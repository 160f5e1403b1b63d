#!/usr/bin/env bash
# MUGE finetune preset — twin of the reference launcher
# (run_scripts/muge_finetune_vit-b-16_rbt-base.sh). One process per host;
# jax.distributed handles multi-host rendezvous, the ("data","model") mesh
# replaces torch.distributed.launch per-GPU ranks.
set -e

DATAPATH=${1:-"./datapath"}

python -m nans_clip_tpu.training.main \
    --train-data "${DATAPATH}/datasets/MUGE/train" \
    --val-data "${DATAPATH}/datasets/MUGE/valid" \
    --name muge_finetune_vit-b-16_roberta-base \
    --logs "${DATAPATH}/experiments/" \
    --vision-model ViT-B-16 \
    --text-model RoBERTa-wwm-ext-base-chinese \
    --clip-weight-path "${DATAPATH}/pretrained_weights/clip_cn_vit-b-16.pt" \
    --bert-weight-path "${DATAPATH}/pretrained_weights/clip_cn_vit-b-16.pt" \
    --batch-size 128 \
    --valid-batch-size 128 \
    --accum-freq 1 \
    --lr 5e-5 \
    --wd 0.001 \
    --warmup 100 \
    --max-epochs 3 \
    --valid-epoch-interval 1 \
    --save-epoch-frequency 1 \
    --log-interval 10 \
    --context-length 52 \
    --use-augment \
    "${@:2}"
