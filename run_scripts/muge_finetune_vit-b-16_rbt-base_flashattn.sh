#!/usr/bin/env bash
# "FlashAttention" preset (reference *_flashattn.sh adds --use-flash-attention).
# On TPU the fused Pallas attention block is already the default; this preset
# pins it explicitly.
set -e
DIR="$(dirname "$0")"
bash "${DIR}/muge_finetune_vit-b-16_rbt-base.sh" "${1:-./datapath}" \
    --attn-impl fused --name muge_finetune_vit-b-16_roberta-base_flashattn "${@:2}"
