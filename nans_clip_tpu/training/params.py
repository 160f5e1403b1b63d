"""Training CLI flags — same surface as reference training/params.py:16-236,
minus the knobs that TPU/JAX makes obsolete (kept as accepted no-ops with a
warning so reference launch scripts still run):

* ``--precision``: bf16 compute + fp32 params is the single path (no AMP
  GradScaler); ``--precision fp32`` disables bf16 compute.
* ``--use-flash-attention``: the Pallas fused kernel is the default; the
  flag maps to ``attn_impl``.
* ``--gather-with-grad`` / ``--skip-aggregate``: JAX's feature gather is
  always differentiable and always global (SURVEY §2.8) — both accepted,
  ignored.
* ``--use-bn-sync``: batch stats are computed over the global sharded batch
  under jit, i.e. always synced for RN50.
"""

from __future__ import annotations

import argparse


def get_default_params(model_name: str) -> dict:
    # Per-arch defaults from the CLIP paper (reference params.py:4-13).
    if model_name in ("RN50", "RN101", "RN50x4"):
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}
    if model_name in ("ViT-B-32", "ViT-B-16", "ViT-H-14"):
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    if model_name in ("ViT-L-14", "ViT-L-14-336"):
        return {"lr": 4.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {}


def parse_args(argv=None):
    p = argparse.ArgumentParser("nans_clip_tpu trainer")
    # data
    p.add_argument("--train-data", default=None, help="npack dataset dir (train split)")
    p.add_argument("--val-data", default=None, help="npack dataset dir (val split)")
    p.add_argument("--num-workers", type=int, default=8, help="decode threads")
    p.add_argument("--valid-num-workers", type=int, default=8)
    # logging / ckpt
    p.add_argument("--logs", default="./logs/")
    p.add_argument("--name", default="train_clip")
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--report-training-batch-acc", action="store_true", default=True)
    p.add_argument("--save-epoch-frequency", type=int, default=1)
    p.add_argument("--save-step-frequency", type=int, default=-1)
    p.add_argument("--resume", default=None)
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--reset-data-offset", action="store_true")
    p.add_argument("--save-torch-format", action="store_true",
                   help="also write reference-layout .pt checkpoints")
    # batches / schedule
    p.add_argument("--batch-size", type=int, default=64, help="per-device batch size")
    p.add_argument("--valid-batch-size", type=int, default=64)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=10)
    p.add_argument("--valid-step-interval", type=int, default=None)
    p.add_argument("--valid-epoch-interval", type=int, default=1)
    p.add_argument("--context-length", type=int, default=52)
    # optimizer
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--beta1", type=float, default=None)
    p.add_argument("--beta2", type=float, default=None)
    p.add_argument("--eps", type=float, default=None)
    p.add_argument("--wd", type=float, default=0.001)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--skip-scheduler", action="store_true",
                   help="constant lr after warmup (no cosine decay). The "
                        "reference parses but never applies this flag; here "
                        "it does what the help text promises")
    # model
    p.add_argument("--vision-model", default="ViT-B-16",
                   choices=["ViT-B-32", "ViT-B-16", "ViT-L-14", "ViT-L-14-336",
                            "ViT-H-14", "RN50"])
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese",
                   choices=["RoBERTa-wwm-ext-base-chinese",
                            "RoBERTa-wwm-ext-large-chinese", "RBT3-chinese"])
    p.add_argument("--clip-weight-path", default=None)
    p.add_argument("--bert-weight-path", default=None)
    p.add_argument("--precision", choices=["amp", "fp16", "fp32", "bf16"],
                   default="bf16", help="amp/fp16 map to bf16 on TPU")
    p.add_argument("--mask-ratio", type=float, default=0.0, help="FLIP masking")
    p.add_argument("--freeze-vision", action="store_true")
    p.add_argument("--grad-checkpointing", action="store_true")
    p.add_argument("--use-augment", action="store_true")
    p.add_argument("--exact-decode", action="store_true",
                   help="decode training images with the PIL-bit-exact "
                        "bicubic path (the reference's non-augment "
                        "transform pixels, training/data.py:85-90) "
                        "instead of the DCT-scaled bilinear fast decode")
    p.add_argument("--use-bn-sync", action="store_true", help="no-op: always synced on TPU")
    p.add_argument("--use-flash-attention", action="store_true",
                   help="no-op: Pallas fused attention is the default on TPU")
    p.add_argument("--attn-impl", choices=["auto", "pallas", "xla", "fused"],
                   default="auto")
    p.add_argument("--accum-freq", type=int, default=1)
    p.add_argument("--gather-with-grad", action="store_true", help="no-op on TPU (always)")
    p.add_argument("--skip-aggregate", action="store_true", help="no-op on TPU")
    p.add_argument("--grad-norm-clip", type=float, default=None)
    p.add_argument("--adam-state-dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="store Adam moments in this dtype; bfloat16 halves "
                        "optimizer HBM (lets ViT-H train at bs32 on 16 GB)")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    # parallelism
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis size")
    p.add_argument("--fsdp", action="store_true",
                   help="fully shard params + Adam moments over the data "
                        "axis (ZeRO-3 storage; XLA inserts the per-use "
                        "all-gather / gradient reduce-scatter)")
    p.add_argument("--fsdp-min-size", type=int, default=None,
                   help="replicate parameters smaller than this many "
                        "elements instead of sharding them (default: the "
                        "production 65536 gate; lower it for tiny models)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan of "
                        "the train step over stacked batches): amortizes "
                        "per-dispatch host overhead (+2.6%% measured at 4 "
                        "on the bench chip). Trajectory is identical to 1. "
                        "Log/valid/save cadences round UP to the next "
                        "dispatch boundary; holds K preprocessed batches "
                        "on device, so watch HBM at large global batches")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel mesh axis size: each stage "
                        "stores and runs layers/pp transformer layers, "
                        "activations ride a ppermute ring (GPipe schedule); "
                        "mutually exclusive with --tp > 1")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="pipeline microbatches per step (0 = auto: the "
                        "largest divisor of the per-data-shard batch <= "
                        "4*pp keeping >= 2 samples per microbatch — "
                        "bubble <= 1/5 at the 4*pp target)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed via TPU-pod metadata "
                        "autodetect (multi-host). Explicit rendezvous works "
                        "without the flag via COORDINATOR_ADDRESS/"
                        "NUM_PROCESSES/PROCESS_ID env vars")
    # misc
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform (the axon sitecustomize hook "
                        "overrides JAX_PLATFORMS env, so do it via config)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--profile-steps", default=None,
                   help="capture a jax.profiler trace over steps 'START:END' "
                        "into <logs>/<name>/profile (open with XProf)")
    p.add_argument("--tiny-model", action="store_true",
                   help="shrink towers to a test-size config (CI/integration tests)")
    p.add_argument("--seed", type=int, default=123)
    # distillation
    p.add_argument("--distillation", action="store_true")
    p.add_argument("--teacher-model-name", default=None,
                   help="struct name Vision@Text of the frozen teacher")
    p.add_argument("--teacher-weight-path", default=None)
    p.add_argument("--kd_loss_weight", "--kd-loss-weight", type=float, default=0.5)

    args = p.parse_args(argv)
    for name, val in get_default_params(args.vision_model).items():
        if getattr(args, name) is None:
            setattr(args, name, val)
    if args.lr is None:
        args.lr = 5.0e-4
    if args.beta1 is None:
        args.beta1, args.beta2, args.eps = 0.9, 0.999, 1e-8
    args.aggregate = not args.skip_aggregate
    return args
