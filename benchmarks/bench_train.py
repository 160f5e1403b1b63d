"""Training-step throughput benchmark (ViT-B/16 + RoBERTa-base, 1 chip).

Measures the FULL production train step — both towers forward, global
InfoNCE, backward, AdamW — at batch 256 in bf16 with remat, in the
reference's training configuration (dropout ON: attention-prob + hidden
dropout 0.1 in the text tower, modeling_bert.py defaults), i.e. the fused
Pallas kernels with in-kernel PRNG dropout and the fused backward kernels.

Reference baseline (BASELINE.md / flash_attention_En.md): 8xA100-80G
flash-attn ViT-B/16 at 0.96 s/iter x 3600 global batch = 469 pairs/s per
A100. Round-1 number: 620 pairs/s/chip (fused ViT attention fwd+bwd, text
tower UNFUSED because of dropout).

Prints one JSON line. Timing includes the ~27.5 ms tunnel RTT per step
(<7% at this step time; same methodology as round 1).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
WARMUP = 2
ITERS = 8
BASELINE_PAIRS_PER_SEC = 469.0  # per-A100 reference


def main():
    ap = argparse.ArgumentParser()
    # The fused blocks' custom_vjps already recompute activations inside
    # their backward kernels (residuals are just the inputs), so per-block
    # jax.checkpoint is redundant recompute when the kernels are routed —
    # --remat exists to measure that.
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--attn-impl", default="auto")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--vision-model", default="ViT-B-16")
    ap.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    # per-A100 pairs/s from flash_attention_En.md (s/it x global batch / 8):
    # ViT-B/16 469, ViT-L/14 163, ViT-H/14 75.7
    ap.add_argument("--baseline", type=float, default=BASELINE_PAIRS_PER_SEC)
    ap.add_argument("--adam-state-dtype", default=None,
                    help="e.g. bfloat16: halves optimizer HBM (ViT-H @ bs32)")
    ap.add_argument("--accum-freq", type=int, default=1)
    # K>1 runs K optimizer steps per dispatch (lax.scan over stacked
    # batches): on a real TPU-VM host the async enqueue pipeline hides the
    # per-step dispatch cost, but the tunnel's ~27.5 ms RTT is synchronous
    # — K=4 amortizes it the way bench.py's inner fori_loop does for
    # inference, so this is the truer chip step time, not a benchmark trick.
    ap.add_argument("--steps-per-call", type=int, default=1)
    # Attribution probe: zero the dropout PROBABILITIES while keeping
    # deterministic=False, so the routing (training kernels) is unchanged
    # and only the in-kernel PRNG work disappears. NOT a production mode.
    ap.add_argument("--no-dropout", action="store_true")
    # FLIP (scaling-language-image-pretraining-via-masking) speed mode:
    # randomly DROP this fraction of image patches per step (the
    # reference's --mask-ratio, model.py random_masking).
    ap.add_argument("--mask-ratio", type=float, default=0.0)
    args = ap.parse_args()
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)

    from nans_clip_tpu.parallel import create_mesh

    cfg = load_config(f"{args.vision_model}@{args.text_model}")
    if args.no_dropout:
        import dataclasses
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0))
    options = ModelOptions(attn_impl=args.attn_impl, compute_dtype="bfloat16",
                           remat=args.remat, deterministic=False)
    tcfg = TrainConfig(lr=1e-4, warmup=10, max_steps=1000,
                       accum_freq=args.accum_freq,
                       mask_ratio=args.mask_ratio,
                       adam_state_dtype=args.adam_state_dtype)

    mesh = create_mesh()  # 1-chip data mesh (the loss constrains sharding)
    ctx = jax.set_mesh(mesh)
    ctx.__enter__()

    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, batch_stats, tcfg)
    step = make_train_step(cfg, tcfg, options)

    BATCH = args.batch
    K = args.steps_per_call
    rs = np.random.RandomState(0)
    r = cfg.vision.image_resolution
    texts = jnp.zeros((BATCH, 52), jnp.int32)
    texts = texts.at[:, 0].set(101)
    texts = texts.at[:, 1:30].set(jnp.asarray(rs.randint(1000, 20000, (BATCH, 29))))
    texts = texts.at[:, 30].set(102)
    rng = jax.random.PRNGKey(7)

    if K > 1:
        inner = step

        @jax.jit
        def step(state, images_k, texts_k, rng):
            def body(s, xs):
                im, tx, rn = xs
                return inner(s, im, tx, rn)
            state, ms = jax.lax.scan(body, state,
                                     (images_k, texts_k,
                                      jax.random.split(rng, K)))
            return state, jax.tree.map(lambda m: m[-1], ms)

        images = jnp.asarray(rs.randn(K, BATCH, r, r, 3), jnp.bfloat16)
        texts = jnp.broadcast_to(texts, (K,) + texts.shape)
    else:
        images = jnp.asarray(rs.randn(BATCH, r, r, 3), jnp.bfloat16)

    print("compiling + warmup...", flush=True)
    for i in range(WARMUP):
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, images, texts, srng)
        # consuming the fp32 loss scalar is the only reliable device sync
        # on the tunneled platform (see bench.py notes)
        print(f"warmup {i}: loss={float(metrics['loss']):.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, images, texts, srng)
        loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (ITERS * K)
    pairs = BATCH / dt
    print(json.dumps({
        "metric": f"{args.vision_model}+{args.text_model} train pairs/sec/"
                  f"chip (bs{BATCH} bf16 remat={args.remat}, dropout "
                  f"{'OFF (attribution probe)' if args.no_dropout else 'on'}, "
                  f"attn_impl={args.attn_impl}"
                  + (f", adam_state={args.adam_state_dtype}"
                     if args.adam_state_dtype else "")
                  + (f", accum={args.accum_freq}" if args.accum_freq > 1
                     else "")
                  + (f", {K} steps/dispatch" if K > 1 else "")
                  + (f", FLIP mask {args.mask_ratio}"
                     if args.mask_ratio else "") + ")",
        "value": round(pairs, 1),
        "unit": "pairs/sec",
        "step_ms": round(dt * 1000, 1),
        "loss": loss,
        "vs_baseline": round(pairs / args.baseline, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
