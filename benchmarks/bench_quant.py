"""int8 weight-streaming tower vs bf16 tower — batch-1 serving A/B.

Hypothesis (utils/quantize.py): batch-1 latency through the whole-tower
kernel is weight-DMA bound (RoBERTa-base ~14 MB/layer bf16, ViT-H
~39 MB/layer), so halving the streamed bytes with int8 weights +
in-VMEM dequant should cut the DMA-bound share toward 2x while the
dequant VPU work overlaps the next layer's DMA. Same-process A/B per
cell (cross-process runs drift +-4%): the bf16 arm and the int8 arm jit
fresh in one process; inner fori_loop drowns the ~27.5 ms tunnel RTT.

Usage: python bench_quant.py [text-b|img-b|img-h|text-l ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER = 64
ITERS = 6
WARMUP = 2

CELLS = {
    # name: (config, tower, batch)
    "text-b": ("ViT-B-16@RoBERTa-wwm-ext-base-chinese", "text", 1),
    "img-b": ("ViT-B-16@RoBERTa-wwm-ext-base-chinese", "image", 1),
    "img-h": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", "image", 1),
    "text-l": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", "text", 1),
}


def build(name, tower, batch, quantize):
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
    from nans_clip_tpu.utils.quantize import quantize_for_serving

    cfg = load_config(name)
    options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          params)
    if quantize:
        params = quantize_for_serving(params)
    rs = np.random.RandomState(0)
    if tower == "image":
        r = cfg.vision.image_resolution
        x = jnp.asarray(rs.randn(batch, r, r, 3), jnp.bfloat16)
        enc = encode_image
    else:
        t = np.zeros((batch, 52), np.int32)
        t[:, 0] = 101
        t[:, 1:12] = rs.randint(1000, 20000, (batch, 11))
        t[:, 12] = 102
        x = jnp.asarray(t)
        enc = encode_text

    def run(p, x):
        def body(i, acc):
            if tower == "image":
                xi = x + (acc * 1e-12).astype(x.dtype)
            else:
                # acc-dependent select keeps the body loop-variant (ids are
                # ints, the float-perturbation trick doesn't apply) so XLA
                # cannot hoist the forward out of the fori_loop
                xi = jnp.where(acc < jnp.float32(np.inf), x, x + 1)
            return acc + jnp.sum(enc(p, cfg, xi, options)
                                 .astype(jnp.float32))
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    one = jax.jit(lambda p, x: enc(p, cfg, x, options).astype(jnp.float32))
    return jax.jit(run), one, params, x


def drive(fn, params, x):
    for _ in range(WARMUP):
        float(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fn(params, x))
    return (time.perf_counter() - t0) / (ITERS * INNER) * 1e3  # ms/call


def main():
    cells = sys.argv[1:] or list(CELLS)
    for cell in cells:
        name, tower, batch = CELLS[cell]
        fn, one, params, x = build(name, tower, batch, quantize=False)
        ref = np.asarray(one(params, x))
        ms_bf16 = drive(fn, params, x)
        print(f"{cell}: bf16 tower {ms_bf16:.3f} ms", flush=True)

        fnq, oneq, qparams, xq = build(name, tower, batch, quantize=True)
        out = np.asarray(oneq(qparams, xq))
        rel = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
        ms_q = drive(fnq, qparams, xq)
        print(f"{cell}: int8 tower {ms_q:.3f} ms  rel={rel:.2e}", flush=True)
        print(json.dumps({
            "metric": f"quant_tower_{cell}", "bf16_ms": round(ms_bf16, 3),
            "int8_ms": round(ms_q, 3),
            "speedup": round(ms_bf16 / ms_q, 3), "rel_err": float(rel)}),
            flush=True)


if __name__ == "__main__":
    main()
