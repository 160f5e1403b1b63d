"""W=1280 whole-tower mega-kernel A/B (closed VERDICT r2 weak #5).

The r2 width cap (TOWER_MAX_WIDTH=1024) kept ViT-H/14 image batch-1 on
the per-block path (one-shot fused attention + XLA MLP). The budget math
says the H cell fits: double-buffered per-layer weights
2*(4WW + 2WI)*2B = 78.6MB, tile=1 activations ~13.2MB (x3/qkv/h fp32
scratch; head-major dh=80 pads 80->128 lanes so the true activation
footprint is up to ~1.6x = ~21MB), total ~92-100MB against the 110MB
VMEM_TOWER pin on a 128MB v5e. This script measured the cell on the real
chip: 3.287 ms tower vs 3.922 per-block (1.19x, rel 8e-3) — since then
TOWER_MAX_WIDTH=1280 IS the shipping route (gates.py provenance), so the
per-block arm here forces the tower off to reproduce the A/B.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER = 32
ITERS = 6
WARMUP = 2
BATCH = 1


def build():
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, init_clip

    cfg = load_config("ViT-H-14@RoBERTa-wwm-ext-large-chinese")
    options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          params)
    r = cfg.vision.image_resolution

    def run(p, x):
        def body(i, acc):
            return acc + jnp.sum(encode_image(
                p, cfg, x + (acc * 1e-12).astype(x.dtype),
                options).astype(jnp.float32))
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    one = jax.jit(lambda p, x: encode_image(p, cfg, x, options)
                  .astype(jnp.float32))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(BATCH, r, r, 3), jnp.bfloat16)
    return jax.jit(run), one, params, x


def drive(fn, params, x):
    for _ in range(WARMUP):
        float(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fn(params, x))
    return (time.perf_counter() - t0) / (ITERS * INNER) * 1e3  # ms/call


def main():
    import nans_clip_tpu.ops.tower_kernel as tk

    # Arm A: per-block path — force the tower OFF (since r3 the W=1280
    # tower IS the shipping route; this A/B originally motivated that).
    orig_tile = tk.tower_batch_tile
    tk.tower_batch_tile = lambda *a, **k: 0
    try:
        fn, one, params, x = build()
        ref = np.asarray(one(params, x))
        ms_block = drive(fn, params, x)
    finally:
        tk.tower_batch_tile = orig_tile
    print(f"per-block  batch-1 ViT-H image: {ms_block:.3f} ms")

    # Arm B: the shipping route (W=1280 tower); same process, fresh jits.
    s, w, inter = 257, 1280, 5120
    tile = tk.tower_batch_tile(BATCH, s, w, inter, 2)
    print(f"tower_batch_tile(H) = {tile} (budget admits the cell)")
    assert tile >= 1, "budget math rejects the cell; record negative"
    fn2, one2, _, _ = build()
    try:
        out = np.asarray(one2(params, x))
    except Exception as e:  # Mosaic compile failure = the measured negative
        print("TOWER W=1280 COMPILE FAILED:")
        print(repr(e)[:2000])
        print(json.dumps({"metric": "tower_h_batch1", "result": "compile-fail",
                          "per_block_ms": round(ms_block, 3)}))
        return
    rel = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
    ms_tower = drive(fn2, params, x)
    print(f"tower      batch-1 ViT-H image: {ms_tower:.3f} ms  rel={rel:.2e}")
    print(json.dumps({
        "metric": "tower_h_batch1", "result": "ok",
        "per_block_ms": round(ms_block, 3), "tower_ms": round(ms_tower, 3),
        "speedup": round(ms_block / ms_tower, 3), "rel_err": float(rel)}))


if __name__ == "__main__":
    main()
