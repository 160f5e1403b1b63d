"""ViT-L/14 and ViT-H/14 image-tower throughput: fused (regridded batch-
tiled kernels) vs the XLA-fallback routing — the round-2 check that the
multi-sample-cell regrid beats XLA at the big widths (round-1 numbers to
beat: ViT-L 620 img/s @ bs64, ViT-H 230 img/s @ bs16; T4-TRT baselines
13.0 ms and 25.9 ms/sample from deployment_En.md).

Prints one JSON line per (model, impl). Timing uses the inner-fori-loop
trick from bench.py (the tunnel RTT is fixed ~27.5 ms per dispatch).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER = 4
ITERS = 6
WARMUP = 2


def bench_tower(name: str, batch: int, impl: str, baseline_ms: float):
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, init_clip

    cfg = load_config(name)
    options = ModelOptions(attn_impl=impl, compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    r = cfg.vision.image_resolution

    def run(p, x):
        def body(i, acc):
            return acc + jnp.sum(encode_image(
                p, cfg, x + (acc * 1e-12).astype(x.dtype),
                options).astype(jnp.float32))
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    fn = jax.jit(run)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(batch, r, r, 3), jnp.bfloat16)
    for _ in range(WARMUP):
        float(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fn(params, x))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    ips = batch / dt
    print(json.dumps({
        "metric": f"{name.split('@')[0]} image features img/s/chip "
                  f"(bs{batch} bf16 attn_impl={impl})",
        "value": round(ips, 1),
        "unit": "img/sec",
        "ms_per_image": round(1000 * dt / batch, 3),
        "vs_t4_trt": round(ips / (1000.0 / baseline_ms), 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="L,H",
                    help="comma list from {L,H}")
    ap.add_argument("--impls", default="auto,fused")
    args = ap.parse_args()
    spec = {"L": ("ViT-L-14@RoBERTa-wwm-ext-base-chinese", 64, 13.04),
            "H": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", 16, 25.88)}
    for m in args.models.split(","):
        name, batch, base = spec[m.strip()]
        for impl in args.impls.split(","):
            bench_tower(name, batch, impl.strip(), base)


if __name__ == "__main__":
    main()
