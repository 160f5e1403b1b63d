"""Text batch-1: harness-vs-product decomposition (r4 verdict #5).

The published 0.518 ms text batch-1 latency carries ~0.21 ms/iter of
tunnel RTT (speed_benchmark --inner 128). This drive separates, in ONE
process (inner fori_loop, fp32-scalar sync):

  rtt        — measured per-dispatch round trip (trivial jit scalar)
  full       — encode_text batch-1, production routing (tower kernel)
  emb        — embeddings gather + pos/type add + LN (the pre-tower glue)
  proj       — CLS pooling + text_projection matmul (the post-tower glue)

so `full - emb - proj` isolates the tower kernel's share and the glue
numbers bound what folding embeddings/projection INTO the mega-kernel
could possibly save. (Mosaic cost of doing so, for the provenance note:
the [21128, W] vocab gather in-kernel is either 52 scalar-indexed row
DMAs or a one-hot [S,V]x[V,W] matmul streaming the full 32 MB table —
both are strictly more traffic than XLA's fused gather, and the glue
share measured here is what they'd have to beat.)

Usage: python benchmarks/bench_text_b1.py [text-b|text-l ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER = 128
ITERS = 6
WARMUP = 2

CELLS = {
    "text-b": ("ViT-B-16@RoBERTa-wwm-ext-base-chinese", 1.54),
    "text-l": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", 3.89),
}


def _loop(body1):
    def run(p, x):
        def body(i, acc):
            xi = jnp.where(acc < jnp.float32(np.inf), x, x + 1)
            return acc + body1(p, xi)
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))
    return jax.jit(run)


def drive(fn, *args):
    for _ in range(WARMUP):
        float(fn(*args))
    wall = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        wall.append(time.perf_counter() - t0)
    return np.mean(wall)  # seconds per dispatch of INNER calls


def measure_rtt():
    one = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros((), jnp.float32)
    float(one(v))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        float(one(v))
    return (time.perf_counter() - t0) / n


def main():
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.bert import cast_tree
    from nans_clip_tpu.models.clip import encode_text, init_clip
    from nans_clip_tpu.ops.layernorm import layer_norm

    rtt = measure_rtt()
    print(f"measured per-dispatch RTT: {rtt * 1e3:.2f} ms", flush=True)

    for cell in sys.argv[1:] or list(CELLS):
        name, t4_ms = CELLS[cell]
        cfg = load_config(name)
        tcfg = cfg.text
        options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
        params, _ = init_clip(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        rs = np.random.RandomState(0)
        t = np.zeros((1, 52), np.int32)
        t[:, 0] = 101
        t[:, 1:12] = rs.randint(1000, 20000, (1, 11))
        t[:, 12] = 102
        ids = jnp.asarray(t)

        # full production path
        full = _loop(lambda p, xi: jnp.sum(
            encode_text(p, cfg, xi, options).astype(jnp.float32)))

        # pre-tower glue: embeddings + LN (bert_features:69-75)
        def emb_fn(p, xi):
            bp = cast_tree(p["bert"], options)
            e = bp["embeddings"]
            x = e["word"][xi] + e["position"][:52][None] \
                + e["token_type"][0][None, None, :]
            x = layer_norm(x, **e["ln"], eps=tcfg.layer_norm_eps)
            return jnp.sum(x.astype(jnp.float32))
        emb = _loop(emb_fn)

        # post-tower glue: CLS pool + projection (clip.py encode_text)
        seq = jnp.asarray(rs.randn(1, 52, tcfg.hidden_size), jnp.bfloat16)

        def proj_fn(p, xi):
            f = xi[:, 0, :] @ p["text_projection"].astype(xi.dtype)
            return jnp.sum(f.astype(jnp.float32))
        proj = _loop(proj_fn)

        w_full = drive(full, params, ids)
        w_emb = drive(emb, params, ids)
        w_proj = drive(proj, params, seq)

        def per_call(w):  # RTT-corrected ms per encode
            return (w - rtt) / INNER * 1e3

        ms_full, ms_emb, ms_proj = map(per_call, (w_full, w_emb, w_proj))
        ms_raw = w_full / INNER * 1e3  # raw = RTT amortized in, like the published table
        glue = ms_emb + ms_proj
        print(json.dumps({
            "metric": f"text_b1_decomp_{cell}",
            "rtt_ms_per_dispatch": round(rtt * 1e3, 2),
            "full_ms_raw": round(ms_raw, 4),
            "full_ms_rtt_corrected": round(ms_full, 4),
            "emb_glue_ms": round(ms_emb, 4),
            "proj_glue_ms": round(ms_proj, 4),
            "tower_share_ms": round(ms_full - glue, 4),
            "glue_share_pct": round(100 * glue / ms_full, 1),
            "vs_t4_trt_rtt_corrected": round(t4_ms / ms_full, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
