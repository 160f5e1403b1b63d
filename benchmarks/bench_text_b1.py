"""Text batch-1: harness-vs-product decomposition (r4 verdict #5).

The published 0.518 ms text batch-1 latency carries tunnel RTT
(speed_benchmark --inner 128 amortizes ~27-37 ms of per-dispatch round
trip). This drive separates harness from product with a TWO-POINT
inner-loop fit per segment — wall(N) = overhead + N * device_ms, so
device_ms = (wall(N2) - wall(N1)) / (N2 - N1) is immune to the
RTT-variance that makes single-subtraction estimates of near-empty
programs go negative. Segments, all in ONE process:

  full — encode_text batch-1, production routing (tower kernel)
  emb  — embeddings gather + pos/type add + LN (the pre-tower glue)
  proj — CLS pooling + text_projection matmul (the post-tower glue)

`full - emb - proj` isolates the tower kernel's share, and the glue
numbers bound what folding embeddings/projection INTO the mega-kernel
could save. (Mosaic cost of folding, for the provenance note: the
[21128, W] vocab gather in-kernel is either 52 scalar-indexed row DMAs
or a one-hot [S,V]x[V,W] matmul streaming the full 32 MB table — both
strictly more traffic than XLA's fused gather.)

Usage: python benchmarks/bench_text_b1.py [text-b|text-l ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

INNERS = (64, 256)
ITERS = 5
WARMUP = 2

CELLS = {
    # name: (config, tower, T4-TRT fp16 bs=1 ms from deployment_En.md)
    "text-b": ("ViT-B-16@RoBERTa-wwm-ext-base-chinese", "text", 1.54),
    "text-l": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", "text", 3.89),
    # image cells: full-path device time only (no glue decomposition —
    # the embed/proj fold question was text's; these give the
    # device-corrected deployment rows with the same two-point method)
    "img-b": ("ViT-B-16@RoBERTa-wwm-ext-base-chinese", "image", 3.58),
    "img-h": ("ViT-H-14@RoBERTa-wwm-ext-large-chinese", "image", 25.88),
}


def _loop(body1, inner):
    def run(p, x):
        def body(i, acc):
            xi = jnp.where(acc < jnp.float32(np.inf), x, x + 1)
            return acc + body1(p, xi)
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))
    return jax.jit(run)


def _wall(fn, *args):
    for _ in range(WARMUP):
        float(fn(*args))
    walls = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


def measure(body1, p, x):
    """(device_ms_per_call, overhead_ms_per_dispatch) via two-point fit."""
    n1, n2 = INNERS
    w1 = _wall(_loop(body1, n1), p, x)
    w2 = _wall(_loop(body1, n2), p, x)
    dev = (w2 - w1) / (n2 - n1) * 1e3
    ovh = (w1 - n1 * dev / 1e3) * 1e3
    return dev, ovh, w1 / n1 * 1e3


def main():
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.bert import cast_tree
    from nans_clip_tpu.models.clip import encode_text, init_clip
    from nans_clip_tpu.ops.layernorm import layer_norm

    from nans_clip_tpu.models.clip import encode_image

    cells = [a for a in sys.argv[1:] if not a.startswith("-")]
    for cell in cells or list(CELLS):
        name, tower, t4_ms = CELLS[cell]
        cfg = load_config(name)
        tcfg = cfg.text
        options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
        params, _ = init_clip(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        rs = np.random.RandomState(0)

        if tower == "image":
            vcfg = cfg.vision
            r = vcfg.image_resolution
            img = jnp.asarray(rs.randn(1, r, r, 3), jnp.bfloat16)
            full_dev, full_ovh, full_raw64 = measure(
                lambda p, xi: jnp.sum(
                    encode_image(p, cfg, xi, options).astype(jnp.float32)),
                params, img)
            out = {
                "metric": f"b1_device_{cell}",
                "full_ms_device": round(full_dev, 4),
                "full_ms_raw_inner64": round(full_raw64, 4),
                "dispatch_overhead_ms": round(full_ovh, 2),
                "vs_t4_trt_device": round(t4_ms / full_dev, 2),
            }
            if "--img-glue" in sys.argv:
                # pre-tower glue: patch-embed matmul + cls/pos + ln_pre
                # (vit.py:96-109); post: ln_post on CLS + projection. The
                # patch-embed IS an MXU matmul, so unlike the text vocab
                # gather a tower-kernel fold is expressible — this bounds
                # what it could save.
                from nans_clip_tpu.models.vit import cast_tree as vit_cast

                def pre_fn(p, xi):
                    vp = vit_cast(p["visual"], options)
                    pch, g, w = (vcfg.patch_size, vcfg.grid_size,
                                 vcfg.width)
                    x = xi.reshape(1, g, pch, g, pch, 3).transpose(
                        0, 1, 3, 2, 4, 5).reshape(1, g * g, pch * pch * 3)
                    x = x @ vp["conv1"]["kernel"].reshape(pch * pch * 3, w)
                    clsv = jnp.broadcast_to(
                        vp["class_embedding"], (1, 1, w)).astype(x.dtype)
                    x = jnp.concatenate([clsv, x], axis=1)
                    x = x + vp["positional_embedding"].astype(x.dtype)
                    x = layer_norm(x, **vp["ln_pre"])
                    return jnp.sum(x.astype(jnp.float32))
                pre_dev, _, _ = measure(pre_fn, params, img)

                seq_i = jnp.asarray(
                    rs.randn(1, vcfg.grid_size ** 2 + 1, vcfg.width),
                    jnp.bfloat16)

                def post_fn(p, xi):
                    vp = vit_cast(p["visual"], options)
                    x = layer_norm(xi[:, 0, :], **vp["ln_post"])
                    return jnp.sum(
                        (x @ vp["proj"].astype(x.dtype)).astype(jnp.float32))
                post_dev, _, _ = measure(post_fn, params, seq_i)
                glue_i = max(0.0, pre_dev) + max(0.0, post_dev)
                out.update({
                    "pre_glue_ms_device": round(pre_dev, 4),
                    "post_glue_ms_device": round(post_dev, 4),
                    "tower_share_ms": round(full_dev - glue_i, 4),
                    "glue_share_pct": round(100 * glue_i / full_dev, 2),
                })
            print(json.dumps(out), flush=True)
            continue

        t = np.zeros((1, 52), np.int32)
        t[:, 0] = 101
        t[:, 1:12] = rs.randint(1000, 20000, (1, 11))
        t[:, 12] = 102
        ids = jnp.asarray(t)

        full_dev, full_ovh, full_raw64 = measure(
            lambda p, xi: jnp.sum(
                encode_text(p, cfg, xi, options).astype(jnp.float32)),
            params, ids)

        def emb_fn(p, xi):
            bp = cast_tree(p["bert"], options)
            e = bp["embeddings"]
            x = e["word"][xi] + e["position"][:52][None] \
                + e["token_type"][0][None, None, :]
            x = layer_norm(x, **e["ln"], eps=tcfg.layer_norm_eps)
            return jnp.sum(x.astype(jnp.float32))
        emb_dev, _, _ = measure(emb_fn, params, ids)

        seq = jnp.asarray(rs.randn(1, 52, tcfg.hidden_size), jnp.bfloat16)

        def proj_fn(p, xi):
            f = xi[:, 0, :] @ p["text_projection"].astype(xi.dtype)
            return jnp.sum(f.astype(jnp.float32))
        proj_dev, _, _ = measure(proj_fn, params, seq)

        glue = max(0.0, emb_dev) + max(0.0, proj_dev)
        print(json.dumps({
            "metric": f"text_b1_decomp_{cell}",
            "full_ms_device": round(full_dev, 4),
            "full_ms_raw_inner64": round(full_raw64, 4),
            "dispatch_overhead_ms": round(full_ovh, 2),
            "emb_glue_ms_device": round(emb_dev, 4),
            "proj_glue_ms_device": round(proj_dev, 4),
            "tower_share_ms": round(full_dev - glue, 4),
            "glue_share_pct": round(100 * glue / full_dev, 2),
            "vs_t4_trt_device": round(t4_ms / full_dev, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
