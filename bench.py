"""Benchmark: ViT-B/16 dual-tower feature-extraction throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md, T4 TensorRT fp16 batch-1): image 3.58 ms + text
1.54 ms per sample = 195.3 pairs/sec. The north star is >=2x that per chip.
We serve batched + AOT-jitted in bf16 (the TPU way), not batch-1.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 1000.0 / (3.58 + 1.54)

# Measured bf16 Pallas matmul peak on this chip (PARITY.md int8-probe
# section: 234.8 TFLOP/s sustained through a Pallas kernel) — the MFU
# denominator. The v5e nominal bf16 peak is 197 TFLOP/s/chip on paper;
# the probe measured higher through the tunnel clock, so we report against
# the probe (conservative MFU) and record both.
MEASURED_PEAK_TFLOPS = 234.8


def _tower_flops(seq: int, width: int, layers: int) -> float:
    """Forward FLOPs of one transformer tower per SAMPLE (2*MACs):
    qkv (6SW^2) + attention matmuls (4S^2W) + out-proj (2SW^2) +
    4x-MLP (16SW^2) per layer."""
    per_layer = 24.0 * seq * width * width + 4.0 * seq * seq * width
    return layers * per_layer


def _clip_pair_flops(cfg, text_seq: int) -> float:
    """Forward FLOPs per (image, text) pair for a ViT-based CLIP config."""
    v, t = cfg.vision, cfg.text
    s_img = (v.image_resolution // v.patch_size) ** 2 + 1
    img = _tower_flops(s_img, v.width, v.layers)
    img += 2.0 * s_img * (3 * v.patch_size ** 2) * v.width   # patch embed
    img += 2.0 * v.width * cfg.embed_dim                      # projection
    txt = _tower_flops(text_seq, t.hidden_size, t.num_hidden_layers)
    txt += 2.0 * t.hidden_size * cfg.embed_dim
    return img + txt

# Batch settled by same-process A/Bs (512 -> 1024 -> 2048 -> 4096 each
# won: image 0.2364/0.2333/0.2316/0.2305 ms/sample, text 0.0683/0.0669/
# 0.0655/0.0645): bigger dispatches amortize per-call scheduling; the
# 2048->4096 step is the flattening tail (+0.8% pairs/s, r3 ladder probe).
IMAGE_BATCH = 4096
TEXT_BATCH = 4096
ITERS = 8        # host-visible timing iterations
INNER = 8        # forwards per jitted call (amortizes the tunnel RTT,
                 # measured ~27.5 ms fixed per dispatch on the axon relay)
WARMUP = 2


def main():
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip

    cfg = load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    # NOTE: each call returns an fp32 scalar so `float(...)` forces full
    # device execution. On the tunneled 'axon' platform block_until_ready
    # does NOT actually block (measured 100x-over-speed-of-light numbers),
    # and device->host transfer of bf16 arrays hangs; a summed fp32 scalar
    # is the reliable sync on every backend. INNER forwards run inside one
    # jitted call (fori_loop) so the tunnel RTT amortizes away.
    def _loop(fn):
        # acc feeds back into the input (x + acc*1e-12): a loop-carried data
        # dependency so XLA cannot hoist the forward out of the loop.
        def run(p, x):
            def body(i, acc):
                return acc + fn(p, x, acc)
            return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))
        return jax.jit(run)

    img_fn = _loop(lambda p, x, acc: jnp.sum(
        encode_image(p, cfg, x + (acc * 1e-12).astype(x.dtype), options).astype(jnp.float32)))
    txt_fn = _loop(lambda p, t, acc: jnp.sum(
        encode_text(p, cfg, t + (acc * 1e-12).astype(t.dtype), options).astype(jnp.float32)))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(IMAGE_BATCH, 224, 224, 3), jnp.bfloat16)
    texts = jnp.zeros((TEXT_BATCH, 52), jnp.int32)
    texts = texts.at[:, 0].set(101)
    texts = texts.at[:, 1:30].set(jnp.asarray(rs.randint(1000, 20000, (TEXT_BATCH, 29))))
    texts = texts.at[:, 30].set(102)

    # warmup / compile
    for _ in range(WARMUP):
        float(img_fn(params, images))
        float(txt_fn(params, texts))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(img_fn(params, images))
    img_time = (time.perf_counter() - t0) / (ITERS * INNER)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(txt_fn(params, texts))
    txt_time = (time.perf_counter() - t0) / (ITERS * INNER)

    imgs_per_sec = IMAGE_BATCH / img_time
    txts_per_sec = TEXT_BATCH / txt_time
    # throughput extracting matched image+text pairs
    pairs_per_sec = 1.0 / (img_time / IMAGE_BATCH + txt_time / TEXT_BATCH)

    flops_per_pair = _clip_pair_flops(cfg, texts.shape[1])
    tflops = pairs_per_sec * flops_per_pair / 1e12
    result = {
        "metric": "ViT-B/16 image+text feature pairs/sec/chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "detail": {
            "images_per_sec": round(imgs_per_sec, 2),
            "texts_per_sec": round(txts_per_sec, 2),
            "image_ms_per_sample": round(1000 * img_time / IMAGE_BATCH, 4),
            "text_ms_per_sample": round(1000 * txt_time / TEXT_BATCH, 4),
            "batch": IMAGE_BATCH,
            "backend": jax.default_backend(),
            "tflops_per_sec": round(tflops, 1),
            "pct_of_measured_peak": round(100 * tflops / MEASURED_PEAK_TFLOPS, 1),
            "peak_ref_tflops": MEASURED_PEAK_TFLOPS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
