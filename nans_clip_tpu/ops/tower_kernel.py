"""Whole-tower serving mega-kernel: all L transformer layers in ONE
pallas_call, grid over layers.

Rationale (low-latency serving): at batch 1 the tower is entirely
overhead- and weight-streaming-bound — the per-sub-block kernels cost
24 launches with activation HBM round trips between them, ~1.8 ms for the
38M-param text tower whose weight-streaming floor is ~0.25 ms. This
kernel runs the whole encoder in one launch: the grid is (n_layers,),
each step's weight blocks are indexed by layer from the parameter-stacked
[L, ...] arrays (the same layout lax.scan consumes, models/bert.py:38-53,
models/vit.py), Pallas double-buffers the next layer's weights while the
current layer computes, and the activations never leave VMEM (a scratch
buffer carries x across grid steps — the sequential-grid guarantee on
TPU). Replaces the reference's serving path of 2x12 separate attention/
MLP CUDA module calls (cn_clip/clip/model.py:189, deploy/tensorrt usage).

Inference only (no dropout, no custom_vjp): the training path keeps the
per-sub-block kernels whose backward twins recompute in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nans_clip_tpu.ops.gates import (TOWER_BUDGET, TOWER_MAX_RESTREAMS,
                                     TOWER_MAX_WIDTH, TOWER_TILE_CAP,
                                     VMEM_TOWER)
from nans_clip_tpu.ops.layer_kernel import encoder_layer_math


def _tower_kernel(x_ref, kb_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                  bo_ref, s2_ref, b2_ref, w1_ref, bm1_ref, w2_ref, bm2_ref,
                  o_ref, xs_ref, *, heads: int, eps: float, act: str,
                  post_ln: bool, masked: bool, n_layers: int, batch: int):
    l = pl.program_id(1)               # grid (batch_tile, layer), layer fastest
    rows, w = xs_ref.shape

    @pl.when(l == 0)
    def _():
        xs_ref[:] = x_ref[:].reshape(rows, w)

    x = xs_ref[:]
    kb = kb_ref[:] if masked else None
    # the layer math (attention + MLP, head-major, fp32 stats) is shared
    # with the whole-layer kernel so the two serving paths cannot diverge
    out = encoder_layer_math(
        x, kb, s1_ref[0], b1_ref[0], wqkv_ref[0], bqkv_ref[0], wo_ref[0],
        bo_ref[0], s2_ref[0], b2_ref[0], w1_ref[0], bm1_ref[0], w2_ref[0],
        bm2_ref[0], heads=heads, eps=eps, act=act, post_ln=post_ln,
        batch=batch)

    xs_ref[:] = out.astype(x.dtype)

    # constant-index output block: flushed to HBM once after the final
    # grid step, so only the last layer needs to store it — earlier
    # layers' writes were dead VMEM traffic
    @pl.when(l == n_layers - 1)
    def _():
        o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def _tower_kernel_q(x_ref, kb_ref, s1_ref, b1_ref, wqkv_ref, sqkv_ref,
                    bqkv_ref, wo_ref, so_ref, bo_ref, s2_ref, b2_ref, w1_ref,
                    sm1_ref, bm1_ref, w2_ref, sm2_ref, bm2_ref, o_ref, xs_ref,
                    *, heads: int, eps: float, act: str, post_ln: bool,
                    masked: bool, n_layers: int, batch: int):
    """int8 weight-streaming variant (utils/quantize.py): each big weight
    block arrives int8 (HALF the HBM bytes — the batch-1 bottleneck) with
    a per-output-channel fp32 scale row, and is dequantized in VMEM. The
    convert+mul is VPU work that overlaps the NEXT layer's weight DMA in
    the double-buffered grid pipeline, so at DMA-bound batch sizes the
    layer step time tracks the halved streamed bytes. Math after dequant
    is the shared encoder_layer_math — bf16 MXU, fp32 stats — so the
    quantized path cannot structurally diverge from the bf16 one."""
    l = pl.program_id(1)
    rows, w = xs_ref.shape

    @pl.when(l == 0)
    def _():
        xs_ref[:] = x_ref[:].reshape(rows, w)

    x = xs_ref[:]
    kb = kb_ref[:] if masked else None
    deq = lambda wr, sr: (wr[0].astype(jnp.float32)
                          * sr[0].astype(jnp.float32)).astype(x.dtype)
    out = encoder_layer_math(
        x, kb, s1_ref[0], b1_ref[0], deq(wqkv_ref, sqkv_ref), bqkv_ref[0],
        deq(wo_ref, so_ref), bo_ref[0], s2_ref[0], b2_ref[0],
        deq(w1_ref, sm1_ref), bm1_ref[0], deq(w2_ref, sm2_ref), bm2_ref[0],
        heads=heads, eps=eps, act=act, post_ln=post_ln, batch=batch)

    xs_ref[:] = out.astype(x.dtype)

    @pl.when(l == n_layers - 1)
    def _():
        o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def tower_batch_tile(b: int, s: int, w: int, inter: int,
                     esize: int = 2, quant: bool = False) -> int:
    """Samples per tower cell. The grid is (B/tile, L): within one batch
    tile the activations never leave VMEM across all L layers; a new tile
    re-streams the weights (L blocks), so bigger tiles amortize weight
    traffic. Budget: double-buffered per-layer weights + live activations
    against the raised 110MB vmem limit."""
    if w % 128 or w > TOWER_MAX_WIDTH:
        # beyond W=1280 the double-buffered weights alone (>=113MB at
        # W=1536) exceed the pin; route per-sub-block kernels there.
        # W=1024 (50MB) and W=1280 (78.6MB, tile=1, 1.19x at batch 1)
        # are TPU-validated.
        return 0
    total = 4 * w * w + 2 * w * inter
    if quant:
        # int8 streamed blocks double-buffered + ONE dequantized copy in
        # the compute dtype (live through the layer math); at esize=2
        # this equals the bf16 case, so every validated cell still fits
        weights = total * (2 + esize)
    else:
        weights = 2 * total * esize                     # double-buffered
    per = s * (3 * w * 4              # fp32 qkv
               + inter * 4            # fp32 h
               + w * (4 * esize + 4))  # x/xn/ctx/out + scratch
    t = (TOWER_BUDGET - weights) // per
    t = min(t, TOWER_TILE_CAP, b)
    while t > 1 and b % t:
        t -= 1
    return int(max(t, 0))


def fits_tower(b: int, s: int, w: int, inter: int, esize: int = 2,
               quant: bool = False) -> bool:
    """Route the tower kernel only while weight re-streaming stays
    bounded (<= 4 batch tiles): it wins decisively at serving batches
    (1.2-1.5x, see PARITY) but at bs256 the per-tile weight re-streams
    cancel the saved activation round trips (measured 3100 vs 3121
    pairs/s — noise); the per-sub-block kernels keep the big batches."""
    t = tower_batch_tile(b, s, w, inter, esize, quant)
    return t >= 1 and b <= TOWER_MAX_RESTREAMS * t


def fused_tower(x, key_bias, ln1_scale, ln1_bias, wqkv, bqkv, wo, bo,
                ln2_scale, ln2_bias, w1, b1, w2, b2, heads: int,
                eps: float, act: str, post_ln: bool,
                interpret: bool = False):
    """Run the full L-layer encoder on [B, S, W] activations.

    All parameter arrays are layer-stacked ([L, ...]); ln1 is the
    attention-side LayerNorm (pre-LN for ViT, post-LN for BERT), ln2 the
    MLP-side. ``key_bias``: [B, 1, S] additive mask or None. The grid is
    (B/tile, L) with the layer axis fastest: each batch tile's
    activations stay in the VMEM scratch across all L layers (no
    inter-layer HBM round trips), weights re-stream once per batch tile.

    ``wqkv/wo/w1/w2`` may each be an int8-quantized leaf
    ``{"int8": [L, in, out], "scale": [L, 1, out]}`` (utils/quantize.py):
    the kernel then streams HALF the weight bytes and dequantizes in VMEM
    (the low-latency serving mode; all four must be quantized together).
    """
    from nans_clip_tpu.utils.quantize import is_quantized
    b, s, w = x.shape
    quant = is_quantized(wqkv)
    assert quant == is_quantized(wo) == is_quantized(w1) == is_quantized(w2), \
        "all four tower weights must be quantized together"
    L = (wqkv["int8"] if quant else wqkv).shape[0]
    inter = (w1["int8"] if quant else w1).shape[-1]
    masked = key_bias is not None
    if key_bias is None:
        # never read when masked=False: a [1,1,S] dummy with a constant
        # index map avoids allocating + streaming a [B,1,S] zeros buffer
        # on the unmasked (image-tower) path
        key_bias = jnp.zeros((1, 1, s), jnp.float32)
    else:
        key_bias = jnp.asarray(key_bias, jnp.float32).reshape(b, 1, s)
    tile = tower_batch_tile(b, s, w, inter, jnp.dtype(x.dtype).itemsize,
                            quant)
    assert tile >= 1 and b % tile == 0, (b, s, w, tile)

    # [L, d] stacked vectors must present [L, 1, d] blocks: a (1, d) tail
    # is only tile-legal when the sublane dim equals the array's (the same
    # singleton trick as the wide kernel's bqkv re-lay)
    r3 = lambda a: a.reshape(a.shape[0], 1, a.shape[1])
    bat = lambda *shape: pl.BlockSpec(shape, lambda bt, l: (bt,) + (0,) * (len(shape) - 1),
                                      memory_space=pltpu.VMEM)
    lyr = lambda *shape: pl.BlockSpec((1,) + shape,
                                      lambda bt, l: (l,) + (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    if quant:
        # each weight spec is followed by its [L, 1, out] scale-row spec
        kernel, wspecs, wargs = _tower_kernel_q, [
            lyr(w, 3 * w), lyr(1, 3 * w), lyr(1, 3 * w),   # wqkv/scale/bqkv
            lyr(w, w), lyr(1, w), lyr(1, w),               # wo/scale/bo
            lyr(1, w), lyr(1, w),                          # ln2 scale/bias
            lyr(w, inter), lyr(1, inter), lyr(1, inter),   # w1/scale/b1
            lyr(inter, w), lyr(1, w), lyr(1, w),           # w2/scale/b2
        ], (wqkv["int8"], wqkv["scale"], r3(bqkv),
            wo["int8"], wo["scale"], r3(bo),
            r3(ln2_scale), r3(ln2_bias),
            w1["int8"], w1["scale"], r3(b1),
            w2["int8"], w2["scale"], r3(b2))
    else:
        kernel, wspecs, wargs = _tower_kernel, [
            lyr(w, 3 * w), lyr(1, 3 * w),  # wqkv/bqkv
            lyr(w, w), lyr(1, w),          # wo/bo
            lyr(1, w), lyr(1, w),          # ln2 scale/bias
            lyr(w, inter), lyr(1, inter),  # w1/b1
            lyr(inter, w), lyr(1, w),      # w2/b2
        ], (wqkv, r3(bqkv), wo, r3(bo), r3(ln2_scale), r3(ln2_bias),
            w1, r3(b1), w2, r3(b2))
    return pl.pallas_call(
        functools.partial(kernel, heads=heads, eps=eps, act=act,
                          post_ln=post_ln, masked=masked, n_layers=L,
                          batch=tile),
        grid=(b // tile, L),
        in_specs=[
            bat(tile, s, w),           # x (fetched once per batch tile)
            (bat(tile, 1, s) if masked else
             pl.BlockSpec((1, 1, s), lambda bt, l: (0, 0, 0),
                          memory_space=pltpu.VMEM)),  # key_bias
            lyr(1, w), lyr(1, w),      # ln1 scale/bias
        ] + wspecs,
        out_specs=bat(tile, s, w),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile * s, w), x.dtype)],
        # double-buffered per-layer weights alone exceed the default 16MB
        # scoped-vmem budget; raise it (tower_batch_tile keeps the true
        # footprint under ~100MB of the chip's 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TOWER),
        interpret=interpret,
    )(x, key_bias, r3(ln1_scale), r3(ln1_bias), *wargs)
