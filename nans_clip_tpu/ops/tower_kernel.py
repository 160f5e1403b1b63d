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


def _tower_kernel_q_dma(x_ref, kb_ref, s1_ref, b1_ref, bqkv_ref, bo_ref,
                        s2_ref, b2_ref, bm1_ref, bm2_ref,
                        sqkv_ref, so_ref, sm1_ref, sm2_ref,
                        nqkv_ref, no_ref, nm1_ref, nm2_ref,
                        qkv_hbm, wo_hbm, w1_hbm, w2_hbm,
                        o_ref, xs_ref, i8_qkv, i8_wo, i8_w1, i8_w2,
                        bf_qkv, bf_wo, bf_w1, bf_w2, sems,
                        *, heads: int, eps: float, act: str, post_ln: bool,
                        masked: bool, n_layers: int, batch: int):
    """int8 weight streaming with the dequant moved OFF the critical path
    (r3 VERDICT next #7): the int8 blocks are DMA'd manually from HBM
    into a 3-deep VMEM ring and dequantized into double-buffered
    compute-dtype scratch ONE LAYER AHEAD — the dequant VPU work for
    layer l+1 sits in the same instruction stream as layer l's MXU math
    (independent buffers), where Mosaic can interleave it, instead of
    between the DMA wait and the matmuls like the in-line variant
    (_tower_kernel_q). The 3-slot int8 ring makes the write-after-read
    distance two full layers, so the async store into a slot cannot race
    the dequant that read it. Costs VMEM: 3x int8 + 2x dequantized weight
    sets — fits W<=1024; at W=1280 that is ~138MB, beyond the chip's VMEM
    (the ViT-H capacity negative recorded in PARITY.md).

    ``sqkv..sm2`` are THIS layer's scale rows (only read at l==0 for the
    prologue dequant); ``nqkv..nm2`` are the l+1 rows (index map clamped,
    never read at the last layer)."""
    l = pl.program_id(1)
    rows, w = xs_ref.shape

    i8 = (i8_qkv, i8_wo, i8_w1, i8_w2)
    hbm = (qkv_hbm, wo_hbm, w1_hbm, w2_hbm)
    bf = (bf_qkv, bf_wo, bf_w1, bf_w2)

    def dma(layer, slot):
        for k in range(4):
            pltpu.make_async_copy(hbm[k].at[layer], i8[k].at[slot],
                                  sems.at[slot, k]).start()

    def wait(slot):
        for k in range(4):
            pltpu.make_async_copy(i8[k].at[slot], i8[k].at[slot],
                                  sems.at[slot, k]).wait()

    def dequant(slot3, slot2, scale_refs):
        for k, sref in zip(range(4), scale_refs):
            s = sref[0].astype(jnp.float32)
            bf[k][slot2] = (i8[k][slot3].astype(jnp.float32)
                            * s).astype(bf[k].dtype)

    @pl.when(l == 0)
    def _():
        xs_ref[:] = x_ref[:].reshape(rows, w)
        dma(0, 0)
        wait(0)
        dequant(0, 0, (sqkv_ref, so_ref, sm1_ref, sm2_ref))
        if n_layers > 1:
            dma(1, 1)

    x = xs_ref[:]
    kb = kb_ref[:] if masked else None
    out = encoder_layer_math(
        x, kb, s1_ref[0], b1_ref[0], bf_qkv[l % 2], bqkv_ref[0],
        bf_wo[l % 2], bo_ref[0], s2_ref[0], b2_ref[0], bf_w1[l % 2],
        bm1_ref[0], bf_w2[l % 2], bm2_ref[0], heads=heads, eps=eps,
        act=act, post_ln=post_ln, batch=batch)
    xs_ref[:] = out.astype(x.dtype)

    # prepare layer l+1 while layer l computes: wait its DMA (issued one
    # step ago; at l==0 the prologue just started it — the wait lands in
    # the prologue cost), dequant into the other compute buffer, then
    # start the DMA for layer l+2 into the ring slot freed two steps ago
    @pl.when(l + 1 < n_layers)
    def _():
        wait((l + 1) % 3)

    @pl.when(l + 1 < n_layers)
    def _():
        dequant((l + 1) % 3, (l + 1) % 2,
                (nqkv_ref, no_ref, nm1_ref, nm2_ref))

    @pl.when(l + 2 < n_layers)
    def _():
        dma(l + 2, (l + 2) % 3)

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


def tower_qdma_tile(b: int, s: int, w: int, inter: int,
                    esize: int = 2) -> int:
    """Batch tile for the dequant-ahead int8 kernel: 3x int8 ring + 2x
    dequantized weight sets resident. 0 when the cell cannot exist —
    W=1280's ~138MB weight residency alone exceeds VMEM (the ViT-H
    capacity negative, PARITY.md int8 section)."""
    if w % 128 or w > 1024:
        return 0
    total = 4 * w * w + 2 * w * inter
    weights = 3 * total + 2 * total * esize
    per = s * (3 * w * 4 + inter * 4 + w * (4 * esize + 4))
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
                interpret: bool = False, quant_dma: bool = False):
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
    if quant and quant_dma:
        # dequant-ahead variant (opt-in, see _tower_kernel_q_dma): small
        # per-layer params via the automatic pipeline, the four int8
        # weights manually DMA'd from HBM
        dtile = tower_qdma_tile(b, s, w, inter,
                                jnp.dtype(x.dtype).itemsize)
        assert dtile >= 1 and b % dtile == 0, (
            f"qdma cell does not exist at b={b} s={s} w={w} (W=1280's "
            "3x-int8 + 2x-deq residency exceeds VMEM — PARITY.md)")
        tile = dtile
        L_last = L - 1
        lyr_n = lambda *shape: pl.BlockSpec(
            (1,) + shape,
            lambda bt, l: (jnp.minimum(l + 1, L_last),) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        i8s = lambda *shape: pltpu.VMEM(shape, jnp.int8)
        bfs = lambda *shape: pltpu.VMEM(shape, x.dtype)
        return pl.pallas_call(
            functools.partial(_tower_kernel_q_dma, heads=heads, eps=eps,
                              act=act, post_ln=post_ln, masked=masked,
                              n_layers=L, batch=tile),
            grid=(b // tile, L),
            in_specs=[
                bat(tile, s, w),
                (bat(tile, 1, s) if masked else
                 pl.BlockSpec((1, 1, s), lambda bt, l: (0, 0, 0),
                              memory_space=pltpu.VMEM)),
                lyr(1, w), lyr(1, w),                  # ln1
                lyr(1, 3 * w), lyr(1, w),              # bqkv, bo
                lyr(1, w), lyr(1, w),                  # ln2
                lyr(1, inter), lyr(1, w),              # b1, b2
                lyr(1, 3 * w), lyr(1, w),              # scales (layer l)
                lyr(1, inter), lyr(1, w),
                lyr_n(1, 3 * w), lyr_n(1, w),          # scales (layer l+1)
                lyr_n(1, inter), lyr_n(1, w),
                any_spec, any_spec, any_spec, any_spec,  # int8 weights, HBM
            ],
            out_specs=bat(tile, s, w),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile * s, w), x.dtype),
                i8s(3, w, 3 * w), i8s(3, w, w),
                i8s(3, w, inter), i8s(3, inter, w),
                bfs(2, w, 3 * w), bfs(2, w, w),
                bfs(2, w, inter), bfs(2, inter, w),
                pltpu.SemaphoreType.DMA((3, 4)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_TOWER),
            interpret=interpret,
        )(x, key_bias, r3(ln1_scale), r3(ln1_bias), r3(bqkv), r3(bo),
          r3(ln2_scale), r3(ln2_bias), r3(b1), r3(b2),
          wqkv["scale"], wo["scale"], w1["scale"], w2["scale"],
          wqkv["scale"], wo["scale"], w1["scale"], w2["scale"],
          wqkv["int8"], wo["int8"], w1["int8"], w2["int8"])
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
