"""Whole-LAYER training backward: MLP bwd + attention bwd in ONE
pallas_call with full in-kernel weight gradients (r4; VERDICT r3 item 3).

Today's training backward runs TWO fullgrad kernels per pre-LN layer
(ops/fused_block_bwd.py): the MLP kernel writes dx_mlp [B,S,W] to HBM and
the attention kernel reads it back as its g. This kernel chains the two
SHARED math bodies (``_mlp_bwd_math`` -> ``_attn_bwd_math``) inside one
grid cell so that intermediate d-activation never leaves VMEM — saving
the dx round trip (2 x [B,S,W] HBM passes/layer) and half the kernel
launches, at the cost of holding both sub-blocks' weights + fp32
accumulators resident (~65 MB at ViT-B shapes -> the VMEM_TOWER-class
pin; the r2 arithmetic that dismissed this under the 64 MB pin is what
this kernel exists to measure past).

The intermediate gradient is quantized to the io dtype before entering
the attention body — exactly the cast the HBM round trip applied — so
the combined kernel is numerically identical to the two-kernel chain.

ViT pre-LN, dropout-free (the CLIP image tower has no dropout; the BERT
tower keeps its per-sub-block kernels). Routing: ``route_layer_bwd``
consults ``LAYER_BWD_ROUTE`` (gates.py) — set by the same-process
full-step A/B protocol; ``NANS_LAYER_BWD=1/0`` overrides for drives.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nans_clip_tpu.ops.fused_block_bwd import (_attn_bwd_math,
                                               _attn_fullgrad_need,
                                               _mlp_bwd_math,
                                               _mlp_fullgrad_need)
from nans_clip_tpu.ops import gates
from nans_clip_tpu.ops.gates import (ATTN_BWD_TILE_CAP, ATTN_BWD_TILE_MAX_SEQ,
                                     LAYER_FULLGRAD_BUDGET, VMEM_TOWER)


def _layer_fullgrad_need(seq: int, width: int, heads: int, inter: int,
                         esize: int) -> int:
    """Combined resident+per-tile VMEM estimate: both sub-blocks' needs
    (each already counts its weights, fp32 accumulators and live set),
    minus one copy of the shared [T,S,W] io blocks counted twice."""
    shared_io = ((seq + 7) // 8 * 8) * width * 2 * esize
    return (_attn_fullgrad_need(seq, width, heads, esize)
            + _mlp_fullgrad_need(seq, width, inter, esize)[0]
            + _mlp_fullgrad_need(seq, width, inter, esize)[1]
            - shared_io)


def fits_layer_bwd_fullgrad(seq: int, width: int, heads: int, inter: int,
                            esize: int = 2) -> bool:
    return _layer_fullgrad_need(seq, width, heads, inter,
                                esize) < LAYER_FULLGRAD_BUDGET


def route_layer_bwd(seq: int, width: int, heads: int, inter: int,
                    esize: int = 2) -> bool:
    env = os.environ.get("NANS_LAYER_BWD")
    if env is not None:
        if env != "1":
            return False
    elif not gates.LAYER_BWD_ROUTE:   # module attr: drives monkeypatch it
        return False
    return (jax.default_backend() == "tpu"
            and fits_layer_bwd_fullgrad(seq, width, heads, inter, esize))


def _layer_bwd_fullgrad_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref,
                               wo_ref, xm_ref, s2_ref, b2_ref, w1_ref,
                               b1m_ref, w2_ref, b2m_ref, g_ref,
                               dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                               dbo_ref, dsc1_ref, dbi1_ref, dw1_ref,
                               db1_ref, dw2_ref, db2_ref, dsc2_ref,
                               dbi2_ref, *, heads: int, act: str,
                               eps: float):
    t, seq, w = x_ref.shape
    xdt = x_ref.dtype

    # ---- MLP sub-block backward (pre-LN, no dropout) ----
    dxm, xn2, h, dh_pre, dproj, lnstat2, dxn2 = _mlp_bwd_math(
        xm_ref, s2_ref, b2_ref, w1_ref, b1m_ref, w2_ref, b2m_ref,
        None, g_ref, act=act, eps=eps, post_ln=False, hid_drop=0.0)
    dw1_c = jax.lax.dot_general(xn2.astype(xdt), dh_pre.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(h.astype(xdt), dproj.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db1_c = jnp.sum(dh_pre, axis=0, keepdims=True)
    db2_c = jnp.sum(dproj, axis=0, keepdims=True)
    dsc2_c = jnp.sum(dxn2 * lnstat2.astype(jnp.float32), axis=0,
                     keepdims=True)
    dbi2_c = jnp.sum(dxn2, axis=0, keepdims=True)

    # ---- attention sub-block backward, g = dx_mlp (quantized to the io
    # dtype exactly like the two-kernel chain's HBM round trip) ----
    g_attn = dxm.astype(xdt).reshape(t, seq, w)
    dx, xn, ctx, dqkv, xhat, dxn, gA = _attn_bwd_math(
        x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_attn,
        heads=heads, eps=eps)
    dx_ref[:] = dx.reshape(t, seq, w).astype(dx_ref.dtype)

    dwqkv_c = jax.lax.dot_general(xn.astype(xdt), dqkv.astype(xdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dwo_c = jax.lax.dot_general(ctx.astype(xdt), gA.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv_c = jnp.sum(dqkv, axis=0, keepdims=True)
    dbo_c = jnp.sum(gA, axis=0, keepdims=True)
    dsc1_c = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbi1_c = jnp.sum(dxn, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwqkv_ref[:] = dwqkv_c
        dbqkv_ref[:] = dbqkv_c
        dwo_ref[:] = dwo_c
        dbo_ref[:] = dbo_c
        dsc1_ref[:] = dsc1_c
        dbi1_ref[:] = dbi1_c
        dw1_ref[:] = dw1_c
        db1_ref[:] = db1_c
        dw2_ref[:] = dw2_c
        db2_ref[:] = db2_c
        dsc2_ref[:] = dsc2_c
        dbi2_ref[:] = dbi2_c

    @pl.when(pl.program_id(0) > 0)
    def _():
        dwqkv_ref[:] += dwqkv_c
        dbqkv_ref[:] += dbqkv_c
        dwo_ref[:] += dwo_c
        dbo_ref[:] += dbo_c
        dsc1_ref[:] += dsc1_c
        dbi1_ref[:] += dbi1_c
        dw1_ref[:] += dw1_c
        db1_ref[:] += db1_c
        dw2_ref[:] += dw2_c
        db2_ref[:] += db2_c
        dsc2_ref[:] += dsc2_c
        dbi2_ref[:] += dbi2_c


def fused_layer_block_bwd_fullgrad(x, s1, b1, wqkv, bqkv, wo, xm, s2, b2,
                                   w1, b1m, w2, b2m, g, heads: int,
                                   act: str = "quick_gelu",
                                   eps: float = 1e-5,
                                   interpret: bool = False):
    """One pallas_call for the whole pre-LN layer backward. ``xm`` is the
    attention block's OUTPUT (the natural fwd dataflow array — no extra
    store). Returns (dx, dwqkv, dbqkv, dwo, dbo, dsc1, dbi1, dw1, db1,
    dw2, db2, dsc2, dbi2), weight grads fp32."""
    b, s, w = x.shape
    i = w1.shape[-1]
    esize = jnp.dtype(x.dtype).itemsize
    need = _layer_fullgrad_need(s, w, heads, i, esize)
    assert need < LAYER_FULLGRAD_BUDGET, (
        f"layer bwd cell needs ~{need >> 20}MB > budget; gate at the caller")
    # per-tile live set ~= both sub-bodies' per-sample terms
    resident = ((3 * w * w + w * w) + 2 * w * i) * (esize + 4)
    per = max(1, need - resident)
    tile = max(1, (LAYER_FULLGRAD_BUDGET - resident) // per)
    tile = min(tile, ATTN_BWD_TILE_CAP if s <= ATTN_BWD_TILE_MAX_SEQ else 1)
    while tile > 1 and b % tile:
        tile -= 1
    tile = int(tile)
    vec = lambda d: pl.BlockSpec((d,), lambda idx: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda idx: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda idx: (idx, 0, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_layer_bwd_fullgrad_kernel, heads=heads, act=act,
                          eps=eps),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), blk(w), vec(w), vec(w), mat(w, i), vec(i),
                  mat(i, w), vec(w), blk(w)],
        out_specs=[blk(w), mat(w, 3 * w), mat(1, 3 * w), mat(w, w),
                   mat(1, w), mat(1, w), mat(1, w), mat(w, i), mat(1, i),
                   mat(i, w), mat(1, w), mat(1, w), mat(1, w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((w, 3 * w), f32),
            jax.ShapeDtypeStruct((1, 3 * w), f32),
            jax.ShapeDtypeStruct((w, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
            jax.ShapeDtypeStruct((w, i), f32),
            jax.ShapeDtypeStruct((1, i), f32),
            jax.ShapeDtypeStruct((i, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
            jax.ShapeDtypeStruct((1, w), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_TOWER),
        interpret=interpret,
    )(x, s1, b1, wqkv, bqkv, wo, xm, s2, b2, w1, b1m, w2, b2m, g)


# ---------------------------------------------------------------------------
# Layer-level custom_vjp: forward = the two shipping fwd kernels (their
# dataflow intermediate xm is the residual — no extra store), backward =
# the combined kernel above.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def fused_layer_train(x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2,
                      b2m, heads: int, act: str = "quick_gelu",
                      eps: float = 1e-5, interpret: bool = False):
    y, _ = _layer_fwd(x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2,
                      b2m, heads, act, eps, interpret)
    return y


def _layer_fwd(x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2, b2m,
               heads, act, eps, interpret):
    from nans_clip_tpu.ops.fused_block import (fused_attention_block,
                                               fused_mlp_block)
    xm = fused_attention_block(x, s1, b1, wqkv, bqkv, wo, bo, heads,
                               eps=eps, interpret=interpret)
    y = fused_mlp_block(xm, s2, b2, w1, b1m, w2, b2m, act, eps, False,
                        interpret)
    return y, (x, xm, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2, b2m)


def _layer_bwd(heads, act, eps, interpret, res, g):
    x, xm, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2, b2m = res
    (dx, dwqkv, dbqkv, dwo, dbo, dsc1, dbi1, dw1, db1, dw2, db2, dsc2,
     dbi2) = fused_layer_block_bwd_fullgrad(
        x, s1, b1, wqkv, bqkv, wo, xm, s2, b2, w1, b1m, w2, b2m, g,
        heads, act, eps, interpret)
    return (dx,
            dsc1.reshape(-1).astype(s1.dtype),
            dbi1.reshape(-1).astype(b1.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv.reshape(-1).astype(bqkv.dtype),
            dwo.astype(wo.dtype),
            dbo.reshape(-1).astype(bo.dtype),
            dsc2.reshape(-1).astype(s2.dtype),
            dbi2.reshape(-1).astype(b2.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(-1).astype(b1m.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(-1).astype(b2m.dtype))


fused_layer_train.defvjp(_layer_fwd, _layer_bwd)
