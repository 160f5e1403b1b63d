"""Backward kernel for the fused ViT attention sub-block.

The default backward recomputes the whole sub-block with plain XLA (remat
semantics). This kernel fuses the expensive per-sample part instead:

  recompute LN -> QKV -> probs entirely in VMEM, then compute
  d(attention) and the input gradient dx in the same pass, emitting the
  recomputed activations (xn, ctx, dqkv) that the WEIGHT gradients need.

Weight gradients themselves (dwqkv = xn^T dqkv, dwo = ctx^T g) are batched
[B*S, W]x[B*S, W'] contractions — exactly what XLA's MXU pipeline is best
at — so they stay outside the kernel.

Layout (ViT pre-LN): out = x + wo^T-proj(MHA(LN(x))). No mask, no dropout.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bwd_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
                dx_ref, xn_ref, ctx_ref, dqkv_ref, *, heads: int, eps: float):
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)                 # [S, W]
    w = x.shape[-1]
    dh = w // heads
    scale = 1.0 / math.sqrt(dh)

    # ---- recompute forward (VMEM-resident) ----
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gamma = s1_ref[:].astype(jnp.float32)
    xn = (xhat * gamma + b1_ref[:].astype(jnp.float32)).astype(x.dtype)

    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)

    # dctx = g @ wo^T
    dctx = jax.lax.dot_general(g.astype(x.dtype), wo_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    ctx_parts = []
    dq_parts = []
    dk_parts = []
    dv_parts = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].astype(x.dtype)
        k = qkv[:, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
        v = qkv[:, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)   # [S, S] fp32
        pb = p.astype(x.dtype)
        ctx_h = jnp.dot(pb, v, preferred_element_type=jnp.float32)
        ctx_parts.append(ctx_h)

        dctx_h = dctx[:, h * dh:(h + 1) * dh].astype(x.dtype)
        dv_h = jax.lax.dot_general(pb, dctx_h, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dctx_h, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)                         # [S, S] fp32
        dsb = ds.astype(x.dtype)
        dq_parts.append(jnp.dot(dsb, k, preferred_element_type=jnp.float32) * scale)
        dk_parts.append(jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32) * scale)
        dv_parts.append(dv_h)

    ctx = jnp.concatenate(ctx_parts, axis=-1)
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_parts, axis=-1),
         jnp.concatenate(dk_parts, axis=-1),
         jnp.concatenate(dv_parts, axis=-1)], axis=-1)  # [S, 3W] fp32

    # dxn = dqkv @ wqkv^T
    dxn = jax.lax.dot_general(dqkv.astype(x.dtype), wqkv_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # LayerNorm backward: dxhat = dxn * gamma
    dxhat = dxn * gamma
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)

    dx_ref[0] = (g + dx_ln).astype(dx_ref.dtype)
    xn_ref[0] = xn.astype(xn_ref.dtype)
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)
    dqkv_ref[0] = dqkv.astype(dqkv_ref.dtype)


def fused_attention_block_bwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, g,
                              heads: int, eps: float = 1e-5,
                              interpret: bool = False):
    """Returns (dx, xn, ctx, dqkv); caller forms the weight grads:
        dwqkv = einsum('bsw,bsu->wu', xn, dqkv)   dbqkv = sum(dqkv)
        dwo   = einsum('bsw,bsu->wu', ctx, g)     dbo   = sum(g)
        d_ln_scale = sum(dxn * xhat), d_ln_bias = sum(dxn) (via caller's xhat)
    """
    b, s, w = x.shape
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, eps=eps),
        grid=(b,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), blk(w)],
        out_specs=[blk(w), blk(w), blk(w), blk(3 * w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, 3 * w), x.dtype),
        ],
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, g)
