"""Fully-fused transformer attention block (Pallas): LN -> QKV -> MHA ->
out-projection -> residual in ONE kernel.

This is the actual scope of the reference's FlashMHA replacement
(clip/model.py:189): not just softmax(QK^T)V but the whole pre-LN attention
sub-block. Fusing it keeps xn/qkv/probs/ctx entirely in VMEM — five HBM
round trips removed per layer, which is where the time goes at CLIP's short
sequence lengths (the matmuls themselves are small).

Grid: one (sample) cell per program; weights use constant index maps so
they stay VMEM-resident across the batch. fp32 LayerNorm statistics and
softmax, bf16 matmul inputs (MXU native).

Backward: ``custom_vjp`` whose bwd recomputes with the plain-XLA
implementation — same memory profile as remat, no bwd kernel to maintain.

VMEM budget fits ViT-B/L (width <= 1024, seq <= 640); wider models fall
back to the unfused path automatically.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_WIDTH = 1024
MAX_FUSED_SEQ = 640


def _reference_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads: int,
                     eps: float):
    """Plain-XLA twin (oracle + backward path)."""
    from nans_clip_tpu.ops.attention import attention_xla, merge_heads, split_heads
    from nans_clip_tpu.ops.layernorm import layer_norm

    xn = layer_norm(x, ln_scale, ln_bias, eps)
    qkv = xn @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ctx = merge_heads(attention_xla(split_heads(q, heads), split_heads(k, heads),
                                    split_heads(v, heads)))
    return x + (ctx @ wo + bo)


def _kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, eps: float, seq: int):
    x = x_ref[0]                                   # [S, W] input dtype
    w = x.shape[-1]
    dh = w // heads
    scale = 1.0 / math.sqrt(dh)

    # LayerNorm, fp32 statistics
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)    # [S, 3W] fp32

    ctx_parts = []
    for h in range(heads):                         # static unroll
        q = qkv[:, h * dh:(h + 1) * dh].astype(x.dtype)
        k = qkv[:, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
        v = qkv[:, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)  # [S, W]

    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps, interpret):
    b, s, w = x.shape
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, eps=eps, seq=s),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w), mat(w, 3 * w), vec(3 * w), mat(w, w), vec(w),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                          heads: int, eps: float = 1e-5,
                          interpret: bool = False):
    """x: [B, S, W]. Returns x + out_proj(MHA(LN(x))). ViT pre-LN layout."""
    return _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps,
                       interpret)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps, interpret):
    out = _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps,
                      interpret)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)


def _bwd(heads, eps, interpret, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo = res
    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=heads, eps=eps),
                     x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
    return vjp(g)


fused_attention_block.defvjp(_fwd, _bwd)


def fits_fused(seq: int, width: int) -> bool:
    return width <= MAX_FUSED_WIDTH and seq <= MAX_FUSED_SEQ
