"""Fused multi-head attention for TPU.

This replaces BOTH external attention engines of the reference with one
code path:

* flash-attn CUDA ``FlashMHA`` (reference clip/model.py:14-16,189 and
  modeling_bert.py:31-33,172) and
* PyTorch's fused C++ ``nn.MultiheadAttention`` /
  ``F.multi_head_attention_forward`` (clip/model.py:83-101,189).

Design: CLIP sequences are short (52 text tokens, 197/257/577 image
tokens), so a full attention row fits comfortably in VMEM. The Pallas
kernel therefore fuses QK^T -> masked softmax -> PV into a single
VMEM-resident pass per (batch, head, q-block) — no [B,H,S,S] round trip to
HBM — with fp32 softmax statistics (the TPU analog of the reference's
fp16-overflow guards, deploy/tensorrt_utils.py:65-97). The backward pass is
a second Pallas kernel wired up via ``jax.custom_vjp``; it recomputes the
probabilities from the saved logsumexp (flash-attention style) instead of
storing them.

A pure-XLA implementation (``attention_xla``) is kept as the numerics
oracle and as the path that supports attention-prob dropout
(modeling_bert.py:118-152 semantics).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Full-row kernel keeps an [S, S] fp32 tile in VMEM; beyond this we fall
# back to XLA (no reference model needs it: max seq is 577 -> padded 640).
from nans_clip_tpu.ops.gates import MAX_PALLAS_SEQ  # noqa: E402 (provenance table)


def _pick_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    # Measured on v5e (ViT-B/16, S=197, bs=256): XLA's batched attention
    # out-runs this full-row kernel 1.6x device-side — at CLIP's short
    # sequence lengths the [S,S] matrix is small enough that XLA's fusion
    # wins and the flash-style memory saving is irrelevant. The kernel is
    # kept opt-in (impl="pallas") for the long-sequence / memory-bound
    # regime and as the target for further kernel work.
    return "xla"


# --------------------------------------------------------------------------
# XLA reference path
# --------------------------------------------------------------------------

def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                  key_bias: Optional[jax.Array] = None,
                  dropout_rate: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None,
                  deterministic: bool = True) -> jax.Array:
    """Reference attention. q,k,v: [B, H, S, Dh]; key_bias: [B, S] additive."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and not deterministic and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# --------------------------------------------------------------------------
# Pallas fused kernel
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)                       # [BQ, Dh]
    k = k_ref[0, 0].astype(jnp.float32)                       # [S, Dh]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # [BQ, S]
    s = s + bias_ref[0]                                        # [1, S] broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v_ref[0, 0].astype(jnp.float32),
                preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0]                                     # [S]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    p = jnp.exp(s - lse[:, None])                              # [S, S]

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)       # p^T do
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)       # do v^T
    delta = jnp.sum(do * o, axis=-1, keepdims=True)            # [S, 1]
    ds = p * (dp - delta)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_fwd_call(q, k, v, bias, block_q: int, interpret: bool):
    b, h, s, dh = q.shape
    nq = s // block_q
    scale = 1.0 / math.sqrt(dh)
    kv_spec = pl.BlockSpec((1, 1, s, dh), lambda bb, hh, i: (bb, hh, 0, 0),
                           memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, 1, s), lambda bb, hh, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda bb, hh, i: (bb, hh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, s), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)
    return out, lse


def _flash_bwd_call(q, k, v, bias, o, do, lse, interpret: bool):
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    full = pl.BlockSpec((1, 1, s, dh), lambda bb, hh: (bb, hh, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            full, full, full,
            pl.BlockSpec((1, 1, s), lambda bb, hh: (bb, 0, 0), memory_space=pltpu.VMEM),
            full, full,
            pl.BlockSpec((1, 1, 1, s), lambda bb, hh: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[full, full, full],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, bias, o, do, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention(q, k, v, bias, block_q: int, interpret: bool):
    out, _ = _flash_fwd_call(q, k, v, bias, block_q, interpret)
    return out


def _flash_attention_fwd(q, k, v, bias, block_q, interpret):
    out, lse = _flash_fwd_call(q, k, v, bias, block_q, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_bwd(block_q, interpret, res, g):
    q, k, v, bias, out, lse = res
    dq, dk, dv = _flash_bwd_call(q, k, v, bias, out, g, lse, interpret)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                     key_bias: Optional[jax.Array] = None,
                     block_q: int = 128, interpret: bool = False) -> jax.Array:
    """Pad to tile boundaries and run the fused kernel."""
    b, h, s, dh = q.shape
    sp = ((s + block_q - 1) // block_q) * block_q
    pad = sp - s
    bias = jnp.zeros((b, s), jnp.float32) if key_bias is None else key_bias.astype(jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    out = _flash_attention(q, k, v, bias[:, None, :], block_q, interpret)
    return out[:, :, :s, :] if pad else out


# --------------------------------------------------------------------------
# Block-level flash path for long-seq TRAINING (ViT-L-336, S=577)
#
# Plain AD through ``x + mha(ln(x), impl="pallas")`` saves the PADDED,
# per-head q/k/v/o under the layer scan — bf16[L,B,H,640,64] x4, where the
# dh=64 lane dim tile-pads 2x — plus fp32 LN intermediates: 17.6 GB at
# L-336 bs32, an observed HBM OOM. This custom_vjp stores only x, the
# merged context, and the lse rows (~78 MB/layer at bs32) and recomputes
# LN + the QKV projection in the backward (one extra [B*S,W]x[W,3W]
# matmul, ~0.5 ms — cheap next to the 12 ms attention bwd).
# --------------------------------------------------------------------------

def _flash_block_parts(x, ln_scale, ln_bias, wqkv, bqkv, heads, eps, block_q):
    """Recomputable prefix: LN -> QKV -> per-head split -> pad to block_q.
    Returns (xn, q, k, v, key-bias) with q/k/v [B, H, SP, dh]."""
    from nans_clip_tpu.ops.layernorm import layer_norm
    b, s, w = x.shape
    xn = layer_norm(x, ln_scale, ln_bias, eps)
    qkv = xn @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, heads) for t in (q, k, v))
    sp = ((s + block_q - 1) // block_q) * block_q
    pad = sp - s
    bias = jnp.zeros((b, s), jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    return xn, q, k, v, bias[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def flash_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                          heads: int, eps: float = 1e-5,
                          block_q: int = 128, interpret: bool = False):
    """Pre-LN ViT attention block via the flash kernels:
    x + out_proj(flash_mha(LN(x))). x: [B, S, W], no key mask."""
    out, _ = _flash_block_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                              heads, eps, block_q, interpret)
    return out


def _flash_block_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps,
                     block_q, interpret):
    b, s, w = x.shape
    _, q, k, v, bias = _flash_block_parts(x, ln_scale, ln_bias, wqkv, bqkv,
                                          heads, eps, block_q)
    ctx, lse = _flash_fwd_call(q, k, v, bias, block_q, interpret)
    ctx_m = merge_heads(ctx[:, :, :s, :])
    out = x + ctx_m @ wo + bo
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, ctx_m, lse)


def _flash_block_bwd(heads, eps, block_q, interpret, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wo, ctx_m, lse = res
    b, s, w = x.shape
    sp = lse.shape[-1]
    pad = sp - s
    xn, q, k, v, bias = _flash_block_parts(x, ln_scale, ln_bias, wqkv, bqkv,
                                           heads, eps, block_q)
    gf = g.astype(jnp.float32)

    # Output-projection grads
    dwo = jnp.einsum("bsw,bsu->wu", ctx_m, g,
                     preferred_element_type=jnp.float32).astype(wo.dtype)
    dbo = jnp.sum(gf, axis=(0, 1)).astype(wo.dtype)
    dctx_m = jnp.einsum("bsu,wu->bsw", g, wo,
                        preferred_element_type=jnp.float32).astype(x.dtype)

    # Attention bwd: padded rows carry do=0/o=0, so their dk/dv
    # contributions vanish (ds rows are exactly zero) and their dq rows
    # are dropped by the unpad below.
    rowpad = ((0, 0), (0, 0), (0, pad), (0, 0))
    dctx = jnp.pad(split_heads(dctx_m, heads), rowpad)
    o_pad = jnp.pad(split_heads(ctx_m, heads), rowpad)
    dq, dk, dv = _flash_bwd_call(q, k, v, bias, o_pad, dctx, lse, interpret)
    dqkv = jnp.concatenate(
        [merge_heads(t[:, :, :s, :]) for t in (dq, dk, dv)], axis=-1)

    # QKV-projection grads
    dqkv_f = dqkv.astype(jnp.float32)
    dwqkv = jnp.einsum("bsw,bsu->wu", xn, dqkv,
                       preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv_f, axis=(0, 1)).astype(bqkv.dtype)
    dxn = jnp.einsum("bsu,wu->bsw", dqkv_f, wqkv.astype(jnp.float32))

    # LayerNorm bwd (fp32, matching ops/layernorm.py statistics)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    d_scale = jnp.sum(dxn * xhat, axis=(0, 1)).astype(ln_scale.dtype)
    d_bias = jnp.sum(dxn, axis=(0, 1)).astype(ln_bias.dtype)
    dxhat = dxn * ln_scale.astype(jnp.float32)
    dx_ln = inv * (dxhat
                   - jnp.mean(dxhat, axis=-1, keepdims=True)
                   - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx = (gf + dx_ln).astype(x.dtype)
    return dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo


flash_attention_block.defvjp(_flash_block_fwd, _flash_block_bwd)


# --------------------------------------------------------------------------
# Public entry point
# --------------------------------------------------------------------------

def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_bias: Optional[jax.Array] = None,
                    *, impl: str = "auto",
                    dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    deterministic: bool = True,
                    interpret: bool = False) -> jax.Array:
    """Multi-head self-attention on [B, H, S, Dh] tensors.

    ``key_bias`` is an additive [B, S] mask over keys (0 for valid,
    large-negative for padding), matching the reference's
    ``(1 - mask) * -10000`` convention (modeling_bert.py:450-458).
    """
    use_dropout = dropout_rate > 0.0 and not deterministic and dropout_rng is not None
    impl = _pick_impl(impl)
    if impl == "pallas" and not use_dropout and q.shape[2] <= MAX_PALLAS_SEQ:
        return attention_pallas(q, k, v, key_bias, interpret=interpret)
    return attention_xla(q, k, v, key_bias, dropout_rate, dropout_rng, deterministic)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, D] -> [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, S, Dh] -> [B, S, D]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def mha(x: jax.Array, params: dict, num_heads: int,
        key_bias: Optional[jax.Array] = None, **kw) -> jax.Array:
    """Full MHA block: fused-QKV projection, attention, output projection.

    ``params``: {"wqkv": [D, 3D], "bqkv": [3D], "wo": [D, D], "bo": [D]}
    (single checkpoint layout — no in_proj/Wqkv rename dance, cf. reference
    clip/model.py:493-548).
    """
    d = x.shape[-1]
    qkv = x @ params["wqkv"] + params["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = fused_attention(split_heads(q, num_heads), split_heads(k, num_heads),
                          split_heads(v, num_heads), key_bias, **kw)
    return merge_heads(out) @ params["wo"] + params["bo"]
