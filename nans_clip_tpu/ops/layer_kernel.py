"""Whole-layer fused kernel: attention + MLP sub-blocks in ONE pallas_call.

The per-sub-block kernels (ops/fused_block.py) write the post-attention
hidden state to HBM and read it straight back for the MLP — at large batch
that round trip (plus a second kernel launch per layer) is the only HBM
traffic left between the sub-blocks. This kernel keeps the intermediate in
VMEM: LN1 -> QKV -> per-head attention -> out-proj -> residual [-> post-LN]
-> LN2 -> fc1 -> gelu -> fc2 -> residual [-> post-LN], with both weight
sets resident (12*W^2 elements: 14 MB at W=768 bf16, 25 MB at W=1024 —
inside the raised 64 MB scoped-vmem budget).

Deterministic forwards only (serving, eval, feature extraction): the
training path keeps the two-kernel split because each sub-block's
custom_vjp recomputes from ITS block input, and the in-kernel dropout
PRNG stream layout is defined per sub-block (fused_block.py:118-170).

Complements ops/tower_kernel.py (all L layers in one call, activations
VMEM-resident — small-batch serving): this kernel grids over the batch,
so it covers the LARGE-batch regime where the tower's weight re-streaming
per batch tile would dominate.

Replaces (with fused_block.py) the reference's flash-attn + torch C++ MHA
fast path (cn_clip/clip/model.py attention dispatch); no reference analog
exists for the cross-sub-block fusion itself.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nans_clip_tpu.ops.fused_block import _erf, _ln, _rup
from nans_clip_tpu.ops.gates import (LAYER_CELL_BUDGET, LAYER_MAX_SEQ,
                                     LAYER_ROUTE_MIN_TILE, LAYER_TILE_CAP,
                                     MAX_FUSED_SEQ, VMEM_RAISED)


def encoder_layer_math(x, kb, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, bm1,
                       w2, bm2, *, heads: int, eps: float, act: str,
                       post_ln: bool, batch: int):
    """One transformer layer on VMEM-resident VALUES: LN1 -> QKV ->
    per-head block-diagonal attention -> out-proj -> residual [-> post-LN]
    -> LN2 -> fc1 -> act -> fc2 -> residual [-> post-LN].

    Shared by the whole-layer kernel below and the whole-tower kernel
    (ops/tower_kernel.py) so the two serving paths cannot numerically
    diverge. ``x``: [batch*S, W] flattened; ``kb``: [batch, 1, S] additive
    key bias or None. Returns the layer output in fp32 (callers cast).
    fp32 LN/softmax statistics throughout (the fp16-overflow guard)."""
    rows, w = x.shape
    s0 = rows // batch
    dh = w // heads
    scale = 1.0 / math.sqrt(dh)

    # ---- attention sub-block (head-major loops, fused_block._kernel) ----
    if post_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), s1, b1, eps).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)
    qkv = qkv + bqkv.astype(jnp.float32)
    ctx_parts = []
    for h in range(heads):                         # static unroll
        q = qkv[:, h * dh:(h + 1) * dh].astype(x.dtype)
        k = qkv[:, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
        v = qkv[:, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
        ctx_t = []
        for tt in range(batch):                    # block-diagonal attention
            sl = slice(tt * s0, (tt + 1) * s0)
            s = jax.lax.dot_general(q[sl], k[sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if kb is not None:
                s = s + kb[tt]                     # [1, S] additive key bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx_t.append(jnp.dot(p.astype(x.dtype), v[sl],
                                 preferred_element_type=jnp.float32))
        ctx_parts.append(jnp.concatenate(ctx_t, axis=0) if batch > 1
                         else ctx_t[0])
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)
    proj = jnp.dot(ctx, wo, preferred_element_type=jnp.float32)
    proj = proj + bo.astype(jnp.float32)
    a = proj + x.astype(jnp.float32)
    if post_ln:
        a = _ln(a, s1, b1, eps)
    # cast through the input dtype between sub-blocks: bit-identical to
    # the two-kernel path (the attention kernel's o_ref store)
    a = a.astype(x.dtype)

    # ---- MLP sub-block (fused_block._mlp_kernel) ----
    if post_ln:
        hn = a
    else:
        hn = _ln(a.astype(jnp.float32), s2, b2, eps).astype(x.dtype)
    hmid = jnp.dot(hn, w1, preferred_element_type=jnp.float32)
    hmid = hmid + bm1.astype(jnp.float32)
    if act == "quick_gelu":
        hmid = hmid * jax.nn.sigmoid(1.702 * hmid)
    else:                                          # exact-erf gelu (BERT)
        hmid = 0.5 * hmid * (1.0 + _erf(hmid * 0.7071067811865476))
    hmid = hmid.astype(x.dtype)
    p2 = jnp.dot(hmid, w2, preferred_element_type=jnp.float32)
    p2 = p2 + bm2.astype(jnp.float32)
    out = p2 + a.astype(jnp.float32)
    if post_ln:
        out = _ln(out, s2, b2, eps)
    return out


def _layer_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  s2_ref, b2_ref, w1_ref, b1m_ref, w2_ref, b2m_ref, kb_ref,
                  o_ref, *, heads: int, eps: float, post_ln: bool,
                  masked: bool, act: str):
    t, s0, w = x_ref.shape
    x = x_ref[:].reshape(t * s0, w)
    kb = kb_ref[:] if masked else None
    out = encoder_layer_math(
        x, kb, s1_ref[:], b1_ref[:], wqkv_ref[:], bqkv_ref[:], wo_ref[:],
        bo_ref[:], s2_ref[:], b2_ref[:], w1_ref[:], b1m_ref[:], w2_ref[:],
        b2m_ref[:], heads=heads, eps=eps, act=act, post_ln=post_ln, batch=t)
    o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)


def layer_cell_tile(b: int, seq: int, width: int, inter: int,
                    esize: int = 2) -> int:
    """Batch tile against the kernel's OWN budget (both weight sets
    resident + both sub-blocks' per-sample live sets, inside the raised
    64 MB scoped-vmem limit with io-double-buffer headroom) — the
    sub-block estimators' 14 MB budgets would cap the tile at the MLP's
    answer and throw away the attention part's row fill at short seqs."""
    heads = max(1, width // 64)
    # attn wqkv+wo (4*w*w) + MLP w1+w2 (2*w*inter) — matches the
    # tower_batch_tile estimator; inter != 4*w widths were previously
    # under-counted by the hardcoded 12*w*w form
    weights = (4 * width * width + 2 * width * inter) * esize
    attn_ps = (seq * 3 * width * 4 + heads * _rup(seq, 8) * seq * 4
               + seq * width * 5 * esize)
    mlp_ps = seq * (inter * (4 + 2 * esize) + width * 6 * esize)
    t = max(1, (LAYER_CELL_BUDGET - weights) // (attn_ps + mlp_ps))
    t = min(t, LAYER_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


# Models route the whole-layer kernel for deterministic forwards when this
# is on (and route_layer admits the shape); kept as a module switch so
# hardware A/Bs can flip it per-process. Hardware verdict (v5e, bs256,
# 12-layer scan, same-process A/Bs):
#   * text S=52 tile=8 WINS 1.040x (13447 vs 12932 samples/s) — at short
#     seqs the combined cell keeps the attention part's 8-sample row fill
#     AND drops the inter-sub-block HBM round trip;
#   * image S=197 tile=1 LOSES 0.963x (4032 vs 4188 img/s — the bigger
#     kernel's VMEM footprint costs more pipelining than the saved round
#     trip buys).
# Hence the tile >= 4 routing gate: row-fill is what pays. (S=197 rows
# already fill the MXU alone; historical tile=2 attention A/Bs at ViT
# shapes also lost, fused_block.py:attn_cell_tile docstring.)
ROUTE = True


def route_layer(b: int, seq: int, width: int, inter: int,
                esize: int = 2) -> bool:
    return (ROUTE and fits_layer(seq, width, inter)
            and layer_cell_tile(b, seq, width, inter, esize) >= LAYER_ROUTE_MIN_TILE)


def fits_layer(seq: int, width: int, inter: int) -> bool:
    """One-shot shapes only: both weight sets resident (<= 25 MB at
    W=1024) plus the fp32 qkv/h intermediates of one cell inside the
    64 MB scoped-vmem budget."""
    return (width % 128 == 0 and width <= 1024 and inter <= 4 * 1024
            and seq <= min(MAX_FUSED_SEQ, LAYER_MAX_SEQ))


def fused_layer_block(x, ln1_scale, ln1_bias, wqkv, bqkv, wo, bo,
                      ln2_scale, ln2_bias, w1, b1, w2, b2, heads: int,
                      eps: float = 1e-5, act: str = "quick_gelu",
                      post_ln: bool = False, key_bias=None,
                      interpret: bool = False, tile: int = 0):
    """One transformer layer (both sub-blocks) in one Pallas kernel.
    pre-LN (ViT): x + attn(LN1(x)); h + mlp(LN2(h)).
    post-LN (BERT): LN1(x + attn(x)); LN2(h + mlp(h)), additive key_bias.
    Deterministic forward only — no dropout, not differentiable (route
    training through the per-sub-block custom_vjp kernels)."""
    b, s, w = x.shape
    inter = w1.shape[-1]
    if tile <= 0:
        tile = layer_cell_tile(b, s, w, inter, jnp.dtype(x.dtype).itemsize)
    assert b % tile == 0
    masked = key_bias is not None
    if key_bias is None:
        # never read when masked=False: a [1,1,S] dummy with a constant
        # index map avoids allocating + DMA-streaming a [B,1,S] zeros
        # buffer per grid cell on the (dominant) unmasked ViT path
        kb = jnp.zeros((1, 1, s), jnp.float32)
    else:
        kb = key_bias.astype(jnp.float32).reshape(b, 1, s)
    params = pltpu.CompilerParams(vmem_limit_bytes=VMEM_RAISED)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    io = lambda: pl.BlockSpec((tile, s, w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel, heads=heads, eps=eps,
                          post_ln=post_ln, masked=masked, act=act),
        grid=(b // tile,),
        in_specs=[
            io(),
            vec(w), vec(w), mat(w, 3 * w), vec(3 * w), mat(w, w), vec(w),
            vec(w), vec(w), mat(w, inter), vec(inter), mat(inter, w), vec(w),
            (pl.BlockSpec((tile, 1, s), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if masked else
             pl.BlockSpec((1, 1, s), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=io(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=params,
        interpret=interpret,
    )(x, ln1_scale, ln1_bias, wqkv, bqkv, wo, bo,
      ln2_scale, ln2_bias, w1, b1, w2, b2, kb)
