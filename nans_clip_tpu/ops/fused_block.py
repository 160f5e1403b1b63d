"""Fully-fused transformer sub-block kernels (Pallas).

This is the actual scope of the reference's FlashMHA replacement
(clip/model.py:189): not just softmax(QK^T)V but whole sub-blocks —
LN -> QKV -> MHA -> out-projection -> residual (ViT pre-LN and BERT
post-LN/masked variants), and LN -> fc1 -> act -> fc2 -> residual for the
MLP. Fusing keeps xn/qkv/probs/ctx entirely in VMEM — the HBM round trips
are where the time goes at CLIP's short sequence lengths (the matmuls
themselves are small).

Grid: one batch-tile cell per program (T samples; T>1 when the width is
lane-aligned and VMEM allows — at BERT's S=52 a single sample fills only
52/128 MXU rows, so tiling the projections at [T*S, W] bought the text
tower +23%); weights use constant index maps so they stay VMEM-resident
across the whole batch. fp32 LayerNorm statistics and softmax, bf16
matmul inputs (MXU native).

Dropout (attention-prob + hidden, modeling_bert.py:118-152) runs in-kernel
from the Mosaic PRNG — TPU only; see _keep_mask.

Backward: ``custom_vjp``. On TPU the bwd routes to the fused backward
kernels in ops/fused_block_bwd.py (per-sample VMEM recompute — including
the re-seeded PRNG stream when dropout is on — plus dx in one pass, weight
grads as batched XLA contractions); elsewhere, or where the bwd kernels
don't fit VMEM, it recomputes with the plain-XLA twin (remat semantics).
NOTE: because every bwd path recomputes from the block inputs, wrapping
these blocks in jax.checkpoint is redundant work (measured: 657 vs 617
pairs/s at ViT-B bs256 training with remat off).

VMEM budget fits ViT-B/L one-shot (width <= 1024, seq <= 640); wider
models use the batch-tiled chunked variants below or fall back to XLA per
the measured routing notes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B-derived routing constants live in ops/gates.py (one provenance
# table; see its module docstring for the re-validation workflow).
from nans_clip_tpu.ops.gates import (ATTN_CELL_BUDGET, ATTN_CELL_TILE_CAP,
                                     ATTN_VMEM_PIN_SEQ, MAX_FUSED_MLP_WIDTH,
                                     MAX_FUSED_SEQ, MAX_FUSED_WIDTH,
                                     MAX_TILED_MLP_WIDTH, MAX_WIDE_WIDTH,
                                     MLP_CELL_BUDGET, MLP_CELL_BUDGET_WIDE,
                                     MLP_CELL_TILE_CAP,
                                     MLP_CHUNK_WEIGHT_BYTES,
                                     MLP_ONESHOT_WIDE_SEQ,
                                     MLP_ONESHOT_WIDE_WIDTH,
                                     MLP_REGRID_BUDGET, MLP_REGRID_TILE_CAP,
                                     ONESHOT_ATTN_WIDE_SEQ,
                                     ONESHOT_ATTN_WIDE_WIDTH, VMEM_RAISED,
                                     WIDE_TILE_BUDGET)


def _rup(n: int, m: int) -> int:
    return -(-n // m) * m


def _keep_mask(shape, rate: float):
    """Dropout keep mask from the per-core Mosaic PRNG (kept where
    bits >= rate * 2^32). TPU-only: interpret mode yields zero bits, so
    callers gate dropout > 0 on the TPU backend. The generator shape is
    padded to tile alignment, then sliced."""
    ps = (_rup(shape[0], 8), _rup(shape[1], 128))
    bits = pltpu.bitcast(pltpu.prng_random_bits(ps), jnp.uint32)
    thresh = jnp.uint32(min(2 ** 32 - 1, int(round(rate * 4294967296.0))))
    return (bits >= thresh)[: shape[0], : shape[1]]


def _reference_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads: int,
                     eps: float, key_bias=None, post_ln: bool = False):
    """Plain-XLA twin (oracle + backward path).

    pre-LN (ViT):  x + proj(MHA(LN(x)))
    post-LN (BERT): LN(x + proj(MHA(x)))  — mask via additive key_bias
    """
    from nans_clip_tpu.ops.attention import attention_xla, merge_heads, split_heads
    from nans_clip_tpu.ops.layernorm import layer_norm

    xn = x if post_ln else layer_norm(x, ln_scale, ln_bias, eps)
    qkv = xn @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ctx = merge_heads(attention_xla(split_heads(q, heads), split_heads(k, heads),
                                    split_heads(v, heads), key_bias))
    out = x + (ctx @ wo + bo)
    return layer_norm(out, ln_scale, ln_bias, eps) if post_ln else out


def _ln(xf, scale_ref, bias_ref, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)


def _kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            kb_ref, seed_ref, o_ref, *, heads: int, eps: float, seq: int,
            post_ln: bool, masked: bool, attn_drop: float, hid_drop: float):
    # block may hold several samples (batch tiling, W lane-aligned): the
    # LN/QKV/out-projection parts flatten to [T*S, W] (taller MXU shapes);
    # the attention itself is block-diagonal so it loops per sample
    t, s0, w = x_ref.shape
    x = x_ref[:].reshape(t * s0, w)                # [T*S, W] input dtype
    dh = w // heads
    scale = 1.0 / math.sqrt(dh)
    dropping = attn_drop > 0.0 or hid_drop > 0.0

    if post_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), s1_ref, b1_ref, eps).astype(x.dtype)

    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)    # [T*S, 3W] fp32

    if dropping:
        # Sample-major loops so the PRNG is re-seeded per SAMPLE (global
        # index), never per cell: the bwd kernels run one sample per cell
        # and regenerate the same stream, so per-sample seeding is what
        # lets the forward batch-tile freely while dropout is on.
        # Per-sample draw order (attn masks in head order, then the hidden
        # mask) is mirrored in *_bwd_kernel.
        ctx_rows, hid_keeps = [], []
        for tt in range(t):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * t + tt)
            sl = slice(tt * s0, (tt + 1) * s0)
            parts = []
            for h in range(heads):                 # static unroll
                q = qkv[sl, h * dh:(h + 1) * dh].astype(x.dtype)
                k = qkv[sl, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
                v = qkv[sl, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                if masked:
                    s = s + kb_ref[tt]             # [1, S] additive key bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                if attn_drop > 0.0:
                    keep = _keep_mask((s0, s0), attn_drop)
                    p = jnp.where(keep, p * (1.0 / (1.0 - attn_drop)), 0.0)
                parts.append(jnp.dot(p.astype(x.dtype), v,
                                     preferred_element_type=jnp.float32))
            ctx_rows.append(jnp.concatenate(parts, axis=-1))
            if hid_drop > 0.0:  # drawn inside the sample's stream, used
                # below; stored as an fp32 multiplier (scale-or-zero):
                # Mosaic cannot concatenate i1 vregs across samples
                hid_keeps.append(jnp.where(_keep_mask((s0, w), hid_drop),
                                           1.0 / (1.0 - hid_drop), 0.0))
        ctx = (jnp.concatenate(ctx_rows, axis=0) if t > 1
               else ctx_rows[0]).astype(x.dtype)   # [T*S, W]
    else:
        # Head-major loops (one column-slice of qkv per head, t-loop
        # inside): measured ~4% faster than sample-major on the batch-
        # tiled text tower (0.077 vs 0.080 ms/sample) — no PRNG ordering
        # constraint applies when dropout is off.
        ctx_parts = []
        for h in range(heads):                     # static unroll
            q = qkv[:, h * dh:(h + 1) * dh].astype(x.dtype)
            k = qkv[:, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
            v = qkv[:, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
            ctx_t = []
            for tt in range(t):
                sl = slice(tt * s0, (tt + 1) * s0)
                s = jax.lax.dot_general(q[sl], k[sl], (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                if masked:
                    s = s + kb_ref[tt]             # [1, S] additive key bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                ctx_t.append(jnp.dot(p.astype(x.dtype), v[sl],
                                     preferred_element_type=jnp.float32))
            ctx_parts.append(jnp.concatenate(ctx_t, axis=0) if t > 1 else ctx_t[0])
        ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)
        hid_keeps = []

    proj = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[:].astype(jnp.float32)
    if hid_drop > 0.0:  # hidden dropout on proj+bias, pre-residual
        mult = (jnp.concatenate(hid_keeps, axis=0) if t > 1
                else hid_keeps[0])                 # (modeling_bert.py:147)
        proj = proj * mult
    out = proj + x.astype(jnp.float32)
    if post_ln:
        out = _ln(out, s1_ref, b1_ref, eps)
    o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)


def _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed,
                heads, eps, post_ln, interpret, attn_drop=0.0, hid_drop=0.0):
    b, s, w = x.shape
    masked = key_bias is not None
    if key_bias is None:
        # never read when masked=False: a [1,1,S] dummy with a constant
        # index map avoids allocating + DMA-streaming a [B,1,S] zeros
        # buffer per grid cell on the (dominant) unmasked ViT path
        key_bias = jnp.zeros((1, 1, s), jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32).reshape(b, 1, s)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    # batch tiling is dropout-safe: the kernel re-seeds the PRNG per SAMPLE
    # (global index), matching the bwd kernels' one-sample-per-cell streams
    tile = attn_cell_tile(b, s, w, heads, jnp.dtype(x.dtype).itemsize,
                          dropout=attn_drop > 0.0 or hid_drop > 0.0)
    # H-class one-shot cells exceed the 16MB default scoped-vmem budget,
    # and so do long-seq W=1024 cells (ViT-L-336 S=577 needs 18.4MB: it
    # compiled inside the train step, where sibling 64MB-pinned calls
    # raise the module budget, but failed standalone at the 16MB default)
    params = (pltpu.CompilerParams(vmem_limit_bytes=VMEM_RAISED)
              if w > MAX_FUSED_WIDTH or s > ATTN_VMEM_PIN_SEQ else None)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, eps=eps, seq=s,
                          post_ln=post_ln, masked=masked,
                          attn_drop=attn_drop, hid_drop=hid_drop),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w), mat(w, 3 * w), vec(3 * w), mat(w, w), vec(w),
            (pl.BlockSpec((tile, 1, s), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if masked else
             pl.BlockSpec((1, 1, s), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=params,
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed)


def attn_cell_tile(b: int, seq: int, width: int, heads: int,
                   esize: int = 2, dropout: bool = False) -> int:
    """Batch tile for the one-shot attention kernel. Per-sample VMEM: fp32
    qkv + per-head fp32 probs + x/xn/ctx/out; weights are resident. The
    full heads-term is deliberate: a relaxed 2-live-probs estimate admits
    tile=2 at ViT S=197, which MEASURED SLOWER (4100 vs 4156 img/s) —
    tile>1 only pays at short sequences (BERT S=52: tile 8). With dropout
    the per-sample hidden keep-mask stays live until the out-projection."""
    if width % 128:
        return 1
    weights = 4 * width * width * esize
    per_sample = (seq * 3 * width * 4 + heads * _rup(seq, 8) * seq * 4
                  + seq * width * 5 * esize)
    if dropout:
        per_sample += _rup(seq, 8) * width * 4     # live hidden keep mask
    t = max(1, (ATTN_CELL_BUDGET - weights) // per_sample)
    t = min(t, ATTN_CELL_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _fused_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed,
                 heads: int, eps: float, post_ln: bool, interpret: bool,
                 attn_drop: float, hid_drop: float):
    return _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias,
                       seed, heads, eps, post_ln, interpret, attn_drop,
                       hid_drop)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed, heads,
         eps, post_ln, interpret, attn_drop, hid_drop):
    out = _fused_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias,
                      seed, heads, eps, post_ln, interpret, attn_drop,
                      hid_drop)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed)


def _oneshot_attn_weight_grads(x, xn, ctx, dqkv, g, wqkv, ln_scale,
                               ln_bias, eps):
    """Weight/LN grads for the pre-LN attention bwd kernels (shared by the
    narrow and wide custom_vjps so the two routings cannot drift): the
    kernel returns dx plus the recomputed xn/ctx and dqkv; the weight
    grads are batched XLA contractions over those."""
    gf = g.astype(jnp.float32)
    dwqkv = jnp.einsum("bsw,bsu->wu", xn, dqkv,
                       preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    dwo = jnp.einsum("bsw,bsu->wu", ctx, g,
                     preferred_element_type=jnp.float32)
    dbo = jnp.sum(gf, axis=(0, 1))
    # LN param grads (cheap elementwise recompute in XLA)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    dxn = jnp.einsum("bsu,wu->bsw", dqkv.astype(jnp.float32),
                     wqkv.astype(jnp.float32))
    d_scale = jnp.sum(dxn * xhat, axis=(0, 1)).astype(ln_scale.dtype)
    d_bias = jnp.sum(dxn, axis=(0, 1)).astype(ln_bias.dtype)
    return d_scale, d_bias, dwqkv, dbqkv, dwo, dbo


def _bwd(heads, eps, post_ln, interpret, attn_drop, hid_drop, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed = res
    on_tpu = jax.default_backend() == "tpu"
    from nans_clip_tpu.ops.fused_block_bwd import (fits_attention_bwd,
                                                   fits_attn_bwd_fullgrad)
    # NOTE: the WIDE attention fullgrad tier (W=1280 under the 110MB
    # pin, fits_attn_bwd_fullgrad_wide) is NOT routed: same-process H
    # bs64 A/B measured EXACTLY neutral (734.3 vs 734.4 ms/step) — the
    # saved [B,S,5W] emission traffic is fully repaid by the tile=1
    # short-row in-kernel wgrads. Tested opt-in; H keeps the r2-validated
    # one-shot emitting kernel + XLA einsums.
    if (not post_ln and key_bias is None and on_tpu
            and fits_attn_bwd_fullgrad(x.shape[1], x.shape[2], heads,
                                       jnp.dtype(x.dtype).itemsize)):
        # full-gradient kernel: weight grads contracted + fp32-accumulated
        # in-kernel — no [B,S,5W] activation round trip, no XLA dxn
        # re-matmul (routed r3; see PARITY.md r3 breakdown table)
        from nans_clip_tpu.ops.fused_block_bwd import \
            fused_attention_block_bwd_fullgrad

        dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias = \
            fused_attention_block_bwd_fullgrad(
                x, ln_scale, ln_bias, wqkv, bqkv, wo, g, heads, eps,
                interpret)
        return (dx, d_scale.reshape(-1).astype(ln_scale.dtype),
                d_bias.reshape(-1).astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(-1).astype(bqkv.dtype),
                dwo.astype(wo.dtype), dbo.reshape(-1).astype(bo.dtype),
                None, None)
    if (not post_ln and key_bias is None and on_tpu
            and fits_attention_bwd(x.shape[1], x.shape[2], heads)):
        # Fused backward: per-sample recompute + attention bwd + dx in one
        # Pallas kernel; weight grads as batched XLA contractions.
        from nans_clip_tpu.ops.fused_block_bwd import fused_attention_block_bwd

        dx, xn, ctx, dqkv = fused_attention_block_bwd(
            x, ln_scale, ln_bias, wqkv, bqkv, wo, g, heads, eps, interpret)
        d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = _oneshot_attn_weight_grads(
            x, xn, ctx, dqkv, g, wqkv, ln_scale, ln_bias, eps)
        return (dx, d_scale, d_bias, dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                dbo.astype(bo.dtype), None, None)
    if not post_ln and key_bias is None and on_tpu:
        # ViT-L/H: the single cell exceeds VMEM — head-chunked bwd kernel.
        # Also the reason big-model training fits HBM at all: the XLA vjp
        # fallback materializes [B, H, S, S] fp32 probs (ViT-L bs64 OOMs).
        from nans_clip_tpu.ops.fused_block_bwd import (
            assemble_chunked_attn_weight_grads, attn_bwd_head_chunk,
            fused_attention_block_bwd_chunked)

        hpc = attn_bwd_head_chunk(x.shape[1], x.shape[2], heads)
        if hpc is not None:
            dx, xn, ctx_h, dqkv_h = fused_attention_block_bwd_chunked(
                x, ln_scale, ln_bias, wqkv, bqkv, wo, g, heads, hpc, eps,
                interpret)
            d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = \
                assemble_chunked_attn_weight_grads(
                    x, xn, ctx_h, dqkv_h, g, heads, hpc, ln_scale, ln_bias,
                    wqkv, eps)
            return (dx, d_scale, d_bias, dwqkv.astype(wqkv.dtype),
                    dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                    dbo.astype(bo.dtype), None, None)
    from nans_clip_tpu.ops.fused_block_bwd import (fits_attn_bwd_fullgrad,
                                                   fits_bert_attention_bwd)
    if post_ln and on_tpu and fits_bert_attention_bwd(
            x.shape[1], x.shape[2], heads):
        # BERT post-LN (masked, optional in-kernel dropout) bwd kernel: the
        # PRNG stream re-seeds identically, so keep masks regenerate — an
        # XLA recompute could not reproduce them. Off-TPU the rate-0 XLA
        # vjp below applies (the kernel itself is interpret-tested
        # directly in tests/test_fused_bwd.py).
        if fits_attn_bwd_fullgrad(x.shape[1], x.shape[2], heads,
                                  jnp.dtype(x.dtype).itemsize):
            # full-gradient variant (r3): in-kernel weight grads
            from nans_clip_tpu.ops.fused_block_bwd import \
                fused_bert_attention_block_bwd_fullgrad

            dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias = \
                fused_bert_attention_block_bwd_fullgrad(
                    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias,
                    seed, g, heads, eps, attn_drop, hid_drop, interpret)
            return (dx, d_scale.reshape(-1).astype(ln_scale.dtype),
                    d_bias.reshape(-1).astype(ln_bias.dtype),
                    dwqkv.astype(wqkv.dtype),
                    dbqkv.reshape(-1).astype(bqkv.dtype),
                    dwo.astype(wo.dtype), dbo.reshape(-1).astype(bo.dtype),
                    None, None)
        from nans_clip_tpu.ops.fused_block_bwd import (
            fused_bert_attention_block_bwd)

        dx, dqkv, ctx, dproj, uhat = fused_bert_attention_block_bwd(
            x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed, g,
            heads, eps, attn_drop, hid_drop, interpret)
        gf = g.astype(jnp.float32)
        dwqkv = jnp.einsum("bsw,bsu->wu", x, dqkv,
                           preferred_element_type=jnp.float32).astype(wqkv.dtype)
        dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)).astype(bqkv.dtype)
        dwo = jnp.einsum("bsw,bsu->wu", ctx, dproj,
                         preferred_element_type=jnp.float32).astype(wo.dtype)
        dbo = jnp.sum(dproj.astype(jnp.float32), axis=(0, 1)).astype(bo.dtype)
        d_scale = jnp.sum(gf * uhat.astype(jnp.float32),
                          axis=(0, 1)).astype(ln_scale.dtype)
        d_bias = jnp.sum(gf, axis=(0, 1)).astype(ln_bias.dtype)
        return (dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo, None, None)
    assert attn_drop == hid_drop == 0.0, (
        "in-kernel dropout requires the TPU backend (interpret-mode PRNG "
        "returns zeros); gate at the caller")
    _, vjp = jax.vjp(
        lambda *a: _reference_block(*a, heads=heads, eps=eps,
                                    key_bias=key_bias, post_ln=post_ln),
        x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
    grads = vjp(g)
    return grads + (None, None)


_fused_block.defvjp(_fwd, _bwd)


def fused_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                          heads: int, eps: float = 1e-5,
                          interpret: bool = False):
    """ViT pre-LN layout: x + out_proj(MHA(LN(x))). x: [B, S, W]."""
    return _fused_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, None, None,
                        heads, eps, False, interpret, 0.0, 0.0)


def fused_bert_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                               key_bias, heads: int, eps: float = 1e-12,
                               interpret: bool = False,
                               attn_dropout: float = 0.0,
                               hidden_dropout: float = 0.0,
                               seed=None):
    """BERT post-LN layout: LN(x + dropout(out_proj(MHA_dropout(x)))) with
    padding mask (modeling_bert.py:118-152). Dropout rates > 0 use the
    in-kernel Mosaic PRNG (TPU only — callers gate on backend); ``seed`` is
    a traced int32 scalar, varied per layer, offset per sample inside."""
    if attn_dropout > 0.0 or hidden_dropout > 0.0:
        from nans_clip_tpu.ops.fused_block_bwd import fits_bert_attention_bwd
        assert jax.default_backend() == "tpu", (
            "in-kernel dropout needs the hardware PRNG (interpret mode "
            "yields zero bits) — use the unfused path off-TPU")
        assert fits_bert_attention_bwd(x.shape[1], x.shape[2], heads), (
            "dropout bwd kernel does not fit VMEM at this seq/width")
        assert seed is not None, "dropout needs a seed"
    return _fused_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias,
                        seed, heads, eps, True, interpret,
                        float(attn_dropout), float(hidden_dropout))


def fits_fused(seq: int, width: int) -> bool:
    # Lane alignment: the kernels flatten [T,S,W]->[T*S,W], and Mosaic
    # rejects that shape cast when W isn't a multiple of the 128-lane
    # vreg ("unsupported shape cast", found driving a width-64 test
    # config on chip r3). Every production tower is 768/1024/1280;
    # sub-lane custom widths route XLA.
    if width % 128:
        return False
    if width <= MAX_FUSED_WIDTH and seq <= MAX_FUSED_SEQ:
        return True
    # H-class one-shot cells (W=1280: weights 13.1MB + ~11.5MB/sample)
    # fit once _fused_call raises vmem_limit to 64MB for W > 1024
    return width <= ONESHOT_ATTN_WIDE_WIDTH and seq <= ONESHOT_ATTN_WIDE_SEQ


# ---------------------------------------------------------------------------
# Wide variant (ViT-H, width 1280): the fused-QKV weight alone (~10MB bf16)
# blows the single-cell VMEM budget, so heads are processed in chunks. The
# caller re-lays wqkv as [H, W, 3*dh] so each chunk's q/k/v columns are one
# contiguous block; a VMEM scratch accumulates the per-head context across
# the sequential chunk iterations, and the last chunk applies the output
# projection + residual.
# ---------------------------------------------------------------------------

def fits_fused_wide(seq: int, width: int) -> bool:
    # width % 128: Mosaic lane-alignment (see fits_fused); also keeps
    # dh = width/heads head slices vreg-contiguous in the chunked layout
    return (width % 128 == 0 and MAX_FUSED_WIDTH < width <= MAX_WIDE_WIDTH
            and seq <= MAX_FUSED_SEQ)


def _wide_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 o_ref, ctx_ref, *, heads_per_chunk: int, n_chunks: int,
                 dh: int, eps: float):
    c = pl.program_id(1)
    x = x_ref[0]
    scale = 1.0 / math.sqrt(dh)

    xn = _ln(x.astype(jnp.float32), s1_ref, b1_ref, eps).astype(x.dtype)

    for j in range(heads_per_chunk):
        wj = wqkv_ref[j]                          # [W, 3*dh]
        bj = bqkv_ref[j, 0].astype(jnp.float32)   # [3*dh]
        qkv = jnp.dot(xn, wj, preferred_element_type=jnp.float32) + bj
        q = qkv[:, :dh].astype(x.dtype)
        k = qkv[:, dh:2 * dh].astype(x.dtype)
        v = qkv[:, 2 * dh:].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_h = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32)
        # scratch is [H, S, dh]: dynamic index on the leading (untiled) dim —
        # lane-dim offsets would need 128-alignment, which dh=80 isn't.
        h_global = c * heads_per_chunk + j
        ctx_ref[h_global] = ctx_h

    @pl.when(c == n_chunks - 1)
    def _():
        heads = n_chunks * heads_per_chunk
        out = bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
        for h in range(heads):  # static; wo row offsets h*dh are 8-aligned
            out = out + jnp.dot(ctx_ref[h].astype(x.dtype),
                                wo_ref[h * dh:(h + 1) * dh, :],
                                preferred_element_type=jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


def _fused_wide_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps,
                     interpret, heads_per_chunk: int):
    b, s, w = x.shape
    dh = w // heads
    assert heads % heads_per_chunk == 0
    n_chunks = heads // heads_per_chunk
    # re-lay fused [W, 3W] -> per-head [H, W, 3*dh] (one XLA transpose)
    wqkv_h = wqkv.reshape(w, 3, heads, dh).transpose(2, 0, 1, 3).reshape(heads, w, 3 * dh)
    # [H, 1, 3*dh]: the singleton dim keeps the block shape tile-legal
    bqkv_h = bqkv.reshape(3, heads, dh).transpose(1, 0, 2).reshape(heads, 1, 3 * dh)
    vec = lambda d: pl.BlockSpec((d,), lambda bb, cc: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wide_kernel, heads_per_chunk=heads_per_chunk,
                          n_chunks=n_chunks, dh=dh, eps=eps),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda bb, cc: (bb, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w),
            pl.BlockSpec((heads_per_chunk, w, 3 * dh),
                         lambda bb, cc: (cc, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads_per_chunk, 1, 3 * dh), lambda bb, cc: (cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda bb, cc: (0, 0), memory_space=pltpu.VMEM),
            vec(w),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda bb, cc: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((heads, s, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_h, bqkv_h, wo, bo)


# Batch-tiled regrid of the head-chunked kernel: T samples per cell so the
# per-chunk weight streaming amortizes T-fold and the QKV projection runs
# at [T*S, W] MXU shape. Attention itself stays per-sample (block-diagonal).

def _wide_batched_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                         bo_ref, o_ref, ctx_ref, *, heads_per_chunk: int,
                         n_chunks: int, dh: int, eps: float):
    c = pl.program_id(1)
    t, s, w = x_ref.shape
    x = x_ref[:].reshape(t * s, w)
    scale = 1.0 / math.sqrt(dh)

    xn = _ln(x.astype(jnp.float32), s1_ref, b1_ref, eps).astype(x.dtype)

    for j in range(heads_per_chunk):
        wj = wqkv_ref[j]                          # [W, 3*dh]
        bj = bqkv_ref[j, 0].astype(jnp.float32)   # [3*dh]
        qkv = jnp.dot(xn, wj, preferred_element_type=jnp.float32) + bj
        h_global = c * heads_per_chunk + j
        for tt in range(t):                       # per-sample attention
            qkv_t = qkv[tt * s:(tt + 1) * s]
            q = qkv_t[:, :dh].astype(x.dtype)
            k = qkv_t[:, dh:2 * dh].astype(x.dtype)
            v = qkv_t[:, 2 * dh:].astype(x.dtype)
            sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx_ref[tt, h_global] = jnp.dot(
                p.astype(x.dtype), v,
                preferred_element_type=jnp.float32).astype(ctx_ref.dtype)

    @pl.when(c == n_chunks - 1)
    def _():
        heads = n_chunks * heads_per_chunk
        # per-sample accumulation: Mosaic cannot collapse (T, S, dh) into
        # (T*S, dh) when dh isn't lane-aligned (dh=80 at ViT-H)
        for tt in range(t):
            out = bo_ref[:].astype(jnp.float32) + x_ref[tt].astype(jnp.float32)
            for h in range(heads):
                out = out + jnp.dot(ctx_ref[tt, h].astype(x.dtype),
                                    wo_ref[h * dh:(h + 1) * dh, :],
                                    preferred_element_type=jnp.float32)
            o_ref[tt] = out.astype(o_ref.dtype)


def _fused_wide_batched_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads,
                             eps, interpret, heads_per_chunk: int, tile: int):
    b, s, w = x.shape
    dh = w // heads
    assert heads % heads_per_chunk == 0 and b % tile == 0
    n_chunks = heads // heads_per_chunk
    wqkv_h = wqkv.reshape(w, 3, heads, dh).transpose(2, 0, 1, 3).reshape(heads, w, 3 * dh)
    bqkv_h = bqkv.reshape(3, heads, dh).transpose(1, 0, 2).reshape(heads, 1, 3 * dh)
    vec = lambda d: pl.BlockSpec((d,), lambda bb, cc: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wide_batched_kernel, heads_per_chunk=heads_per_chunk,
                          n_chunks=n_chunks, dh=dh, eps=eps),
        grid=(b // tile, n_chunks),
        in_specs=[
            pl.BlockSpec((tile, s, w), lambda bb, cc: (bb, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w),
            pl.BlockSpec((heads_per_chunk, w, 3 * dh),
                         lambda bb, cc: (cc, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads_per_chunk, 1, 3 * dh), lambda bb, cc: (cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda bb, cc: (0, 0), memory_space=pltpu.VMEM),
            vec(w),
        ],
        out_specs=pl.BlockSpec((tile, s, w), lambda bb, cc: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # ctx is written once per head (no accumulation), so the scratch
        # can be input-precision — halves the dominant VMEM term
        scratch_shapes=[pltpu.VMEM((tile, heads, s, dh), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_h, bqkv_h, wo, bo)


def wide_batch_tile(b: int, seq: int, width: int,
                    heads_per_chunk: int = 2, esize: int = 2) -> int:
    """Batch tile for the wide attention regrid. Per-sample VMEM: bf16 ctx
    scratch + double-buffered x/out blocks; fixed: wo + one wqkv chunk."""
    per_sample = seq * width * (esize + 2 * esize + 2 * esize)
    fixed = (width * width + heads_per_chunk * width * 3 * 128) * esize
    t = max(1, (WIDE_TILE_BUDGET - fixed) // per_sample)
    while t > 1 and b % t:
        t -= 1
    return int(t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_attention_block_wide(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                               heads: int, eps: float = 1e-5,
                               heads_per_chunk: int = 4,
                               interpret: bool = False,
                               batch_tile: int = 1):
    """ViT pre-LN attention sub-block, head-chunked for width > 1024.
    ``batch_tile`` > 1 amortizes the weight-chunk streaming over T samples
    (the regrid that makes this kernel competitive with XLA at ViT-H)."""
    if batch_tile > 1:
        return _fused_wide_batched_call(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                                        bo, heads, eps, interpret,
                                        heads_per_chunk, batch_tile)
    return _fused_wide_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads,
                            eps, interpret, heads_per_chunk)


def _wide_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads, eps,
              heads_per_chunk, interpret, batch_tile):
    if batch_tile > 1:
        out = _fused_wide_batched_call(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                                       bo, heads, eps, interpret,
                                       heads_per_chunk, batch_tile)
    else:
        out = _fused_wide_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                               heads, eps, interpret, heads_per_chunk)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)


def _wide_bwd(heads, eps, heads_per_chunk, interpret, batch_tile, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo = res
    if jax.default_backend() == "tpu":
        from nans_clip_tpu.ops.fused_block_bwd import (
            fits_attention_bwd, fused_attention_block_bwd)
        if fits_attention_bwd(x.shape[1], x.shape[2], heads):
            # one-shot bwd cell (fits with the raised 64MB vmem limit):
            # measured faster than the head-chunked kernel at ViT-L
            # (167.9 -> 174.7 pairs/s) — same assembly as _bwd above
            dx, xn, ctx, dqkv = fused_attention_block_bwd(
                x, ln_scale, ln_bias, wqkv, bqkv, wo, g, heads, eps,
                interpret)
            d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = \
                _oneshot_attn_weight_grads(x, xn, ctx, dqkv, g, wqkv,
                                           ln_scale, ln_bias, eps)
            return (dx, d_scale, d_bias, dwqkv.astype(wqkv.dtype),
                    dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                    dbo.astype(bo.dtype))
        # head-chunked bwd kernel: the XLA vjp fallback would materialize
        # [B, H, S, S] fp32 probs per layer (HBM OOM at ViT-H training)
        from nans_clip_tpu.ops.fused_block_bwd import (
            assemble_chunked_attn_weight_grads, attn_bwd_head_chunk,
            fused_attention_block_bwd_chunked)

        hpc = attn_bwd_head_chunk(x.shape[1], x.shape[2], heads)
        if hpc is not None:
            dx, xn, ctx_h, dqkv_h = fused_attention_block_bwd_chunked(
                x, ln_scale, ln_bias, wqkv, bqkv, wo, g, heads, hpc, eps,
                interpret)
            d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = \
                assemble_chunked_attn_weight_grads(
                    x, xn, ctx_h, dqkv_h, g, heads, hpc, ln_scale, ln_bias,
                    wqkv, eps)
            return (dx, d_scale, d_bias, dwqkv.astype(wqkv.dtype),
                    dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                    dbo.astype(bo.dtype))
    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=heads, eps=eps),
                     x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
    return vjp(g)


fused_attention_block_wide.defvjp(_wide_fwd, _wide_bwd)


# ---------------------------------------------------------------------------
# Fused MLP sub-block: LN -> fc1 -> gelu -> fc2 -> residual (pre-LN), or
# fc1 -> gelu -> fc2 -> residual -> LN (post-LN, BERT). Same VMEM-residency
# rationale as the attention block; both fc weights must fit in VMEM, so
# this is gated at width <= 768 (ViT-B / BERT-base).
# ---------------------------------------------------------------------------

def fits_fused_mlp(seq: int, width: int) -> bool:
    # width % 128: same Mosaic lane-alignment constraint as fits_fused
    return (width % 128 == 0 and width <= MAX_FUSED_MLP_WIDTH
            and seq <= MAX_FUSED_SEQ)


def fits_fused_mlp_oneshot(seq: int, width: int) -> bool:
    """One-shot MLP kernel routing: classic widths always; wider towers
    only at SHORT sequences (RoBERTa-large S=52, W=1024) where the cell
    fits the raised 64MB vmem limit — what lets the large text tower run
    fully fused (incl. in-kernel dropout; the chunk-streamed variants
    have no dropout support)."""
    if fits_fused_mlp(seq, width):
        return True
    return (width % 128 == 0 and seq <= MLP_ONESHOT_WIDE_SEQ
            and width <= MLP_ONESHOT_WIDE_WIDTH)


def mlp_oneshot_direct_ok(seq: int, width: int) -> bool:
    """Direct-call admission to the one-shot kernel at SUB-LANE widths
    (w % 128 != 0), which the ROUTING gates refuse (models fall back to
    XLA — the r3 lane-alignment rule: Mosaic rejects the tile>1
    [T,S,W]->[T*S,W] flatten). A direct call still runs one-shot: the
    tile pickers return 1 at sub-lane widths, so the rejected cast never
    exists, and the tile=1 cell (incl. in-kernel dropout fwd+bwd at W=64)
    is chip-validated (tests/test_tpu_dropout.py). Covers BOTH one-shot
    tiers — classic and wide-short-seq — because the tiled fallbacks
    assert on dropout and their chunk picker has no sub-lane support.
    Shared by ``_mlp_dispatch`` and the regression test so the two can't
    drift."""
    if width % 128 == 0:
        return False
    return ((width <= MAX_FUSED_MLP_WIDTH and seq <= MAX_FUSED_SEQ)
            or (width <= MLP_ONESHOT_WIDE_WIDTH
                and seq <= MLP_ONESHOT_WIDE_SEQ))


def _reference_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, act: str,
                   eps: float, post_ln: bool):
    from nans_clip_tpu.ops.activations import ACT2FN
    from nans_clip_tpu.ops.layernorm import layer_norm

    xn = x if post_ln else layer_norm(x, ln_scale, ln_bias, eps)
    h = ACT2FN[act](xn @ w1 + b1)
    out = x + (h @ w2 + b2)
    return layer_norm(out, ln_scale, ln_bias, eps) if post_ln else out


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7 ~ fp32 exact).
    Mosaic has no erf/erfc primitive, so the kernel carries its own."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                seed_ref, o_ref, *, act: str, eps: float, post_ln: bool,
                hid_drop: float):
    # block may hold several samples (batch tiling, W lane-aligned): the
    # whole sub-block is elementwise or row-parallel, so [T, S, W] flattens
    # to [T*S, W] and every matmul runs at the taller MXU shape
    t, seq, w = x_ref.shape
    x = x_ref[:].reshape(t * seq, w)
    if post_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), s_ref, b_ref, eps).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:  # exact-erf gelu (BERT)
        h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    h = h.astype(x.dtype)
    proj = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    proj = proj + b2_ref[:].astype(jnp.float32)
    if hid_drop > 0.0:  # pre-residual hidden dropout (modeling_bert.py:152)
        # per-SAMPLE PRNG seeding (global index) so the stream matches the
        # bwd kernel's one-sample-per-cell regeneration at any batch tile;
        # fp32 multipliers because Mosaic cannot concatenate i1 vregs
        mults = []
        for tt in range(t):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * t + tt)
            mults.append(jnp.where(_keep_mask((seq, w), hid_drop),
                                   1.0 / (1.0 - hid_drop), 0.0))
        proj = proj * (jnp.concatenate(mults, axis=0) if t > 1 else mults[0])
    out = proj + x.astype(jnp.float32)
    if post_ln:
        out = _ln(out, s_ref, b_ref, eps)
    o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)


def _fused_mlp_call(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps, post_ln,
                    interpret, hid_drop=0.0, seed=None, tile: int = 1):
    b, s, w = x.shape
    i = w1.shape[-1]
    assert b % tile == 0
    # wide one-shot cells (RoBERTa-large W=1024: fc weights alone 16.8MB)
    # exceed the 16MB default scoped-vmem budget — raise the limit
    params = (pltpu.CompilerParams(vmem_limit_bytes=VMEM_RAISED)
              if w > MAX_FUSED_MLP_WIDTH else None)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    vec = lambda d: pl.BlockSpec((d,), lambda idx: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda idx: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act, eps=eps, post_ln=post_ln,
                          hid_drop=hid_drop),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s, w), lambda idx: (idx, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w), mat(w, i), vec(i), mat(i, w), vec(w),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, s, w), lambda idx: (idx, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=params,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2, seed)


def mlp_cell_tile(b: int, seq: int, width: int, inter: int,
                  esize: int = 2, dropout: bool = False) -> int:
    """Batch tile for the one-shot MLP kernel: fills the MXU row dimension
    at short sequences (BERT S=52 alone fills 52/128 rows). Needs W
    lane-aligned to flatten [T, S, W]; fp32 h/proj intermediates dominate."""
    if width % 128:
        return 1
    weights = 2 * width * inter * esize
    per_sample = seq * (inter * (4 + 2 * esize) + width * 6 * esize)
    if dropout:
        per_sample += _rup(seq, 8) * width * 4     # live hidden keep mask
    # W <= 768 keeps the measured 14MB budget (16MB default scoped vmem);
    # wide short-seq cells run with vmem_limit raised to 64MB
    budget = (MLP_CELL_BUDGET_WIDE if width > MAX_FUSED_MLP_WIDTH
              else MLP_CELL_BUDGET)
    t = max(1, (budget - weights) // per_sample)
    t = min(t, MLP_CELL_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


# Tiled variant for wide towers (ViT-L/H): the fc weights don't fit VMEM at
# once, so the intermediate dimension is processed in chunks; the grid is
# (batch, chunk) with a VMEM scratch accumulator that persists across the
# sequential chunk iterations of one batch cell.
#
# MEASURED SLOWER than XLA's batched MLP at ViT-L (578 vs 620 img/s @ bs64):
# the per-sample grid re-streams every weight chunk once per batch element,
# where XLA reads the weights once for the whole batched matmul. Kept as a
# correct reference (tests cover it) but NOT routed by default; a batched
# regrid (chunk-major with multi-sample cells) is the round-2 follow-up.

def _mlp_tiled_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, acc_ref, *, act: str, eps: float, post_ln: bool,
                      n_chunks: int):
    c = pl.program_id(1)
    x = x_ref[0]

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if post_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), s_ref, b_ref, eps).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    h = h.astype(x.dtype)
    acc_ref[:] = acc_ref[:] + jnp.dot(h, w2_ref[:],
                                      preferred_element_type=jnp.float32)

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
        if post_ln:
            out = _ln(out, s_ref, b_ref, eps)
        o_ref[0] = out.astype(o_ref.dtype)


def _fused_mlp_tiled_call(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps,
                          post_ln, interpret, chunk: int):
    b, s, w = x.shape
    i = w1.shape[-1]
    assert i % chunk == 0, (i, chunk)
    n_chunks = i // chunk
    vec = lambda d: pl.BlockSpec((d,), lambda bb, cc: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_tiled_kernel, act=act, eps=eps, post_ln=post_ln,
                          n_chunks=n_chunks),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda bb, cc: (bb, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w),
            pl.BlockSpec((w, chunk), lambda bb, cc: (0, cc), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda bb, cc: (cc,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w), lambda bb, cc: (cc, 0), memory_space=pltpu.VMEM),
            vec(w),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda bb, cc: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((s, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


def fits_fused_mlp_tiled(seq: int, width: int) -> bool:
    return (width % 128 == 0
            and MAX_FUSED_MLP_WIDTH < width <= MAX_TILED_MLP_WIDTH
            and seq <= MAX_FUSED_SEQ)


def mlp_chunk_size(width: int, inter: int, esize: int = 2):
    """Largest divisor of ``inter`` that is a multiple of 256 (the bf16
    1-D tiling Mosaic requires for the bias blocks) with a <=2MB weight
    tile; None if no such chunk exists."""
    for k in range(inter // 256, 0, -1):
        c = k * 256
        if inter % c == 0 and width * c * esize <= MLP_CHUNK_WEIGHT_BYTES:
            return c
    return None


def fused_mlp_routable(b: int, seq: int, width: int, inter: int,
                       esize: int = 2) -> bool:
    """Should the model route fused_mlp_block at this shape? One-shot
    widths always; wider ones only when the batch-tiled regrid applies
    (tile > 1 — the single-sample tiled variant re-streams weight chunks
    and lost to XLA). Routing the fused block also matters for TRAINING
    memory: its custom_vjp stores only the block inputs, where the inline
    XLA MLP under scan saves [L, B, S, 4W] gelu intermediates (12 GB at
    ViT-L bs64 — an HBM OOM). A jax.checkpoint'd XLA MLP shares that
    memory property and won isolated kernel A/Bs, but measured
    neutral-to-slower in the full train step (see vit.py) — the regrid
    stays routed for wide training forwards."""
    if fits_fused_mlp(seq, width):
        return True
    if not fits_fused_mlp_tiled(seq, width):
        return False
    chunk = mlp_chunk_size(width, inter, esize)
    return (chunk is not None
            and mlp_batch_tile(b, seq, width, inter, chunk, esize) > 1)


# Batch-tiled regrid of the tiled MLP (the round-2 follow-up promised in
# the round-1 notes): grid (batch_tile, chunk) with T samples per cell, so
# each streamed weight chunk is amortized over T samples instead of one,
# and the fc1/act/fc2 matmuls run at [T*S, W] MXU shapes. The fp32
# accumulator lives in scratch and persists across one tile's (consecutive)
# chunk sweep.

def _mlp_batched_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        o_ref, acc_ref, *, act: str, eps: float,
                        post_ln: bool, n_chunks: int):
    c = pl.program_id(1)
    t, s, w = x_ref.shape
    x = x_ref[:].reshape(t * s, w)

    if post_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), s_ref, b_ref, eps).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    h = h.astype(x.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = part

    @pl.when(c > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
        if post_ln:
            out = _ln(out, s_ref, b_ref, eps)
        o_ref[:] = out.reshape(t, s, w).astype(o_ref.dtype)


def _fused_mlp_batched_call(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps,
                            post_ln, interpret, chunk: int, tile: int):
    b, s, w = x.shape
    i = w1.shape[-1]
    assert i % chunk == 0 and b % tile == 0, (i, chunk, b, tile)
    n_chunks = i // chunk
    # 1-D params go in as (1, d) rows: XLA sometimes assigns split 1-D
    # layouts (e.g. T(1024)(128)S(1) for the 5120-wide ViT-H bias) that
    # Mosaic refuses; 2-D rows always get the standard tiled layout
    row = lambda d: pl.BlockSpec((1, d), lambda bb, cc: (0, 0),
                                 memory_space=pltpu.VMEM)
    # Mosaic double-buffers the streamed weight chunks AND the in/out
    # blocks across grid steps, so the cell's true VMEM footprint is ~2x
    # the mlp_batch_tile estimate (ViT-L tile=2: 16.71M > the 16M default
    # scoped-vmem limit). Raise the limit like the other wide kernels.
    return pl.pallas_call(
        functools.partial(_mlp_batched_kernel, act=act, eps=eps,
                          post_ln=post_ln, n_chunks=n_chunks),
        grid=(b // tile, n_chunks),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        in_specs=[
            pl.BlockSpec((tile, s, w), lambda bb, cc: (bb, 0, 0), memory_space=pltpu.VMEM),
            row(w), row(w),
            pl.BlockSpec((w, chunk), lambda bb, cc: (0, cc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda bb, cc: (0, cc), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w), lambda bb, cc: (cc, 0), memory_space=pltpu.VMEM),
            row(w),
        ],
        out_specs=pl.BlockSpec((tile, s, w), lambda bb, cc: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile * s, w), jnp.float32)],
        interpret=interpret,
    )(x, ln_scale.reshape(1, w), ln_bias.reshape(1, w), w1,
      b1.reshape(1, i), w2, b2.reshape(1, w))


def mlp_batch_tile(b: int, seq: int, width: int, inter: int,
                   chunk: int, esize: int = 2) -> int:
    """Largest batch tile whose cell fits the VMEM budget (x + out bf16,
    acc fp32, h fp32 per chunk, plus the weight chunks). The call pins
    vmem_limit_bytes=64MB and the true footprint is ~2x this estimate
    (Mosaic double-buffers weight chunks + in/out blocks), so the 26MB
    budget targets ~52-56MB real. Routing matters beyond speed: tile > 1
    is what routes fused_mlp_block for wide TRAINING forwards, whose
    input-only vjp residuals keep ViT-L/H(+336) inside HBM — at S=577
    this gives tile=2 where the old 13MB budget forced tile=1 and the
    XLA MLP scan-saved 3.4GB of gelu intermediates (bs32 OOM). Capped at
    2: same-process TPU A/Bs measured tile=2 faster than tile=4 at both
    ViT-H (3.530 vs 3.622 ms) and ViT-L-336 (3.843 vs 4.218 ms) — bigger
    tiles shrink the weight-stream amortization win by evicting the x/out
    blocks' double buffers."""
    weights = 2 * width * chunk * esize
    per_sample = seq * width * (2 * esize + 4) + seq * chunk * 4
    budget = MLP_REGRID_BUDGET - weights
    t = max(1, budget // per_sample)
    t = min(t, MLP_REGRID_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


def _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, act, eps,
                  post_ln, interpret, hid_drop):
    """Width-based kernel routing, shared by the custom_vjp primal AND its
    fwd rule (they must agree: the one-shot kernel's fc weights exceed VMEM
    at widths the tiled variant exists for)."""
    w = x.shape[-1]
    oneshot = (fits_fused_mlp_oneshot(x.shape[1], w)
               or mlp_oneshot_direct_ok(x.shape[1], w))
    if not oneshot:
        assert hid_drop == 0.0, "tiled MLP kernel has no dropout support"
        i = w1.shape[-1]
        esize = jnp.dtype(x.dtype).itemsize
        chunk = mlp_chunk_size(w, i, esize)  # <=2MB weight tile, 256-aligned
        assert chunk is not None, (w, i)
        tile = mlp_batch_tile(x.shape[0], x.shape[1], w, i, chunk, esize)
        if tile > 1:  # batch-tiled regrid: weight chunks amortize T-fold
            return _fused_mlp_batched_call(x, ln_scale, ln_bias, w1, b1, w2,
                                           b2, act, eps, post_ln, interpret,
                                           chunk, tile)
        return _fused_mlp_tiled_call(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                     act, eps, post_ln, interpret, chunk)
    # batch tiling is dropout-safe: the kernel re-seeds the PRNG per SAMPLE
    # (global index), matching the bwd kernel's one-sample-per-cell stream
    tile = mlp_cell_tile(x.shape[0], x.shape[1], w, w1.shape[-1],
                         jnp.dtype(x.dtype).itemsize,
                         dropout=hid_drop > 0.0)
    return _fused_mlp_call(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps,
                           post_ln, interpret, hid_drop, seed, tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    act: str = "quick_gelu", eps: float = 1e-5,
                    post_ln: bool = False, interpret: bool = False,
                    hid_dropout: float = 0.0, seed=None):
    return _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, act,
                         eps, post_ln, interpret, hid_dropout)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps, post_ln,
             interpret, hid_dropout, seed):
    out = _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, act,
                        eps, post_ln, interpret, hid_dropout)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, seed)


def _mlp_bwd(act, eps, post_ln, interpret, hid_dropout, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2, seed = res
    from nans_clip_tpu.ops.fused_block_bwd import (fits_fused_mlp_bwd,
                                                   fits_mlp_bwd_fullgrad)
    on_tpu = jax.default_backend() == "tpu"
    # NOTE: the WIDE fullgrad tier (fits_mlp_bwd_fullgrad_wide, W=1024
    # S=257 under the 110MB pin) is NOT routed: it compiles and is
    # gradient-exact, but measured SLOWER in the full ViT-L224 train
    # step (177.2 vs 185.3 pairs/s) — at tile=1 the in-kernel weight
    # grads contract only S rows per grid step, losing more MXU
    # efficiency than the saved [B,S,I] HBM traffic buys. Kept as a
    # tested opt-in; the wide cells stay on the XLA-recompute vjp.
    if on_tpu and fits_mlp_bwd_fullgrad(x.shape[1], x.shape[2],
                                        w1.shape[-1],
                                        jnp.dtype(x.dtype).itemsize):
        # full-gradient kernel: weight grads contracted + accumulated
        # in-kernel (fp32 VMEM across the batch grid) — no [B,S,·]
        # intermediates hit HBM. Routed r3 for the bwd-MFU gap the
        # breakdown attributed to these round trips (PARITY.md r3 table).
        from nans_clip_tpu.ops.fused_block_bwd import \
            fused_mlp_block_bwd_fullgrad

        dx, dw1, db1, dw2, db2, d_scale, d_bias = \
            fused_mlp_block_bwd_fullgrad(
                x, ln_scale, ln_bias, w1, b1, w2, b2, seed, g, act, eps,
                post_ln, hid_dropout, interpret)
        return (dx, d_scale.reshape(-1).astype(ln_scale.dtype),
                d_bias.reshape(-1).astype(ln_bias.dtype),
                dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
                dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype),
                None)
    # NOTE: the chunked+batch-tiled bwd kernel for seq/width beyond the
    # single-cell budget (fused_mlp_block_bwd_chunked) is NOT routed:
    # measured at ViT-B bs256 it re-streams weight chunks (tile=1: 598
    # pairs/s vs 657 with the XLA vjp below) and its tile>=2 configs hit
    # Mosaic layout-verification failures on g; kept tested as an opt-in
    # like the round-1 tiled forward.
    if on_tpu and fits_fused_mlp_bwd(x.shape[1], x.shape[2]):
        # per-sample VMEM recompute + dx kernel (same PRNG stream as the
        # forward when dropout is on); weight grads as XLA contractions
        from nans_clip_tpu.ops.fused_block_bwd import fused_mlp_block_bwd

        dx, xn, h, dh_pre, dproj, lnstat, dxn = fused_mlp_block_bwd(
            x, ln_scale, ln_bias, w1, b1, w2, b2, seed, g, act, eps,
            post_ln, hid_dropout, interpret)
        dw1 = jnp.einsum("bsw,bsi->wi", xn, dh_pre,
                         preferred_element_type=jnp.float32).astype(w1.dtype)
        db1 = jnp.sum(dh_pre.astype(jnp.float32), axis=(0, 1)).astype(b1.dtype)
        dw2 = jnp.einsum("bsi,bsw->iw", h, dproj,
                         preferred_element_type=jnp.float32).astype(w2.dtype)
        db2 = jnp.sum(dproj.astype(jnp.float32), axis=(0, 1)).astype(b2.dtype)
        gsrc = g.astype(jnp.float32) if post_ln else dxn.astype(jnp.float32)
        d_scale = jnp.sum(gsrc * lnstat.astype(jnp.float32),
                          axis=(0, 1)).astype(ln_scale.dtype)
        d_bias = jnp.sum(gsrc, axis=(0, 1)).astype(ln_bias.dtype)
        return (dx, d_scale, d_bias, dw1, db1, dw2, db2, None)
    assert hid_dropout == 0.0, (
        "in-kernel MLP dropout requires the TPU backend and the bwd-kernel "
        "VMEM fit — gate at the caller")
    _, vjp = jax.vjp(lambda *a: _reference_mlp(*a, act=act, eps=eps,
                                               post_ln=post_ln),
                     x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g) + (None,)


fused_mlp_block.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# PARTIAL variants for tensor parallelism (parallel/tp.py): each model shard
# computes its local heads / intermediate columns and emits the out/down-
# projection partial sum WITHOUT the residual, output bias, or final LN —
# the shard_map wrapper psums the partials over the 'model' axis and applies
# those once. ``pre_ln`` says whether the sub-block normalizes its input
# (ViT pre-LN / BERT post-LN respectively use True / False here).
# ---------------------------------------------------------------------------


def _reference_block_partial(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                             heads: int, eps: float, pre_ln: bool,
                             key_bias=None):
    """Plain-XLA twin of the partial attention sub-block (vjp + TP oracle).
    wqkv: [W, 3*Wl] (q|k|v thirds of the LOCAL heads), wo: [Wl, W]."""
    from nans_clip_tpu.ops.attention import attention_xla, merge_heads, split_heads
    from nans_clip_tpu.ops.layernorm import layer_norm

    xn = layer_norm(x, ln_scale, ln_bias, eps) if pre_ln else x
    qkv = xn @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ctx = merge_heads(attention_xla(split_heads(q, heads), split_heads(k, heads),
                                    split_heads(v, heads), key_bias))
    return ctx @ wo


def _partial_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                    kb_ref, o_ref, *, heads: int, eps: float, pre_ln: bool,
                    masked: bool):
    x = x_ref[0]                                    # [S, W] full width
    wl3 = wqkv_ref.shape[-1]                        # 3 * local width
    wl = wl3 // 3
    dh = wl // heads
    scale = 1.0 / math.sqrt(dh)

    if pre_ln:
        xn = _ln(x.astype(jnp.float32), s1_ref, b1_ref, eps).astype(x.dtype)
    else:
        xn = x
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)     # [S, 3*Wl]

    ctx_parts = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].astype(x.dtype)
        k = qkv[:, wl + h * dh:wl + (h + 1) * dh].astype(x.dtype)
        v = qkv[:, 2 * wl + h * dh:2 * wl + (h + 1) * dh].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if masked:
            s = s + kb_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)  # [S, Wl]
    o_ref[0] = jnp.dot(ctx, wo_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _partial_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias, heads,
                  eps, pre_ln, interpret):
    b, s, w = x.shape
    masked = key_bias is not None
    if key_bias is None:
        key_bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32).reshape(b, 1, s)
    wl3 = wqkv.shape[-1]
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_partial_kernel, heads=heads, eps=eps,
                          pre_ln=pre_ln, masked=masked),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w), mat(w, wl3), vec(wl3), mat(wl3 // 3, w),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_attention_block_partial(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                                  key_bias, heads: int, eps: float,
                                  pre_ln: bool, interpret: bool = False):
    """Local-heads attention partial: [opt LN ->] QKV -> MHA -> ctx @ wo.
    Caller adds psum + residual + output bias (+ post-LN)."""
    return _partial_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias,
                         heads, eps, pre_ln, interpret)


def _partial_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias, heads, eps,
                 pre_ln, interpret):
    out = _partial_call(x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias,
                        heads, eps, pre_ln, interpret)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias)


def _partial_bwd(heads, eps, pre_ln, interpret, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wo, key_bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference_block_partial(*a, heads=heads, eps=eps,
                                            pre_ln=pre_ln, key_bias=key_bias),
        x, ln_scale, ln_bias, wqkv, bqkv, wo)
    return vjp(g) + (None,)


fused_attention_block_partial.defvjp(_partial_fwd, _partial_bwd)


def _reference_mlp_partial(x, ln_scale, ln_bias, w1, b1, w2, act: str,
                           eps: float, pre_ln: bool):
    from nans_clip_tpu.ops.activations import ACT2FN
    from nans_clip_tpu.ops.layernorm import layer_norm

    xn = layer_norm(x, ln_scale, ln_bias, eps) if pre_ln else x
    return ACT2FN[act](xn @ w1 + b1) @ w2


def _mlp_partial_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, o_ref,
                        *, act: str, eps: float, pre_ln: bool):
    x = x_ref[0]
    if pre_ln:
        xn = _ln(x.astype(jnp.float32), s_ref, b_ref, eps).astype(x.dtype)
    else:
        xn = x
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    h = h.astype(x.dtype)
    o_ref[0] = jnp.dot(h, w2_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _mlp_partial_call(x, ln_scale, ln_bias, w1, b1, w2, act, eps, pre_ln,
                      interpret):
    b, s, w = x.shape
    i = w1.shape[-1]
    vec = lambda d: pl.BlockSpec((d,), lambda idx: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda idx: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_partial_kernel, act=act, eps=eps, pre_ln=pre_ln),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda idx: (idx, 0, 0), memory_space=pltpu.VMEM),
            vec(w), vec(w), mat(w, i), vec(i), mat(i, w),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda idx: (idx, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_mlp_block_partial(x, ln_scale, ln_bias, w1, b1, w2,
                            act: str, eps: float, pre_ln: bool,
                            interpret: bool = False):
    """Column/row-split MLP partial: [opt LN ->] fc1 -> act -> fc2-partial.
    Caller adds psum + residual + fc2 bias (+ post-LN)."""
    return _mlp_partial_call(x, ln_scale, ln_bias, w1, b1, w2, act, eps,
                             pre_ln, interpret)


def _mlp_partial_fwd(x, ln_scale, ln_bias, w1, b1, w2, act, eps, pre_ln,
                     interpret):
    out = _mlp_partial_call(x, ln_scale, ln_bias, w1, b1, w2, act, eps,
                            pre_ln, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2)


def _mlp_partial_bwd(act, eps, pre_ln, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp_partial(*a, act=act, eps=eps, pre_ln=pre_ln),
        x, ln_scale, ln_bias, w1, b1, w2)
    return vjp(g)


fused_mlp_block_partial.defvjp(_mlp_partial_fwd, _mlp_partial_bwd)
