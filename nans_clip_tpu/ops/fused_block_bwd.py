"""Backward kernels for the fused transformer sub-blocks.

The default backward recomputes the whole sub-block with plain XLA (remat
semantics). These kernels fuse the expensive per-sample part instead:
recompute the forward entirely in VMEM, then compute the input gradient dx
in the same pass, emitting the recomputed activations that the WEIGHT
gradients need. Weight gradients themselves are batched [B*S, W]x[B*S, W']
contractions — exactly what XLA's MXU pipeline is best at — so they stay
outside the kernels.

Three kernels:
* ``fused_attention_block_bwd`` — ViT pre-LN attention (no mask/dropout);
* ``fused_bert_attention_block_bwd`` — BERT post-LN attention with the
  additive padding mask AND in-kernel dropout (attention-prob + hidden,
  modeling_bert.py:118-152 semantics): the forward's PRNG sequence is
  re-seeded with the same per-sample seed so the keep masks regenerate
  bit-identically (the reason dropout must live in a kernel: an XLA
  recompute could never reproduce the Mosaic PRNG stream);
* ``fused_mlp_block_bwd`` — the MLP sub-block, pre-LN (ViT) or post-LN
  (BERT) with optional hidden dropout.

In-kernel dropout requires the hardware PRNG (pltpu.prng_*): interpret
mode returns zero bits, so dropout rates > 0 are TPU-only — callers gate
on backend and fall back to the unfused XLA dropout path elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from nans_clip_tpu.ops.fused_block import _keep_mask, _rup  # noqa: E402
from nans_clip_tpu.ops.gates import (ATTN_BWD_BUDGET, ATTN_BWD_TILE_CAP,
                                     ATTN_BWD_TILE_MAX_SEQ,
                                     ATTN_FULLGRAD_BUDGET,
                                     BERT_ATTN_BWD_BUDGET,
                                     HEAD_CHUNK_BUDGET, MLP_BWD_BUDGET,
                                     MLP_BWD_WIDE_SEQ, MLP_BWD_WIDE_WIDTH,
                                     ATTN_FULLGRAD_WIDE_BUDGET,
                                     ATTN_FULLGRAD_WIDE_MAX_SEQ,
                                     MLP_FULLGRAD_BUDGET,
                                     MLP_FULLGRAD_WIDE_BUDGET,
                                     VMEM_MLP_FULLGRAD_WIDE, VMEM_RAISED)


def fits_attention_bwd(seq: int, width: int, heads: int) -> bool:
    """VMEM check for the pre-LN (ViT) attention bwd kernel: weights +
    fp32 qkv/dqkv + per-head probs + fp32 row buffers + double-buffered
    io per cell, against the raised 64MB vmem_limit (the original 14MB
    bound targeted the 16MB default scoped budget and excluded ViT-L's
    S=257/W=1024 cell, which fits comfortably once the limit is raised)."""
    weights = 4 * width * width * 2
    qkv = _rup(seq, 8) * 3 * width * 8
    probs = heads * _rup(seq, 8) * seq * 4
    acts = _rup(seq, 8) * width * 24
    io = _rup(seq, 8) * width * 2 * 8 * 2
    return weights + qkv + probs + acts + io < ATTN_BWD_BUDGET


def fits_bert_attention_bwd(seq: int, width: int, heads: int) -> bool:
    """VMEM check: the bwd kernel keeps per-head prob + keep-mask stacks
    plus both weight matrices resident."""
    probs = heads * _rup(seq, 8) * _rup(seq, 128) * 4 * 2
    weights = (3 * width * width + width * width) * 2
    return probs + weights < BERT_ATTN_BWD_BUDGET


def fits_fused_mlp_bwd(seq: int, width: int) -> bool:
    """Routing gate: fc weights + three fp32 [S, 4W] intermediates
    resident. Holds for BERT-class (S=52). NOT a pure VMEM bound any
    more — with vmem_limit raised to 64MB the ViT-B S=197 cell compiles,
    but MEASURED SLOWER than the XLA vjp recompute (644.5 vs 661 pairs/s
    train step), so the 13MB boundary doubles as the measured routing
    cutoff."""
    weights = 2 * width * 4 * width * 2
    inter = 3 * _rup(seq, 8) * 4 * width * 4
    if weights + inter < MLP_BWD_BUDGET:
        return True
    # short-seq wide towers (RoBERTa-large S=52, W=1024): the ~22MB cell
    # fits the raised 64MB vmem limit, and fusing is what keeps dropout
    # training on the kernel path (PRNG stream regeneration)
    return seq <= MLP_BWD_WIDE_SEQ and width <= MLP_BWD_WIDE_WIDTH


def _ln_fwd_stats(u, eps):
    """Normalized activations + rstd only — the LN scale is applied by
    callers (it is NOT folded into the returned stats)."""
    mean = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    uhat = (u - mean) * rstd
    return uhat, rstd


def _ln_bwd(g, gamma, uhat, rstd):
    ghat = g * gamma
    mean_g = jnp.mean(ghat, axis=-1, keepdims=True)
    mean_gu = jnp.mean(ghat * uhat, axis=-1, keepdims=True)
    return rstd * (ghat - mean_g - uhat * mean_gu)


def attn_bwd_cell_tile(b: int, seq: int, width: int, heads: int,
                       esize: int = 2) -> int:
    """Batch tile for the attention bwd kernels: fills the MXU row dim of
    the flattened QKV/projection matmuls (the attention matmuls stay per
    sample). fp32 qkv/dqkv + per-head probs (+ mask multiplier) + six
    fp32 row buffers + double-buffered io blocks; weights resident. The
    callers raise vmem_limit_bytes to 64MB. Tiling only pays at SHORT
    sequences (BERT S=52) where a single sample under-fills the MXU row
    dim; at ViT's S=197 tile=2 measured slower for both the fwd (4100 vs
    4156 img/s, attn_cell_tile note) and the bwd (639.9 vs 664 pairs/s
    train step) — the [S,S] fp32 prob live-set doubles and evicts the
    weight blocks."""
    if width % 128 or seq > ATTN_BWD_TILE_MAX_SEQ:
        return 1
    weights = (3 * width * width + width * width) * esize
    per = (seq * 3 * width * 8                      # fp32 qkv + dqkv
           + heads * _rup(seq, 8) * seq * 8         # probs + multiplier
           + seq * width * 4 * 6                    # fp32 row buffers
           + seq * width * esize * 2 * 9)           # io blocks, dbl-buffered
    t = max(1, (ATTN_BWD_BUDGET - weights) // per)
    t = min(t, ATTN_BWD_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


def _attn_bwd_math(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
                   *, heads: int, eps: float):
    """Shared pre-LN attention bwd body. Returns (dx, xn, ctx, dqkv, xhat,
    dxn, g) as flat [T*S, .] arrays — the emitting kernel stores the
    activations for XLA weight-grad einsums; the full-gradient kernel
    contracts them in place."""
    # the cell may hold T samples: LN/QKV/dctx/dxn run flattened at
    # [T*S, .] MXU shapes, the attention fwd+bwd loops per (sample, head)
    t, seq, w = x_ref.shape
    x = x_ref[:].reshape(t * seq, w)
    g = g_ref[:].reshape(t * seq, w).astype(jnp.float32)
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

    ctx_rows, dqkv_rows = [], []
    for tt in range(t):
        sl = slice(tt * seq, (tt + 1) * seq)
        ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
        for h in range(heads):
            q = qkv[sl, h * dh:(h + 1) * dh].astype(x.dtype)
            k = qkv[sl, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
            v = qkv[sl, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)   # [S, S] fp32
            pb = p.astype(x.dtype)
            ctx_parts.append(jnp.dot(pb, v, preferred_element_type=jnp.float32))

            dctx_h = dctx[sl, h * dh:(h + 1) * dh].astype(x.dtype)
            dv_parts.append(jax.lax.dot_general(
                pb, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(dctx_h, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - delta)                         # [S, S] fp32
            dsb = ds.astype(x.dtype)
            dq_parts.append(jnp.dot(dsb, k,
                                    preferred_element_type=jnp.float32) * scale)
            dk_parts.append(jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        ctx_rows.append(jnp.concatenate(ctx_parts, axis=-1))
        dqkv_rows.append(jnp.concatenate(
            [jnp.concatenate(dq_parts, axis=-1),
             jnp.concatenate(dk_parts, axis=-1),
             jnp.concatenate(dv_parts, axis=-1)], axis=-1))
    ctx = jnp.concatenate(ctx_rows, axis=0) if t > 1 else ctx_rows[0]
    dqkv = (jnp.concatenate(dqkv_rows, axis=0) if t > 1
            else dqkv_rows[0])                            # [T*S, 3W] fp32

    # dxn = dqkv @ wqkv^T
    dxn = jax.lax.dot_general(dqkv.astype(x.dtype), wqkv_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # LayerNorm backward: dxhat = dxn * gamma
    dxhat = dxn * gamma
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    return g + dx_ln, xn, ctx, dqkv, xhat, dxn, g


def _bwd_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
                dx_ref, xn_ref, ctx_ref, dqkv_ref, *, heads: int, eps: float):
    t, seq, w = x_ref.shape
    dx, xn, ctx, dqkv, _, _, _ = _attn_bwd_math(
        x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
        heads=heads, eps=eps)
    sh3 = lambda c: (t, seq, c)
    dx_ref[:] = dx.reshape(sh3(w)).astype(dx_ref.dtype)
    xn_ref[:] = xn.reshape(sh3(w)).astype(xn_ref.dtype)
    ctx_ref[:] = ctx.reshape(sh3(w)).astype(ctx_ref.dtype)
    dqkv_ref[:] = dqkv.reshape(sh3(3 * w)).astype(dqkv_ref.dtype)


def _bwd_fullgrad_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                         g_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                         dbo_ref, dsc_ref, dbi_ref, *, heads: int,
                         eps: float):
    """Pre-LN attention bwd with IN-KERNEL weight grads, fp32-accumulated
    across the (sequential) batch grid. Also saves the XLA assembly's
    dxn = dqkv @ wqkv^T recompute (the math body already has it)."""
    t, seq, w = x_ref.shape
    dx, xn, ctx, dqkv, xhat, dxn, g = _attn_bwd_math(
        x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
        heads=heads, eps=eps)
    dx_ref[:] = dx.reshape(t, seq, w).astype(dx_ref.dtype)

    xdt = x_ref.dtype
    dwqkv_c = jax.lax.dot_general(xn.astype(xdt), dqkv.astype(xdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dwo_c = jax.lax.dot_general(ctx.astype(xdt), g.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv_c = jnp.sum(dqkv, axis=0, keepdims=True)
    dbo_c = jnp.sum(g, axis=0, keepdims=True)
    dsc_c = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbi_c = jnp.sum(dxn, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwqkv_ref[:] = dwqkv_c
        dbqkv_ref[:] = dbqkv_c
        dwo_ref[:] = dwo_c
        dbo_ref[:] = dbo_c
        dsc_ref[:] = dsc_c
        dbi_ref[:] = dbi_c

    @pl.when(pl.program_id(0) > 0)
    def _():
        dwqkv_ref[:] += dwqkv_c
        dbqkv_ref[:] += dbqkv_c
        dwo_ref[:] += dwo_c
        dbo_ref[:] += dbo_c
        dsc_ref[:] += dsc_c
        dbi_ref[:] += dbi_c


def _bert_bwd_math(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                   bo_ref, kb_ref, seed_ref, g_ref,
                   *, heads: int, eps: float, attn_drop: float,
                   hid_drop: float, masked: bool):
    """Recompute the BERT post-LN attention forward (same per-SAMPLE PRNG
    stream as the fwd kernel) and produce dx + the activations the weight
    grads need, as flat [T*S, .] arrays. The cell may hold T samples
    (batch tiling): the row-parallel matmuls run flattened at [T*S, .]
    MXU shapes; the attention itself and all PRNG draws are per sample
    (seeded by GLOBAL sample index, the same stream at any tile). Dropout
    masks are kept as fp32 scale-or-zero multipliers (Mosaic cannot
    concatenate i1 vregs across samples)."""
    t, seq, w = x_ref.shape
    x = x_ref[:].reshape(t * seq, w)
    g = g_ref[:].reshape(t * seq, w).astype(jnp.float32)
    dh = w // heads
    scale = 1.0 / math.sqrt(dh)
    dropping = attn_drop > 0.0 or hid_drop > 0.0

    # ---- forward recompute (identical op/PRNG order to _kernel) ----
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)

    # per-sample attention recompute; fp32 probs (pre-dropout) and mask
    # multipliers are held for the backward head loop below
    p_pre = [[None] * heads for _ in range(t)]
    amult = [[None] * heads for _ in range(t)]
    ctx_rows, hmults = [], []
    for tt in range(t):
        if dropping:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * t + tt)
        sl = slice(tt * seq, (tt + 1) * seq)
        parts = []
        for h in range(heads):
            q = qkv[sl, h * dh:(h + 1) * dh].astype(x.dtype)
            k = qkv[sl, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
            v = qkv[sl, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if masked:
                s = s + kb_ref[tt]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            p_pre[tt][h] = p
            if attn_drop > 0.0:
                amult[tt][h] = jnp.where(_keep_mask((seq, seq), attn_drop),
                                         1.0 / (1.0 - attn_drop), 0.0)
                p = p * amult[tt][h]
            parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
        ctx_rows.append(jnp.concatenate(parts, axis=-1))
        if hid_drop > 0.0:
            hmults.append(jnp.where(_keep_mask((seq, w), hid_drop),
                                    1.0 / (1.0 - hid_drop), 0.0))
    ctx = (jnp.concatenate(ctx_rows, axis=0) if t > 1
           else ctx_rows[0]).astype(x.dtype)

    proj = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[:].astype(jnp.float32)
    if hid_drop > 0.0:
        hmult = jnp.concatenate(hmults, axis=0) if t > 1 else hmults[0]
        proj = proj * hmult
    u = proj + x.astype(jnp.float32)
    uhat, rstd = _ln_fwd_stats(u, eps)

    # ---- backward ----
    du = _ln_bwd(g, s1_ref[:].astype(jnp.float32), uhat, rstd)
    dproj = du
    if hid_drop > 0.0:
        dproj = dproj * hmult
    dctx = jax.lax.dot_general(dproj.astype(x.dtype), wo_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    dqkv_rows = []
    for tt in range(t):
        sl = slice(tt * seq, (tt + 1) * seq)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            q = qkv[sl, h * dh:(h + 1) * dh].astype(x.dtype)
            k = qkv[sl, w + h * dh:w + (h + 1) * dh].astype(x.dtype)
            v = qkv[sl, 2 * w + h * dh:2 * w + (h + 1) * dh].astype(x.dtype)
            p = p_pre[tt][h]
            pd = p if attn_drop == 0.0 else p * amult[tt][h]
            pdb = pd.astype(x.dtype)
            dctx_h = dctx[sl, h * dh:(h + 1) * dh].astype(x.dtype)
            dv_parts.append(jax.lax.dot_general(
                pdb, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dpd = jax.lax.dot_general(dctx_h, v, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dp = dpd if attn_drop == 0.0 else dpd * amult[tt][h]
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - delta)
            dsb = ds.astype(x.dtype)
            dq_parts.append(jnp.dot(dsb, k,
                                    preferred_element_type=jnp.float32) * scale)
            dk_parts.append(jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        dqkv_rows.append(jnp.concatenate(
            [jnp.concatenate(dq_parts, axis=-1),
             jnp.concatenate(dk_parts, axis=-1),
             jnp.concatenate(dv_parts, axis=-1)], axis=-1))
    dqkv = jnp.concatenate(dqkv_rows, axis=0) if t > 1 else dqkv_rows[0]

    dx_qkv = jax.lax.dot_general(dqkv.astype(x.dtype), wqkv_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return du + dx_qkv, dqkv, ctx, dproj, uhat, x, g


def _bert_bwd_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref,
                     bo_ref, kb_ref, seed_ref, g_ref,
                     dx_ref, dqkv_ref, ctx_ref, dproj_ref, uhat_ref,
                     *, heads: int, eps: float, attn_drop: float,
                     hid_drop: float, masked: bool):
    t, seq, w = x_ref.shape
    dx, dqkv, ctx, dproj, uhat, _, _ = _bert_bwd_math(
        x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, kb_ref,
        seed_ref, g_ref, heads=heads, eps=eps, attn_drop=attn_drop,
        hid_drop=hid_drop, masked=masked)
    sh3 = lambda c: (t, seq, c)
    dx_ref[:] = dx.reshape(sh3(w)).astype(dx_ref.dtype)
    dqkv_ref[:] = dqkv.reshape(sh3(3 * w)).astype(dqkv_ref.dtype)
    ctx_ref[:] = ctx.reshape(sh3(w)).astype(ctx_ref.dtype)
    dproj_ref[:] = dproj.reshape(sh3(w)).astype(dproj_ref.dtype)
    uhat_ref[:] = uhat.reshape(sh3(w)).astype(uhat_ref.dtype)


def _bert_bwd_fullgrad_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref,
                              wo_ref, bo_ref, kb_ref, seed_ref, g_ref,
                              dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                              dbo_ref, dsc_ref, dbi_ref, *, heads: int,
                              eps: float, attn_drop: float,
                              hid_drop: float, masked: bool):
    """Post-LN (BERT) attention bwd with in-kernel weight grads, fp32-
    accumulated across the batch grid (same PRNG stream contract)."""
    t, seq, w = x_ref.shape
    dx, dqkv, ctx, dproj, uhat, x, g = _bert_bwd_math(
        x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, kb_ref,
        seed_ref, g_ref, heads=heads, eps=eps, attn_drop=attn_drop,
        hid_drop=hid_drop, masked=masked)
    dx_ref[:] = dx.reshape(t, seq, w).astype(dx_ref.dtype)

    xdt = x_ref.dtype
    dwqkv_c = jax.lax.dot_general(x, dqkv.astype(xdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dwo_c = jax.lax.dot_general(ctx, dproj.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv_c = jnp.sum(dqkv, axis=0, keepdims=True)
    dbo_c = jnp.sum(dproj, axis=0, keepdims=True)
    dsc_c = jnp.sum(g * uhat, axis=0, keepdims=True)
    dbi_c = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwqkv_ref[:] = dwqkv_c
        dbqkv_ref[:] = dbqkv_c
        dwo_ref[:] = dwo_c
        dbo_ref[:] = dbo_c
        dsc_ref[:] = dsc_c
        dbi_ref[:] = dbi_c

    @pl.when(pl.program_id(0) > 0)
    def _():
        dwqkv_ref[:] += dwqkv_c
        dbqkv_ref[:] += dbqkv_c
        dwo_ref[:] += dwo_c
        dbo_ref[:] += dbo_c
        dsc_ref[:] += dsc_c
        dbi_ref[:] += dbi_c


def fused_bert_attention_block_bwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                                   key_bias, seed, g, heads: int,
                                   eps: float = 1e-12,
                                   attn_drop: float = 0.0,
                                   hid_drop: float = 0.0,
                                   interpret: bool = False):
    """Returns (dx, dqkv, ctx, dproj, uhat); the caller forms weight grads:
        dwqkv = einsum('bsw,bsu->wu', x, dqkv)      dbqkv = sum(dqkv)
        dwo   = einsum('bsw,bsu->wu', ctx, dproj)   dbo   = sum(dproj)
        d_ln_scale = sum(g * uhat)                  d_ln_bias = sum(g)
    """
    b, s, w = x.shape
    masked = key_bias is not None
    if key_bias is None:
        key_bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32).reshape(b, 1, s)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    tile = attn_bwd_cell_tile(b, s, w, heads, jnp.dtype(x.dtype).itemsize)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bert_bwd_kernel, heads=heads, eps=eps,
                          attn_drop=attn_drop, hid_drop=hid_drop,
                          masked=masked),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), vec(w),
                  pl.BlockSpec((tile, 1, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM), blk(w)],
        out_specs=[blk(w), blk(3 * w), blk(w), blk(w), blk(w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, 3 * w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed, g)


def fused_bert_attention_block_bwd_fullgrad(x, ln_scale, ln_bias, wqkv,
                                            bqkv, wo, bo, key_bias, seed, g,
                                            heads: int, eps: float = 1e-12,
                                            attn_drop: float = 0.0,
                                            hid_drop: float = 0.0,
                                            interpret: bool = False):
    """Returns the COMPLETE gradient set
    (dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias); weight grads contracted
    in-kernel, fp32-accumulated across the batch grid. Same PRNG stream
    contract as fused_bert_attention_block_bwd."""
    b, s, w = x.shape
    masked = key_bias is not None
    if key_bias is None:
        key_bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32).reshape(b, 1, s)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    esize = jnp.dtype(x.dtype).itemsize
    resident = (3 * w * w + w * w) * (esize + 4)
    per = (_rup(s, 8) * 3 * w * 8 + heads * _rup(s, 8) * _rup(s, 128) * 8
           + _rup(s, 8) * w * 4 * 8 + _rup(s, 8) * w * esize * 2 * 5)
    tile = max(1, (ATTN_FULLGRAD_BUDGET - resident) // per)
    tile = min(tile, ATTN_BWD_TILE_CAP if s <= ATTN_BWD_TILE_MAX_SEQ else 1)
    while tile > 1 and b % tile:
        tile -= 1
    tile = int(tile)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bert_bwd_fullgrad_kernel, heads=heads, eps=eps,
                          attn_drop=attn_drop, hid_drop=hid_drop,
                          masked=masked),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), vec(w),
                  pl.BlockSpec((tile, 1, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM), blk(w)],
        out_specs=[blk(w), mat(w, 3 * w), mat(1, 3 * w), mat(w, w),
                   mat(1, w), mat(1, w), mat(1, w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((w, 3 * w), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * w), jnp.float32),
            jax.ShapeDtypeStruct((w, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, key_bias, seed, g)


def fused_attention_block_bwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, g,
                              heads: int, eps: float = 1e-5,
                              interpret: bool = False):
    """Returns (dx, xn, ctx, dqkv); caller forms the weight grads:
        dwqkv = einsum('bsw,bsu->wu', xn, dqkv)   dbqkv = sum(dqkv)
        dwo   = einsum('bsw,bsu->wu', ctx, g)     dbo   = sum(g)
        d_ln_scale = sum(dxn * xhat), d_ln_bias = sum(dxn) (via caller's xhat)
    """
    b, s, w = x.shape
    tile = attn_bwd_cell_tile(b, s, w, heads, jnp.dtype(x.dtype).itemsize)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, eps=eps),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), blk(w)],
        out_specs=[blk(w), blk(w), blk(w), blk(3 * w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, 3 * w), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, g)


def fits_attn_bwd_fullgrad(seq: int, width: int, heads: int,
                           esize: int = 2) -> bool:
    """Full-gradient variant's VMEM bound: the emitting kernel's live set
    plus resident fp32 accumulators (dwqkv W·3W + dwo W·W = 16·W² bytes),
    minus the five [T,S,·] output blocks it no longer double-buffers.
    ``esize``: io/weight dtype size — fp32 inputs (tests, --precision
    fp32) double the resident weights, pushing wide cells past the pin."""
    return _attn_fullgrad_need(seq, width, heads,
                               esize) < ATTN_FULLGRAD_BUDGET


def _attn_fullgrad_need(seq: int, width: int, heads: int,
                        esize: int) -> int:
    weights = (3 * width * width + width * width) * esize
    accums = (3 * width * width + width * width) * 4
    qkv = _rup(seq, 8) * 3 * width * 4 * 2
    probs = heads * _rup(seq, 8) * seq * 4
    acts = _rup(seq, 8) * width * 24
    io = _rup(seq, 8) * width * 2 * esize * 2
    return weights + accums + qkv + probs + acts + io


def fits_attn_bwd_fullgrad_wide(seq: int, width: int, heads: int,
                                esize: int = 2) -> bool:
    """Wide tier (ViT-H W=1280, S<=320): the ~63MB bf16 cell runs under
    the raised VMEM_MLP_FULLGRAD_WIDE pin. Longer sequences (L-336
    S=577) keep their measured head-chunked path regardless of fit —
    that routing was settled by full-step drives (PARITY.md)."""
    if seq > ATTN_FULLGRAD_WIDE_MAX_SEQ:
        return False
    return _attn_fullgrad_need(seq, width, heads,
                               esize) < ATTN_FULLGRAD_WIDE_BUDGET


def fused_attention_block_bwd_fullgrad(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                                       g, heads: int, eps: float = 1e-5,
                                       interpret: bool = False):
    """Returns the COMPLETE gradient set
    (dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias) — weight grads contracted
    in-kernel and fp32-accumulated across the batch grid; nothing but dx
    and the (tiny) accumulators reach HBM. Replaces the emitting kernel +
    _oneshot_attn_weight_grads XLA assembly (which wrote/re-read
    [B,S,5W] of activations AND re-ran the dxn = dqkv·wqkvᵀ matmul)."""
    b, s, w = x.shape
    esize = jnp.dtype(x.dtype).itemsize
    resident = (3 * w * w + w * w) * (esize + 4)
    per = (s * 3 * w * 8 + heads * _rup(s, 8) * s * 8
           + s * w * 4 * 6 + s * w * esize * 2 * 5)
    # wide-tier cells (W=1280) exceed the narrow budget: pin the raised
    # limit and size the tile against the wide budget instead
    if fits_attn_bwd_fullgrad(s, w, heads, esize):
        budget, pin = ATTN_FULLGRAD_BUDGET, VMEM_RAISED
    else:
        budget, pin = ATTN_FULLGRAD_WIDE_BUDGET, VMEM_MLP_FULLGRAD_WIDE
    tile = max(1, (budget - resident) // per)
    tile = min(tile, ATTN_BWD_TILE_CAP if s <= ATTN_BWD_TILE_MAX_SEQ else 1)
    while tile > 1 and b % tile:
        tile -= 1
    tile = int(tile)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_fullgrad_kernel, heads=heads, eps=eps),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, 3 * w), vec(3 * w),
                  mat(w, w), blk(w)],
        out_specs=[blk(w), mat(w, 3 * w), mat(1, 3 * w), mat(w, w),
                   mat(1, w), mat(1, w), mat(1, w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((w, 3 * w), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * w), jnp.float32),
            jax.ShapeDtypeStruct((w, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pin),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, g)


# ---------------------------------------------------------------------------
# Fused MLP sub-block backward (pre-LN ViT / post-LN BERT, optional hidden
# dropout). Per-sample recompute of LN -> fc1 -> act -> fc2 (+ the same
# PRNG keep mask as the forward), then dx in the same VMEM pass.
# ---------------------------------------------------------------------------


def mlp_bwd_cell_tile(b: int, seq: int, width: int, inter: int,
                      esize: int = 2) -> int:
    """Batch tile for the MLP bwd kernel (row-parallel, so tiling just
    fills the MXU row dim). fp32 h_pre/dact/dh + fp32 row buffers +
    double-buffered io; both fc weights resident; vmem_limit 64MB."""
    if width % 128:
        return 1
    weights = 2 * width * inter * esize
    per = (seq * inter * 4 * 3                       # fp32 h_pre/dact/dh
           + seq * width * 4 * 4                     # fp32 row buffers
           + seq * (5 * width + 2 * inter) * esize * 2)  # io, dbl-buffered
    t = max(1, (ATTN_BWD_BUDGET - weights) // per)
    t = min(t, ATTN_BWD_TILE_CAP)
    while t > 1 and b % t:
        t -= 1
    return int(t)


def _act_and_grad(h_pre, act: str):
    if act == "quick_gelu":
        sig = jax.nn.sigmoid(1.702 * h_pre)
        return h_pre * sig, sig * (1.0 + 1.702 * h_pre * (1.0 - sig))
    # exact-erf gelu (same rational erf as the forward kernel)
    from nans_clip_tpu.ops.fused_block import _erf
    cdf = 0.5 * (1.0 + _erf(h_pre * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * h_pre * h_pre) * 0.3989422804014327
    return h_pre * cdf, cdf + h_pre * pdf


def _mlp_bwd_math(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  seed_ref, g_ref, *, act: str, eps: float, post_ln: bool,
                  hid_drop: float):
    """Shared recompute+backward body for the MLP bwd kernels. Returns
    (dx, xn, h, dh_pre, dproj, lnstat, dxn) as flat [T*S, .] fp32/bf16
    arrays — the emitting and the full-gradient kernels differ only in
    what they do with them."""
    # the cell may hold T samples: the whole sub-block is row-parallel so
    # everything flattens to [T*S, .]; only the PRNG keep-mask draws are
    # per sample (seeded by GLOBAL index — the same stream at any tile)
    t, seq, w = x_ref.shape
    x = x_ref[:].reshape(t * seq, w)
    g = g_ref[:].reshape(t * seq, w).astype(jnp.float32)

    # ---- forward recompute ----
    xf = x.astype(jnp.float32)
    gamma = s_ref[:].astype(jnp.float32)
    if post_ln:
        xn = x
        xnf = xf
        xhat = None
    else:
        xhat, rstd_in = _ln_fwd_stats(xf, eps)
        xnf = xhat * gamma + b_ref[:].astype(jnp.float32)
        xn = xnf.astype(x.dtype)
    h_pre = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[:].astype(jnp.float32)
    h_f, dact = _act_and_grad(h_pre, act)
    h = h_f.astype(x.dtype)
    proj = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    proj = proj + b2_ref[:].astype(jnp.float32)
    if hid_drop > 0.0:
        mults = []
        for tt in range(t):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * t + tt)
            mults.append(jnp.where(_keep_mask((seq, w), hid_drop),
                                   1.0 / (1.0 - hid_drop), 0.0))
        hmult = jnp.concatenate(mults, axis=0) if t > 1 else mults[0]
        proj = proj * hmult

    # ---- backward ----
    if post_ln:
        u = xf + proj
        uhat, rstd = _ln_fwd_stats(u, eps)
        du = _ln_bwd(g, gamma, uhat, rstd)
        dproj = du
        lnstat = uhat
    else:
        du = g                       # residual path
        dproj = g
        lnstat = xhat
    if hid_drop > 0.0:
        dproj = dproj * hmult

    dh = jax.lax.dot_general(dproj.astype(x.dtype), w2_ref[:],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh_pre = dh * dact
    dxn = jax.lax.dot_general(dh_pre.astype(x.dtype), w1_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if post_ln:
        dx = du + dxn
    else:
        # LN backward through the input normalization
        dxhat = dxn * gamma
        mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean_dx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = du + rstd_in * (dxhat - mean_d - xhat * mean_dx)
    return dx, xn, h, dh_pre, dproj, lnstat, dxn


def _mlp_bwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    seed_ref, g_ref,
                    dx_ref, xn_ref, h_ref, dhpre_ref, dproj_ref, lnstat_ref,
                    dxn_ref, *, act: str, eps: float, post_ln: bool,
                    hid_drop: float):
    t, seq, w = x_ref.shape
    dx, xn, h, dh_pre, dproj, lnstat, dxn = _mlp_bwd_math(
        x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref,
        g_ref, act=act, eps=eps, post_ln=post_ln, hid_drop=hid_drop)
    i = h.shape[-1]
    sh3 = lambda c: (t, seq, c)
    dx_ref[:] = dx.reshape(sh3(w)).astype(dx_ref.dtype)
    xn_ref[:] = xn.reshape(sh3(w)).astype(xn_ref.dtype)
    h_ref[:] = h.reshape(sh3(i)).astype(h_ref.dtype)
    dhpre_ref[:] = dh_pre.reshape(sh3(i)).astype(dhpre_ref.dtype)
    dproj_ref[:] = dproj.reshape(sh3(w)).astype(dproj_ref.dtype)
    lnstat_ref[:] = lnstat.reshape(sh3(w)).astype(lnstat_ref.dtype)
    dxn_ref[:] = dxn.reshape(sh3(w)).astype(dxn_ref.dtype)


def fused_mlp_block_bwd(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, g,
                        act: str = "quick_gelu", eps: float = 1e-5,
                        post_ln: bool = False, hid_drop: float = 0.0,
                        interpret: bool = False):
    """Returns (dx, xn, h, dh_pre, dproj, lnstat, dxn); weight grads:
        dw1 = einsum('bsw,bsi->wi', xn, dh_pre)   db1 = sum(dh_pre)
        dw2 = einsum('bsi,bsw->iw', h, dproj)     db2 = sum(dproj)
        pre-LN:  d_scale = sum(dxn * lnstat)      d_bias = sum(dxn)
        post-LN: d_scale = sum(g * lnstat)        d_bias = sum(g)
    """
    b, s, w = x.shape
    i = w1.shape[-1]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    tile = mlp_bwd_cell_tile(b, s, w, i, jnp.dtype(x.dtype).itemsize)
    vec = lambda d: pl.BlockSpec((d,), lambda idx: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda idx: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda idx: (idx, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, act=act, eps=eps, post_ln=post_ln,
                          hid_drop=hid_drop),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, i), vec(i), mat(i, w),
                  vec(w), pl.BlockSpec(memory_space=pltpu.SMEM), blk(w)],
        out_specs=[blk(w), blk(w), blk(i), blk(i), blk(w), blk(w), blk(w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, i), x.dtype),
            jax.ShapeDtypeStruct((b, s, i), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, g)


# ---------------------------------------------------------------------------
# FULL-gradient MLP backward: same recompute+dx as fused_mlp_block_bwd,
# but the weight gradients are contracted IN-KERNEL and accumulated in
# fp32 VMEM across the (sequential) batch grid — constant-index output
# blocks stay VMEM-resident between grid steps and flush once at the end.
# This removes the [B,S,·] intermediate tensors (xn, h, dh_pre, dproj,
# lnstat, dxn ≈ 11·S·W·B bytes/layer) that the emitting kernel writes to
# HBM for XLA weight-grad einsums to re-read: at ViT-B bs512 that round
# trip is ~2.3 GB/layer of pure HBM traffic in a bwd pass the round-2
# breakdown measured at 83.5 TFLOP/s vs the forward's 142.3 (bench_breakdown).
# ---------------------------------------------------------------------------


def fits_mlp_bwd_fullgrad(seq: int, width: int, inter: int,
                          esize: int = 2) -> bool:
    """VMEM: both weights (io dtype) + both fp32 grad accumulators
    resident (6·W·I bytes ≈ 28 MB at W=768 bf16) + one sample's fp32 live
    set. fp32 inputs double the weight term: the S=52/W=1024 cell fits in
    bf16 (55 MB) but NOT in fp32 (67 MB > the 64 MB pin) — the r3
    on-chip FD test caught the esize-blind version of this gate."""
    weights_and_accums = 2 * width * inter * esize + 2 * width * inter * 4
    live = _rup(seq, 8) * (inter * 4 * 4 + width * 4 * 6)
    return weights_and_accums + live < MLP_FULLGRAD_BUDGET


def _mlp_fullgrad_need(seq: int, width: int, inter: int, esize: int):
    """(resident, per-tile) VMEM bytes — the wrapper's exact accounting,
    shared with the wide-tier gate so they cannot drift."""
    resident = 2 * width * inter * esize + 2 * width * inter * 4
    per = (_rup(seq, 8) * inter * 4 * 3 + _rup(seq, 8) * width * 4 * 4
           + _rup(seq, 8) * (5 * width + 2 * inter) * esize * 2)
    return resident, per


def fits_mlp_bwd_fullgrad_wide(seq: int, width: int, inter: int,
                               esize: int = 2) -> bool:
    """Wide tier (W=1024-class cells whose resident accumulators alone
    exceed the 64MB pin): one tile fits the raised VMEM_MLP_FULLGRAD_WIDE
    pin's budget for bf16 ViT-L224 image (S=257/W=1024, ~82MB); W=1280
    (~118MB), S=577 (~120MB) and fp32 W=1024 (~113MB) fit no pin.

    NOT ROUTED (opt-in only): the admitted cell compiles and is
    gradient-exact on chip, but LOST the full ViT-L224 train step
    (177.2 vs 185.3 pairs/s) — at tile=1 the in-kernel wgrad
    contractions see only S rows per grid step, costing more MXU
    efficiency than the saved [B,S,I] HBM round trips. All wide cells
    keep the XLA-recompute vjp (gates.py MLP_FULLGRAD_WIDE_BUDGET)."""
    resident, per = _mlp_fullgrad_need(seq, width, inter, esize)
    return resident + per < MLP_FULLGRAD_WIDE_BUDGET


def _mlp_bwd_fullgrad_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                             b2_ref, seed_ref, g_ref,
                             dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                             dsc_ref, dbi_ref, *, act: str, eps: float,
                             post_ln: bool, hid_drop: float):
    t, seq, w = x_ref.shape
    dx, xn, h, dh_pre, dproj, lnstat, dxn = _mlp_bwd_math(
        x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref,
        g_ref, act=act, eps=eps, post_ln=post_ln, hid_drop=hid_drop)
    dx_ref[:] = dx.reshape(t, seq, w).astype(dx_ref.dtype)

    # weight-grad contractions over the cell's rows (dim 0 of both), MXU
    # shapes [W, T*S]x[T*S, I]; inputs cast to the io dtype to match the
    # XLA einsum path's numerics (it read bf16 kernel outputs)
    xdt = x_ref.dtype
    dw1_c = jax.lax.dot_general(xn.astype(xdt), dh_pre.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(h.astype(xdt), dproj.astype(xdt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db1_c = jnp.sum(dh_pre, axis=0, keepdims=True)
    db2_c = jnp.sum(dproj, axis=0, keepdims=True)
    gsrc = (g_ref[:].reshape(t * seq, w).astype(jnp.float32)
            if post_ln else dxn)
    dsc_c = jnp.sum(gsrc * lnstat.astype(jnp.float32), axis=0, keepdims=True)
    dbi_c = jnp.sum(gsrc, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = dw1_c
        db1_ref[:] = db1_c
        dw2_ref[:] = dw2_c
        db2_ref[:] = db2_c
        dsc_ref[:] = dsc_c
        dbi_ref[:] = dbi_c

    @pl.when(pl.program_id(0) > 0)
    def _():
        dw1_ref[:] += dw1_c
        db1_ref[:] += db1_c
        dw2_ref[:] += dw2_c
        db2_ref[:] += db2_c
        dsc_ref[:] += dsc_c
        dbi_ref[:] += dbi_c


def fused_mlp_block_bwd_fullgrad(x, ln_scale, ln_bias, w1, b1, w2, b2, seed,
                                 g, act: str = "quick_gelu",
                                 eps: float = 1e-5, post_ln: bool = False,
                                 hid_drop: float = 0.0,
                                 interpret: bool = False):
    """Returns (dx, dw1, db1, dw2, db2, d_scale, d_bias); the dw/db/d_*
    accumulators are fp32 [·,·]/[1,·] — callers cast to the param dtype.
    Same PRNG stream contract as fused_mlp_block_bwd (per-sample global
    index seeding), so in-kernel dropout training is supported."""
    b, s, w = x.shape
    i = w1.shape[-1]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
    # resident set = weights (io dtype) + fp32 accumulators; the per-tile
    # live set divides what's left (tiling only pays at short seqs — same
    # finding as attn_bwd_cell_tile — so the cap matches). Cells the
    # narrow gate admits keep the r2-validated 64MB pin and tile sizing;
    # wide-tier cells (resident accums alone near the 64MB pin) pin
    # VMEM_MLP_FULLGRAD_WIDE and run tile=1 — an OPT-IN path only:
    # measured SLOWER in the full L224 train step (177.2 vs 185.3
    # pairs/s — tile=1 leaves the in-kernel wgrad contractions only S
    # rows per grid step vs XLA's one [B*S]-row batched contraction),
    # so the dispatch never routes it (gates.py provenance).
    esize = jnp.dtype(x.dtype).itemsize
    resident, per = _mlp_fullgrad_need(s, w, i, esize)
    if (resident + per <= MLP_FULLGRAD_BUDGET
            or fits_mlp_bwd_fullgrad(s, w, i, esize)):
        budget, pin = MLP_FULLGRAD_BUDGET, VMEM_RAISED
    else:
        budget, pin = MLP_FULLGRAD_WIDE_BUDGET, VMEM_MLP_FULLGRAD_WIDE
    tile = max(1, (budget - resident) // per)
    tile = min(tile, ATTN_BWD_TILE_CAP if s <= ATTN_BWD_TILE_MAX_SEQ else 1)
    while tile > 1 and b % tile:
        tile -= 1
    tile = int(tile)
    vec = lambda d: pl.BlockSpec((d,), lambda idx: (0,), memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c), lambda idx: (0, 0), memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((tile, s, c), lambda idx: (idx, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_bwd_fullgrad_kernel, act=act, eps=eps,
                          post_ln=post_ln, hid_drop=hid_drop),
        grid=(b // tile,),
        in_specs=[blk(w), vec(w), vec(w), mat(w, i), vec(i), mat(i, w),
                  vec(w), pl.BlockSpec(memory_space=pltpu.SMEM), blk(w)],
        out_specs=[blk(w), mat(w, i), mat(1, i), mat(i, w), mat(1, w),
                   mat(1, w), mat(1, w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((w, i), jnp.float32),
            jax.ShapeDtypeStruct((1, i), jnp.float32),
            jax.ShapeDtypeStruct((i, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pin),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2, seed, g)


# ---------------------------------------------------------------------------
# Chunked + batch-tiled MLP backward for the PRE-LN (ViT) sub-block at
# seq/width where the single-cell kernel exceeds VMEM (fits_fused_mlp_bwd
# is False, e.g. ViT-B S=197). Pre-LN needs only ONE sweep over the
# intermediate dimension: the residual makes dproj = g directly (no final
# LN, no dropout on this path), so each (batch_tile, chunk) cell computes
# its h / dh_pre slices and accumulates dxn; the last chunk finishes the
# input-LN backward.
# ---------------------------------------------------------------------------


def _mlp_bwd_chunked_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                            g_ref, dx_ref, xn_ref, h_ref, dhpre_ref, dxn_ref,
                            acc_ref, *, act: str, eps: float, n_chunks: int):
    c = pl.program_id(1)
    t, s, w = x_ref.shape
    x = x_ref[:].reshape(t * s, w)
    g = g_ref[:].reshape(t * s, w).astype(jnp.float32)

    xf = x.astype(jnp.float32)
    gamma = s_ref[:].astype(jnp.float32)
    xhat, rstd = _ln_fwd_stats(xf, eps)
    xnf = xhat * gamma + b_ref[:].astype(jnp.float32)
    xn = xnf.astype(x.dtype)

    h_pre = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[:].astype(jnp.float32)
    h_c, dact = _act_and_grad(h_pre, act)
    dh = jax.lax.dot_general(g.astype(x.dtype), w2_ref[:],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh_pre = dh * dact
    part = jax.lax.dot_general(dh_pre.astype(x.dtype), w1_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = part
        xn_ref[:] = xn.reshape(t, s, w).astype(xn_ref.dtype)

    @pl.when(c > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    h_ref[:] = h_c.reshape(t, s, -1).astype(h_ref.dtype)
    dhpre_ref[:] = dh_pre.reshape(t, s, -1).astype(dhpre_ref.dtype)

    @pl.when(c == n_chunks - 1)
    def _():
        dxn = acc_ref[:]
        dxhat = dxn * gamma
        mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean_dx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = g + rstd * (dxhat - mean_d - xhat * mean_dx)
        dx_ref[:] = dx.reshape(t, s, w).astype(dx_ref.dtype)
        dxn_ref[:] = dxn.reshape(t, s, w).astype(dxn_ref.dtype)


def mlp_bwd_chunk_tile(b: int, seq: int, width: int, inter: int):
    """(chunk, batch_tile) for the chunked MLP bwd; None if infeasible.
    Mosaic needs width lane-aligned to collapse the (T, S, W) views."""
    if width % 128:
        return None
    # power-of-two chunks only: Mosaic tiles the 1-D bias at 1024 lanes
    # and the block must divide that tiling. Both fc weight chunks are
    # VMEM-resident: 2 * (width x chunk) bf16. A batch tile of at least 2
    # is REQUIRED: at tile=1 the kernel re-streams weight chunks per
    # sample and measured SLOWER than the XLA vjp (598 vs 657 pairs/s at
    # ViT-B bs256) — the same pathology as the round-1 tiled forward.
    for c in (1024, 512, 256):
        if inter % c:
            continue
        weights = 4 * width * c * 2
        # per sample: x/g/dx/xn/dxn tiles (bf16, in+out double-buffered) +
        # h/dh_pre chunk outputs (bf16) + fp32 h_pre/dact/dh intermediates
        per_sample = seq * (width * 12 + c * (4 + 12))
        t = (10 * 1024 * 1024 - weights) // per_sample
        while t > 1 and b % t:
            t -= 1
        if t >= 2:
            return c, int(t)
    return None


def fused_mlp_block_bwd_chunked(x, ln_scale, ln_bias, w1, b1, w2, g,
                                act: str, eps: float, chunk: int, tile: int,
                                interpret: bool = False):
    """Returns (dx, xn, h, dh_pre, dxn) for the pre-LN MLP; weight grads:
        dw1 = einsum('bsw,bsi->wi', xn, dh_pre)   db1 = sum(dh_pre)
        dw2 = einsum('bsi,bsw->iw', h, g)         db2 = sum(g)
        d_scale = sum(dxn * xhat)                 d_bias = sum(dxn)
    """
    b, s, w = x.shape
    i = w1.shape[-1]
    assert i % chunk == 0 and b % tile == 0
    n_chunks = i // chunk
    vec = lambda d: pl.BlockSpec((d,), lambda bb, cc: (0,), memory_space=pltpu.VMEM)
    tw = lambda: pl.BlockSpec((tile, s, w), lambda bb, cc: (bb, 0, 0),
                              memory_space=pltpu.VMEM)
    tc = lambda: pl.BlockSpec((tile, s, chunk), lambda bb, cc: (bb, 0, cc),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_bwd_chunked_kernel, act=act, eps=eps,
                          n_chunks=n_chunks),
        grid=(b // tile, n_chunks),
        in_specs=[
            tw(), vec(w), vec(w),
            pl.BlockSpec((w, chunk), lambda bb, cc: (0, cc), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda bb, cc: (cc,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w), lambda bb, cc: (cc, 0), memory_space=pltpu.VMEM),
            tw(),
        ],
        out_specs=[tw(), tw(), tc(), tc(), tw()],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, i), x.dtype),
            jax.ShapeDtypeStruct((b, s, i), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tile * s, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, g)


# ---------------------------------------------------------------------------
# Head-chunked pre-LN attention backward for widths/seqs where the
# single-cell kernel exceeds VMEM (ViT-L/H: the all-heads prob stack +
# fused-QKV weight don't fit). Grid (batch, head_chunk): each cell
# recomputes LN once, processes its local heads' probs/grads, accumulates
# the dx contribution across chunks in scratch, and finishes the LN
# backward on the last chunk. This also replaces the XLA fallback's
# [B, H, S, S] prob materialization (5.4 GB at ViT-L bs128) with per-cell
# VMEM tiles — it is what makes big-model training fit HBM at all.
# ---------------------------------------------------------------------------


def _attn_bwd_chunked_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref,
                             wo_ref, g_ref,
                             dx_ref, xn_ref, ctx_ref, dqkv_ref,
                             acc_ref, *, hpc: int, n_chunks: int, dh: int,
                             eps: float):
    c = pl.program_id(1)
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    w = x.shape[-1]
    scale = 1.0 / math.sqrt(dh)

    xf = x.astype(jnp.float32)
    gamma = s1_ref[:].astype(jnp.float32)
    xhat, rstd = _ln_fwd_stats(xf, eps)
    xn = (xhat * gamma + b1_ref[:].astype(jnp.float32)).astype(x.dtype)

    ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for j in range(hpc):
        wj = wqkv_ref[j]                              # [W, 3*dh]
        bj = bqkv_ref[j, 0].astype(jnp.float32)
        qkv = jnp.dot(xn, wj, preferred_element_type=jnp.float32) + bj
        q = qkv[:, :dh].astype(x.dtype)
        k = qkv[:, dh:2 * dh].astype(x.dtype)
        v = qkv[:, 2 * dh:].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(x.dtype)
        ctx_parts.append(jnp.dot(pb, v, preferred_element_type=jnp.float32))

        # dctx_j = g @ wo_j^T with wo_j = wo_ref[j*dh:(j+1)*dh, :]  [dh, W]
        dctx_j = jax.lax.dot_general(
            g.astype(x.dtype), wo_ref[j * dh:(j + 1) * dh, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)  # [S, dh]
        dv_parts.append(jax.lax.dot_general(pb, dctx_j,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(dctx_j, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dsb = ds.astype(x.dtype)
        dq_parts.append(jnp.dot(dsb, k, preferred_element_type=jnp.float32) * scale)
        dk_parts.append(jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32) * scale)

    ctx = jnp.concatenate(ctx_parts, axis=-1)         # [S, hpc*dh]
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_parts, axis=-1),
         jnp.concatenate(dk_parts, axis=-1),
         jnp.concatenate(dv_parts, axis=-1)], axis=-1)  # [S, 3*hpc*dh]

    # dxn contribution from this chunk: per head dqkv_j @ wj^T
    part = jnp.zeros((x.shape[0], w), jnp.float32)
    ld = hpc * dh
    for j in range(hpc):
        dqkv_j = jnp.concatenate(
            [dqkv[:, j * dh:(j + 1) * dh],
             dqkv[:, ld + j * dh:ld + (j + 1) * dh],
             dqkv[:, 2 * ld + j * dh:2 * ld + (j + 1) * dh]],
            axis=-1).astype(x.dtype)                  # [S, 3*dh]
        part = part + jax.lax.dot_general(
            dqkv_j, wqkv_ref[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = part
        xn_ref[0] = xn.astype(xn_ref.dtype)

    @pl.when(c > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    ctx_ref[0, 0] = ctx.astype(ctx_ref.dtype)
    dqkv_ref[0, 0] = dqkv.astype(dqkv_ref.dtype)

    @pl.when(c == n_chunks - 1)
    def _():
        dxn = acc_ref[:]
        dxhat = dxn * gamma
        mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean_dx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = g + rstd * (dxhat - mean_d - xhat * mean_dx)
        dx_ref[0] = dx.astype(dx_ref.dtype)


def attn_bwd_head_chunk(seq: int, width: int, heads: int):
    """Pick heads-per-chunk so the cell fits VMEM, or None. The 24MB
    budget targets the call's 64MB vmem pin (double-buffered); at the
    L-336 cell (S=577, W=1024) it picks hpc=4 — the same-process optimum
    (9.709 ms block fwd+grad vs 10.111 at hpc=2, 10.392 at hpc=8, and
    11.024 for the flash-block path it replaced)."""
    dh = width // heads
    for hpc in (8, 4, 2, 1):
        if heads % hpc:
            continue
        weights = hpc * width * 3 * dh * 2 + hpc * dh * width * 2
        probs = 2 * _rup(seq, 8) * seq * 4 * max(1, hpc // 2)
        acts = _rup(seq, 8) * (width * 16 + 3 * hpc * dh * 8)
        if weights + probs + acts < HEAD_CHUNK_BUDGET:
            return hpc
    return None


def fused_attention_block_bwd_chunked(x, ln_scale, ln_bias, wqkv, bqkv, wo,
                                      g, heads: int, hpc: int,
                                      eps: float = 1e-5,
                                      interpret: bool = False):
    """Returns (dx, xn, ctx_h, dqkv_h) with ctx_h [B, C, S, hpc*dh] and
    dqkv_h [B, C, S, 3*hpc*dh] in per-head-chunk layout; the caller forms
    weight grads via assemble_chunked_attn_weight_grads()."""
    b, s, w = x.shape
    dh = w // heads
    n_chunks = heads // hpc
    wqkv_h = wqkv.reshape(w, 3, heads, dh).transpose(2, 0, 1, 3).reshape(heads, w, 3 * dh)
    bqkv_h = bqkv.reshape(3, heads, dh).transpose(1, 0, 2).reshape(heads, 1, 3 * dh)
    vec = lambda d: pl.BlockSpec((d,), lambda i, cc: (0,), memory_space=pltpu.VMEM)
    blkw = lambda: pl.BlockSpec((1, s, w), lambda i, cc: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_chunked_kernel, hpc=hpc,
                          n_chunks=n_chunks, dh=dh, eps=eps),
        grid=(b, n_chunks),
        in_specs=[
            blkw(), vec(w), vec(w),
            pl.BlockSpec((hpc, w, 3 * dh), lambda i, cc: (cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hpc, 1, 3 * dh), lambda i, cc: (cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hpc * dh, w), lambda i, cc: (cc, 0),
                         memory_space=pltpu.VMEM),
            blkw(),
        ],
        out_specs=[
            blkw(), blkw(),
            pl.BlockSpec((1, 1, s, hpc * dh), lambda i, cc: (i, cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, 3 * hpc * dh), lambda i, cc: (i, cc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, n_chunks, s, hpc * dh), x.dtype),
            jax.ShapeDtypeStruct((b, n_chunks, s, 3 * hpc * dh), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((s, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_RAISED),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_h, bqkv_h, wo, g)


def assemble_chunked_attn_weight_grads(x, xn, ctx_h, dqkv_h, g, heads: int,
                                       hpc: int, ln_scale, ln_bias, wqkv,
                                       eps: float):
    """Weight/LN grads from the chunked bwd outputs (batched XLA einsums)."""
    b, n_chunks, s, _ = ctx_h.shape
    w = x.shape[-1]
    dh = w // heads
    gf = g.astype(jnp.float32)
    # dwqkv: [C, W, 3*hpc*dh] -> (3, H, dh) column view of [W, 3W]
    dwqkv_h = jnp.einsum("bsw,bcsu->cwu", xn, dqkv_h,
                         preferred_element_type=jnp.float32)
    dwqkv = dwqkv_h.reshape(n_chunks, w, 3, hpc, dh)
    dwqkv = dwqkv.transpose(1, 2, 0, 3, 4).reshape(w, 3 * w)
    dbqkv_h = jnp.sum(dqkv_h.astype(jnp.float32), axis=(0, 2))
    dbqkv = dbqkv_h.reshape(n_chunks, 3, hpc, dh).transpose(1, 0, 2, 3).reshape(3 * w)
    # dwo rows are head-major: [C, hpc*dh, W] stacks straight into [W, W]
    dwo = jnp.einsum("bcsu,bsw->cuw", ctx_h, gf,
                     preferred_element_type=jnp.float32).reshape(w, w)
    dbo = jnp.sum(gf, axis=(0, 1))
    # LN param grads via dxn = dqkv @ wqkv^T; build the weight in the
    # kernel's dqkv layout — qkv-major (3, hpc, dh) per chunk
    wqkv_h = wqkv.reshape(w, 3, n_chunks, hpc, dh)
    wqkv_h = wqkv_h.transpose(2, 0, 1, 3, 4).reshape(n_chunks, w,
                                                     3 * hpc * dh)
    dxn = jnp.einsum("bcsu,cwu->bsw", dqkv_h.astype(jnp.float32),
                     wqkv_h.astype(jnp.float32))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    d_scale = jnp.sum(dxn * xhat, axis=(0, 1)).astype(ln_scale.dtype)
    d_bias = jnp.sum(dxn, axis=(0, 1)).astype(ln_bias.dtype)
    return (d_scale, d_bias, dwqkv.astype(wqkv.dtype),
            dbqkv.astype(jnp.float32), dwo, dbo)
