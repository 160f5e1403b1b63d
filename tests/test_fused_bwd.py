"""Fused attention-block backward kernel vs jax.vjp of the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.ops.fused_block import _reference_block
from nans_clip_tpu.ops.fused_block_bwd import fused_attention_block_bwd

INTERPRET = jax.default_backend() != "tpu"


def test_bwd_kernel_matches_vjp():
    B, S, W, H = 2, 52, 64, 4
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    wqkv = jnp.asarray(0.1 * rs.randn(W, 3 * W), jnp.float32)
    bqkv = jnp.asarray(0.1 * rs.randn(3 * W), jnp.float32)
    wo = jnp.asarray(0.1 * rs.randn(W, W), jnp.float32)
    bo = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=H, eps=1e-5),
                     x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)

    from nans_clip_tpu.ops.fused_block import _oneshot_attn_weight_grads

    dx, xn, ctx, dqkv = fused_attention_block_bwd(
        x, ln_s, ln_b, wqkv, bqkv, wo, g, H, 1e-5, INTERPRET)
    # the SHIPPED assembly (shared by the narrow and wide custom_vjps)
    d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = _oneshot_attn_weight_grads(
        x, xn, ctx, dqkv, g, wqkv, ln_s, ln_b, 1e-5)

    ours = (dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo)
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 1e-3 * mag, (name, err, mag)


def _bert_args(seed=1, B=2, S=52, W=64):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    wqkv = jnp.asarray(0.1 * rs.randn(W, 3 * W), jnp.float32)
    bqkv = jnp.asarray(0.1 * rs.randn(3 * W), jnp.float32)
    wo = jnp.asarray(0.1 * rs.randn(W, W), jnp.float32)
    bo = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[:, 40:] = 0.0
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    g = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    return x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, g


def test_bert_bwd_kernel_matches_vjp():
    """BERT post-LN/masked bwd kernel (rate 0 — the dropout path needs the
    hardware PRNG and is validated on TPU in test_tpu_dropout.py)."""
    from nans_clip_tpu.ops.fused_block_bwd import fused_bert_attention_block_bwd
    H = 4
    x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, g = _bert_args()

    _, vjp = jax.vjp(
        lambda *a: _reference_block(*a, heads=H, eps=1e-12,
                                    key_bias=key_bias, post_ln=True),
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)

    dx, dqkv, ctx, dproj, uhat = fused_bert_attention_block_bwd(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, None, g, H, 1e-12,
        0.0, 0.0, INTERPRET)
    dwqkv = jnp.einsum("bsw,bsu->wu", x, dqkv)
    dbqkv = jnp.sum(dqkv, axis=(0, 1))
    dwo = jnp.einsum("bsw,bsu->wu", ctx, dproj)
    dbo = jnp.sum(dproj, axis=(0, 1))
    d_scale = jnp.sum(g * uhat, (0, 1))
    d_bias = jnp.sum(g, (0, 1))

    ours = (dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo)
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 1e-3 * mag, (name, err, mag)


def test_bwd_fullgrad_kernels_match_vjp():
    """Full-gradient attention bwd kernels (pre-LN and BERT post-LN):
    in-kernel weight grads, accumulated across a multi-step batch grid."""
    from nans_clip_tpu.ops.fused_block_bwd import (
        fits_attn_bwd_fullgrad, fused_attention_block_bwd_fullgrad,
        fused_bert_attention_block_bwd_fullgrad)

    assert fits_attn_bwd_fullgrad(197, 768, 12)       # ViT-B routed
    assert fits_attn_bwd_fullgrad(257, 1024, 16)      # ViT-L routed
    assert not fits_attn_bwd_fullgrad(577, 1024, 16)  # L-336 chunked
    assert not fits_attn_bwd_fullgrad(257, 1280, 16)  # H keeps emitting
    # dtype-awareness (r3: the esize-blind gate let an fp32 W=1024 MLP
    # cell bust the 64MB pin by 28KB on chip)
    from nans_clip_tpu.ops.fused_block_bwd import (
        fits_mlp_bwd_fullgrad, fits_mlp_bwd_fullgrad_wide)
    assert fits_mlp_bwd_fullgrad(52, 1024, 4096, 2)       # bf16 H text
    assert not fits_mlp_bwd_fullgrad(52, 1024, 4096, 4)   # fp32 busts pin
    # wide tier: L224 image MLP only (the one W=1024-class cell that fits)
    assert fits_mlp_bwd_fullgrad_wide(257, 1024, 4096, 2)
    assert not fits_mlp_bwd_fullgrad_wide(257, 1280, 5120, 2)  # ViT-H
    assert not fits_mlp_bwd_fullgrad_wide(577, 1024, 4096, 2)  # L-336
    assert not fits_mlp_bwd_fullgrad_wide(257, 1024, 4096, 4)  # fp32

    H = 4
    # S=197 pins tile=1 -> a 4-step grid, exercising the fp32 VMEM
    # accumulation across grid steps
    x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, g = _bert_args(B=4, S=197)

    # --- pre-LN (no mask) ---
    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=H, eps=1e-5),
                     x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)
    out = fused_attention_block_bwd_fullgrad(
        x, ln_s, ln_b, wqkv, bqkv, wo, g, H, 1e-5, INTERPRET)
    dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias = out
    ours = (dx, d_scale.reshape(-1), d_bias.reshape(-1), dwqkv,
            dbqkv.reshape(-1), dwo, dbo.reshape(-1))
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 1e-3 * mag, ("pre_ln", name, err, mag)

    # --- BERT post-LN, masked ---
    _, vjp = jax.vjp(
        lambda *a: _reference_block(*a, heads=H, eps=1e-12,
                                    key_bias=key_bias, post_ln=True),
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)
    out = fused_bert_attention_block_bwd_fullgrad(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, None, g, H, 1e-12,
        0.0, 0.0, INTERPRET)
    dx, dwqkv, dbqkv, dwo, dbo, d_scale, d_bias = out
    ours = (dx, d_scale.reshape(-1), d_bias.reshape(-1), dwqkv,
            dbqkv.reshape(-1), dwo, dbo.reshape(-1))
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 1e-3 * mag, ("post_ln", name, err, mag)


def test_mlp_bwd_kernel_matches_vjp():
    from nans_clip_tpu.ops.fused_block import _reference_mlp
    from nans_clip_tpu.ops.fused_block_bwd import fused_mlp_block_bwd
    import pytest

    for act, post_ln in (("quick_gelu", False), ("gelu", True)):
        B, S, W, I = 2, 52, 64, 256
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
        ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
        ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
        w1 = jnp.asarray(0.1 * rs.randn(W, I), jnp.float32)
        b1 = jnp.asarray(0.1 * rs.randn(I), jnp.float32)
        w2 = jnp.asarray(0.1 * rs.randn(I, W), jnp.float32)
        b2 = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
        g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

        _, vjp = jax.vjp(
            lambda *a: _reference_mlp(*a, act=act, eps=1e-5, post_ln=post_ln),
            x, ln_s, ln_b, w1, b1, w2, b2)
        ref = vjp(g)

        dx, xn, h, dh_pre, dproj, lnstat, dxn = fused_mlp_block_bwd(
            x, ln_s, ln_b, w1, b1, w2, b2, None, g, act, 1e-5, post_ln,
            0.0, INTERPRET)
        dw1 = jnp.einsum("bsw,bsi->wi", xn, dh_pre)
        db1 = jnp.sum(dh_pre, axis=(0, 1))
        dw2 = jnp.einsum("bsi,bsw->iw", h, dproj)
        db2 = jnp.sum(dproj, axis=(0, 1))
        gsrc = g if post_ln else dxn
        d_scale = jnp.sum(gsrc * lnstat, (0, 1))
        d_bias = jnp.sum(gsrc, (0, 1))

        ours = (dx, d_scale, d_bias, dw1, db1, dw2, db2)
        for name, a, b in zip(("dx", "d_scale", "d_bias", "dw1", "db1",
                               "dw2", "db2"), ours, ref):
            err = float(jnp.abs(a - b).max())
            mag = max(float(jnp.abs(b).max()), 1.0)
            assert err < 2e-3 * mag, (act, post_ln, name, err, mag)


def test_mlp_bwd_fullgrad_matches_vjp():
    """The full-gradient kernel (in-kernel weight-grad accumulation over
    the batch grid) returns the COMPLETE gradient set; checked against
    the XLA vjp at a multi-tile grid so the accumulation path runs."""
    from nans_clip_tpu.ops.fused_block import _reference_mlp
    from nans_clip_tpu.ops.fused_block_bwd import (
        fits_mlp_bwd_fullgrad, fused_mlp_block_bwd_fullgrad)

    assert fits_mlp_bwd_fullgrad(197, 768, 3072)       # ViT-B routed
    assert fits_mlp_bwd_fullgrad(52, 1024, 4096)       # RoBERTa-large
    assert not fits_mlp_bwd_fullgrad(257, 1024, 4096)  # ViT-L excluded

    for act, post_ln in (("quick_gelu", False), ("gelu", True)):
        # S=197 pins tile=1 -> a 4-step grid, so the fp32 VMEM
        # accumulation across grid steps is actually exercised
        B, S, W, I = 4, 197, 64, 256
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
        ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
        ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
        w1 = jnp.asarray(0.1 * rs.randn(W, I), jnp.float32)
        b1 = jnp.asarray(0.1 * rs.randn(I), jnp.float32)
        w2 = jnp.asarray(0.1 * rs.randn(I, W), jnp.float32)
        b2 = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
        g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

        _, vjp = jax.vjp(
            lambda *a: _reference_mlp(*a, act=act, eps=1e-5, post_ln=post_ln),
            x, ln_s, ln_b, w1, b1, w2, b2)
        ref = vjp(g)

        dx, dw1, db1, dw2, db2, d_scale, d_bias = fused_mlp_block_bwd_fullgrad(
            x, ln_s, ln_b, w1, b1, w2, b2, None, g, act, 1e-5, post_ln,
            0.0, INTERPRET)
        ours = (dx, d_scale.reshape(-1), d_bias.reshape(-1), dw1,
                db1.reshape(-1), dw2, db2.reshape(-1))
        for name, a, b in zip(("dx", "d_scale", "d_bias", "dw1", "db1",
                               "dw2", "db2"), ours, ref):
            err = float(jnp.abs(a - b).max())
            mag = max(float(jnp.abs(b).max()), 1.0)
            assert err < 2e-3 * mag, (act, post_ln, name, err, mag)


def test_chunked_mlp_bwd_kernel_matches_vjp():
    """Chunked + batch-tiled pre-LN MLP bwd (the ViT-B S=197 path)."""
    from nans_clip_tpu.ops.fused_block import _reference_mlp
    from nans_clip_tpu.ops.fused_block_bwd import (fused_mlp_block_bwd_chunked,
                                                   mlp_bwd_chunk_tile)

    B, S, W, I = 4, 20, 128, 512
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    w1 = jnp.asarray(0.1 * rs.randn(W, I), jnp.float32)
    b1 = jnp.asarray(0.1 * rs.randn(I), jnp.float32)
    w2 = jnp.asarray(0.1 * rs.randn(I, W), jnp.float32)
    b2 = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: _reference_mlp(*a, act="quick_gelu", eps=1e-5,
                                  post_ln=False),
        x, ln_s, ln_b, w1, b1, w2, b2)
    ref = vjp(g)

    dx, xn, h, dh_pre, dxn = fused_mlp_block_bwd_chunked(
        x, ln_s, ln_b, w1, b1, w2, g, "quick_gelu", 1e-5, 128, 2, INTERPRET)
    dw1 = jnp.einsum("bsw,bsi->wi", xn, dh_pre)
    db1 = jnp.sum(dh_pre, axis=(0, 1))
    dw2 = jnp.einsum("bsi,bsw->iw", h, g)
    db2 = jnp.sum(g, axis=(0, 1))
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    d_scale = jnp.sum(dxn * xhat, (0, 1))
    d_bias = jnp.sum(dxn, (0, 1))

    ours = (dx, d_scale, d_bias, dw1, db1, dw2, db2)
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dw1", "db1",
                           "dw2", "db2"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 2e-3 * mag, (name, err, mag)
    assert mlp_bwd_chunk_tile(256, 197, 768, 3072) is not None
    assert mlp_bwd_chunk_tile(256, 197, 760, 3072) is None  # lane alignment


def test_chunked_attention_bwd_kernel_matches_vjp():
    """Head-chunked pre-LN attention bwd (the ViT-L/H path)."""
    from nans_clip_tpu.ops.fused_block_bwd import (
        assemble_chunked_attn_weight_grads, attn_bwd_head_chunk,
        fused_attention_block_bwd_chunked)

    B, S, W, H, HPC = 2, 20, 128, 4, 2
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    wqkv = jnp.asarray(0.1 * rs.randn(W, 3 * W), jnp.float32)
    bqkv = jnp.asarray(0.1 * rs.randn(3 * W), jnp.float32)
    wo = jnp.asarray(0.1 * rs.randn(W, W), jnp.float32)
    bo = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=H, eps=1e-5),
                     x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)

    dx, xn, ctx_h, dqkv_h = fused_attention_block_bwd_chunked(
        x, ln_s, ln_b, wqkv, bqkv, wo, g, H, HPC, 1e-5, INTERPRET)
    d_scale, d_bias, dwqkv, dbqkv, dwo, dbo = \
        assemble_chunked_attn_weight_grads(x, xn, ctx_h, dqkv_h, g, H, HPC,
                                           ln_s, ln_b, wqkv, 1e-5)
    ours = (dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo)
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 2e-3 * mag, (name, err, mag)
    assert attn_bwd_head_chunk(257, 1024, 16) is not None
    assert attn_bwd_head_chunk(257, 1280, 16) is not None  # ViT-H


def test_bwd_kernels_batch_tiled():
    """Lane-aligned width so the bwd cells hold tile > 1 samples: the
    flattened [T*S, .] matmul phases must match the vjp oracle exactly
    like the single-sample cells do."""
    from nans_clip_tpu.ops.fused_block import _reference_mlp
    from nans_clip_tpu.ops.fused_block_bwd import (attn_bwd_cell_tile,
                                                   fused_attention_block_bwd,
                                                   fused_bert_attention_block_bwd,
                                                   fused_mlp_block_bwd,
                                                   mlp_bwd_cell_tile)
    B, S, W, I, H = 8, 20, 128, 512, 4
    assert attn_bwd_cell_tile(B, S, W, H, 4) > 1
    assert mlp_bwd_cell_tile(B, S, W, I, 4) > 1
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    wqkv = jnp.asarray(0.1 * rs.randn(W, 3 * W), jnp.float32)
    bqkv = jnp.asarray(0.1 * rs.randn(3 * W), jnp.float32)
    wo = jnp.asarray(0.1 * rs.randn(W, W), jnp.float32)
    bo = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    g = jnp.asarray(rs.randn(B, S, W), jnp.float32)

    # --- ViT pre-LN attention ---
    _, vjp = jax.vjp(lambda *a: _reference_block(*a, heads=H, eps=1e-5),
                     x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)
    dx, xn, ctx, dqkv = fused_attention_block_bwd(
        x, ln_s, ln_b, wqkv, bqkv, wo, g, H, 1e-5, INTERPRET)
    assert float(jnp.abs(dx - ref[0]).max()) < 1e-3

    # --- BERT post-LN masked attention ---
    mask = np.ones((B, S), np.float32)
    mask[:, 16:] = 0.0
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    _, vjp = jax.vjp(
        lambda *a: _reference_block(*a, heads=H, eps=1e-12,
                                    key_bias=key_bias, post_ln=True),
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    ref = vjp(g)
    dx, dqkv, ctx, dproj, uhat = fused_bert_attention_block_bwd(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias, None, g, H, 1e-12,
        0.0, 0.0, INTERPRET)
    assert float(jnp.abs(dx - ref[0]).max()) < 1e-3
    dwqkv = jnp.einsum("bsw,bsu->wu", x, dqkv)
    assert float(jnp.abs(dwqkv - ref[3]).max()) < 1e-2

    # --- MLP (both LN layouts) ---
    w1 = jnp.asarray(0.1 * rs.randn(W, I), jnp.float32)
    b1 = jnp.asarray(0.1 * rs.randn(I), jnp.float32)
    w2 = jnp.asarray(0.1 * rs.randn(I, W), jnp.float32)
    b2 = jnp.asarray(0.1 * rs.randn(W), jnp.float32)
    for act, post_ln in (("quick_gelu", False), ("gelu", True)):
        _, vjp = jax.vjp(
            lambda *a: _reference_mlp(*a, act=act, eps=1e-5, post_ln=post_ln),
            x, ln_s, ln_b, w1, b1, w2, b2)
        ref = vjp(g)
        dx, xn, h, dh_pre, dproj, lnstat, dxn = fused_mlp_block_bwd(
            x, ln_s, ln_b, w1, b1, w2, b2, None, g, act, 1e-5, post_ln,
            0.0, INTERPRET)
        assert float(jnp.abs(dx - ref[0]).max()) < 2e-3, (act, post_ln)
        dw1 = jnp.einsum("bsw,bsi->wi", xn, dh_pre)
        assert float(jnp.abs(dw1 - ref[3]).max()) < 1e-2, (act, post_ln)


def test_longseq_training_bwd_routing():
    # ViT-L-336 (S=577, W=1024): the one-shot attention bwd cell is 74MB >
    # the 48MB gate, so training backwards run the head-chunked kernel at
    # hpc=4 (same-process block fwd+grad optimum: 9.709 ms vs flash-block
    # 11.024 / XLA-recompute 15.6). The flash-block path (vit.py
    # use_flash_train) is the fallback when the chunked cell doesn't fit
    # either.
    from nans_clip_tpu.ops.fused_block_bwd import (attn_bwd_head_chunk,
                                                   fits_attention_bwd)
    assert fits_attention_bwd(257, 1024, 16)      # ViT-L @224: one-shot bwd
    assert fits_attention_bwd(257, 1280, 16)      # ViT-H @224: one-shot bwd
    assert not fits_attention_bwd(577, 1024, 16)  # L-336 -> chunked bwd
    assert attn_bwd_head_chunk(577, 1024, 16) == 4
    assert attn_bwd_head_chunk(577, 1280, 16) == 4  # hypothetical H-336


def test_wide_fullgrad_attn_gate():
    """Wide attention fullgrad tier: admitted shapes (opt-in — NOT
    routed: same-process H A/B measured exactly neutral, gates.py) and
    the S=577 exclusion that protects L-336's tuned head-chunked path."""
    from nans_clip_tpu.ops.fused_block_bwd import fits_attn_bwd_fullgrad_wide
    assert fits_attn_bwd_fullgrad_wide(257, 1280, 16, 2)   # ViT-H bf16
    assert not fits_attn_bwd_fullgrad_wide(577, 1024, 16, 2)  # L-336
