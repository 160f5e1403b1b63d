"""In-kernel dropout validation — REAL TPU only (NANS_TEST_TPU=1).

The Mosaic PRNG has no CPU/interpret implementation (interpret mode yields
zero bits), so these run on hardware:

* keep rate ≈ 1 - p and determinism w.r.t. the seed;
* gradient/mask consistency: for a FIXED seed the fused block is a plain
  deterministic function, so its custom_vjp (the bwd kernel re-seeding the
  same PRNG stream) must match directional finite differences — this fails
  if fwd and bwd keep masks ever diverge.
"""

import os

import pytest

if os.environ.get("NANS_TEST_TPU") != "1":
    pytest.skip("TPU-only: set NANS_TEST_TPU=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.ops.fused_block import (fused_bert_attention_block,
                                           fused_mlp_block)

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a TPU backend")


def _bert_args(seed=0, B=2, S=52, W=64):
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
    return x, ln_s, ln_b, wqkv, bqkv, wo, bo, key_bias


def test_bert_dropout_deterministic_and_seed_sensitive():
    x, *args, key_bias = _bert_args()
    f = jax.jit(lambda x, s: fused_bert_attention_block(
        x, *args, key_bias, 4, 1e-12, False, 0.1, 0.1, s))
    o1 = np.asarray(f(x, jnp.int32(7)))
    o2 = np.asarray(f(x, jnp.int32(7)))
    o3 = np.asarray(f(x, jnp.int32(8)))
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(o1, o3)
    # rate-0 equals the eval path
    e1 = np.asarray(jax.jit(lambda x: fused_bert_attention_block(
        x, *args, key_bias, 4, 1e-12))(x))
    e2 = np.asarray(jax.jit(lambda x, s: fused_bert_attention_block(
        x, *args, key_bias, 4, 1e-12, False, 0.0, 0.0, s))(x, jnp.int32(7)))
    np.testing.assert_allclose(e1, e2, atol=1e-6)


def test_mlp_dropout_keep_rate():
    """Hidden dropout zeroes ~p of the pre-residual projection."""
    rs = np.random.RandomState(1)
    B, S, W, I = 2, 52, 64, 256
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    ln_s = jnp.ones((W,), jnp.float32)
    ln_b = jnp.zeros((W,), jnp.float32)
    w1 = jnp.asarray(0.1 * rs.randn(W, I), jnp.float32)
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jnp.asarray(0.1 * rs.randn(I, W), jnp.float32)
    b2 = jnp.zeros((W,), jnp.float32)
    p = 0.3
    out = jax.jit(lambda x, s: fused_mlp_block(
        x, ln_s, ln_b, w1, b1, w2, b2, "quick_gelu", 1e-5, False, False,
        p, s))(x, jnp.int32(11))
    proj = np.asarray(out) - np.asarray(x)  # pre-LN: out = x + dropped(proj)
    frac_zero = float((np.abs(proj) < 1e-12).mean())
    assert abs(frac_zero - p) < 0.05, frac_zero


@pytest.mark.parametrize("which", ["attn", "mlp"])
def test_dropout_grads_match_finite_difference(which):
    """custom_vjp (bwd kernel, re-seeded PRNG) vs directional finite
    differences of the forward at a FIXED seed."""
    seed = jnp.int32(13)
    if which == "attn":
        x, *args, key_bias = _bert_args(3)
        f = lambda x: jnp.sum(jnp.sin(fused_bert_attention_block(
            x, *args, key_bias, 4, 1e-12, False, 0.1, 0.1, seed)))
    else:
        rs = np.random.RandomState(4)
        B, S, W, I = 2, 52, 64, 256
        x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
        margs = (jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32),
                 jnp.asarray(0.1 * rs.randn(W), jnp.float32),
                 jnp.asarray(0.1 * rs.randn(W, I), jnp.float32),
                 jnp.asarray(0.1 * rs.randn(I), jnp.float32),
                 jnp.asarray(0.1 * rs.randn(I, W), jnp.float32),
                 jnp.asarray(0.1 * rs.randn(W), jnp.float32))
        f = lambda x: jnp.sum(jnp.sin(fused_mlp_block(
            x, *margs, "gelu", 1e-12, True, False, 0.1, seed)))

    g = jax.jit(jax.grad(f))(x)
    fj = jax.jit(f)
    rs = np.random.RandomState(0)
    for _ in range(3):
        v = jnp.asarray(rs.randn(*x.shape), jnp.float32)
        eps = 1e-3
        fd = (float(fj(x + eps * v)) - float(fj(x - eps * v))) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(an)), (which, fd, an)


def _wide_bert_args(seed=0, B=8, S=52, W=128):
    """Lane-aligned width so attn_cell_tile/mlp_cell_tile pick tile > 1."""
    return _bert_args(seed, B=B, S=S, W=W)


def test_dropout_batch_tile_invariance():
    """Per-sample PRNG seeding makes the output independent of the batch
    tile: the same batch run at tile=1 and at the natural tile>1 must be
    bitwise identical (the bwd kernels rely on exactly this invariance)."""
    import nans_clip_tpu.ops.fused_block as fb

    x, *args, key_bias = _wide_bert_args(5)
    natural = fb.attn_cell_tile(x.shape[0], x.shape[1], x.shape[2], 4,
                                4, dropout=True)
    assert natural > 1, f"shape too small to tile: {natural}"

    f = jax.jit(lambda x, s: fused_bert_attention_block(
        x, *args, key_bias, 4, 1e-12, False, 0.1, 0.1, s))
    tiled = np.asarray(f(x, jnp.int32(3)))

    orig = fb.attn_cell_tile
    fb.attn_cell_tile = lambda *a, **k: 1
    try:
        f1 = jax.jit(lambda x, s: fused_bert_attention_block(
            x, *args, key_bias, 4, 1e-12, False, 0.1, 0.1, s))
        single = np.asarray(f1(x, jnp.int32(3)))
    finally:
        fb.attn_cell_tile = orig
    np.testing.assert_array_equal(tiled, single)


def test_mlp_dropout_batch_tile_invariance():
    import nans_clip_tpu.ops.fused_block as fb

    rs = np.random.RandomState(6)
    B, S, W, I = 8, 52, 128, 512
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    margs = (jnp.ones((W,), jnp.float32), jnp.zeros((W,), jnp.float32),
             jnp.asarray(0.1 * rs.randn(W, I), jnp.float32),
             jnp.zeros((I,), jnp.float32),
             jnp.asarray(0.1 * rs.randn(I, W), jnp.float32),
             jnp.zeros((W,), jnp.float32))
    assert fb.mlp_cell_tile(B, S, W, I, 4, dropout=True) > 1

    f = jax.jit(lambda x, s: fused_mlp_block(
        x, *margs, "gelu", 1e-12, True, False, 0.1, s))
    tiled = np.asarray(f(x, jnp.int32(9)))

    orig = fb.mlp_cell_tile
    fb.mlp_cell_tile = lambda *a, **k: 1
    try:
        f1 = jax.jit(lambda x, s: fused_mlp_block(
            x, *margs, "gelu", 1e-12, True, False, 0.1, s))
        single = np.asarray(f1(x, jnp.int32(9)))
    finally:
        fb.mlp_cell_tile = orig
    np.testing.assert_array_equal(tiled, single)


def test_dropout_grads_match_finite_difference_tiled():
    """Same fwd/bwd PRNG-consistency check as above but at a lane-aligned
    width where the FORWARD batch-tiles (tile>1) while the bwd kernel runs
    one sample per cell."""
    seed = jnp.int32(17)
    x, *args, key_bias = _wide_bert_args(7)
    f = lambda x: jnp.sum(jnp.sin(fused_bert_attention_block(
        x, *args, key_bias, 4, 1e-12, False, 0.1, 0.1, seed)))
    g = jax.jit(jax.grad(f))(x)
    fj = jax.jit(f)
    rs = np.random.RandomState(0)
    for _ in range(2):
        v = jnp.asarray(rs.randn(*x.shape), jnp.float32)
        eps = 1e-3
        fd = (float(fj(x + eps * v)) - float(fj(x - eps * v))) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(an)), (fd, an)


def test_wide_mlp_dropout_grads_finite_difference():
    """RoBERTa-large MLP shape (W=1024, I=4096, S=52): the one-shot MLP
    kernel newly routed at short-seq wide towers, dropout in-kernel,
    fwd/bwd PRNG streams must agree (custom_vjp vs finite differences)."""
    import nans_clip_tpu.ops.fused_block as fb

    rs = np.random.RandomState(11)
    B, S, W, I = 4, 52, 1024, 4096
    assert fb.fits_fused_mlp_oneshot(S, W)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    margs = (jnp.ones((W,), jnp.float32), jnp.zeros((W,), jnp.float32),
             jnp.asarray(0.05 * rs.randn(W, I), jnp.float32),
             jnp.zeros((I,), jnp.float32),
             jnp.asarray(0.05 * rs.randn(I, W), jnp.float32),
             jnp.zeros((W,), jnp.float32))
    seed = jnp.int32(23)
    f = lambda x: jnp.sum(jnp.sin(fused_mlp_block(
        x, *margs, "gelu", 1e-12, True, False, 0.1, seed)))
    g = jax.jit(jax.grad(f))(x)
    fj = jax.jit(f)
    for _ in range(2):
        v = jnp.asarray(rs.randn(*x.shape), jnp.float32)
        eps = 1e-3
        fd = (float(fj(x + eps * v)) - float(fj(x - eps * v))) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(an)), (fd, an)
