"""Fused MLP sub-block kernel vs XLA oracle (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.ops.fused_block import (_reference_mlp, fits_fused_mlp,
                                           fused_mlp_block)

INTERPRET = jax.default_backend() != "tpu"


def _args(seed, s, w, i):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(2, s, w), jnp.float32),
            jnp.asarray(1.0 + 0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w, i), jnp.float32),
            jnp.asarray(0.1 * rs.randn(i), jnp.float32),
            jnp.asarray(0.1 * rs.randn(i, w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32))


@pytest.mark.parametrize("act,post", [("quick_gelu", False), ("gelu", True)])
def test_fused_mlp_matches_reference(act, post):
    x, *args = _args(0, 52, 64, 256)
    ref = _reference_mlp(x, *args, act=act, eps=1e-5, post_ln=post)
    out = fused_mlp_block(x, *args, act, 1e-5, post, INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
    g1 = jax.grad(lambda x, *a: jnp.sum(jnp.sin(
        fused_mlp_block(x, *a, act, 1e-5, post, INTERPRET))),
        argnums=tuple(range(7)))(x, *args)
    g2 = jax.grad(lambda x, *a: jnp.sum(jnp.sin(
        _reference_mlp(x, *a, act=act, eps=1e-5, post_ln=post))),
        argnums=tuple(range(7)))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_fits_fused_mlp():
    from nans_clip_tpu.ops.fused_block import fits_fused_mlp_tiled
    assert fits_fused_mlp(197, 768)
    assert not fits_fused_mlp(197, 1024)  # ViT-L MLP weights exceed VMEM...
    assert fits_fused_mlp_tiled(257, 1024)  # ...but the tiled variant fits
    assert fits_fused_mlp_tiled(257, 1280)  # ViT-H too
    assert not fits_fused_mlp_tiled(197, 768)  # small widths use the 1-shot


def test_wide_training_shapes_route_the_regrid():
    # tile > 1 is what routes fused_mlp_block for wide TRAINING forwards;
    # its input-only vjp residuals keep ViT-L/H(+336) inside HBM (the
    # inline XLA MLP under scan saves [L, B, S, 4W] gelu intermediates --
    # 3.4 GB at L-336 bs32, an observed OOM at the old 13MB budget). A
    # checkpointed XLA MLP shares the memory property but measured
    # neutral-to-slower in the full train step (H 77.3 vs 79.3 pairs/s).
    from nans_clip_tpu.ops.fused_block import (fused_mlp_routable,
                                               mlp_batch_tile,
                                               mlp_chunk_size)
    for b, s, w, i in [(128, 257, 1024, 4096),   # ViT-L/14 @ 224
                       (32, 577, 1024, 4096),    # ViT-L/14 @ 336
                       (32, 257, 1280, 5120)]:   # ViT-H/14
        chunk = mlp_chunk_size(w, i, 2)
        assert chunk is not None
        assert mlp_batch_tile(b, s, w, i, chunk, 2) > 1, (b, s, w)
        assert fused_mlp_routable(b, s, w, i, 2), (b, s, w)


@pytest.mark.parametrize("act,post", [("quick_gelu", False), ("gelu", True)])
def test_tiled_mlp_matches_reference(act, post):
    from nans_clip_tpu.ops.fused_block import _fused_mlp_tiled_call
    x, *args = _args(1, 36, 256, 1024)
    ref = _reference_mlp(x, *args, act=act, eps=1e-5, post_ln=post)
    out = _fused_mlp_tiled_call(x, *args, act, 1e-5, post, INTERPRET, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_wide_mlp_grads_through_public_api():
    """fused_mlp_block at width > MAX_FUSED_MLP_WIDTH must route the tiled
    kernel in BOTH the primal and the custom_vjp fwd rule (the one-shot
    kernel's fc weights exceed VMEM at these widths), and its gradients
    must match the oracle."""
    from nans_clip_tpu.ops.fused_block import MAX_FUSED_MLP_WIDTH
    w = 1024
    assert w > MAX_FUSED_MLP_WIDTH
    x, *args = _args(2, 36, w, 4 * w)
    out = fused_mlp_block(x, *args, "quick_gelu", 1e-5, False, INTERPRET)
    ref = _reference_mlp(x, *args, act="quick_gelu", eps=1e-5, post_ln=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    g1 = jax.grad(lambda x, *a: jnp.sum(jnp.sin(
        fused_mlp_block(x, *a, "quick_gelu", 1e-5, False, INTERPRET))),
        argnums=tuple(range(7)))(x, *args)
    g2 = jax.grad(lambda x, *a: jnp.sum(jnp.sin(
        _reference_mlp(x, *a, act="quick_gelu", eps=1e-5, post_ln=False))),
        argnums=tuple(range(7)))(x, *args)
    for a, b in zip(g1, g2):
        # fp32 accumulation-order noise: these grads sum over B*S*4W ~ 3e5
        # terms, so per-element differences reach ~1e-3 relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-4, rtol=2e-3)


def test_batched_tiled_mlp_matches_reference():
    """Batch-tiled regrid (multi-sample cells): same math as the oracle."""
    from nans_clip_tpu.ops.fused_block import (_fused_mlp_batched_call,
                                               mlp_batch_tile)
    for act, post in (("quick_gelu", False), ("gelu", True)):
        x, *args = _args(3, 36, 256, 1024)  # batch 2 from _args
        ref = _reference_mlp(x, *args, act=act, eps=1e-5, post_ln=post)
        out = _fused_mlp_batched_call(x, *args, act, 1e-5, post, INTERPRET,
                                      256, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)
    assert mlp_batch_tile(64, 257, 1024, 4096, 512) >= 2


def test_cell_tiled_mlp_matches_reference():
    """Lane-aligned width routes the batch-tiled one-shot kernel (T>1)."""
    from nans_clip_tpu.ops.fused_block import mlp_cell_tile
    assert mlp_cell_tile(4, 24, 128, 512) > 1
    x, *args = _args(4, 24, 128, 512)  # batch 2
    for act, post in (("quick_gelu", False), ("gelu", True)):
        ref = _reference_mlp(x, *args, act=act, eps=1e-5, post_ln=post)
        out = fused_mlp_block(x, *args, act, 1e-5, post, INTERPRET)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)


def test_sub_lane_direct_call_keeps_oneshot_and_dropout():
    """Sub-lane widths (w % 128 != 0) fail the ROUTING gates (models fall
    back to XLA, r3 lane-alignment rule), but a DIRECT fused_mlp_block
    call must still dispatch the one-shot kernel at tile=1 — NOT the
    dropout-less tiled branch. Regression: the r3 gate change made a
    W=64 dropout call die on the tiled branch's assert (caught by the
    on-chip tests/test_tpu_dropout.py MLP legs)."""
    from nans_clip_tpu.ops.fused_block import (fits_fused_mlp_oneshot,
                                               mlp_oneshot_direct_ok)
    x, *args = _args(7, 52, 64, 256)
    assert not fits_fused_mlp_oneshot(52, 64)   # routing still says XLA
    assert mlp_oneshot_direct_ok(52, 64)        # the dispatch's admission
    # the WIDE sub-lane tier is admitted too (ADVICE r3: a direct call at
    # 768 < w, w % 128 != 0, short seq used to fall into the tiled branch
    # where dropout asserts and mlp_chunk_size can return None)
    assert mlp_oneshot_direct_ok(52, 960)
    assert not mlp_oneshot_direct_ok(52, 1920)  # beyond the wide tier
    assert not mlp_oneshot_direct_ok(52, 128)   # lane-aligned: not direct
    # eval path: one-shot branch, oracle-exact
    ref = _reference_mlp(x, *args, act="quick_gelu", eps=1e-5, post_ln=False)
    out = fused_mlp_block(x, *args, "quick_gelu", 1e-5, False, INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    # dropout path: must not raise "tiled MLP kernel has no dropout
    # support". The Mosaic PRNG has no CPU lowering (even in interpret
    # mode), so trace abstractly — eval_shape runs the Python dispatch
    # (where the assert lives) without lowering the kernel; the PRNG
    # semantics themselves are validated on-chip (test_tpu_dropout.py)
    out_d = jax.eval_shape(
        lambda x, *a: fused_mlp_block(x, *a, "quick_gelu", 1e-5, False,
                                      INTERPRET, 0.3, jnp.int32(11)),
        x, *args)
    assert out_d.shape == x.shape
    # WIDE sub-lane direct call with dropout: same dispatch-level check
    xw, *argsw = _args(2, 52, 960, 3840)
    out_w = jax.eval_shape(
        lambda x, *a: fused_mlp_block(x, *a, "quick_gelu", 1e-5, False,
                                      INTERPRET, 0.3, jnp.int32(11)),
        xw, *argsw)
    assert out_w.shape == xw.shape
