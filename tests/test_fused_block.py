"""Fused attention-block kernel vs XLA oracle (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, init_clip
from nans_clip_tpu.ops.fused_block import (_reference_block, fits_fused,
                                           fused_attention_block)
from tests.test_trainer import TINY, _batch

INTERPRET = jax.default_backend() != "tpu"


def _args(seed, s, w):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(2, s, w), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(w), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(w), jnp.float32)
    wqkv = jnp.asarray(0.1 * rs.randn(w, 3 * w), jnp.float32)
    bqkv = jnp.asarray(0.1 * rs.randn(3 * w), jnp.float32)
    wo = jnp.asarray(0.1 * rs.randn(w, w), jnp.float32)
    bo = jnp.asarray(0.1 * rs.randn(w), jnp.float32)
    return x, ln_s, ln_b, wqkv, bqkv, wo, bo


@pytest.mark.parametrize("s,w,h", [(52, 64, 4), (197, 128, 2)])
def test_fused_block_matches_reference(s, w, h):
    x, *args = _args(0, s, w)
    ref = _reference_block(x, *args, heads=h, eps=1e-5)
    out = fused_attention_block(x, *args, h, 1e-5, INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_block_grads():
    x, *args = _args(1, 52, 64)

    def loss(fn):
        return lambda x, *a: jnp.sum(jnp.sin(fn(x, *a)))

    g1 = jax.grad(loss(lambda x, *a: fused_attention_block(x, *a, 4, 1e-5, INTERPRET)),
                  argnums=tuple(range(7)))(x, *args)
    g2 = jax.grad(loss(lambda x, *a: _reference_block(x, *a, heads=4, eps=1e-5)),
                  argnums=tuple(range(7)))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)


def test_fits_fused():
    assert fits_fused(197, 768)
    assert fits_fused(577, 1024)
    assert fits_fused(257, 1280)       # ViT-H one-shot (raised vmem limit)
    assert not fits_fused(577, 1280)   # H@336px -> wide chunked kernels
    assert not fits_fused(1024, 768)


def test_vit_tower_with_fused_impl():
    """Full ViT tower routed through the fused kernel equals the XLA path.
    attn_impl='fused' off-TPU runs the kernels in interpreter mode (the
    interpret flag is threaded by vit.py), so this works on the CPU mesh."""
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, _ = _batch(4)
    ref = encode_image(params, TINY, jnp.asarray(images), ModelOptions(attn_impl="xla"))
    out = encode_image(params, TINY, jnp.asarray(images),
                       ModelOptions(attn_impl="fused"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_bert_tower_with_fused_impl():
    """BERT (post-LN, masked) fused routing equals the XLA path off-TPU."""
    from nans_clip_tpu.models.clip import encode_text
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    _, texts = _batch(4)
    ref = encode_text(params, TINY, jnp.asarray(texts), ModelOptions(attn_impl="xla"))
    out = encode_text(params, TINY, jnp.asarray(texts),
                      ModelOptions(attn_impl="fused"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_wide_attention_grads():
    """fused_attention_block_wide's custom_vjp (head-chunked ViT-H path):
    gradients for every input must match the oracle."""
    from nans_clip_tpu.ops.fused_block import (fits_fused_wide,
                                               fused_attention_block_wide)
    assert fits_fused_wide(257, 1280)
    x, *args = _args(2, 36, 160)  # dh=80 like ViT-H (heads=2, chunk=1)

    def loss(fn):
        return lambda x, *a: jnp.sum(jnp.sin(fn(x, *a)))

    g1 = jax.grad(loss(lambda x, *a: fused_attention_block_wide(
        x, *a, 2, 1e-5, 1, INTERPRET)), argnums=tuple(range(7)))(x, *args)
    g2 = jax.grad(loss(lambda x, *a: _reference_block(x, *a, heads=2, eps=1e-5)),
                  argnums=tuple(range(7)))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)


def test_batched_wide_attention_matches_reference():
    """Batch-tiled regrid of the head-chunked wide kernel."""
    from nans_clip_tpu.ops.fused_block import (fused_attention_block_wide,
                                               wide_batch_tile)
    x, *args = _args(3, 36, 160)  # batch 2, dh=80 (heads=2)
    ref = _reference_block(x, *args, heads=2, eps=1e-5)
    out = fused_attention_block_wide(x, *args, 2, 1e-5, 1, INTERPRET, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
    assert wide_batch_tile(16, 257, 1280) >= 2
