"""Whole-tower serving mega-kernel vs the per-sub-block oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.ops.fused_block import _reference_block, _reference_mlp
from nans_clip_tpu.ops.tower_kernel import fits_tower, fused_tower

INTERPRET = jax.default_backend() != "tpu"


def _stacked(L, W, I, seed=0):
    rs = np.random.RandomState(seed)
    f = lambda *sh: jnp.asarray(0.1 * rs.randn(*sh), jnp.float32)
    return dict(
        ln1_s=jnp.asarray(1.0 + 0.1 * rs.randn(L, W), jnp.float32),
        ln1_b=f(L, W), wqkv=f(L, W, 3 * W), bqkv=f(L, 3 * W),
        wo=f(L, W, W), bo=f(L, W),
        ln2_s=jnp.asarray(1.0 + 0.1 * rs.randn(L, W), jnp.float32),
        ln2_b=f(L, W), w1=f(L, W, I), b1=f(L, I), w2=f(L, I, W), b2=f(L, W),
    )


def _oracle(x, p, heads, eps, act, post_ln, key_bias=None):
    L = p["wqkv"].shape[0]
    for l in range(L):
        x = _reference_block(x, p["ln1_s"][l], p["ln1_b"][l], p["wqkv"][l],
                             p["bqkv"][l], p["wo"][l], p["bo"][l], heads,
                             eps, key_bias=key_bias, post_ln=post_ln)
        x = _reference_mlp(x, p["ln2_s"][l], p["ln2_b"][l], p["w1"][l],
                           p["b1"][l], p["w2"][l], p["b2"][l], act, eps,
                           post_ln=post_ln)
    return x


@pytest.mark.parametrize("post_ln,act,masked,B,S,W,I,heads", [
    (False, "quick_gelu", False, 2, 12, 128, 512, 4),   # ViT-like pre-LN
    (True, "gelu", True, 3, 10, 128, 512, 4),           # BERT-like post-LN
])
def test_tower_matches_oracle(post_ln, act, masked, B, S, W, I, heads):
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    p = _stacked(3, W, I)
    key_bias = None
    if masked:
        mask = np.ones((B, S), np.float32)
        mask[:, S - 3:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0).reshape(B, 1, S)
    out = fused_tower(x, key_bias, p["ln1_s"], p["ln1_b"], p["wqkv"],
                      p["bqkv"], p["wo"], p["bo"], p["ln2_s"], p["ln2_b"],
                      p["w1"], p["b1"], p["w2"], p["b2"], heads, 1e-5,
                      act, post_ln, interpret=INTERPRET)
    # _reference_block's attention_xla takes key_bias as [B, S]
    ref = _oracle(x, p, heads, 1e-5, act, post_ln,
                  key_bias=None if key_bias is None
                  else key_bias.reshape(B, S))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fits_tower_gate():
    from nans_clip_tpu.ops.tower_kernel import tower_batch_tile
    assert fits_tower(1, 52, 768, 3072)      # text batch-1
    assert fits_tower(32, 52, 768, 3072)     # text batch-32
    assert fits_tower(8, 197, 768, 3072)     # ViT-B batch-8
    # throughput shapes run the (batch_tile, layer) grid
    assert tower_batch_tile(256, 197, 768, 3072) == 8
    assert tower_batch_tile(256, 52, 768, 3072, 4) >= 8
    assert not fits_tower(1, 52, 769, 3072)  # lane alignment
    assert not fits_tower(64, 257, 1024, 4096)  # ViT-L: unvalidated width


def test_tower_batch_tiled_grid():
    """(batch_tile, layer) grid: B > tile exercises the per-tile scratch
    re-init and weight re-streaming."""
    import nans_clip_tpu.ops.tower_kernel as tk
    B, S, W, I, heads = 6, 12, 128, 512, 4
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    p = _stacked(3, W, I, seed=4)
    orig = tk.tower_batch_tile
    tk.tower_batch_tile = lambda *a, **k: 2    # force B=6 into 3 tiles
    try:
        out = fused_tower(x, None, p["ln1_s"], p["ln1_b"], p["wqkv"],
                          p["bqkv"], p["wo"], p["bo"], p["ln2_s"],
                          p["ln2_b"], p["w1"], p["b1"], p["w2"], p["b2"],
                          heads, 1e-5, "quick_gelu", False,
                          interpret=INTERPRET)
    finally:
        tk.tower_batch_tile = orig
    ref = _oracle(x, p, heads, 1e-5, "quick_gelu", False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tower_routing_through_encode():
    """attn_impl='fused' at a lane-aligned width routes the whole-tower
    kernel for deterministic forwards (interpret off-TPU) and must equal
    the XLA path through the public encode_* API."""
    from nans_clip_tpu import configs as C
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip

    cfg = C.CLIPConfig(
        embed_dim=64,
        vision=C.VisionConfig(embed_dim=64, image_resolution=32, layers=2,
                              width=128, patch_size=16, head_width=32),
        text=C.TextConfig(hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=512),
        name="tiny128",
    )
    assert fits_tower(3, 52, 128, 512)
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(3, 32, 32, 3), jnp.float32)
    texts = np.zeros((3, 52), np.int32)
    texts[:, 0] = 101
    texts[:, 1:12] = rs.randint(1000, 20000, (3, 11))
    texts[:, 12] = 102
    texts = jnp.asarray(texts)

    for enc, data in ((encode_image, images), (encode_text, texts)):
        ref = enc(params, cfg, data, ModelOptions(attn_impl="xla"))
        out = enc(params, cfg, data, ModelOptions(attn_impl="fused"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-4)
