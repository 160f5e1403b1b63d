"""Whole-layer fused kernel (attn + MLP in one pallas_call) vs the
sub-block oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.ops.fused_block import _reference_block, _reference_mlp
from nans_clip_tpu.ops.layer_kernel import (fits_layer, fused_layer_block,
                                            layer_cell_tile)

INTERPRET = jax.default_backend() != "tpu"


def _layer_args(seed, b, s, w, inter):
    rs = np.random.RandomState(seed)
    r = lambda *sh: jnp.asarray(0.1 * rs.randn(*sh), jnp.float32)
    return dict(
        x=jnp.asarray(rs.randn(b, s, w), jnp.float32),
        ln1_scale=1.0 + r(w), ln1_bias=r(w),
        wqkv=r(w, 3 * w), bqkv=r(3 * w), wo=r(w, w), bo=r(w),
        ln2_scale=1.0 + r(w), ln2_bias=r(w),
        w1=r(w, inter), b1=r(inter), w2=r(inter, w), b2=r(w))


def _oracle(a, heads, eps, act, post_ln, key_bias=None):
    h = _reference_block(a["x"], a["ln1_scale"], a["ln1_bias"], a["wqkv"],
                         a["bqkv"], a["wo"], a["bo"], heads=heads, eps=eps,
                         key_bias=key_bias, post_ln=post_ln)
    return _reference_mlp(h, a["ln2_scale"], a["ln2_bias"], a["w1"], a["b1"],
                          a["w2"], a["b2"], act, eps, post_ln)


@pytest.mark.parametrize("b,s,w,heads,post_ln", [
    (2, 52, 64, 4, False),    # ViT-ish pre-LN
    (2, 52, 64, 4, True),     # BERT post-LN + mask
    (4, 24, 128, 2, False),   # batch-tileable shape
])
def test_layer_kernel_matches_oracles(b, s, w, heads, post_ln):
    a = _layer_args(0, b, s, w, 4 * w)
    act = "gelu" if post_ln else "quick_gelu"
    eps = 1e-12 if post_ln else 1e-5
    key_bias = None
    if post_ln:
        mask = np.ones((b, s), np.float32)
        mask[:, 18:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0)  # [B, S] convention
    ref = _oracle(a, heads, eps, act, post_ln,
                  key_bias=key_bias)
    out = fused_layer_block(a["x"], a["ln1_scale"], a["ln1_bias"], a["wqkv"],
                            a["bqkv"], a["wo"], a["bo"], a["ln2_scale"],
                            a["ln2_bias"], a["w1"], a["b1"], a["w2"], a["b2"],
                            heads, eps, act, post_ln, key_bias=key_bias,
                            interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_layer_kernel_tile_invariance():
    """tile=2 produces the same result as tile=1 (PRNG-free path)."""
    a = _layer_args(1, 4, 24, 128, 512)
    run = lambda tile: fused_layer_block(
        a["x"], a["ln1_scale"], a["ln1_bias"], a["wqkv"], a["bqkv"], a["wo"],
        a["bo"], a["ln2_scale"], a["ln2_bias"], a["w1"], a["b1"], a["w2"],
        a["b2"], 2, 1e-5, "quick_gelu", False, interpret=INTERPRET, tile=tile)
    # fp32 reduction-order noise only (different collapsed-row matmul
    # blocking between the tiles)
    np.testing.assert_allclose(np.asarray(run(2)), np.asarray(run(1)),
                               atol=1e-5, rtol=1e-5)


def test_layer_routing_through_encode(monkeypatch):
    """With the tower gate off, deterministic fused encodes route the
    whole-layer kernel (interpret off-TPU) and must equal the XLA path."""
    from nans_clip_tpu import configs as C
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
    import nans_clip_tpu.ops.layer_kernel as lk
    import nans_clip_tpu.ops.tower_kernel as tk

    cfg = C.CLIPConfig(
        embed_dim=64,
        vision=C.VisionConfig(embed_dim=64, image_resolution=32, layers=2,
                              width=128, patch_size=16, head_width=32),
        text=C.TextConfig(hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=512),
        name="tiny128")
    monkeypatch.setattr(tk, "fits_tower", lambda *a, **k: False)
    monkeypatch.setattr(lk, "ROUTE", True)
    calls = []
    orig = lk.fused_layer_block
    monkeypatch.setattr(lk, "fused_layer_block",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(8, 32, 32, 3), jnp.float32)
    texts = np.zeros((8, 52), np.int32)
    texts[:, 0] = 101
    texts[:, 1:12] = rs.randint(1000, 20000, (8, 11))
    texts[:, 12] = 102
    texts = jnp.asarray(texts)

    for enc, data in ((encode_image, images), (encode_text, texts)):
        ref = enc(params, cfg, data, ModelOptions(attn_impl="xla"))
        calls.clear()
        out = enc(params, cfg, data, ModelOptions(attn_impl="fused"))
        assert calls, "whole-layer kernel was not routed"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-4)


def test_fits_layer_gates():
    assert fits_layer(197, 768, 3072)        # ViT-B
    assert fits_layer(52, 1024, 4096)        # RoBERTa-large
    assert fits_layer(257, 1024, 4096)       # ViT-L
    assert not fits_layer(197, 1280, 5120)   # ViT-H: weights 39MB + qkv
    assert not fits_layer(577, 1024, 4096)   # 336px ViT-L: S too long
    assert layer_cell_tile(256, 197, 768, 3072) >= 1
