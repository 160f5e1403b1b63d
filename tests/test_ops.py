"""Kernel tests: pallas fused attention & layernorm vs XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.ops import (attention_pallas, attention_xla, layer_norm,
                               mha, pallas_layer_norm)

INTERPRET = jax.default_backend() != "tpu"


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("shape", [
    (2, 4, 52, 64),     # text tower
    (2, 12, 197, 64),   # ViT-B/16 @224
    (1, 16, 80, 80),    # head_dim 80 (ViT-H), unaligned seq
])
def test_attention_forward_matches_xla(shape):
    b, h, s, d = shape
    q, k, v = _rand(0, shape), _rand(1, shape), _rand(2, shape)
    lens = jnp.linspace(s // 2, s, b).astype(jnp.int32)
    bias = jnp.where(jnp.arange(s)[None, :] < lens[:, None], 0.0, -10000.0)
    ref = attention_xla(q, k, v, bias)
    out = attention_pallas(q, k, v, bias, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_no_mask():
    shape = (2, 4, 197, 64)
    q, k, v = _rand(0, shape), _rand(1, shape), _rand(2, shape)
    ref = attention_xla(q, k, v)
    out = attention_pallas(q, k, v, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_grads_match_xla():
    shape = (2, 4, 52, 64)
    q, k, v = _rand(0, shape), _rand(1, shape), _rand(2, shape)
    lens = jnp.array([52, 30])
    bias = jnp.where(jnp.arange(52)[None, :] < lens[:, None], 0.0, -10000.0)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(jnp.sin(out))  # nonuniform cotangent
        return f

    g_ref = jax.grad(loss(lambda q, k, v: attention_xla(q, k, v, bias)), (0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(lambda q, k, v: attention_pallas(q, k, v, bias, interpret=INTERPRET)),
                     (0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)


def test_attention_grads_match_xla_padded_multiblock():
    # The long-seq training route (ViT-L-336, S=577) runs the flash kernel
    # with seq padded across MULTIPLE q-blocks (577 -> 640 at block_q=128,
    # no key mask). Cover the padded multi-block vjp at a cheap analogue.
    shape = (1, 2, 130, 64)  # 130 -> 256: 2 q-blocks, 126 padded rows
    q, k, v = _rand(0, shape), _rand(1, shape), _rand(2, shape)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(jnp.sin(fn(q, k, v)))
        return f

    g_ref = jax.grad(loss(lambda q, k, v: attention_xla(q, k, v)), (0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(lambda q, k, v: attention_pallas(q, k, v, interpret=INTERPRET)),
                     (0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)


def test_masked_keys_get_zero_attention():
    # With key j masked for batch 0, changing k/v at j must not change output.
    shape = (2, 2, 52, 64)
    q, k, v = _rand(0, shape), _rand(1, shape), _rand(2, shape)
    bias = jnp.zeros((2, 52)).at[0, 40:].set(-10000.0)
    out1 = attention_pallas(q, k, v, bias, interpret=INTERPRET)
    k2 = k.at[:, :, 45, :].set(99.0)
    v2 = v.at[:, :, 45, :].set(-99.0)
    out2 = attention_pallas(q, k2, v2, bias, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5)
    # batch 1 is unmasked: it must differ
    assert float(jnp.abs(out1[1] - out2[1]).max()) > 1e-3


def test_layer_norm_fp32_stats():
    x = (_rand(0, (4, 77, 768)) * 10).astype(jnp.bfloat16)
    scale, bias = jnp.ones((768,)), jnp.zeros((768,))
    y = layer_norm(x, scale, bias)
    assert y.dtype == jnp.bfloat16
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(yf.mean(-1), 0.0, atol=0.05)
    np.testing.assert_allclose(yf.std(-1), 1.0, atol=0.05)


def test_pallas_layer_norm_matches():
    x = _rand(0, (3, 100, 512))
    scale = _rand(1, (512,)) * 0.1 + 1.0
    bias = _rand(2, (512,)) * 0.1
    ref = layer_norm(x, scale, bias)
    out = pallas_layer_norm(x, scale, bias, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_mha_block():
    d, heads = 64, 4
    params = {
        "wqkv": _rand(0, (d, 3 * d)) * 0.1,
        "bqkv": jnp.zeros((3 * d,)),
        "wo": _rand(1, (d, d)) * 0.1,
        "bo": jnp.zeros((d,)),
    }
    x = _rand(2, (2, 52, d))
    out = mha(x, params, heads, impl="xla")
    assert out.shape == x.shape
    out_p = mha(x, params, heads, impl="pallas", interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out), atol=2e-5, rtol=2e-5)


def test_flash_attention_block_grads_match_oracle():
    # The long-seq training route (vit.py use_flash_train): block-level
    # custom_vjp over LN -> QKV -> flash attention -> out-proj + residual,
    # with S padded across multiple q-blocks (S=130 -> 256 here, the cheap
    # analogue of ViT-L-336's 577 -> 640).
    from nans_clip_tpu.ops.attention import flash_attention_block

    b, s, w, heads = 2, 130, 128, 2
    ks = [jax.random.PRNGKey(i) for i in range(8)]
    x = jax.random.normal(ks[0], (b, s, w), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (w,))
    bias = 0.1 * jax.random.normal(ks[2], (w,))
    wqkv = 0.1 * jax.random.normal(ks[3], (w, 3 * w))
    bqkv = 0.1 * jax.random.normal(ks[4], (3 * w,))
    wo = 0.1 * jax.random.normal(ks[5], (w, w))
    bo = 0.1 * jax.random.normal(ks[6], (w,))

    def oracle(x, scale, bias, wqkv, bqkv, wo, bo):
        p = {"wqkv": wqkv, "bqkv": bqkv, "wo": wo, "bo": bo}
        h = x + mha(layer_norm(x, scale, bias), p, heads, impl="xla")
        return jnp.sum(jnp.sin(h))

    def ours(x, scale, bias, wqkv, bqkv, wo, bo):
        h = flash_attention_block(x, scale, bias, wqkv, bqkv, wo, bo,
                                  heads, 1e-5, 128, INTERPRET)
        return jnp.sum(jnp.sin(h))

    args = (x, scale, bias, wqkv, bqkv, wo, bo)
    np.testing.assert_allclose(np.asarray(ours(*args)), np.asarray(oracle(*args)),
                               rtol=1e-5)
    g_ref = jax.grad(oracle, tuple(range(7)))(*args)
    g_out = jax.grad(ours, tuple(range(7)))(*args)
    for name, a, o in zip("x scale bias wqkv bqkv wo bo".split(), g_ref, g_out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(a),
                                   atol=5e-5, rtol=5e-4, err_msg=name)


def test_profiling_utils(tmp_path):
    """utils/profiling: trace writes an XProf capture, device_sync returns
    the consumed scalar, StepTimer windows roll correctly."""
    import glob
    import os

    import jax.numpy as jnp

    from nans_clip_tpu.utils.profiling import StepTimer, device_sync, trace

    with trace(str(tmp_path)):
        device_sync(jnp.ones((4,)))
    assert glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"),
                     recursive=True), "no trace artifact written"

    assert device_sync() == 0.0
    assert device_sync(jnp.full((3,), 2.0)) == 6.0

    t = StepTimer(window=2)
    t.data_ready(); t.step_done(8)
    t.data_ready(); t.step_done(8)
    t.data_ready(); t.step_done(8)  # rolls past the window
    assert len(t.step_times) == 2 and len(t.data_times) == 2
    assert t.step_time > 0 and t.data_time >= 0
    assert t.samples_per_sec(8) > 0
