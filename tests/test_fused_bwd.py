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

    dx, xn, ctx, dqkv = fused_attention_block_bwd(
        x, ln_s, ln_b, wqkv, bqkv, wo, g, H, 1e-5, INTERPRET)
    dwqkv = jnp.einsum("bsw,bsu->wu", xn, dqkv)
    dbqkv = jnp.sum(dqkv, axis=(0, 1))
    dwo = jnp.einsum("bsw,bsu->wu", ctx, g)
    dbo = jnp.sum(g, axis=(0, 1))
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    dxn = jnp.einsum("bsu,wu->bsw", dqkv, wqkv)
    d_scale = jnp.sum(dxn * xhat, (0, 1))
    d_bias = jnp.sum(dxn, (0, 1))

    ours = (dx, d_scale, d_bias, dwqkv, dbqkv, dwo, dbo)
    for name, a, b in zip(("dx", "d_scale", "d_bias", "dwqkv", "dbqkv",
                           "dwo", "dbo"), ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 1e-3 * mag, (name, err, mag)
