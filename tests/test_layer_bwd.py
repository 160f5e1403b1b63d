"""Whole-layer training backward (ops/layer_bwd.py, r4) vs the XLA vjp."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.ops.fused_block import _reference_block, _reference_mlp
from nans_clip_tpu.ops.layer_bwd import (fits_layer_bwd_fullgrad,
                                         fused_layer_train, route_layer_bwd)

INTERPRET = jax.default_backend() != "tpu"


def _args(seed=0, B=4, S=24, W=128, I=512):
    rs = np.random.RandomState(seed)
    f = lambda *sh: jnp.asarray(0.1 * rs.randn(*sh), jnp.float32)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    s1 = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    b1 = f(W)
    wqkv, bqkv, wo, bo = f(W, 3 * W), f(3 * W), f(W, W), f(W)
    s2 = jnp.asarray(1.0 + 0.1 * rs.randn(W), jnp.float32)
    b2 = f(W)
    w1, b1m, w2, b2m = f(W, I), f(I), f(I, W), f(W)
    return x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2, b2m


def _reference_layer(x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2,
                     b2m, heads, eps):
    y = _reference_block(x, s1, b1, wqkv, bqkv, wo, bo, heads=heads, eps=eps)
    return _reference_mlp(y, s2, b2, w1, b1m, w2, b2m, act="quick_gelu",
                          eps=eps, post_ln=False)


def test_layer_bwd_fullgrad_matches_vjp():
    """Combined kernel's full gradient set == jax.vjp of the XLA layer."""
    H = 4
    args = _args()
    g = jnp.asarray(np.random.RandomState(9).randn(*args[0].shape),
                    jnp.float32)

    _, vjp = jax.vjp(lambda *a: _reference_layer(*a, heads=H, eps=1e-5),
                     *args)
    ref = vjp(g)

    _, vjp2 = jax.vjp(lambda *a: fused_layer_train(*a, H, "quick_gelu",
                                                   1e-5, INTERPRET),
                      *args)
    ours = vjp2(g)

    names = ("dx", "ds1", "db1", "dwqkv", "dbqkv", "dwo", "dbo", "ds2",
             "db2", "dw1", "db1m", "dw2", "db2m")
    assert len(ours) == len(ref) == len(names)
    for name, a, b in zip(names, ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 2e-3 * mag, (name, err, mag)


def test_layer_bwd_forward_matches_reference():
    H = 4
    args = _args(seed=3)
    ref = _reference_layer(*args, heads=H, eps=1e-5)
    out = fused_layer_train(*args, H, "quick_gelu", 1e-5, INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_layer_bwd_batch_grid_accumulates():
    """Grid > 1 (several batch steps) must accumulate weight grads across
    cells, equal to the single-pass vjp."""
    H = 4
    args = _args(seed=5, B=6, S=16, W=128, I=256)
    g = jnp.asarray(np.random.RandomState(2).randn(*args[0].shape),
                    jnp.float32)
    _, vjp = jax.vjp(lambda *a: _reference_layer(*a, heads=H, eps=1e-5),
                     *args)
    ref = vjp(g)
    _, vjp2 = jax.vjp(lambda *a: fused_layer_train(*a, H, "quick_gelu",
                                                   1e-5, INTERPRET),
                      *args)
    ours = vjp2(g)
    for a, b in zip(ours, ref):
        err = float(jnp.abs(a - b).max())
        mag = max(float(jnp.abs(b).max()), 1.0)
        assert err < 2e-3 * mag


def test_layer_bwd_gates(monkeypatch):
    # the ViT-B training cell fits the VMEM_TOWER-class budget
    assert fits_layer_bwd_fullgrad(197, 768, 12, 3072, 2)
    # fp32 (tests / --precision fp32) pushes it out or not — esize-aware
    assert isinstance(fits_layer_bwd_fullgrad(197, 768, 12, 3072, 4), bool)
    # unrouted by default (gate tested with the ambient env CLEARED — a
    # developer's NANS_LAYER_BWD=1 between drives must not fail the suite)
    monkeypatch.delenv("NANS_LAYER_BWD", raising=False)
    from nans_clip_tpu.ops import gates
    assert not gates.LAYER_BWD_ROUTE  # r4 drive: measured negative
    assert not route_layer_bwd(197, 768, 12, 3072, 2)
    # env opt-in on CPU still refuses (backend gate)
    monkeypatch.setenv("NANS_LAYER_BWD", "1")
    import jax
    if jax.default_backend() != "tpu":
        assert not route_layer_bwd(197, 768, 12, 3072, 2)
    # env force-off wins over everything
    monkeypatch.setenv("NANS_LAYER_BWD", "0")
    monkeypatch.setattr(gates, "LAYER_BWD_ROUTE", True)
    assert not route_layer_bwd(197, 768, 12, 3072, 2)
