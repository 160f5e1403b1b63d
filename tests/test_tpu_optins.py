"""On-chip guards for the r4 OPT-IN kernels (NANS_TEST_TPU=1 only).

Neither kernel is routed (both are measured negatives — gates.py
provenance) but both ship as supported opt-ins; these legs keep them
compiling and numerically exact on real hardware:

* whole-layer training backward (`ops/layer_bwd.py`, `NANS_LAYER_BWD=1`):
  gradient set vs the shipping two-kernel chain;
* dequant-ahead int8 tower (`fused_tower(quant_dma=True)`): output vs
  the in-line int8 kernel (bit-identical in the r4 drive).
"""

import os

import pytest

if os.environ.get("NANS_TEST_TPU") != "1":
    pytest.skip("TPU-only: set NANS_TEST_TPU=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np


@pytest.fixture(autouse=True)
def _default_precision():
    # bf16 Pallas matmuls reject the conftest's "highest" default
    with jax.default_matmul_precision("default"):
        yield


def test_layer_bwd_matches_two_kernel_chain_on_chip():
    from nans_clip_tpu.ops.fused_block import (fused_attention_block,
                                               fused_mlp_block)
    from nans_clip_tpu.ops.layer_bwd import fused_layer_train

    B, S, W, H, I = 4, 197, 768, 12, 3072
    rs = np.random.RandomState(0)
    f = lambda *sh: jnp.asarray(0.05 * rs.randn(*sh), jnp.bfloat16)
    args = (jnp.asarray(rs.randn(B, S, W), jnp.bfloat16),
            f(W), f(W), f(W, 3 * W), f(3 * W), f(W, W), f(W),
            f(W), f(W), f(W, I), f(I), f(I, W), f(W))
    g = jnp.asarray(rs.randn(B, S, W), jnp.bfloat16)

    def two_kernel(*a):
        x, s1, b1, wqkv, bqkv, wo, bo, s2, b2, w1, b1m, w2, b2m = a
        y = fused_attention_block(x, s1, b1, wqkv, bqkv, wo, bo, H)
        return fused_mlp_block(y, s2, b2, w1, b1m, w2, b2m)

    _, vjp_ref = jax.vjp(two_kernel, *args)
    ref = jax.jit(lambda: vjp_ref(g))()
    _, vjp_new = jax.vjp(
        lambda *a: fused_layer_train(*a, H, "quick_gelu", 1e-5, False),
        *args)
    ours = jax.jit(lambda: vjp_new(g))()
    for i, (a, b) in enumerate(zip(ours, ref)):
        a32 = np.asarray(a.astype(jnp.float32))
        b32 = np.asarray(b.astype(jnp.float32))
        err = np.abs(a32 - b32).max()
        mag = max(np.abs(b32).max(), 1.0)
        assert err < 2e-2 * mag, (i, err, mag)


def test_qdma_tower_matches_inline_on_chip():
    from nans_clip_tpu.ops.tower_kernel import fused_tower
    from nans_clip_tpu.utils.quantize import quantize_weight

    L, W, I, S, H = 4, 768, 3072, 197, 12
    rs = np.random.RandomState(1)
    f = lambda *sh: jnp.asarray(0.05 * rs.randn(*sh), jnp.bfloat16)
    p = dict(ln1_s=f(L, W), ln1_b=f(L, W), wqkv=f(L, W, 3 * W),
             bqkv=f(L, 3 * W), wo=f(L, W, W), bo=f(L, W), ln2_s=f(L, W),
             ln2_b=f(L, W), w1=f(L, W, I), b1=f(L, I), w2=f(L, I, W),
             b2=f(L, W))
    qw = {k: quantize_weight(p[k]) for k in ("wqkv", "wo", "w1", "w2")}
    x = jnp.asarray(rs.randn(1, S, W), jnp.bfloat16)

    def run(dma):
        return fused_tower(x, None, p["ln1_s"], p["ln1_b"], qw["wqkv"],
                           p["bqkv"], qw["wo"], p["bo"], p["ln2_s"],
                           p["ln2_b"], qw["w1"], p["b1"], qw["w2"],
                           p["b2"], H, 1e-5, "quick_gelu", False,
                           quant_dma=dma)

    inline = np.asarray(jax.jit(lambda: run(False))().astype(jnp.float32))
    qdma = np.asarray(jax.jit(lambda: run(True))().astype(jnp.float32))
    np.testing.assert_array_equal(qdma, inline)
