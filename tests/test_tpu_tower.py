"""Tower mega-kernel vs per-block path on REAL TPU (NANS_TEST_TPU=1).

The interpret-mode oracle tests (test_tower_kernel.py) prove the math;
this proves the Mosaic compile + routing on hardware at a production
width, comparing the full encode path with the tower routed vs forced
off (bf16, so tolerance covers accumulation-order differences).
"""

import os

import pytest

if os.environ.get("NANS_TEST_TPU") != "1":
    pytest.skip("TPU-only: set NANS_TEST_TPU=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a TPU backend")


def test_tower_routing_matches_per_block_on_tpu():
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_text, init_clip
    import nans_clip_tpu.ops.tower_kernel as tk

    cfg = load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          params)
    rs = np.random.RandomState(0)
    txt = jnp.zeros((2, 52), jnp.int32).at[:, 0].set(101)
    txt = txt.at[:, 1:12].set(jnp.asarray(rs.randint(1000, 20000, (2, 11))))
    txt = txt.at[:, 12].set(102)

    # conftest's matmul_precision="highest" (for tight CPU oracle
    # comparisons) is incompatible with bf16 Pallas matmuls on Mosaic
    # (tpu.matmul with contract_precision<fp32> on bf16 operands fails
    # "Bad lhs type"); production runs the default precision, so test that.
    with jax.default_matmul_precision("default"):
        out = np.asarray(jax.jit(
            lambda p, t: encode_text(p, cfg, t, options))(params, txt),
            np.float32)
        orig = tk.tower_batch_tile
        tk.tower_batch_tile = lambda *a, **k: 0
        try:
            ref = np.asarray(jax.jit(
                lambda p, t: encode_text(p, cfg, t, options))(params, txt),
                np.float32)
        finally:
            tk.tower_batch_tile = orig
    rel = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
    assert rel < 2e-2, rel


def test_quantized_tower_on_tpu():
    """int8 weight-streaming tower (utils/quantize.py): Mosaic compile +
    numerics at production widths — text (W=768 post-LN) and image
    (W=768 pre-LN, S=197) towers vs the same encode on host-dequantized
    params (identical effective weights up to the bf16 scale cast)."""
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
    from nans_clip_tpu.utils.quantize import (dequantize_layer_tree,
                                              quantize_for_serving)

    cfg = load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16")
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x,
                          params)
    qp = quantize_for_serving(params)
    dq = {**qp,
          "visual": {**qp["visual"],
                     "transformer": dequantize_layer_tree(
                         qp["visual"]["transformer"], jnp.bfloat16)},
          "bert": {**qp["bert"],
                   "encoder": dequantize_layer_tree(qp["bert"]["encoder"],
                                                    jnp.bfloat16)}}
    rs = np.random.RandomState(0)
    txt = jnp.zeros((2, 52), jnp.int32).at[:, 0].set(101)
    txt = txt.at[:, 1:12].set(jnp.asarray(rs.randint(1000, 20000, (2, 11))))
    txt = txt.at[:, 12].set(102)
    img = jnp.asarray(rs.randn(2, 224, 224, 3), jnp.bfloat16)

    with jax.default_matmul_precision("default"):
        for enc, data in ((encode_text, txt), (encode_image, img)):
            out = np.asarray(jax.jit(
                lambda p, t: enc(p, cfg, t, options))(qp, data), np.float32)
            ref = np.asarray(jax.jit(
                lambda p, t: enc(p, cfg, t, options))(dq, data), np.float32)
            rel = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
            assert rel < 2e-2, (enc.__name__, rel)
