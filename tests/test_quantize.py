"""Weight-only int8 serving mode (utils/quantize.py + the quantized
whole-tower kernel): quantizer bounds, kernel-vs-oracle on dequantized
weights, end-to-end encode routing, and the dequantize fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.ops.tower_kernel import fits_tower, fused_tower, tower_batch_tile
from nans_clip_tpu.utils.quantize import (dequantize_layer_tree,
                                          dequantize_weight, is_quantized,
                                          layer_tree_quantized,
                                          quantize_for_serving,
                                          quantize_layer_tree,
                                          quantize_weight)
from tests.test_tower_kernel import _oracle, _stacked

INTERPRET = jax.default_backend() != "tpu"


def test_quantize_roundtrip_bounds():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(3, 96, 160).astype(np.float32))
    q = quantize_weight(w)
    assert q["int8"].dtype == jnp.int8 and q["scale"].shape == (3, 1, 160)
    back = dequantize_weight(q, jnp.float32)
    # symmetric per-output-channel: |err| <= scale/2 elementwise
    err = np.abs(np.asarray(back - w))
    bound = np.broadcast_to(np.asarray(q["scale"]) / 2 + 1e-9, w.shape)
    assert (err <= bound).all()
    # the per-channel max hits the top code exactly (|q| == 127 somewhere)
    assert int(np.abs(np.asarray(q["int8"])).max()) == 127


def test_quant_tile_math_matches_bf16():
    # at esize=2 the int8 double-buffer + one dequantized copy equals the
    # bf16 double-buffer, so every validated routing cell is unchanged
    for (b, s, w, i) in [(1, 52, 768, 3072), (8, 197, 768, 3072),
                         (1, 257, 1280, 5120)]:
        assert tower_batch_tile(b, s, w, i, 2, True) == \
            tower_batch_tile(b, s, w, i, 2, False)
        assert fits_tower(b, s, w, i, 2, quant=True)


@pytest.mark.parametrize("post_ln,act,masked", [
    (False, "quick_gelu", False),   # ViT-like pre-LN
    (True, "gelu", True),           # BERT-like post-LN
])
def test_quant_tower_matches_dequantized_oracle(post_ln, act, masked):
    B, S, W, I, heads = 2, 12, 128, 512, 4
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    p = _stacked(3, W, I, seed=5)
    key_bias = None
    if masked:
        mask = np.ones((B, S), np.float32)
        mask[:, S - 3:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0).reshape(B, 1, S)
    qw = {k: quantize_weight(p[k]) for k in ("wqkv", "wo", "w1", "w2")}
    out = fused_tower(x, key_bias, p["ln1_s"], p["ln1_b"], qw["wqkv"],
                      p["bqkv"], qw["wo"], p["bo"], p["ln2_s"], p["ln2_b"],
                      qw["w1"], p["b1"], qw["w2"], p["b2"], heads, 1e-5,
                      act, post_ln, interpret=INTERPRET)
    pd = dict(p)
    for k in ("wqkv", "wo", "w1", "w2"):
        pd[k] = dequantize_weight(qw[k], jnp.float32)
    ref = _oracle(x, pd, heads, 1e-5, act, post_ln,
                  key_bias=None if key_bias is None
                  else key_bias.reshape(B, S))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_quant_tower_batch_tiled_grid():
    """B > tile: the int8 blocks re-stream once per batch tile and the
    VMEM scratch re-initializes — same contract as the bf16 grid."""
    import nans_clip_tpu.ops.tower_kernel as tk
    B, S, W, I, heads = 6, 12, 128, 512, 4
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    p = _stacked(3, W, I, seed=8)
    qw = {k: quantize_weight(p[k]) for k in ("wqkv", "wo", "w1", "w2")}
    orig = tk.tower_batch_tile
    tk.tower_batch_tile = lambda *a, **k: 2    # force B=6 into 3 tiles
    try:
        out = fused_tower(x, None, p["ln1_s"], p["ln1_b"], qw["wqkv"],
                          p["bqkv"], qw["wo"], p["bo"], p["ln2_s"],
                          p["ln2_b"], qw["w1"], p["b1"], qw["w2"], p["b2"],
                          heads, 1e-5, "quick_gelu", False,
                          interpret=INTERPRET)
    finally:
        tk.tower_batch_tile = orig
    pd = dict(p)
    for k in ("wqkv", "wo", "w1", "w2"):
        pd[k] = dequantize_weight(qw[k], jnp.float32)
    ref = _oracle(x, pd, heads, 1e-5, "quick_gelu", False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _tiny_cfg():
    from nans_clip_tpu import configs as C
    return C.CLIPConfig(
        embed_dim=64,
        vision=C.VisionConfig(embed_dim=64, image_resolution=32, layers=2,
                              width=128, patch_size=16, head_width=32),
        text=C.TextConfig(hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=512),
        name="tiny128",
    )


def _tiny_inputs(b=3):
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(b, 32, 32, 3), jnp.float32)
    texts = np.zeros((b, 52), np.int32)
    texts[:, 0] = 101
    texts[:, 1:12] = rs.randint(1000, 20000, (b, 11))
    texts[:, 12] = 102
    return images, jnp.asarray(texts)


def test_quantize_for_serving_tree_shape():
    from nans_clip_tpu.models.clip import init_clip
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    qp = quantize_for_serving(params)
    assert layer_tree_quantized(qp["visual"]["transformer"])
    assert layer_tree_quantized(qp["bert"]["encoder"])
    assert is_quantized(qp["bert"]["encoder"]["mlp"]["w2"])
    # everything else untouched (same objects)
    assert qp["text_projection"] is params["text_projection"]
    assert not is_quantized(qp["bert"]["encoder"]["attn"]["bqkv"])
    # the original tree is not mutated
    assert not layer_tree_quantized(params["bert"]["encoder"])
    # per-tower selection (text-only: the measured-win configuration for
    # wide image towers, see quantize_for_serving docstring)
    tq = quantize_for_serving(params, towers=("text",))
    assert layer_tree_quantized(tq["bert"]["encoder"])
    assert not layer_tree_quantized(tq["visual"]["transformer"])
    with pytest.raises(ValueError):
        quantize_for_serving(params, towers=("vision",))
    # not idempotent — and ordering with LoRA is enforced both ways
    with pytest.raises(ValueError, match="already int8-quantized"):
        quantize_for_serving(qp)
    from nans_clip_tpu.models.lora import init_lora, merge_lora
    adapters = init_lora(jax.random.PRNGKey(0), params, rank=2)
    with pytest.raises(ValueError, match="merge first"):
        merge_lora(qp, adapters)


def test_quant_encode_routes_tower_and_matches_dequantized():
    """attn_impl='fused' with int8 params routes the quantized tower
    kernel; it must equal the XLA path run on the DEQUANTIZED params
    (same effective weights, different kernels), and the XLA path on the
    quantized params must take the dequantize fallback and match exactly."""
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    qp = quantize_for_serving(params)
    dq = {**qp,
          "visual": {**qp["visual"],
                     "transformer": dequantize_layer_tree(
                         qp["visual"]["transformer"], jnp.float32)},
          "bert": {**qp["bert"],
                   "encoder": dequantize_layer_tree(qp["bert"]["encoder"],
                                                    jnp.float32)}}
    images, texts = _tiny_inputs()
    for enc, data in ((encode_image, images), (encode_text, texts)):
        ref = enc(dq, cfg, data, ModelOptions(attn_impl="xla"))
        out = enc(qp, cfg, data, ModelOptions(attn_impl="fused"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-4)
        # dequantize fallback (non-tower path) is numerically identical
        # to running the dequantized params through the same path
        fb = enc(qp, cfg, data, ModelOptions(attn_impl="xla"))
        np.testing.assert_allclose(np.asarray(fb), np.asarray(ref),
                                   atol=0, rtol=0)


def test_quant_composes_with_aot_compile():
    """deploy.compile_tower (the TRT-engine analog) accepts a quantized
    param tree unchanged: the executable embeds int8 weights + scales
    (half the weight bytes device-resident) and matches the dequantized
    run."""
    from nans_clip_tpu.deploy.aot import compile_tower
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_text, init_clip
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    qp = quantize_for_serving(params)
    _, texts = _tiny_inputs(2)
    opts = ModelOptions(attn_impl="xla", compute_dtype=None)
    run = compile_tower(cfg, qp, "text", 2, options=opts)
    out = np.asarray(run(texts))
    ref = encode_text(qp, cfg, texts, opts)
    ref = np.asarray(ref / jnp.linalg.norm(ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_clipmodel_quantize_method():
    """api.CLIPModel.quantize() returns a serving copy whose similarity
    matrix tracks the full-precision one; the original is untouched."""
    from nans_clip_tpu.api import CLIPModel
    from nans_clip_tpu.models.clip import init_clip
    cfg = _tiny_cfg()
    params, bstats = init_clip(jax.random.PRNGKey(3), cfg)
    m = CLIPModel(cfg, params, bstats)
    q = m.quantize()
    assert not layer_tree_quantized(m.params["bert"]["encoder"])
    assert layer_tree_quantized(q.params["bert"]["encoder"])
    images, texts = _tiny_inputs(2)
    li, _ = m.get_similarity(images, texts)
    qli, _ = q.get_similarity(images, texts)
    np.testing.assert_allclose(np.asarray(qli), np.asarray(li),
                               atol=0.15, rtol=0.05)
    with pytest.raises(ValueError):
        m.quantize("int4")


def test_quant_quality_vs_full_precision():
    """int8 weight error stays second-order through the full model:
    embedding cosine vs the full-precision forward > 0.999."""
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(2), cfg)
    qp = quantize_for_serving(params)
    images, texts = _tiny_inputs()
    opts = ModelOptions(attn_impl="xla")
    for enc, data in ((encode_image, images), (encode_text, texts)):
        full = np.asarray(enc(params, cfg, data, opts), np.float64)
        q = np.asarray(enc(qp, cfg, data, opts), np.float64)
        cos = (full * q).sum(-1) / (
            np.linalg.norm(full, axis=-1) * np.linalg.norm(q, axis=-1))
        assert (cos > 0.999).all(), cos


def test_cast_tree_keeps_quant_scales_fp32():
    """Production serving loads with compute_dtype=bf16; cast_tree must
    treat {'int8','scale'} leaves as atomic — downcasting the documented
    fp32 per-channel scales to bf16 would add avoidable dequant error on
    the shipped path while CI validates fp32-scale configs."""
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.models.common import cast_tree
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    qp = quantize_for_serving(params)
    cast = cast_tree(qp, ModelOptions(compute_dtype="bfloat16"))
    enc = cast["bert"]["encoder"]
    assert enc["attn"]["wqkv"]["int8"].dtype == jnp.int8
    assert enc["attn"]["wqkv"]["scale"].dtype == jnp.float32
    assert enc["mlp"]["w2"]["scale"].dtype == jnp.float32
    # non-quantized floating leaves still cast
    assert cast["bert"]["encoder"]["attn"]["bqkv"].dtype == jnp.bfloat16
    assert cast["text_projection"].dtype == jnp.bfloat16
    # and the bf16 quantized forward equals the bf16 dequantized-params
    # forward (the scales no longer diverge between the two)
    from nans_clip_tpu.models.clip import encode_text
    from nans_clip_tpu.utils.quantize import dequantize_params
    _, texts = _tiny_inputs()
    out = encode_text(qp, cfg, texts, ModelOptions(attn_impl="xla",
                                                   compute_dtype="bfloat16"))
    ref = encode_text(dequantize_params(qp), cfg, texts,
                      ModelOptions(attn_impl="xla",
                                   compute_dtype="bfloat16"))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-6, rtol=1e-5)


def test_quantized_tree_export_fails_fast():
    """torch_interop must refuse a quantized tree with a clear message
    (CLAUDE.md: torch_interop stays in sync with param-tree changes)."""
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.utils.quantize import (dequantize_params,
                                              params_quantized)
    from nans_clip_tpu.utils.torch_interop import state_dict_from_params
    cfg = _tiny_cfg()
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    qp = quantize_for_serving(params, ("text",))
    assert params_quantized(qp) and not params_quantized(params)
    with pytest.raises(ValueError, match="dequantize first"):
        state_dict_from_params(qp, cfg)
    # dequantize_params makes it exportable again, close to the original
    dq = dequantize_params(qp)
    assert not params_quantized(dq)
    sd = state_dict_from_params(dq, cfg)
    w = np.asarray(params["bert"]["encoder"]["mlp"]["w1"])
    scale = np.abs(w).max()
    got = sd["bert.encoder.layer.0.intermediate.dense.weight"]
    assert np.abs(np.asarray(got).T - w[0]).max() < scale / 100


def test_towers_for_mode():
    from nans_clip_tpu.utils.quantize import towers_for_mode
    assert towers_for_mode("int8") == ("text", "image")
    assert towers_for_mode("int8-text") == ("text",)
    with pytest.raises(ValueError, match="unknown quantize mode"):
        towers_for_mode("int4")


@pytest.mark.parametrize("post_ln,act,masked", [
    (False, "quick_gelu", False),   # ViT-like pre-LN
    (True, "gelu", True),           # BERT-like post-LN
])
def test_quant_tower_dma_variant_matches(post_ln, act, masked):
    """Dequant-ahead manual-DMA variant (r4, _tower_kernel_q_dma): same
    math, dequant moved off the critical path — must equal the in-line
    quant kernel / dequantized oracle bit-for-tolerance."""
    B, S, W, I, heads = 2, 12, 128, 512, 4
    rs = np.random.RandomState(13)
    x = jnp.asarray(rs.randn(B, S, W), jnp.float32)
    p = _stacked(3, W, I, seed=6)
    key_bias = None
    if masked:
        mask = np.ones((B, S), np.float32)
        mask[:, S - 3:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0).reshape(B, 1, S)
    qw = {k: quantize_weight(p[k]) for k in ("wqkv", "wo", "w1", "w2")}
    out = fused_tower(x, key_bias, p["ln1_s"], p["ln1_b"], qw["wqkv"],
                      p["bqkv"], qw["wo"], p["bo"], p["ln2_s"], p["ln2_b"],
                      qw["w1"], p["b1"], qw["w2"], p["b2"], heads, 1e-5,
                      act, post_ln, interpret=INTERPRET, quant_dma=True)
    pd = dict(p)
    for k in ("wqkv", "wo", "w1", "w2"):
        pd[k] = dequantize_weight(qw[k], jnp.float32)
    ref = _oracle(x, pd, heads, 1e-5, act, post_ln,
                  key_bias=None if key_bias is None
                  else key_bias.reshape(B, S))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_quant_tower_dma_gate():
    """The qdma cell cannot exist at W=1280 (3x int8 + 2x dequantized
    residency ~138MB > VMEM) — the documented ViT-H capacity negative."""
    from nans_clip_tpu.ops.tower_kernel import tower_qdma_tile
    assert tower_qdma_tile(1, 257, 1280, 5120) == 0
    assert tower_qdma_tile(1, 197, 768, 3072) >= 1
    assert tower_qdma_tile(1, 257, 1024, 4096) >= 1
