"""Tensor-parallel sub-blocks (shard_map over the 'model' axis) vs the
single-device oracle — VERDICT round-1 item 2: the fused kernels run under
a model>1 mesh (interpret mode on the CPU test mesh) with head-split
attention and column/row-split MLP, and match the unsharded math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu import configs as C
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
from nans_clip_tpu.ops.fused_block import _reference_block, _reference_mlp
from nans_clip_tpu.parallel import create_mesh, shard_batch, shard_params
from nans_clip_tpu.parallel.tp import tp_attention_block, tp_mlp_block
from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                    make_train_step)
from tests.test_trainer import TINY, _batch

INTERPRET = jax.default_backend() != "tpu"


def _mesh(model=2):
    n = len(jax.devices())
    return create_mesh(data=n // model, model=model)


def _attn_args(seed, s, w):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(8, s, w), jnp.float32),
            jnp.asarray(1.0 + 0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w, 3 * w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(3 * w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w, w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32))


@pytest.mark.parametrize("impl", ["xla", "fused"])
@pytest.mark.parametrize("post_ln,masked", [(False, False), (True, True)])
def test_tp_attention_block_matches_oracle(impl, post_ln, masked):
    x, *args = _attn_args(0, 24, 64)
    heads = 4
    key_bias = None
    if masked:
        mask = np.ones((8, 24), np.float32)
        mask[:, 18:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    ref = _reference_block(x, *args, heads=heads, eps=1e-5,
                           key_bias=key_bias, post_ln=post_ln)
    with jax.set_mesh(_mesh(2)):
        out = tp_attention_block(x, *args, heads, 2, eps=1e-5,
                                 post_ln=post_ln, key_bias=key_bias,
                                 impl=impl, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("impl", ["xla", "fused"])
@pytest.mark.parametrize("act,post_ln", [("quick_gelu", False), ("gelu", True)])
def test_tp_mlp_block_matches_oracle(impl, act, post_ln):
    rs = np.random.RandomState(1)
    w, i = 64, 256
    x = jnp.asarray(rs.randn(8, 24, w), jnp.float32)
    args = (jnp.asarray(1.0 + 0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w, i), jnp.float32),
            jnp.asarray(0.1 * rs.randn(i), jnp.float32),
            jnp.asarray(0.1 * rs.randn(i, w), jnp.float32),
            jnp.asarray(0.1 * rs.randn(w), jnp.float32))
    ref = _reference_mlp(x, *args, act=act, eps=1e-5, post_ln=post_ln)
    with jax.set_mesh(_mesh(2)):
        out = tp_mlp_block(x, *args, act, 2, eps=1e-5, post_ln=post_ln,
                           impl=impl, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_tp_towers_match_single_device():
    """encode_image/encode_text with options.tp=2 (fused kernels, interpret)
    equal the unsharded XLA towers."""
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, texts = _batch(8)
    ref_i = encode_image(params, TINY, jnp.asarray(images),
                         ModelOptions(attn_impl="xla"))
    ref_t = encode_text(params, TINY, jnp.asarray(texts),
                        ModelOptions(attn_impl="xla"))
    mesh = _mesh(2)
    opts = ModelOptions(attn_impl="fused", tp=2)
    with jax.set_mesh(mesh):
        params_s = shard_params(params, mesh)
        out_i = encode_image(params_s, TINY, shard_batch(jnp.asarray(images), mesh), opts)
        out_t = encode_text(params_s, TINY, shard_batch(jnp.asarray(texts), mesh), opts)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               atol=5e-5, rtol=5e-4)


def test_tp_train_step_matches_single_device():
    """One full train step (grads + AdamW) under data4 x model2 with the
    fused TP path equals the unsharded step within Adam-amplified fp32
    noise — proves gradients flow correctly through shard_map + psum +
    the partial-kernel custom_vjps."""
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, texts = _batch(16)
    im, tx = jnp.asarray(images), jnp.asarray(texts)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=10)

    state = create_train_state(jax.tree.map(jnp.copy, params), {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla",
                                                    deterministic=True),
                           constrain=False)
    ref_state, ref_metrics = step(state, im, tx, jax.random.PRNGKey(3))

    mesh = _mesh(2)
    with jax.set_mesh(mesh):
        params_s = shard_params(jax.tree.map(jnp.copy, params), mesh)
        state = create_train_state(params_s, {}, tcfg)
        step = make_train_step(TINY, tcfg,
                               ModelOptions(attn_impl="fused", tp=2,
                                            deterministic=True),
                               constrain=False)
        tp_state, tp_metrics = step(state, shard_batch(im, mesh),
                                    shard_batch(tx, mesh),
                                    jax.random.PRNGKey(3))
        assert abs(float(tp_metrics["loss"]) - float(ref_metrics["loss"])) < 1e-4
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             ref_state.params, tp_state.params)
    assert max(jax.tree.leaves(diffs)) < 5e-4, diffs


def test_tp_mesh_mismatch_fails_fast():
    """options.tp desynced from the mesh's 'model' axis must raise, not
    silently clamp the head slice and double-count shards in the psum."""
    x, *args = _attn_args(0, 24, 64)
    with jax.set_mesh(_mesh(4)):
        with pytest.raises(AssertionError, match="mesh"):
            tp_attention_block(x, *args, 4, 2, impl="xla")
