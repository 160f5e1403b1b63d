"""Checkpoint save/restore tests: trainer path, eval path, reset flags,
torch-format export round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.training import TrainConfig, create_train_state
from nans_clip_tpu.utils.checkpoint import (latest_exists, restore_checkpoint,
                                            save_checkpoint)
from tests.test_trainer import TINY


@pytest.fixture()
def saved_state(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(max_steps=10)
    state = create_train_state(params, {}, tcfg)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, "epoch3", state, {"epoch": 3, "step": 7, "name": "t"})
    return d, state, tcfg


def test_latest_pointer(saved_state):
    d, state, _ = saved_state
    assert latest_exists(d)
    with open(os.path.join(d, "LATEST")) as f:
        assert f.read().strip() == "epoch3"


def test_restore_roundtrip(saved_state):
    d, state, tcfg = saved_state
    params0, _ = init_clip(jax.random.PRNGKey(1), TINY)  # different init
    template = create_train_state(params0, {}, tcfg)
    restored, meta = restore_checkpoint(d, "epoch_latest", template)
    assert meta == {"epoch": 3, "step": 7, "name": "t"}
    assert int(restored.step) == 7
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                        restored.params, state.params)
    assert all(jax.tree.leaves(same))


def test_reset_optimizer(saved_state):
    d, state, tcfg = saved_state
    params0, _ = init_clip(jax.random.PRNGKey(1), TINY)
    template = create_train_state(params0, {}, tcfg)
    restored, _ = restore_checkpoint(d, "epoch3", template, reset_optimizer=True)
    # opt_state stays the template's (fresh), params come from disk
    fresh = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                         restored.opt_state, template.opt_state)
    assert all(jax.tree.leaves(fresh))


def test_missing_checkpoint_is_noop(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    template = create_train_state(params, {}, TrainConfig(max_steps=10))
    state, meta = restore_checkpoint(str(tmp_path / "none"), "epoch_latest", template)
    assert meta is None


def test_eval_path_restores_orbax_dir(saved_state):
    d, state, _ = saved_state
    from nans_clip_tpu.eval.model_io import load_eval_model

    # monkeypatch-free: load_eval_model builds its own cfg by name, so just
    # exercise the orbax branch through a tiny struct-compatible path by
    # calling the underlying restore directly.
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(d), "epoch3"))
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                        restored["params"], jax.tree.map(np.asarray, state.params))
    assert all(jax.tree.leaves(same))
