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


def test_missing_checkpoint_raises_unless_opted_out(tmp_path):
    """A typo'd --resume tag must not silently train from random init."""
    import pytest
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    template = create_train_state(params, {}, TrainConfig(max_steps=10))
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "none"), "epoch_latest", template)
    state, meta = restore_checkpoint(str(tmp_path / "none"), "epoch_latest",
                                     template, missing_ok=True)
    assert meta is None


def test_reset_optimizer_survives_optimizer_change(tmp_path):
    """--reset-optimizer must restore even when the NEW optimizer state
    has a different structure/dtype than the stored one (the main reason
    to pass the flag): the stored opt_state is read against its on-disk
    metadata and discarded."""
    from nans_clip_tpu.utils.checkpoint import save_checkpoint

    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    st = create_train_state(params, {}, TrainConfig(max_steps=10))
    d = str(tmp_path / "ck")
    save_checkpoint(d, "epoch1", st, {"epoch": 1, "step": 1})
    # new run with bf16 Adam moments: different opt_state dtypes
    tcfg2 = TrainConfig(max_steps=10, adam_state_dtype="bfloat16")
    template = create_train_state(jax.tree.map(jnp.copy, params), {}, tcfg2)
    restored, _ = restore_checkpoint(d, "epoch1", template,
                                     reset_optimizer=True)
    same = jax.tree.map(lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
                        restored.params, st.params)
    assert all(jax.tree.leaves(same))


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
