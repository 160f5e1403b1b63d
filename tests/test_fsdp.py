"""FSDP (ZeRO-3-style param + Adam-moment sharding over 'data').

The reference is DDP-only (training/main.py:135 — every rank holds full
params + optimizer); FSDP is this framework's storage axis past the 16 GB
HBM ceiling documented for ViT-H in PARITY.md. Tests: (1) the sharding
rules on an abstract full-size ViT-B tree, (2) a 3-step train-loop
equivalence run, FSDP on a 4x2 mesh vs the unsharded single-device step,
with the moments actually sharded.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu import configs as C
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.parallel import create_mesh, shard_batch, shard_params
from nans_clip_tpu.parallel import mesh as mesh_mod
from nans_clip_tpu.parallel.mesh import param_shardings
from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                    make_train_step)
from nans_clip_tpu.training.trainer import (shard_train_state,
                                            train_state_shardings)
from tests.test_trainer import TINY, _batch


def test_fsdp_specs_on_full_size_tree():
    cfg = C.load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    params, _ = jax.eval_shape(lambda: init_clip(jax.random.PRNGKey(0), cfg))
    mesh = create_mesh(data=4, model=2)
    sh = param_shardings(params, mesh, fsdp=True)

    def spec(*path):
        node = sh
        for k in path:
            node = node[k]
        return tuple(node.spec)

    # wqkv is TP-replicated (q|k|v columns not head-alignable) -> FSDP
    # shards its largest dim (3W).
    assert spec("visual", "transformer", "attn", "wqkv") == (None, None, "data")
    # wo is TP row-split on dim 1 -> FSDP takes the remaining width dim.
    assert spec("visual", "transformer", "attn", "wo") == (None, "model", "data")
    assert spec("bert", "encoder", "mlp", "w1") == (None, "data", "model")
    # vocab embedding: dim 0 (21128) divides by 4.
    assert spec("bert", "embeddings", "word")[0] == "data"
    # small leaves stay replicated (gather latency > storage win)
    assert spec("visual", "transformer", "attn", "bqkv") == ()
    assert spec("visual", "ln_pre", "scale") == ()
    # every spec is materializable: dims divide the axis sizes
    def check(path, leaf):
        node = sh
        for k in path:
            node = node[k.key] if hasattr(k, "key") else node[k]
        for d, axis in enumerate(tuple(node.spec)):
            if axis is not None:
                assert leaf.shape[d] % mesh.shape[axis] == 0, (path, leaf.shape)
    jax.tree_util.tree_map_with_path(check, params)


def test_fsdp_train_matches_unsharded(monkeypatch):
    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 1024)
    images, texts = _batch(16)
    tcfg = TrainConfig(lr=1e-3, warmup=2, max_steps=10)
    options = ModelOptions(attn_impl="xla")
    params0, _ = init_clip(jax.random.PRNGKey(0), TINY)

    def sharded_over_data(arr):
        return "data" in str(arr.sharding.spec)

    def run(fsdp):
        # baseline = the standard replicated-param DP path on the SAME
        # 4x2 mesh, so the diff isolates the FSDP storage sharding
        mesh = create_mesh(data=4, model=2)
        with jax.set_mesh(mesh):
            params = jax.tree.map(jnp.copy, params0)
            params = shard_params(params, mesh, fsdp=fsdp)
            state = create_train_state(params, {}, tcfg)
            sh = None
            if fsdp:
                state = shard_train_state(state, mesh, fsdp=True)
                sh = train_state_shardings(state, mesh, fsdp=True)
                # storage is actually sharded: params AND the Adam moments
                assert sharded_over_data(
                    state.params["visual"]["transformer"]["attn"]["wqkv"])
                mus = [leaf for path, leaf in
                       jax.tree_util.tree_leaves_with_path(state.opt_state)
                       if any(getattr(p, "key", None) == "wqkv" for p in path)]
                assert mus and all(sharded_over_data(m) for m in mus)
            step = make_train_step(TINY, tcfg, options, state_shardings=sh)
            losses = []
            for i in range(3):
                im, tx = jnp.asarray(images), jnp.asarray(texts)
                if fsdp:
                    im, tx = shard_batch(im, mesh), shard_batch(tx, mesh)
                state, metrics = step(state, im, tx, jax.random.PRNGKey(i))
                losses.append(float(metrics["loss"]))
            if fsdp:
                # the OUTPUT state kept the sharded storage (the constraint)
                assert sharded_over_data(
                    state.params["visual"]["transformer"]["attn"]["wqkv"])
            final = jax.tree.map(np.asarray, jax.device_get(state.params))
        return losses, final

    l_ref, p_ref = run(fsdp=False)
    l_fsdp, p_fsdp = run(fsdp=True)
    np.testing.assert_allclose(l_fsdp, l_ref, rtol=2e-5, atol=2e-5)
    # params: early Adam steps divide by sqrt(nu)+eps with tiny nu, so
    # fp32 reduction-order differences between the two partitionings get
    # amplified to ~10% of an update on a few elements — the losses above
    # are the tight equivalence check.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3),
                 p_fsdp, p_ref)


def test_pure_dp_accum_compiles_without_spmd_full_remat(tmp_path):
    """Regression guard for the r5 fix: pure-DP (data=N, model=1) + FSDP
    + grad accumulation used to route the remat'd scan body's microbatch
    re-slices through replicate-then-reshard — XLA logs "[SPMD]
    Involuntary full rematerialization" warnings from C++. The
    _encode_all microbatch sharding pin removes them; compile in a
    subprocess and assert the warning never appears (C++ stderr is not
    visible to capfd, hence the subprocess)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "puredp.py"
    script.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from nans_clip_tpu.models import ModelOptions\n"
        "from nans_clip_tpu.models.clip import init_clip\n"
        "from nans_clip_tpu.parallel import (create_mesh, shard_batch,\n"
        "                                    shard_params)\n"
        "from nans_clip_tpu.training import (TrainConfig,\n"
        "    create_train_state, make_train_step)\n"
        "from nans_clip_tpu.training.trainer import (shard_train_state,\n"
        "    train_state_shardings)\n"
        "from tests.test_trainer import TINY\n"
        "tcfg = TrainConfig(lr=1e-4, warmup=2, max_steps=4, accum_freq=2,\n"
        "                   mask_ratio=0.5)\n"
        "mesh = create_mesh(data=8, model=1)\n"
        "opts = ModelOptions(attn_impl='xla', deterministic=False)\n"
        "rs = np.random.RandomState(0)\n"
        "im = jnp.asarray(rs.randn(32, 32, 32, 3), jnp.float32)\n"
        "tx = jnp.zeros((32, 52), jnp.int32).at[:, 0].set(101)\n"
        "with jax.set_mesh(mesh):\n"
        "    params, _ = init_clip(jax.random.PRNGKey(0), TINY)\n"
        "    params = shard_params(params, mesh, fsdp=True,\n"
        "                          fsdp_min_size=1024)\n"
        "    state = create_train_state(params, {}, tcfg)\n"
        "    state = shard_train_state(state, mesh, fsdp=True,\n"
        "                              fsdp_min_size=1024)\n"
        "    sh = train_state_shardings(state, mesh, fsdp=True,\n"
        "                               fsdp_min_size=1024)\n"
        "    step = make_train_step(TINY, tcfg, opts, state_shardings=sh)\n"
        "    state, m = step(state, shard_batch(im, mesh),\n"
        "                    shard_batch(tx, mesh), jax.random.PRNGKey(0))\n"
        "    print('LOSS', float(m['loss']))\n")
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="")
    out = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "LOSS" in out.stdout
    assert "Involuntary full rematerialization" not in out.stderr, \
        out.stderr[-3000:]
