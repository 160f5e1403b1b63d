"""End-to-end training CLI integration test (tiny model, 8-device CPU mesh):
build dataset -> train 1 epoch -> checkpoint -> auto-resume -> continue."""

import base64
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.preprocess.build_dataset import build_split
from nans_clip_tpu.training.main import main as train_main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("clidata")
    rs = np.random.RandomState(0)
    with open(root / "train_imgs.tsv", "w") as f:
        for i in range(32):
            buf = io.BytesIO()
            Image.fromarray(rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                buf, format="JPEG")
            f.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
    with open(root / "train_texts.jsonl", "w", encoding="utf-8") as f:
        for t in range(32):
            f.write(json.dumps({"text_id": t, "text": f"图{t}",
                                "image_ids": [t]}, ensure_ascii=False) + "\n")
    build_split(str(root), "train")
    return str(root / "train")


def test_train_resume_cycle(data_dir, tmp_path):
    logs = str(tmp_path / "logs")
    common = [
        "--train-data", data_dir, "--val-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "cli_test",
        "--num-workers", "2", "--valid-num-workers", "2",
    ]
    state = train_main(common + ["--max-epochs", "1"])
    assert int(state.step) == 2  # 32 pairs / global batch 16 = 2 steps
    ckpt_dir = os.path.join(logs, "cli_test", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch1"))
    assert os.path.exists(os.path.join(ckpt_dir, "LATEST"))

    # auto-resume continues (no --resume flag needed)
    state2 = train_main(common + ["--max-epochs", "2"])
    assert int(state2.step) == 4
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch2"))


def test_train_fsdp_cycle(data_dir, tmp_path):
    """--fsdp: params + Adam moments stored sharded over 'data', full
    train -> Orbax checkpoint -> auto-resume cycle (restore must rebuild
    the sharded arrays from the sharded-state template)."""
    logs = str(tmp_path / "logs")
    common = [
        "--train-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "fsdp_test",
        "--num-workers", "2", "--fsdp", "--tp", "2",
        "--fsdp-min-size", "1024",
    ]
    state = train_main(common + ["--max-epochs", "1"])
    assert int(state.step) == 4  # 32 pairs / (bs2 x data4) = 4 steps
    wqkv = state.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "data" in str(wqkv.sharding.spec)
    state2 = train_main(common + ["--max-epochs", "2"])
    assert int(state2.step) == 8
    wqkv2 = state2.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "data" in str(wqkv2.sharding.spec)


def test_train_pp_cycle(data_dir, tmp_path):
    """--pp 2: transformer layers stored per pipeline stage (leading dim
    sharded over 'pipe'), full train -> checkpoint -> auto-resume cycle
    through the GPipe shard_map path (parallel/pp.py)."""
    logs = str(tmp_path / "logs")
    common = [
        "--train-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "4", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "pp_test",
        "--num-workers", "2", "--pp", "2",
    ]
    state = train_main(common + ["--max-epochs", "1"])
    assert int(state.step) == 2  # 32 pairs / (bs4 x data4) = 2 steps
    wqkv = state.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "pipe" in str(wqkv.sharding.spec)
    ckpt_dir = os.path.join(logs, "pp_test", "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "LATEST"))
    state2 = train_main(common + ["--max-epochs", "2"])
    assert int(state2.step) == 4


def test_steps_per_call_matches_single(data_dir, tmp_path):
    """--steps-per-call K scans K optimizer steps per dispatch; the
    trajectory must MATCH the K=1 run (same seed -> same per-step rng
    stream and data order), including an epoch tail shorter than K
    (flushed as single steps) and the max-steps trim."""
    def run(name, extra):
        logs = str(tmp_path / name)
        return train_main([
            "--train-data", data_dir,
            "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
            "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
            "--log-interval", "1", "--logs", logs, "--name", name,
            "--num-workers", "2", "--max-epochs", "2"] + extra)

    ref = run("spc1", [])                          # 2 steps/epoch, 4 total
    k2 = run("spc2", ["--steps-per-call", "2"])    # one 2-step dispatch/epoch
    k3 = run("spc3", ["--steps-per-call", "3"])    # every epoch is a 2-tail
    assert int(ref.step) == int(k2.step) == int(k3.step) == 4
    for got in (k2, k3):
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             ref.params, got.params)
        assert max(jax.tree.leaves(diffs)) < 1e-6, diffs

    # max-steps trim: 3 steps at K=2 -> a full dispatch + a 1-step tail
    trimmed = run("spc_trim", ["--steps-per-call", "2", "--max-steps", "3"])
    assert int(trimmed.step) == 3


def test_mid_epoch_resume_skips_trained_batches(data_dir, tmp_path, monkeypatch):
    """Resume from a mid-epoch step checkpoint fast-forwards the loader past
    the batches already trained (no batch trained twice, epoch tail kept)."""
    from nans_clip_tpu.data.dataset import DataLoader as DL
    logs = str(tmp_path / "logs_mid")
    common = [
        "--train-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "mid_resume",
        "--num-workers", "2",
    ]
    train_main(common + ["--max-epochs", "1", "--max-steps", "1",
                         "--save-step-frequency", "1"])
    ckpt_dir = os.path.join(logs, "mid_resume", "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "step_1.meta.json"))
    # simulate a run killed after the step-save but before the epoch-end
    # save: LATEST points at the mid-epoch step checkpoint
    with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
        f.write("step_1")

    calls = []
    orig = DL.set_epoch

    def record(self, epoch, start_batch=0):
        calls.append((epoch, start_batch))
        return orig(self, epoch, start_batch)

    monkeypatch.setattr(DL, "set_epoch", record)
    state = train_main(common + ["--max-epochs", "1"])
    # epoch 0 resumed one batch in (step 1 of 2 already trained)
    assert (0, 1) in calls, calls
    assert int(state.step) == 2


def test_cross_topology_resume(data_dir, tmp_path):
    """Elastic resume: a checkpoint written under one mesh topology must
    restore under a DIFFERENT one (Orbax reshards against the template
    state built on the NEW mesh). Epoch 1 trains dp4xtp2 with FSDP
    storage; epoch 2 auto-resumes as plain dp8 — the production
    fleet-resize path (reference has no analog: DDP checkpoints are
    rank-agnostic only because everything is replicated)."""
    logs = str(tmp_path / "logs")
    base = [
        "--train-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "xtopo_test",
        "--num-workers", "2",
    ]
    state = train_main(base + ["--max-epochs", "1", "--fsdp", "--tp", "2",
                               "--fsdp-min-size", "1024"])
    assert int(state.step) == 4  # 32 pairs / (bs2 x data4) = 4 steps
    wqkv = state.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "data" in str(wqkv.sharding.spec)  # FSDP-sharded storage

    # resume WITHOUT tp/fsdp: 8-way data mesh, fully replicated params
    state2 = train_main(base + ["--max-epochs", "2"])
    assert int(state2.step) == 6  # 4 + 32/(bs2 x data8) = 4 + 2
    wqkv2 = state2.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "data" not in str(wqkv2.sharding.spec)
    assert np.isfinite(np.asarray(wqkv2, np.float32)).all()


def test_cross_topology_mid_epoch_resume(data_dir, tmp_path, monkeypatch):
    """Mid-epoch elastic resume: the checkpoint records the SAMPLE offset
    (epoch_samples), so resuming under a different global batch skips
    exactly the trained samples — epoch_batch alone would convert step
    counts at the NEW batch size and silently skip (or replay) data."""
    from nans_clip_tpu.data.dataset import DataLoader as DL
    logs = str(tmp_path / "logs")
    base = [
        "--train-data", data_dir,
        "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
        "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
        "--log-interval", "1", "--logs", logs, "--name", "xtopo_mid",
        "--num-workers", "2",
    ]
    # dp4xtp2: global batch 8, 32 pairs -> 4 steps/epoch; stop after 2
    state = train_main(base + ["--tp", "2", "--max-epochs", "1",
                               "--max-steps", "2",
                               "--save-step-frequency", "2"])
    assert int(state.step) == 2     # 16 of 32 samples trained
    ckpt_dir = os.path.join(logs, "xtopo_mid", "checkpoints")
    with open(os.path.join(ckpt_dir, "step_2.meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch_samples"] == 16
    with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
        f.write("step_2")

    calls = []
    orig = DL.set_epoch

    def record(self, epoch, start_batch=0):
        calls.append((epoch, start_batch))
        return orig(self, epoch, start_batch)

    monkeypatch.setattr(DL, "set_epoch", record)
    # resume as dp8: global batch 16 -> the 16 trained samples are exactly
    # 1 new-size step; the epoch's remaining 16 samples train as 1 step
    state2 = train_main(base + ["--max-epochs", "1"])
    assert (0, 1) in calls, calls   # fast-forwarded 1 loader batch, not 2
    assert int(state2.step) == 3


def test_steps_per_call_composes_with_fsdp(data_dir, tmp_path):
    """--steps-per-call x --fsdp --tp: the scanned step body carries the
    with_sharding_constraint pin, so the multi-step dispatch must keep the
    state ZeRO-3-sharded over 'data' AND produce the same trajectory as
    the K=1 fsdp run."""
    def run(name, extra):
        logs = str(tmp_path / name)
        return train_main([
            "--train-data", data_dir,
            "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
            "--batch-size", "2", "--lr", "1e-4", "--warmup", "2",
            "--log-interval", "1", "--logs", logs, "--name", name,
            "--num-workers", "2", "--max-epochs", "1",
            "--fsdp", "--tp", "2", "--fsdp-min-size", "1024"] + extra)

    ref = run("fsdp_k1", [])
    k2 = run("fsdp_k2", ["--steps-per-call", "2"])
    assert int(ref.step) == int(k2.step) == 4
    # the multi-step output state kept the fsdp storage sharding
    wqkv = k2.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "data" in str(wqkv.sharding.spec)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ref.params, k2.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6, diffs


def test_steps_per_call_composes_with_pp(data_dir, tmp_path):
    """--steps-per-call x --pp: the GPipe shard_map step scans identically
    — per-stage storage sharding kept, trajectory equal to K=1."""
    def run(name, extra):
        logs = str(tmp_path / name)
        return train_main([
            "--train-data", data_dir,
            "--tiny-model", "--precision", "fp32", "--attn-impl", "xla",
            "--batch-size", "4", "--lr", "1e-4", "--warmup", "2",
            "--log-interval", "1", "--logs", logs, "--name", name,
            "--num-workers", "2", "--max-epochs", "1", "--pp", "2"] + extra)

    ref = run("pp_k1", [])
    k2 = run("pp_k2", ["--steps-per-call", "2"])
    assert int(ref.step) == int(k2.step) == 2
    wqkv = k2.params["visual"]["transformer"]["attn"]["wqkv"]
    assert "pipe" in str(wqkv.sharding.spec)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ref.params, k2.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6, diffs
