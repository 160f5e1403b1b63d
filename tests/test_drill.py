"""Composed product drill (nans_clip_tpu/drill.py) at CPU test scale.

One run through the WHOLE product: dataset build -> finetune -> 3-stage
eval (mean recall must improve) -> engine build -> daemon serve ->
served == offline features. This is the only test class that catches
cross-stage composition drift (checkpoint naming between stages,
transform-mode or precision mismatches train-vs-eval-vs-serve) — each
stage's own tests pass even when the composition is broken.
"""

import json
import os

from nans_clip_tpu.drill import main as drill_main


def test_drill_tiny_cpu(tmp_path):
    # 100 steps: under the suite's 8-device mesh each step consumes the
    # full 128-pair dataset, so this converges harder than the standalone
    # 1-device default of 200 (which reaches MR 100/95.8 — see
    # SCALES['tiny']); margins here are asserted by the drill itself
    record = drill_main([
        "--scale", "tiny", "--platform", "cpu", "--steps", "100",
        "--workdir", str(tmp_path / "drill"),
        "--out", str(tmp_path / "DRILL.json")])
    assert record["ok"]
    assert record["improved"]
    for d in ("t2i", "i2t"):
        assert record["mean_recall_trained"][d] > record["mean_recall_init"][d]
    # every stage ran and left its artifact
    stages = record["stages"]
    assert set(stages) == {"build_dataset", "init_checkpoint", "train",
                           "eval_init", "eval_trained", "build_engines",
                           "serve"}
    assert stages["train"]["steps_run"] == record["steps"]
    assert os.path.exists(stages["train"]["checkpoint"])
    assert stages["serve"]["served_vs_offline_image_max_diff"] <= 1e-5
    assert stages["serve"]["served_vs_offline_text_max_diff"] <= 1e-5
    with open(tmp_path / "DRILL.json") as f:
        assert json.load(f)["ok"]

    # Quality ratchet (r4 verdict #6): the seeded run's converged quality
    # is a RECORDED BAND, not just "improved" — a JAX-side regression in
    # augmentation/masking/routing that still trains would land below it
    # even while every parity test (which only compares against torch
    # where shims run) stays green. Recorded r5: t2i 100.0 / i2t 100.0
    # mean recall, R@1 100/100 at 100 steps under the suite's 8-device
    # mesh (and 100.0/95.8 at the standalone 200-step default).
    for d in ("t2i", "i2t"):
        assert record["mean_recall_trained"][d] >= 95.0, (
            d, record["mean_recall_trained"])
        assert record["recalls_trained"][d]["r1"] >= 90.0, (
            d, record["recalls_trained"])
