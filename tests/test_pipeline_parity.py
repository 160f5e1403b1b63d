"""End-to-end retrieval-pipeline parity against the reference's OWN stack.

VERDICT round-1 item 1: prove the two *pipelines* agree, not just the
towers. The reference's unmodified 3-stage eval
(eval/extract_features.py:165-203 -> make_topk_predictions.py:69-88 ->
evaluation.py:94-157, plus the _tr mirror) runs here on CPU torch via
tests/_shims (lmdb + torchvision shims, cuda no-ops); our pipeline runs on
the same LMDB-built dataset and the same random checkpoint. Asserts:

* per-tower features match within fp32 tolerance (text AND image — the
  image path includes JPEG decode + PIL bicubic resize + normalize);
* top-k prediction lists are IDENTICAL;
* R@1/5/10 + mean_recall are IDENTICAL, in both retrieval directions.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import REFERENCE, requires_reference  # noqa: E402
from tests.test_lmdb import RUN_REF, _build_lmdb_split  # noqa: E402

# the reference validator requires exactly top-10 predictions per query
# (evaluation.py:15-58), so both galleries must hold >= 10 items
N_IMGS, N_TEXTS = 12, 10
VISION, TEXT = "ViT-B-16", "RBT3-chinese"


def _run_ref(script, *args):
    cmd = [sys.executable, RUN_REF,
           os.path.join(REFERENCE, "cn_clip/eval", script), *map(str, args)]
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def _read_feats(path, key):
    feats = {}
    with open(path) as f:
        for line in f:
            obj = json.loads(line)
            feats[obj[key]] = np.asarray(obj["feature"], np.float32)
    return feats


def _read_topk(path, qkey, gkey):
    out = {}
    with open(path) as f:
        for line in f:
            obj = json.loads(line)
            out[obj[qkey]] = list(obj[gkey])
    return out


@pytest.fixture(scope="module")
def parity_run(tmp_path_factory):
    """Build dataset + shared checkpoint, run BOTH pipelines end to end."""
    import jax

    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.preprocess.lmdb_to_npack import convert_split
    from nans_clip_tpu.utils.torch_interop import (save_torch_checkpoint,
                                                   state_dict_from_params)

    root = str(tmp_path_factory.mktemp("parity"))
    split = _build_lmdb_split(root, n_imgs=N_IMGS, n_texts=N_TEXTS, seed=3)
    texts_jsonl = os.path.join(root, "valid_texts.jsonl")

    # shared random checkpoint in the reference's .pt layout
    cfg = load_config(f"{VISION}@{TEXT}")
    params, _ = init_clip(jax.random.PRNGKey(7), cfg)
    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    ckpt = os.path.join(root, "parity.pt")
    save_torch_checkpoint(ckpt, sd, {"epoch": 0, "step": 0, "name": "parity"})

    d = {"root": root, "split": split, "texts": texts_jsonl, "ckpt": ckpt}

    # ---- reference pipeline (its own code, unmodified, CPU) ----
    d["ref_txt"] = os.path.join(root, "ref.txt_feat.jsonl")
    d["ref_img"] = os.path.join(root, "ref.img_feat.jsonl")
    _run_ref("extract_features.py",
             "--extract-image-feats", "--extract-text-feats",
             "--image-data", os.path.join(split, "imgs"),
             "--text-data", texts_jsonl,
             "--text-feat-output-path", d["ref_txt"],
             "--image-feat-output-path", d["ref_img"],
             "--resume", ckpt, "--precision", "fp32",
             "--vision-model", VISION, "--text-model", TEXT,
             "--img-batch-size", 4, "--text-batch-size", 4)
    d["ref_topk"] = os.path.join(root, "ref_topk.jsonl")
    _run_ref("make_topk_predictions.py",
             "--image-feats", d["ref_img"], "--text-feats", d["ref_txt"],
             "--top-k", 10, "--eval-batch-size", 32,
             "--output", d["ref_topk"])
    d["ref_score"] = os.path.join(root, "ref_score.json")
    _run_ref("evaluation.py", texts_jsonl, d["ref_topk"], d["ref_score"])
    # image->text mirror
    _run_ref("transform_ir_annotation_to_tr.py", "--input", texts_jsonl)
    d["tr_annot"] = texts_jsonl.replace(".jsonl", "") + ".tr.jsonl"
    d["ref_topk_tr"] = os.path.join(root, "ref_topk_tr.jsonl")
    _run_ref("make_topk_predictions_tr.py",
             "--image-feats", d["ref_img"], "--text-feats", d["ref_txt"],
             "--top-k", 10, "--eval-batch-size", 32,
             "--output", d["ref_topk_tr"])
    d["ref_score_tr"] = os.path.join(root, "ref_score_tr.json")
    _run_ref("evaluation_tr.py", d["tr_annot"], d["ref_topk_tr"],
             d["ref_score_tr"])

    # ---- our pipeline on the same inputs ----
    from nans_clip_tpu.eval import (evaluation, evaluation_tr,
                                    extract_features, make_topk_predictions)

    convert_split(split)  # lmdb -> npack ingestion
    d["our_txt"] = os.path.join(root, "our.txt_feat.jsonl")
    d["our_img"] = os.path.join(root, "our.img_feat.jsonl")
    extract_features.main([
        "--extract-image-feats", "--extract-text-feats",
        "--image-data", split, "--text-data", texts_jsonl,
        "--text-feat-output-path", d["our_txt"],
        "--image-feat-output-path", d["our_img"],
        "--resume", ckpt, "--precision", "fp32",
        "--vision-model", VISION, "--text-model", TEXT,
        "--image-transform", "pil",
        "--img-batch-size", "4", "--text-batch-size", "4"])
    d["our_topk"] = os.path.join(root, "our_topk.jsonl")
    make_topk_predictions.main([
        "--image-feats", d["our_img"], "--text-feats", d["our_txt"],
        "--top-k", "10", "--eval-batch-size", "32",
        "--output", d["our_topk"]])
    d["our_score"] = os.path.join(root, "our_score.json")
    evaluation.main([texts_jsonl, d["our_topk"], d["our_score"]])
    d["our_topk_tr"] = os.path.join(root, "our_topk_tr.jsonl")
    make_topk_predictions.main([
        "--image-feats", d["our_img"], "--text-feats", d["our_txt"],
        "--top-k", "10", "--eval-batch-size", "32", "--tr",
        "--output", d["our_topk_tr"]])
    d["our_score_tr"] = os.path.join(root, "our_score_tr.json")
    evaluation_tr.main([d["tr_annot"], d["our_topk_tr"], d["our_score_tr"]])
    return d


requires_reference_mod = requires_reference


@requires_reference
def test_feature_parity(parity_run):
    d = parity_run
    ref_t = _read_feats(d["ref_txt"], "text_id")
    our_t = _read_feats(d["our_txt"], "text_id")
    assert set(ref_t) == set(our_t) and len(ref_t) == N_TEXTS
    for tid in ref_t:
        np.testing.assert_allclose(our_t[tid], ref_t[tid], atol=2e-4,
                                    err_msg=f"text {tid}")
    ref_i = _read_feats(d["ref_img"], "image_id")
    our_i = _read_feats(d["our_img"], "image_id")
    assert set(ref_i) == set(our_i) and len(ref_i) == N_IMGS
    for iid in ref_i:
        np.testing.assert_allclose(our_i[iid], ref_i[iid], atol=2e-4,
                                    err_msg=f"image {iid}")


@requires_reference
def test_topk_parity(parity_run):
    d = parity_run
    ref = _read_topk(d["ref_topk"], "text_id", "image_ids")
    ours = _read_topk(d["our_topk"], "text_id", "image_ids")
    assert ref == ours
    ref_tr = _read_topk(d["ref_topk_tr"], "image_id", "text_ids")
    ours_tr = _read_topk(d["our_topk_tr"], "image_id", "text_ids")
    assert ref_tr == ours_tr


@requires_reference
def test_score_parity(parity_run):
    d = parity_run
    for ref_path, our_path in ((d["ref_score"], d["our_score"]),
                               (d["ref_score_tr"], d["our_score_tr"])):
        with open(ref_path) as f:
            ref = json.load(f)
        with open(our_path) as f:
            ours = json.load(f)
        assert ref.get("success", True), ref
        ref_scores = {k: v for k, v in ref.items() if isinstance(v, (int, float))}
        assert ref_scores, ref
        for k, v in ref_scores.items():
            assert ours[k] == pytest.approx(v, abs=1e-9), (k, ours, ref)
