"""Eval-product parity vs the reference's OWN scripts (round-4 item 1).

Completes the eval parity matrix (test_pipeline_parity.py covers the
3-stage retrieval pipeline): the reference's UNMODIFIED
``cn_clip/eval/zeroshot_evaluation.py`` and the fork's root-level
``evaluate.py`` run here on CPU torch via ``tests/_shims`` (lmdb /
torchvision shims incl. a faithful ImageFolder, CUDA no-ops), against a
shared random checkpoint and shared fixtures; our twins run on the same
inputs. Asserts:

* zero-shot: identical top-1 accuracy, ELEVATER prediction rows
  (softmaxed, within fp32 tolerance) with identical per-image argmax,
  identical param counts in the json;
* template tables: our ``templates_for_dataset`` rendered output equals
  the reference's lambda tables for EVERY routed dataset key and for the
  fallback (incl. "imagenet", which the reference routes to the 183-prompt
  cvinw ``openai`` set — NOT its own 80-prompt imagenet table);
* fork evaluator: identical R@K / NDCG@K / mAP / MR in both directions on
  a split exercising multi-image texts, duplicate captions (the reference
  dedups queries by STRING), a pair pointing at a missing image (dropped
  from gt), and a hard-negative distractor pool with a non-image file in
  the directory.

Fixture note: the pairs env for ``evaluate.py`` is written WITHOUT the
builder's ``num_samples`` meta key — the script iterates
``range(txn.stat()["entries"])`` (evaluate.py:57-59) and would
``pickle.loads(None)`` on the meta key, so only meta-less splits are
readable by it. Images are STANDARD base64 (evaluate.py:70 uses the
non-validating ``base64.b64decode``, which silently corrupts urlsafe
payloads).
"""

import io
import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import REFERENCE, requires_reference  # noqa: E402
from tests.test_lmdb import RUN_REF, SHIMS  # noqa: E402

pytestmark = requires_reference


def _jpeg(rs, size=64):
    from PIL import Image
    arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def _run_ref(script, *args, cwd=None):
    cmd = [sys.executable, RUN_REF, script, *map(str, args)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd)
    assert out.returncode == 0, \
        f"{script} failed:\n{out.stdout[-4000:]}\n{out.stderr[-4000:]}"
    return out.stdout


def _save_ckpt(path, struct):
    import jax

    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.utils.torch_interop import (save_torch_checkpoint,
                                                   state_dict_from_params)
    cfg = load_config(struct)
    params, _ = init_clip(jax.random.PRNGKey(11), cfg)
    sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    save_torch_checkpoint(path, sd, {"epoch": 0, "step": 0, "name": "parity"})
    return path


# ---------------------------------------------------------------------------
# template tables
# ---------------------------------------------------------------------------

def test_template_tables_match_reference():
    """Render every reference template set and compare against ours,
    following the reference's routing (zeroshot_evaluation.py:235-247)."""
    sys.path.insert(0, REFERENCE)
    try:
        from cn_clip.eval.cvinw_zeroshot_templates import (
            aircraft_templates, country211_templates, eurosat_templates,
            flower_templates, food_templates, openai_templates)
    finally:
        sys.path.remove(REFERENCE)
    from nans_clip_tpu.eval.templates import (apply_template,
                                              templates_for_dataset)

    ref_table = {
        "fgvc-aircraft-2013b-variants102": aircraft_templates,
        "food-101": food_templates,
        "oxford-flower-102": flower_templates,
        "eurosat_clip": eurosat_templates,
        "resisc45_clip": eurosat_templates,
        "country211": country211_templates,
        "openai": openai_templates,
    }
    probes = ["猫", "fixed-wing aircraft", "南宋官窑"]
    keys = list(ref_table) + ["imagenet", "some-unknown-dataset"]
    for key in keys:
        ref_templates = ref_table.get(key, openai_templates)
        ours = templates_for_dataset(key)
        assert len(ours) == len(ref_templates), key
        for probe in probes:
            ref_rendered = [t(probe) for t in ref_templates]
            our_rendered = [apply_template(t, probe) for t in ours]
            assert our_rendered == ref_rendered, (key, probe)


# ---------------------------------------------------------------------------
# zero-shot classification vs the reference's own script
# ---------------------------------------------------------------------------

VISION, TEXT = "ViT-B-16", "RBT3-chinese"
N_CLASSES, PER_CLASS = 3, 2
TOTAL_IMAGES = N_CLASSES * PER_CLASS + 2  # + palette PNG + CMYK JPEG


@pytest.fixture(scope="module")
def zeroshot_run(tmp_path_factory):
    from PIL import Image

    root = str(tmp_path_factory.mktemp("zs_parity"))
    data = os.path.join(root, "imagefolder")
    rs = np.random.RandomState(5)
    for cls in ["class_a", "class_b", "class_c"]:
        cdir = os.path.join(data, cls)
        os.makedirs(cdir)
        for j in range(PER_CLASS):
            Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
                os.path.join(cdir, f"img{j}.jpg"), quality=92)
    # non-RGB sources: ImageFolder's default_loader converts to RGB BEFORE
    # the transform's Resize; resize-first NEAREST-resamples palette PNGs
    # and mis-interpolates CMYK JPEGs (advisor r4) — these rows diverge from
    # the reference unless load_one follows the loader's order
    Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE).save(
        os.path.join(data, "class_a", "palette.png"))
    Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).convert(
        "CMYK").save(os.path.join(data, "class_b", "cmyk_img.jpg"),
                     quality=92)
    labels = os.path.join(root, "labels.txt")
    with open(labels, "w", encoding="utf8") as f:
        f.write("青瓷碗\n山水画卷\n宋代官帽\n")
    ckpt = _save_ckpt(os.path.join(root, "zs.pt"), f"{VISION}@{TEXT}")

    ref_out = os.path.join(root, "ref_out")
    os.makedirs(ref_out)
    stdout = _run_ref(
        os.path.join(REFERENCE, "cn_clip/eval/zeroshot_evaluation.py"),
        "--vision-model", VISION, "--text-model", TEXT,
        "--precision", "fp32", "--label-file", labels,
        "--datapath", data, "--dataset", "country211",
        "--save-dir", ref_out, "--resume", ckpt,
        "--img-batch-size", 4, "--num-workers", 0)
    m = re.search(r"zeroshot-top1:\s*([0-9.eE+-]+)", stdout)
    assert m, stdout[-2000:]
    ref_top1 = float(m.group(1))
    with open(os.path.join(ref_out, "country211.json")) as f:
        ref_json = json.load(f)

    from nans_clip_tpu.eval import zeroshot_evaluation
    our_out = os.path.join(root, "our_out")
    our_top1 = zeroshot_evaluation.main([
        "--vision-model", VISION, "--text-model", TEXT,
        "--precision", "fp32", "--label-file", labels,
        "--datapath", data, "--dataset", "country211",
        "--save-dir", our_out, "--resume", ckpt,
        "--img-batch-size", "4"])
    with open(os.path.join(our_out, "country211.json")) as f:
        our_json = json.load(f)
    return {"ref_top1": ref_top1, "our_top1": our_top1,
            "ref": ref_json, "ours": our_json}


def test_zeroshot_top1_parity(zeroshot_run):
    assert zeroshot_run["our_top1"] == pytest.approx(
        zeroshot_run["ref_top1"], abs=1e-9)


def test_zeroshot_elevater_json_parity(zeroshot_run):
    ref, ours = zeroshot_run["ref"], zeroshot_run["ours"]
    for key in ("model_name", "dataset_name", "n_shot", "rnd_seeds",
                "num_trainable_params", "num_params", "num_visual_params",
                "num_backbone_params"):
        assert ours[key] == ref[key], key
    ref_pred = np.asarray(ref["predictions"][0], np.float64)
    our_pred = np.asarray(ours["predictions"][0], np.float64)
    assert ref_pred.shape == our_pred.shape == (TOTAL_IMAGES, N_CLASSES)
    # softmaxed rows
    np.testing.assert_allclose(ref_pred.sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(our_pred, ref_pred, atol=2e-2)
    assert (our_pred.argmax(-1) == ref_pred.argmax(-1)).all()


# ---------------------------------------------------------------------------
# fork evaluate.py vs ours
# ---------------------------------------------------------------------------

def _build_meta_less_split(root, rs):
    """LMDB split in the only layout the fork's evaluate.py can read (no
    num_samples meta key, standard base64), exercising multi-image texts,
    a duplicate caption, and a pair pointing at a missing image."""
    import base64

    from nans_clip_tpu.data import lmdb_store as L

    split = os.path.join(root, "lmdb", "valid")
    pairs = [
        (0, 0, "青瓷碗特写"),
        (1, 0, "青瓷碗特写"),        # multi-image text
        (1, 1, "宋代山水画"),
        (2, 2, "古籍书页"),
        (3, 3, "官窑瓷瓶"),
        (4, 4, "重复的题跋"),
        (5, 5, "重复的题跋"),        # duplicate caption, different text_id
        (99, 6, "缺失图片的描述"),    # image 99 absent from imgs env
        (6, 7, "木雕罗汉"),
        (7, 8, "绢本花鸟"),
    ]
    env_p = L.open(os.path.join(split, "pairs"))
    tp = env_p.begin(write=True)
    for i, rec in enumerate(pairs):
        tp.put(str(i).encode(), pickle.dumps(rec))
    tp.commit()
    env_p.close()
    env_i = L.open(os.path.join(split, "imgs"))
    ti = env_i.begin(write=True)
    for img_id in range(8):
        ti.put(str(img_id).encode(),
               base64.b64encode(_jpeg(rs)).decode().encode())
    ti.commit()
    env_i.close()
    return split


@pytest.fixture(scope="module")
def fork_eval_run(tmp_path_factory):
    from PIL import Image

    root = str(tmp_path_factory.mktemp("fork_eval"))
    rs = np.random.RandomState(9)
    split = _build_meta_less_split(root, rs)

    distract = os.path.join(root, "distractors")
    os.makedirs(distract)
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
            os.path.join(distract, f"d{i}.jpg"), quality=92)
    # palette-mode PNG distractor: evaluate.py:120 converts to RGB BEFORE
    # preprocess; resize-first would NEAREST-resample it (advisor r4)
    Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE).save(os.path.join(distract, "d3.png"))
    with open(os.path.join(distract, "notes.txt"), "w") as f:
        f.write("not an image")  # enumerate()d but skipped by both sides

    # load_from_name("ViT-B-16") expects this exact filename; values are
    # PRE-ROUNDED through fp16 because create_model converts the torch
    # model to fp16 before load_state_dict (clip/utils.py:209-210) and
    # evaluate.py floats it after — pre-rounding makes both sides'
    # effective base weights bit-identical.
    predir = os.path.join(root, "pretrained")
    os.makedirs(predir)
    ckpt = os.path.join(predir, "clip_cn_vit-b-16.pt")
    _save_ckpt(ckpt, "ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    obj = torch.load(ckpt, map_location="cpu", weights_only=False)
    obj["state_dict"] = {
        k: (v.half().float() if v.is_floating_point() else v)
        for k, v in obj["state_dict"].items()}
    torch.save(obj, ckpt)

    _run_ref(os.path.join(REFERENCE, "evaluate.py"),
             "--mode", "zeroshot", "--data_dir", split,
             "--pretrained", predir, "--distractor_dir", distract,
             cwd=root)
    with open(os.path.join(root, "eval_results_zeroshot.json"),
              encoding="utf-8") as f:
        ref = json.load(f)

    from nans_clip_tpu.eval import retrieval_suite
    our_path = os.path.join(root, "ours.json")
    retrieval_suite.main([
        "--data", split, "--resume", ckpt,
        "--vision-model", "ViT-B-16",
        "--text-model", "RoBERTa-wwm-ext-base-chinese",
        "--precision", "fp32", "--image-transform", "pil",
        "--distractor-dir", distract, "--batch-size", "8",
        "--output", our_path])
    with open(our_path) as f:
        ours = json.load(f)
    return {"ref": ref, "ours": ours, "ckpt": ckpt}


def test_fork_eval_pool_counts(fork_eval_run):
    ref, ours = fork_eval_run["ref"], fork_eval_run["ours"]
    assert ref["num_domain_images"] == ours["num_domain_images"] == 8
    assert ref["num_distractors"] == ours["num_distractors"] == 4
    assert ref["num_total_images"] == ours["num_total_images"] == 12
    assert ref["num_texts"] == ours["num_texts"] == 8  # 9 ids, 1 dup string


def test_fork_eval_crashes_on_meta_keyed_split(fork_eval_run, tmp_path):
    """Substantiates the fixture-design claim above: the fork's OWN
    evaluate.py cannot read splits carrying the builder's ``num_samples``
    meta key — its range(txn.stat()['entries']) loop (evaluate.py:57-59)
    runs one past the data and pickle.loads(None) on the meta key. (Our
    retrieval_suite and lmdb_to_npack handle both layouts.)"""
    from nans_clip_tpu.data import lmdb_store as L

    split = str(tmp_path / "meta_split")
    env_p = L.open(os.path.join(split, "pairs"))
    tp = env_p.begin(write=True)
    tp.put(b"0", pickle.dumps((0, 0, "有元数据键的配对")))
    tp.put(b"num_samples", b"1")        # the builder's meta key
    tp.commit()
    env_p.close()
    env_i = L.open(os.path.join(split, "imgs"))
    ti = env_i.begin(write=True)
    import base64 as _b64
    ti.put(b"0", _b64.b64encode(_jpeg(np.random.RandomState(1))).decode().encode())
    ti.commit()
    env_i.close()

    predir = os.path.dirname(fork_eval_run["ckpt"])
    cmd = [sys.executable, RUN_REF,
           os.path.join(REFERENCE, "evaluate.py"),
           "--mode", "zeroshot", "--data_dir", split,
           "--pretrained", predir]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=str(tmp_path))
    assert out.returncode != 0
    assert "pickle" in out.stderr or "NoneType" in out.stderr, \
        out.stderr[-1500:]


def test_fork_eval_metric_parity(fork_eval_run):
    ref, ours = fork_eval_run["ref"], fork_eval_run["ours"]
    for direction in ("text_to_image", "image_to_text"):
        ref_m = ref[direction]
        our_m = ours["zeroshot"][direction]
        assert set(ref_m) == set(our_m)
        for k, v in ref_m.items():
            assert our_m[k] == pytest.approx(v, abs=1e-9), (direction, k)
