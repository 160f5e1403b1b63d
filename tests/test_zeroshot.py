"""Zero-shot classifier + retrieval-suite end-to-end tests (tiny model, CPU)."""

import io
import json
import os

import jax
import numpy as np
import pytest

from nans_clip_tpu.eval.retrieval_suite import evaluate_model, load_split
from nans_clip_tpu.eval.zeroshot_evaluation import (iter_imagefolder, run,
                                                    zero_shot_classifier)
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from tests.test_trainer import TINY

OPTS = ModelOptions(attn_impl="xla")


@pytest.fixture(scope="module")
def tiny_model():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    return params


def test_zero_shot_classifier_shape(tiny_model):
    classifier = zero_shot_classifier(TINY, tiny_model, OPTS,
                                      classnames=["猫", "狗", "鸟"],
                                      templates=["一张{}的照片", "{}"],
                                      batch_size=4)
    assert classifier.shape == (TINY.embed_dim, 3)
    np.testing.assert_allclose(np.linalg.norm(classifier, axis=0), 1.0, atol=1e-5)


def test_imagefolder_run(tiny_model, tmp_path):
    from PIL import Image
    rs = np.random.RandomState(0)
    for ci, cls in enumerate(["猫", "狗"]):
        d = tmp_path / cls
        d.mkdir()
        for j in range(3):
            Image.fromarray(rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                d / f"{j}.jpg")
    samples = list(iter_imagefolder(str(tmp_path)))
    assert len(samples) == 6
    assert {s[1] for s in samples} == {0, 1}

    classifier = zero_shot_classifier(TINY, tiny_model, OPTS, ["猫", "狗"],
                                      ["{}"], batch_size=4)
    acc, preds = run(TINY, tiny_model, {}, OPTS, classifier, str(tmp_path),
                     batch_size=4)
    assert 0.0 <= acc <= 1.0
    assert len(preds) == 6
    assert len(preds[0]) == 2
    # reference run() dumps SOFTMAXED rows (zeroshot_evaluation.py:141)
    for row in preds:
        assert sum(row) == pytest.approx(1.0, abs=1e-5)
        assert all(v >= 0 for v in row)


def test_retrieval_suite_end_to_end(tiny_model, tmp_path):
    import base64
    from PIL import Image
    from nans_clip_tpu.preprocess.build_dataset import build_split

    rs = np.random.RandomState(0)
    with open(tmp_path / "val_imgs.tsv", "w") as f:
        for i in range(6):
            buf = io.BytesIO()
            Image.fromarray(rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
                buf, format="JPEG")
            f.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
    with open(tmp_path / "val_texts.jsonl", "w", encoding="utf-8") as f:
        for t in range(6):
            f.write(json.dumps({"text_id": t, "text": f"第{t}卷",
                                "image_ids": [t]}, ensure_ascii=False) + "\n")
    build_split(str(tmp_path), "val")

    image_ids, texts, t2i_gt, i2t_gt, ds = load_split(str(tmp_path / "val"))
    assert len(image_ids) == 6 and len(texts) == 6
    assert all(isinstance(t, str) for t in texts)  # queries are raw strings
    res = evaluate_model(TINY, tiny_model, {}, OPTS, ds, image_ids, texts,
                         t2i_gt, i2t_gt, batch_size=4, context_length=52)
    for direction in ("text_to_image", "image_to_text"):
        m = res[direction]
        assert set(m) == {"R@1", "R@5", "R@10", "NDCG@1", "NDCG@5", "NDCG@10",
                          "mAP", "MR"}
        assert m["R@10"] == 100.0  # gallery of 6 < 10: every query must hit


def test_retrieval_suite_native_cmyk_fallback(tiny_model, tmp_path):
    """Native mode must not abort on valid non-baseline-RGB JPEGs: the C
    decoder rejects CMYK (ok=0), and the suite falls back to PIL per image
    (advisor r4) — features must match the pil mode on a mixed split."""
    import base64
    from PIL import Image
    from nans_clip_tpu.eval.retrieval_suite import compute_features
    from nans_clip_tpu.preprocess.build_dataset import build_split

    rs = np.random.RandomState(3)
    with open(tmp_path / "val_imgs.tsv", "w") as f:
        for i in range(4):
            buf = io.BytesIO()
            img = Image.fromarray(
                rs.randint(0, 255, (40, 40, 3), dtype=np.uint8))
            if i == 2:  # valid CMYK JPEG in an otherwise RGB split
                img = img.convert("CMYK")
            img.save(buf, format="JPEG", quality=92)
            f.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
    with open(tmp_path / "val_texts.jsonl", "w", encoding="utf-8") as f:
        for t in range(4):
            f.write(json.dumps({"text_id": t, "text": f"第{t}卷",
                                "image_ids": [t]}, ensure_ascii=False) + "\n")
    build_split(str(tmp_path), "val")

    image_ids, texts, _, _, ds = load_split(str(tmp_path / "val"))
    kw = dict(batch_size=4, context_length=52)
    img_n, txt_n = compute_features(TINY, tiny_model, {}, OPTS, ds,
                                    image_ids, texts, pil=False, **kw)
    img_p, txt_p = compute_features(TINY, tiny_model, {}, OPTS, ds,
                                    image_ids, texts, pil=True, **kw)
    np.testing.assert_allclose(img_n, img_p, atol=1e-5)
    np.testing.assert_allclose(txt_n, txt_p, atol=1e-5)
