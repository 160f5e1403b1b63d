"""Eval stack tests: topk, recall scoring, annotation transpose, templates."""

import json
import os

import numpy as np
import pytest

from nans_clip_tpu.eval.evaluation import (compute_score, read_submission,
                                           recall_at_ks, read_reference)
from nans_clip_tpu.eval.make_topk_predictions import load_feats, topk
from nans_clip_tpu.eval.templates import (imagenet_classnames,
                                          imagenet_templates,
                                          templates_for_dataset)
from nans_clip_tpu.eval.transform_ir_annotation_to_tr import transform


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_topk_exact(tmp_path):
    # gallery of one-hot features: query i must retrieve image i first
    d = 16
    gallery = np.eye(d, dtype=np.float32)
    g_ids = np.arange(100, 100 + d)
    queries = 0.9 * np.eye(d, dtype=np.float32) + 0.01
    q_ids = np.arange(d)
    out = dict(topk(q_ids, queries, g_ids, gallery, k=5, chunk=8))
    for i in range(d):
        assert out[i][0] == 100 + i
        assert len(out[i]) == 5
        assert len(set(out[i])) == 5


def test_recall_scoring(tmp_path):
    golden = tmp_path / "golden.jsonl"
    pred = tmp_path / "pred.jsonl"
    _write_jsonl(golden, [
        {"text_id": 0, "image_ids": [10]},
        {"text_id": 1, "image_ids": [11, 12]},
        {"text_id": 2, "image_ids": [13]},
    ])
    _write_jsonl(pred, [
        {"text_id": 0, "image_ids": [10, 1, 2, 3, 4, 5, 6, 7, 8, 9]},   # r@1
        {"text_id": 1, "image_ids": [1, 2, 3, 12, 4, 5, 6, 7, 8, 9]},   # r@5
        {"text_id": 2, "image_ids": [1, 2, 3, 4, 5, 6, 7, 8, 9, 13]},   # r@10
    ])
    mr, r1, r5, r10 = compute_score(str(golden), str(pred))
    assert abs(r1 - 100 / 3) < 1e-9
    assert abs(r5 - 200 / 3) < 1e-9
    assert r10 == 100.0
    assert abs(mr - (r1 + r5 + r10) / 3) < 1e-9


def test_submission_validation(tmp_path):
    golden = tmp_path / "golden.jsonl"
    _write_jsonl(golden, [{"text_id": 0, "image_ids": [1]}])
    ref = read_reference(str(golden))

    bad_count = tmp_path / "bad1.jsonl"
    _write_jsonl(bad_count, [{"text_id": 0, "image_ids": [1, 2, 3]}])
    with pytest.raises(Exception, match="wrong number"):
        read_submission(str(bad_count), ref)

    dup = tmp_path / "bad2.jsonl"
    _write_jsonl(dup, [{"text_id": 0, "image_ids": [1, 1, 2, 3, 4, 5, 6, 7, 8, 9]}])
    with pytest.raises(Exception, match="duplicate"):
        read_submission(str(dup), ref)

    missing = tmp_path / "bad3.jsonl"
    _write_jsonl(missing, [{"text_id": 5, "image_ids": list(range(10))}])
    with pytest.raises(Exception, match="no prediction"):
        read_submission(str(missing), ref)


def test_transform_ir_to_tr(tmp_path):
    src = tmp_path / "ann.jsonl"
    _write_jsonl(src, [
        {"text_id": 0, "image_ids": [5, 6]},
        {"text_id": 1, "image_ids": [6]},
    ])
    out = transform(str(src))
    rows = [json.loads(l) for l in open(out)]
    by_img = {r["image_id"]: r["text_ids"] for r in rows}
    assert by_img == {5: [0], 6: [0, 1]}


def test_templates():
    assert len(imagenet_classnames()) == 1000
    assert len(imagenet_templates()) == 80
    t = imagenet_templates()[0]
    assert "{}" in t
    assert "狗" in t.format("狗")
    # the reference's dataset key (zeroshot_evaluation.py:238) — a bare
    # "flower-102" is NOT in the reference table and falls back to openai
    assert len(templates_for_dataset("oxford-flower-102")) == 32
    assert templates_for_dataset("unknown-dataset")  # falls back to openai set
