"""Flywheel + retrieval-suite tests (host-side logic; no network)."""

import json
import os

import numpy as np
import pytest

from nans_clip_tpu.flywheel.build_dataset import build_texts_for_image
from nans_clip_tpu.flywheel.build_dataset import main as build_main
from nans_clip_tpu.eval.retrieval_suite import metrics_at_k


def test_build_texts_for_image():
    ann = {"modern_chinese": "南宋山水画描绘西湖",
           "ancient_style": "湖山清远,烟波浩渺",
           "keywords": "南宋, 山水画, 西湖",
           "title": "西湖图"}
    texts = build_texts_for_image(ann)
    # "," -> " " leaves double spaces after ", " (reference-faithful)
    assert texts == ["南宋山水画描绘西湖", "湖山清远,烟波浩渺",
                     "南宋  山水画  西湖", "西湖图"]
    # empty fields dropped; duplicate title dropped
    assert build_texts_for_image({"title": "a", "modern_chinese": "a"}) == ["a"]


def test_build_dataset_image_level_split(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    anns = []
    rs = np.random.RandomState(0)
    for i in range(10):
        fname = f"img{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_dir / fname)
        anns.append({"filename": fname, "title": f"图{i}",
                     "modern_chinese": f"描述{i}", "ancient_style": "",
                     "keywords": ""})
        # an augmented variant of the same image
        anns.append({"filename": fname, "modern_chinese": f"另一描述{i}",
                     "_is_augmented": True})
    ann_path = tmp_path / "annotations.json"
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(anns, f, ensure_ascii=False)
    out = tmp_path / "dataset"
    build_main(["--annotations", str(ann_path), "--images-dir", str(img_dir),
                "--output-dir", str(out), "--train-ratio", "0.8"])
    assert (out / "train_imgs.tsv").exists()
    assert (out / "valid_texts.jsonl").exists()
    # leakage check: no caption text appears in both splits
    def texts_of(split):
        return {json.loads(l)["text"] for l in open(out / f"{split}_texts.jsonl",
                                                    encoding="utf-8")}
    assert not (texts_of("train") & texts_of("valid"))
    n_train = len(open(out / "train_imgs.tsv").readlines())
    n_valid = len(open(out / "valid_imgs.tsv").readlines())
    assert n_train == 8 and n_valid == 2


def test_metrics_at_k():
    # query 0 hits at rank 1, query 1 at rank 3, query 2 never
    sims = np.array([
        [0.9, 0.1, 0.0, 0.0],
        [0.5, 0.4, 0.6, 0.0],
        [0.1, 0.2, 0.3, 0.4],
    ])
    gt = {0: {0}, 1: {1}, 2: set()}  # query 2 has no gt -> excluded
    m = metrics_at_k(sims, gt, k_list=(1, 5))
    assert m["R@1"] == 50.0      # 1 of 2 queries hit at rank 1
    assert m["R@5"] == 100.0
    # AP: q0 = 1.0; q1: hit at rank 3 -> 1/3
    assert abs(m["mAP"] - 100 * (1.0 + 1 / 3) / 2) < 1e-6
    assert m["MR"] == (m["R@1"] + m["R@5"]) / 2
