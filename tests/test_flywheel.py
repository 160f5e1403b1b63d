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


def test_scrape_wikimedia_offline(tmp_path, monkeypatch):
    """scrape CLI against a canned Commons API: sha1-named files +
    metadata.jsonl rows; non-image mimes filtered; per-URL failures
    tolerated (reference scripts/scrape_wikimedia.py behavior)."""
    import hashlib

    import nans_clip_tpu.flywheel.scrape as sc

    png = b"\x89PNG fakebytes"
    jpg = b"\xff\xd8\xff fake jpeg"

    def fake_fetch(url, retries=3, timeout=30):
        if "api.php" in url:
            return json.dumps({"query": {"pages": {
                "1": {"title": "File:A.jpg", "imageinfo": [
                    {"thumburl": "http://x/a.jpg", "mime": "image/jpeg"}]},
                "2": {"title": "File:B.png", "imageinfo": [
                    {"url": "http://x/b.png", "mime": "image/png"}]},
                "3": {"title": "File:C.pdf", "imageinfo": [
                    {"url": "http://x/c.pdf", "mime": "application/pdf"}]},
                "4": {"title": "File:D.jpg", "imageinfo": [
                    {"url": "http://x/broken.jpg", "mime": "image/jpeg"}]},
            }}}).encode()
        if url.endswith("a.jpg"):
            return jpg
        if url.endswith("b.png"):
            return png
        raise RuntimeError("download refused")

    monkeypatch.setattr(sc, "fetch", fake_fetch)
    monkeypatch.setattr(sc, "SONG_QUERIES", ["南宋 绘画"])
    monkeypatch.setattr(sc.time, "sleep", lambda s: None)

    out = str(tmp_path / "data")
    sc.main(["wikimedia", "--out", out, "--per-query", "10"])

    with open(os.path.join(out, "metadata.jsonl"), encoding="utf-8") as f:
        rows = [json.loads(ln) for ln in f.read().splitlines()]
    # pdf filtered by mime, broken download skipped -> 2 images land
    assert {r["title"] for r in rows} == {"File:A.jpg", "File:B.png"}
    for r, raw in zip(sorted(rows, key=lambda r: r["title"]), (jpg, png)):
        assert r["filename"] == hashlib.sha1(raw).hexdigest()[:16] + ".jpg"
        with open(os.path.join(out, "images", r["filename"]), "rb") as f:
            assert f.read() == raw
        assert r["category"] == "绘画" and r["query"] == "南宋 绘画"

    # distractors mode writes both pools into one metadata file
    monkeypatch.setattr(sc, "HARD_NEGATIVE_QUERIES", ["Ming dynasty painting"])
    monkeypatch.setattr(sc, "EASY_NEGATIVE_QUERIES", ["abstract art"])
    d_out = str(tmp_path / "distractors")
    sc.main(["distractors", "--out", d_out, "--per-query", "10"])
    with open(os.path.join(d_out, "distractors_meta.jsonl"), encoding="utf-8") as f:
        cats = {json.loads(ln)["category"] for ln in f.read().splitlines()}
    assert cats == {"hard_negative", "easy_negative"}


def test_scrape_images_multisource_offline(tmp_path, monkeypatch):
    """Multi-source ``images`` crawler against canned APIs (reference
    scripts/scrape_images.py): all four sources land rows, non-public-domain
    museum objects are filtered, too-small / non-image payloads rejected,
    and a second run resumes from metadata (original_url dedup -> 0 new)."""
    import nans_clip_tpu.flywheel.scrape as sc

    jpg = b"\xff\xd8\xff" + b"x" * 25_000    # valid: JPEG sig, >20KB
    tiny = b"\xff\xd8\xff small"             # rejected: under byte floor
    html = b"<html>not an image" + b"y" * 25_000   # rejected: bad signature

    def fake_fetch(url, retries=3, timeout=30):
        if "image.baidu.com/search/acjson" in url:
            if "pn=0" not in url:
                return b'{"data": []}'
            return json.dumps({"data": [
                {"hoverURL": "http://b/1.jpg",
                 "fromPageTitleEnc": "<b>马远</b> 踏歌图"},
                {"middleURL": "http://b/tiny.jpg", "fromPageTitle": "small"},
                "junk-non-dict",
            ]}).encode()
        if "commons.wikimedia.org" in url:
            return json.dumps({"query": {"pages": {"1": {
                "title": "File:W.jpg", "imageinfo": [
                    {"thumburl": "http://w/1.jpg", "mime": "image/jpeg"}]}}}}
            ).encode()
        if "collectionapi.metmuseum.org" in url and "/search" in url:
            return json.dumps({"objectIDs": [11, 12]}).encode()
        if "collectionapi.metmuseum.org/public/collection/v1/objects/11" in url:
            return json.dumps({"primaryImage": "http://m/pd.jpg",
                               "isPublicDomain": True, "title": "Met PD",
                               "period": "Southern Song",
                               "department": "Asian Art"}).encode()
        if "collectionapi.metmuseum.org/public/collection/v1/objects/12" in url:
            return json.dumps({"primaryImage": "http://m/priv.jpg",
                               "isPublicDomain": False,
                               "title": "Met private"}).encode()
        if "api.artic.edu" in url:
            return json.dumps({"data": [
                {"image_id": "abc", "is_public_domain": True,
                 "title": "ARTIC PD", "date_display": "1200",
                 "department_title": "Arts of Asia"},
                {"image_id": "nope", "is_public_domain": False,
                 "title": "ARTIC private"},
            ]}).encode()
        if url.endswith(("b/1.jpg", "w/1.jpg", "m/pd.jpg")) \
                or "artic.edu/iiif/2/abc/" in url:
            return jpg
        if url.endswith("tiny.jpg"):
            return tiny
        return html

    monkeypatch.setattr(sc, "fetch", fake_fetch)
    monkeypatch.setattr(sc.time, "sleep", lambda s: None)
    monkeypatch.setattr(sc, "BAIDU_QUERIES", ["马远 踏歌图 高清"])
    monkeypatch.setattr(sc, "MET_QUERIES", ["Song dynasty painting"])
    monkeypatch.setattr(sc, "ARTIC_QUERIES", ["Southern Song"])
    monkeypatch.setattr(
        sc, "IMAGE_SOURCES",
        tuple((p, qs if p != "wiki" else ["Ma Yuan painting"], f)
              for p, qs, f in sc.IMAGE_SOURCES))

    out = str(tmp_path / "flywheel")
    sc.main(["images", "--out", out, "--per-query", "5"])

    meta = os.path.join(out, "image_metadata.jsonl")
    with open(meta, encoding="utf-8") as f:
        rows = [json.loads(ln) for ln in f.read().splitlines()]
    by_src = {r["source"]: r for r in rows}
    assert set(by_src) == {"Baidu Images", "Wikimedia Commons",
                           "The Metropolitan Museum of Art",
                           "Art Institute of Chicago"}
    assert len(rows) == 4          # tiny/html/non-PD all filtered
    assert by_src["Baidu Images"]["title"] == "马远 踏歌图"  # tags stripped
    assert by_src["The Metropolitan Museum of Art"]["era"] == "Southern Song"
    for i, r in enumerate(rows):
        assert r["filename"].split("_")[1] == f"{i:03d}"
        with open(os.path.join(out, "images", r["filename"]), "rb") as f:
            assert f.read() == jpg

    # resume: identical second run adds nothing (original_url dedup)
    sc.main(["images", "--out", out, "--per-query", "5"])
    with open(meta, encoding="utf-8") as f:
        assert len(f.read().splitlines()) == 4
