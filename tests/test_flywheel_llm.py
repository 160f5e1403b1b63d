"""Flywheel scripts against a LOCAL OpenAI-compatible stub server.

Covers the three scripts test_flywheel.py doesn't: ``auto_annotate``
(VLM captioning, resume semantics, markdown-fence tolerance),
``augment_texts`` (paraphrase records, idempotent re-run), and
``filter_annotations`` (CLIP-scored quality filter on the tiny model).
The stub binds 127.0.0.1 — no egress.
"""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np
import pytest


class _Stub(BaseHTTPRequestHandler):
    calls = []  # (kind, caption-or-title) per request
    mode = "json"  # "json" | "fenced" | "garbage"

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        content = body["messages"][0]["content"]
        if isinstance(content, list):  # VLM: image + text parts
            _Stub.calls.append(("vlm", content[1]["text"]))
            ann = {"modern_chinese": "一幅宋代山水画，远山近水，笔意疏朗。",
                   "ancient_style": "山色空濛，水光潋滟。",
                   "keywords": "宋代,山水,绘画"}
            if _Stub.mode == "fenced":
                text = "```json\n" + json.dumps(ann, ensure_ascii=False) + "\n```"
            elif _Stub.mode == "garbage":
                text = "这不是JSON"
            else:
                text = json.dumps(ann, ensure_ascii=False)
        else:  # paraphrase LLM: plain prompt
            _Stub.calls.append(("llm", content))
            text = "- 改写甲\n- 改写乙\n"
        resp = {"choices": [{"message": {"content": text}}]}
        data = json.dumps(resp, ensure_ascii=False).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def stub_url():
    _Stub.calls = []
    _Stub.mode = "json"
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def _images(root, names):
    from PIL import Image
    d = root / "images"
    d.mkdir(exist_ok=True)
    rs = np.random.RandomState(0)
    for n in names:
        Image.fromarray(rs.randint(0, 255, (24, 24, 3), dtype=np.uint8)).save(
            d / n, format="JPEG")
    return d


def test_auto_annotate_cli(tmp_path, stub_url):
    from nans_clip_tpu.flywheel.auto_annotate import main

    _images(tmp_path, ["a.jpg", "b.jpg"])
    meta = tmp_path / "metadata.jsonl"
    with open(meta, "w", encoding="utf-8") as f:
        for fname, title in (("a.jpg", "山水图"), ("b.jpg", "花鸟图"),
                             ("missing.jpg", "佚失")):
            f.write(json.dumps({"filename": fname, "title": title,
                                "category": "绘画"}, ensure_ascii=False) + "\n")
    out = str(tmp_path / "annotations.json")
    args = ["--metadata", str(meta), "--images-dir", str(tmp_path / "images"),
            "--output", out, "--base-url", stub_url, "--sleep", "0"]
    main(args)
    with open(out, encoding="utf-8") as f:
        anns = json.load(f)
    assert [a["filename"] for a in anns] == ["a.jpg", "b.jpg"]
    for a in anns:
        assert a["modern_chinese"] and a["ancient_style"] and a["keywords"]
        assert a["title"] in ("山水图", "花鸟图")
    assert len(_Stub.calls) == 2  # the missing image was never sent

    # resume: a second run re-annotates nothing
    main(args)
    assert len(_Stub.calls) == 2

    # markdown-fenced VLM output parses to the same fields
    _Stub.mode = "fenced"
    _images(tmp_path, ["c.jpg"])
    with open(meta, "a", encoding="utf-8") as f:
        f.write(json.dumps({"filename": "c.jpg", "title": "器物"},
                           ensure_ascii=False) + "\n")
    main(args)
    with open(out, encoding="utf-8") as f:
        anns = json.load(f)
    assert anns[-1]["filename"] == "c.jpg"
    assert anns[-1]["keywords"] == "宋代,山水,绘画"

    # non-JSON output degrades to a truncated modern_chinese, not a crash
    _Stub.mode = "garbage"
    _images(tmp_path, ["d.jpg"])
    with open(meta, "a", encoding="utf-8") as f:
        f.write(json.dumps({"filename": "d.jpg"}, ensure_ascii=False) + "\n")
    main(args)
    with open(out, encoding="utf-8") as f:
        anns = json.load(f)
    assert anns[-1]["modern_chinese"] == "这不是JSON"
    assert anns[-1]["ancient_style"] == ""


def test_augment_texts_cli(tmp_path, stub_url):
    from nans_clip_tpu.flywheel.augment_texts import main

    anns = [{"filename": "a.jpg", "title": "山水图",
             "modern_chinese": "一幅山水画。", "ancient_style": "",
             "keywords": "山水"},
            {"filename": "b.jpg", "title": "空白",
             "modern_chinese": "", "ancient_style": "", "keywords": ""}]
    path = str(tmp_path / "annotations.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(anns, f, ensure_ascii=False)

    args = ["--annotations", path, "--base-url", stub_url,
            "--per-image", "2", "--sleep", "0"]
    main(args)
    with open(path, encoding="utf-8") as f:
        out = json.load(f)
    aug = [a for a in out if a.get("_is_augmented")]
    # a.jpg got 2 paraphrases; b.jpg (empty caption) got none
    assert len(out) == 4 and len(aug) == 2
    assert {a["modern_chinese"] for a in aug} == {"改写甲", "改写乙"}
    assert all(a["filename"] == "a.jpg" for a in aug)

    # idempotent: re-running must not re-paraphrase or duplicate
    n_calls = len(_Stub.calls)
    main(args)
    with open(path, encoding="utf-8") as f:
        out2 = json.load(f)
    assert len(out2) == 4
    assert len(_Stub.calls) == n_calls


def test_filter_annotations_cli(tmp_path, monkeypatch):
    import nans_clip_tpu.flywheel.filter_annotations as fa
    from nans_clip_tpu.configs import tiny_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip

    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)

    def fake_load(vision, text, resume, precision="bf16", attn_impl="auto",
                  cfg_override=None):
        return cfg, params, batch_stats, ModelOptions(attn_impl="xla")

    monkeypatch.setattr(fa, "load_eval_model", fake_load)

    _images(tmp_path, ["a.jpg", "b.jpg"])
    anns = [{"filename": "a.jpg", "modern_chinese": "山水画"},
            {"filename": "b.jpg", "modern_chinese": "花鸟画"},
            {"filename": "gone.jpg", "modern_chinese": "佚失"},
            {"filename": "a.jpg", "modern_chinese": ""}]
    path = str(tmp_path / "annotations.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(anns, f, ensure_ascii=False)

    common = ["--annotations", path, "--images-dir", str(tmp_path / "images"),
              "--resume", "unused.pt"]

    # threshold below any cosine: everything kept, nothing removed
    kept, removed = fa.main(common + ["--threshold", "-1.0", "--dry-run"])
    assert len(kept) == 4 and not removed

    # threshold above any cosine: both SCORED pairs drop; the missing-file
    # and empty-caption records are kept unscored
    kept, removed = fa.main(common + ["--threshold", "1.01"])
    assert {a["filename"] for a in removed} == {"a.jpg", "b.jpg"}
    assert len(kept) == 2
    with open(path, encoding="utf-8") as f:  # in-place rewrite of kept
        assert len(json.load(f)) == 2
