"""demo.py CLI-mode coverage: gallery build -> text query -> top-k print,
with LoRA-less defaults and the int8 serving flag."""

import base64
import io
import json

import jax
import numpy as np
import pytest

import demo as demo_mod
from nans_clip_tpu.configs import tiny_config
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.preprocess.build_dataset import build_split


@pytest.fixture(scope="module")
def gallery_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("demo_data")
    rs = np.random.RandomState(0)
    with open(root / "valid_imgs.tsv", "w") as f:
        for i in range(6):
            arr = rs.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            f.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
    with open(root / "valid_texts.jsonl", "w") as f:
        for t in range(6):
            f.write(json.dumps({"text_id": t, "text": f"示例文本第{t}条",
                                "image_ids": [t]}, ensure_ascii=False) + "\n")
    build_split(str(root), "valid")
    return str(root / "valid")


def _fake_load(monkeypatch):
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)

    def fake(vision, text, resume, precision="bf16", attn_impl="auto",
             cfg_override=None):
        return cfg, params, batch_stats, ModelOptions(attn_impl="xla")

    monkeypatch.setattr(demo_mod, "load_eval_model", fake)


def _run_cli(capsys, gallery_dir, extra):
    demo_mod.main(["--data", gallery_dir, "--resume", "unused",
                   "--cli", "示例文本第3条", "--topk", "4",
                   "--batch-size", "4"] + extra)
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("image_id=")]
    assert len(lines) == 4
    scores = [float(l.split("score=")[1]) for l in lines]
    assert all(np.isfinite(scores))
    assert scores == sorted(scores, reverse=True)
    return [int(l.split()[0].split("=")[1]) for l in lines]


def test_demo_cli_query(gallery_dir, capsys, monkeypatch):
    _fake_load(monkeypatch)
    ids = _run_cli(capsys, gallery_dir, [])
    assert len(set(ids)) == 4


def test_demo_gradio_branch(gallery_dir, monkeypatch):
    """The gradio branch (reference demo.py:95-212 analog) has never run
    in-container (gradio absent) — execute it against a stub: Interface
    construction, component wiring, and the text_search callback end to
    end (launch() drives one query through the gallery)."""
    import sys
    import types

    _fake_load(monkeypatch)
    ran = {}

    gr = types.ModuleType("gradio")

    class _Component:
        def __init__(self, label=None):
            self.label = label

    class _Interface:
        def __init__(self, fn=None, inputs=None, outputs=None, title=None):
            assert callable(fn) and inputs is not None and outputs is not None
            ran["title"] = title
            self._fn = fn

        def launch(self, server_port=None):
            ran["port"] = server_port
            ran["results"] = self._fn("示例文本第2条")

    gr.Interface, gr.Textbox, gr.Gallery = _Interface, _Component, _Component
    monkeypatch.setitem(sys.modules, "gradio", gr)

    demo_mod.main(["--data", gallery_dir, "--resume", "unused",
                   "--topk", "3", "--batch-size", "4", "--port", "7777"])
    assert ran["port"] == 7777 and ran["title"]
    assert len(ran["results"]) == 3
    from PIL import Image
    for img, label in ran["results"]:
        assert isinstance(img, Image.Image)
        assert "(" in label  # "id (score)" caption format


@pytest.mark.parametrize("mode", ["int8", "int8-text"])
def test_demo_cli_quantized(gallery_dir, capsys, monkeypatch, mode):
    """--quantize runs the whole demo path on int8 params; with a tiny
    random init the ranking stays a valid top-k (quality parity for the
    quantized forward is asserted elsewhere: test_quantize.py and the
    golden harness's pokemon-int8 leg)."""
    _fake_load(monkeypatch)
    ids = _run_cli(capsys, gallery_dir, ["--quantize", mode])
    assert len(set(ids)) == 4
