"""Serving daemon (deploy/server.py): HTTP endpoints against live-jit and
engine backends, fixed-shape padding/chunking, error paths."""

import base64
import io
import json
import os
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from nans_clip_tpu.configs import tiny_config
from nans_clip_tpu.deploy.server import ClipService, make_server
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip

OPTS = ModelOptions(attn_impl="xla", compute_dtype=None)


def _jpeg_b64(rs, size=48, urlsafe=False):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 255, (size, size, 3), np.uint8)).save(
        buf, format="JPEG", quality=95)
    enc = base64.urlsafe_b64encode if urlsafe else base64.b64encode
    return enc(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def service():
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    return ClipService(cfg, params, batch_stats, OPTS, max_batch=4)


@pytest.fixture(scope="module")
def server(service):
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok" and obj["backend"] == "jit"


def test_encode_text_matches_direct(server, service):
    texts = ["西湖美景", "南宋古籍", "一只皮卡丘"]
    out = _post(server, "/encode_text", {"texts": texts})
    feats = np.asarray(out["features"], np.float32)
    assert feats.shape == (3, service.cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)
    direct = service.encode_texts(texts)
    np.testing.assert_allclose(feats, direct, atol=1e-5, rtol=1e-5)


def test_encode_image_and_similarity(server, service):
    rs = np.random.RandomState(0)
    # mixed standard and urlsafe base64, like the dataset's own encoding
    imgs = [_jpeg_b64(rs), _jpeg_b64(rs, urlsafe=True)]
    out = _post(server, "/encode_image", {"images": imgs})
    feats = np.asarray(out["features"], np.float32)
    assert feats.shape == (2, service.cfg.embed_dim)
    np.testing.assert_allclose(feats, service.encode_images(imgs),
                               atol=1e-5, rtol=1e-5)

    sim = _post(server, "/similarity",
                {"images": imgs, "texts": ["山水画", "佛经", "地图"]})
    probs = np.asarray(sim["probs"], np.float32)
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    logits = np.asarray(sim["logits_per_image"], np.float32)
    assert np.isfinite(logits).all()


def test_batch_padding_and_chunking(service):
    """Requests that don't match a compiled batch pad up / chunk: 5 texts
    through max_batch=4 = one bs-4 call + one padded call, features equal
    to a batch-1-at-a-time reference."""
    texts = [f"文本{i}" for i in range(5)]
    feats = service.encode_texts(texts)
    one_by_one = np.concatenate([service.encode_texts([t]) for t in texts])
    np.testing.assert_allclose(feats, one_by_one, atol=1e-5, rtol=1e-5)


def test_error_paths(server):
    for path, body, frag in [
            ("/encode_text", {}, "texts"),
            ("/encode_image", {"images": ["!!notb64!!"]}, "cannot decode"),
            ("/nope", {"texts": []}, "unknown path")]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, path, body)
        assert e.value.code in (400, 404)
        assert frag in json.loads(e.value.read())["error"]


def test_engine_backend_matches_jit(tmp_path, service):
    """The production path: engines built by the CLI, served with zero
    compiles in the service; features identical to the jit backend."""
    import nans_clip_tpu.deploy.engine as engine_mod

    d = str(tmp_path / "engines")
    engine_mod.main(["build", "--tiny-model", "--towers", "text,image",
                     "--batch-sizes", "2", "--precision", "fp32",
                     "--attn-impl", "xla", "--out-dir", d])
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    eng_service = ClipService(cfg, params, batch_stats, OPTS, engine_dir=d)
    assert eng_service._engine_batch == {"text": 2, "image": 2}

    texts = ["西湖", "南宋", "古籍"]          # 3 through bs-2 engines: chunk+pad
    np.testing.assert_allclose(eng_service.encode_texts(texts),
                               service.encode_texts(texts),
                               atol=1e-5, rtol=1e-5)
    rs = np.random.RandomState(1)
    imgs = [_jpeg_b64(rs)]
    np.testing.assert_allclose(eng_service.encode_images(imgs),
                               service.encode_images(imgs),
                               atol=1e-5, rtol=1e-5)
    # no compiled-on-demand functions were added alongside the engines
    assert set(eng_service._fns) == {("text", 2), ("image", 2)}

    # quantize-convention mismatch fails at startup, not at request time
    with pytest.raises(ValueError, match="quantize"):
        ClipService(cfg, params, batch_stats, OPTS, engine_dir=d,
                    quantize="int8-text")


def test_server_rejects_mismatched_engine_headers(tmp_path, service):
    """Every convention the header records fails fast at startup: model
    name, text context length, and (for ResNet towers) the baked
    BatchNorm-statistics digest."""
    import pickle
    import shutil

    import nans_clip_tpu.deploy.engine as engine_mod

    d = str(tmp_path / "engines")
    engine_mod.main(["build", "--tiny-model", "--towers", "text",
                     "--batch-sizes", "2", "--precision", "fp32",
                     "--attn-impl", "xla", "--out-dir", d])
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)

    def corrupt(key, value):
        dd = str(tmp_path / f"bad_{key}")
        shutil.rmtree(dd, ignore_errors=True)
        shutil.copytree(d, dd)
        p = engine_mod.engine_path(dd, "text", 2)
        with open(p, "rb") as f:
            payload = pickle.load(f)
        payload["meta"][key] = value
        with open(p, "wb") as f:
            pickle.dump(payload, f)
        return dd

    for key, value, frag in [
            ("model", "ViT-H-14@RoBERTa-wwm-ext-large-chinese", "model"),
            ("context_length", 64, "context_length"),
            ("batch_stats_digest", "deadbeef", "BN running stats")]:
        with pytest.raises(ValueError, match=frag):
            ClipService(cfg, params, batch_stats, OPTS,
                        engine_dir=corrupt(key, value))

    # batch size comes from the payload, not the filename
    dd = str(tmp_path / "renamed")
    shutil.copytree(d, dd)
    os.rename(engine_mod.engine_path(dd, "text", 2),
              engine_mod.engine_path(dd, "text", 8))
    svc = ClipService(cfg, params, batch_stats, OPTS, engine_dir=dd)
    assert set(svc._fns) == {("text", 2)}


def test_empty_requests(server):
    out = _post(server, "/encode_image", {"images": []})
    assert out["features"] == []
    sim = _post(server, "/similarity", {"images": [], "texts": ["一"]})
    assert sim["probs"] == [] and sim["logits_per_image"] == []
