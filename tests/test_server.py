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


# ---------------------------------------------------------------------------
# Dynamic batching (Triton dynamic_batching analog)
# ---------------------------------------------------------------------------

def _gated_service(max_batch=8, **kw):
    """Fresh service whose _run_device records (tower, n) per device call
    and blocks the FIRST call on a gate — deterministic window in which
    later requests must queue."""
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    svc = ClipService(cfg, params, batch_stats, OPTS, max_batch=max_batch,
                      **kw)
    real = svc._run_device
    calls = []
    gate, first_in = threading.Event(), threading.Event()

    def wrapped(tower, x):
        calls.append((tower, x.shape[0]))
        if len(calls) == 1:
            first_in.set()
            assert gate.wait(30), "test gate never released"
        return real(tower, x)

    svc._run_device = wrapped
    return svc, calls, gate, first_in


def _wait_queue(svc, n, timeout=30.0):
    import time
    deadline = time.monotonic() + timeout
    while len(svc._queue) < n:
        assert time.monotonic() < deadline, \
            f"queue never reached {n} (at {len(svc._queue)})"
        time.sleep(0.005)


def test_dynamic_batching_coalesces_concurrent_requests():
    """While the device runs request 0, four batch-1 requests queue; the
    dispatcher drains them as ONE 4-sample device call, and every request
    gets exactly its own features."""
    svc, calls, gate, first_in = _gated_service()
    texts = [f"动态批处理{i}" for i in range(5)]
    results = {}

    def post(i):
        results[i] = svc.encode_texts([texts[i]])

    threads = [threading.Thread(target=post, args=(0,))]
    threads[0].start()
    assert first_in.wait(30)          # dispatcher is inside the device call
    for i in range(1, 5):
        threads.append(threading.Thread(target=post, args=(i,)))
        threads[-1].start()
    _wait_queue(svc, 4)
    gate.set()
    for t in threads:
        t.join(60)
        assert not t.is_alive()

    assert [n for _, n in calls] == [1, 4], calls
    direct = ClipService(svc.cfg, svc.params, svc.batch_stats, OPTS,
                         max_batch=8, dynamic_batching=False)
    for i in range(5):
        np.testing.assert_allclose(results[i], direct.encode_texts([texts[i]]),
                                   atol=1e-5, rtol=1e-5)


def test_dynamic_batching_coalesces_only_same_tower_runs():
    """A queue of text,text,image,text drains as text(2), image(1),
    text(1) — towers never mix inside one dispatch."""
    rs = np.random.RandomState(0)
    img = _jpeg_b64(rs)
    svc, calls, gate, first_in = _gated_service()
    results = {}

    def post_text(i):
        results[i] = svc.encode_texts([f"塔{i}"])

    def post_image(i):
        results[i] = svc.encode_images([img])

    threads = [threading.Thread(target=post_text, args=(0,))]
    threads[0].start()
    assert first_in.wait(30)
    # enqueue strictly in order by waiting for each arrival
    for n, t in enumerate([threading.Thread(target=post_text, args=(1,)),
                           threading.Thread(target=post_text, args=(2,)),
                           threading.Thread(target=post_image, args=(3,)),
                           threading.Thread(target=post_text, args=(4,))]):
        t.start()
        threads.append(t)
        _wait_queue(svc, n + 1)
    gate.set()
    for t in threads:
        t.join(60)
        assert not t.is_alive()

    assert calls == [("text", 1), ("text", 2), ("image", 1), ("text", 1)], \
        calls
    direct = ClipService(svc.cfg, svc.params, svc.batch_stats, OPTS,
                         max_batch=8, dynamic_batching=False)
    for i in (0, 1, 2, 4):
        np.testing.assert_allclose(results[i],
                                   direct.encode_texts([f"塔{i}"]),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(results[3], direct.encode_images([img]),
                               atol=1e-5, rtol=1e-5)


def test_dynamic_batching_respects_coalesce_cap():
    """Coalescing stops at the serving batch: 5 queued singles at
    max_batch=2 drain as ceil-grouped runs, not one giant dispatch whose
    tail chunks would delay the head request."""
    svc, calls, gate, first_in = _gated_service(max_batch=2)
    threads = [threading.Thread(target=svc.encode_texts,
                                args=(["首个"],))]
    threads[0].start()
    assert first_in.wait(30)
    for i in range(5):
        t = threading.Thread(target=svc.encode_texts, args=([f"排{i}"],))
        t.start()
        threads.append(t)
        _wait_queue(svc, i + 1)
    gate.set()
    for t in threads:
        t.join(60)
        assert not t.is_alive()
    # first blocked call is 1; the 5 queued singles drain in runs of <=2
    assert calls[0] == ("text", 1)
    assert all(n <= 2 for _, n in calls[1:])
    assert sum(n for _, n in calls[1:]) == 5


def test_dynamic_batching_scatters_device_errors():
    """A device failure inside a coalesced dispatch reaches EVERY rider
    as the error, not a hang."""
    svc, calls, gate, first_in = _gated_service()

    def boom(tower, x):
        raise ValueError("device exploded")

    errs = {}

    def post(i):
        try:
            svc.encode_texts([f"错{i}"])
        except ValueError as e:
            errs[i] = str(e)

    t0 = threading.Thread(target=post, args=(0,))
    t0.start()
    assert first_in.wait(30)
    svc._run_device = boom            # swap under the blocked first call
    t1 = threading.Thread(target=post, args=(1,))
    t2 = threading.Thread(target=post, args=(2,))
    t1.start(); t2.start()
    _wait_queue(svc, 2)
    gate.set()
    for t in (t0, t1, t2):
        t.join(60)
        assert not t.is_alive()
    # riders 1+2 were coalesced into the failing dispatch; 0 ran on the
    # still-real gated wrapper
    assert errs.get(1) == "device exploded" and errs.get(2) == "device exploded"
    assert 0 not in errs


def test_http_concurrent_requests_roundtrip(server, service):
    """End-to-end over HTTP with the default (dynamic batching ON):
    concurrent unique requests each get their own features back."""
    texts = [f"并发请求{i}" for i in range(6)]
    results = {}

    def post(i):
        results[i] = np.asarray(
            _post(server, "/encode_text", {"texts": [texts[i]]})["features"],
            np.float32)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
        assert not t.is_alive()
    for i in range(6):
        np.testing.assert_allclose(results[i], service.encode_texts([texts[i]]),
                                   atol=1e-5, rtol=1e-5)


def test_stats_endpoint(server, service):
    """GET /stats (Triton-metrics analog): counters move with traffic."""
    with urllib.request.urlopen(server + "/stats") as r:
        before = json.loads(r.read())
    for key in ("requests", "samples", "device_dispatches",
                "device_ms_total", "coalesced_requests",
                "decode_fallbacks", "errors"):
        assert key in before, key
    _post(server, "/encode_text", {"texts": ["统计端点", "第二条"]})
    try:
        _post(server, "/encode_text", {"bad_key": []})
    except Exception:
        pass  # 400 expected
    with urllib.request.urlopen(server + "/stats") as r:
        after = json.loads(r.read())
    assert after["requests"]["text"] == before["requests"]["text"] + 1
    assert after["samples"]["text"] == before["samples"]["text"] + 2
    assert after["device_dispatches"] > before["device_dispatches"]
    assert after["device_ms_total"] > before["device_ms_total"]
    assert after["errors"] == before["errors"] + 1


def test_oversized_body_rejected_413():
    """Bodies over the cap are refused BEFORE buffering (bounded host
    memory on the single-core serving host)."""
    import urllib.error

    from nans_clip_tpu.configs import tiny_config
    from nans_clip_tpu.deploy.server import ClipService, make_server
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip

    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    svc = ClipService(cfg, params, batch_stats,
                      ModelOptions(attn_impl="xla"), max_batch=2,
                      dynamic_batching=False)
    srv = make_server(svc, "127.0.0.1", 0, max_body_bytes=1024)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        body = json.dumps({"texts": ["x" * 4096]}).encode()
        req = urllib.request.Request(
            url + "/encode_text", body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 413
        # small request still fine
        out = _post(url, "/encode_text", {"texts": ["ok"]})
        assert len(out["features"]) == 1
    finally:
        srv.shutdown()
        srv.server_close()
