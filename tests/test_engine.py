"""Serialized serving engines (deploy/engine.py): save/load roundtrip,
fresh-process cold load (no re-compile), and the compatibility header."""

import os
import pickle
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.configs import tiny_config
from nans_clip_tpu.deploy.aot import compile_tower
from nans_clip_tpu.deploy.engine import load_engine, save_engine
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build(tmp_path):
    cfg = tiny_config()
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    opts = ModelOptions(attn_impl="xla", compute_dtype=None)
    run = compile_tower(cfg, params, "text", 2, options=opts)
    path = str(tmp_path / "text_bs2.engine")
    save_engine(path, run, meta={"tower": "text", "model": cfg.name})
    return cfg, params, run, path


def _texts():
    t = np.zeros((2, 52), np.int32)
    t[:, 0] = 101
    t[:, 1] = 768
    t[:, 2] = 102
    return jnp.asarray(t)


def test_engine_roundtrip(tmp_path):
    _cfg, params, run, path = _build(tmp_path)
    texts = _texts()
    ref = np.asarray(run(texts))
    eng = load_engine(path, params)
    assert eng.batch_size == 2 and eng.meta["tower"] == "text"
    np.testing.assert_allclose(np.asarray(eng(texts)), ref, atol=0, rtol=0)
    # unbound form takes (params, x)
    raw = load_engine(path)
    np.testing.assert_allclose(np.asarray(raw(params, texts)), ref,
                               atol=0, rtol=0)


def test_engine_serves_other_checkpoints(tmp_path):
    """The anti-TRT property: weights are an ARGUMENT, not baked in — an
    engine built under checkpoint A must produce checkpoint B's exact
    features when loaded with B's params."""
    cfg, _params_a, run, path = _build(tmp_path)
    params_b, _ = init_clip(jax.random.PRNGKey(7), cfg)
    texts = _texts()
    from nans_clip_tpu.deploy.aot import compile_tower
    opts = ModelOptions(attn_impl="xla", compute_dtype=None)
    ref_b = np.asarray(compile_tower(cfg, params_b, "text", 2,
                                     options=opts)(texts))
    eng_b = load_engine(path, params_b)
    np.testing.assert_allclose(np.asarray(eng_b(texts)), ref_b,
                               atol=0, rtol=0)
    # and A's engine output stays A's (engine isn't secretly stateful)
    assert not np.allclose(np.asarray(run(texts)), ref_b)


def test_engine_header_mismatch(tmp_path):
    _cfg, params, _run, path = _build(tmp_path)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload["platform_version"] = "other-device-gen"
    bad = str(tmp_path / "bad.engine")
    with open(bad, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="rebuild the engine"):
        load_engine(bad, params)
    with pytest.warns(UserWarning, match="rebuild the engine"):
        eng = load_engine(bad, params, strict=False)
    assert np.isfinite(np.asarray(eng(_texts()))).all()
    # not an engine file at all
    junk = str(tmp_path / "junk.engine")
    with open(junk, "wb") as f:
        pickle.dump({"magic": "nope"}, f)
    with pytest.raises(ValueError, match="not a nans-clip-tpu engine"):
        load_engine(junk)


def test_engine_build_cli_and_consumers(tmp_path, monkeypatch, capsys):
    """The TRT workflow end-to-end: `deploy.engine build` writes one
    engine per tower x batch (reference deploy/onnx_to_tensorrt.py:80-94),
    `inspect` prints the header, and BOTH consumers run from the files:
    speed_benchmark --backend engine and extract_features --backend
    engine (output identical to the jit backend)."""
    import json

    import nans_clip_tpu.deploy.engine as engine_mod
    import nans_clip_tpu.deploy.speed_benchmark as sb
    from nans_clip_tpu.data import NPackWriter
    from nans_clip_tpu.eval import extract_features, model_io

    d = str(tmp_path / "engines")
    engine_mod.main(["build", "--tiny-model", "--towers", "text,image",
                     "--batch-sizes", "1,2", "--precision", "fp32",
                     "--attn-impl", "xla", "--out-dir", d])
    for tower in ("text", "image"):
        for bs in (1, 2):
            assert os.path.isfile(engine_mod.engine_path(d, tower, bs))
    engine_mod.main(["inspect", engine_mod.engine_path(d, "text", 2)])
    head = capsys.readouterr().out
    assert "magic: nans-clip-tpu-engine-v1" in head
    assert "'tower': 'text'" in head and "batch_size: 2" in head

    # the build used load_eval_model(tiny, resume=None) = init key 0 —
    # reproduce the identical params for the consumers
    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    opts = ModelOptions(attn_impl="xla", compute_dtype=None)

    def fake_load(vision, text, resume, precision="bf16", attn_impl="auto",
                  cfg=None):
        return tiny_config(), params, batch_stats, opts

    monkeypatch.setattr(model_io, "load_eval_model", fake_load)
    results = sb.main(["--batch-sizes", "1,2", "--n", "2", "--warmup", "1",
                       "--precision", "fp32", "--backend", "engine",
                       "--engine-dir", d])
    assert set(results) == {"image@bs1", "text@bs1", "image@bs2", "text@bs2"}
    assert all(np.isfinite(s["mean"]) for s in results.values())

    # extract_features: engine backend byte-identical to jit backend
    monkeypatch.setattr(extract_features, "load_eval_model", fake_load)
    txt = tmp_path / "texts.jsonl"
    txt.write_text("".join(json.dumps({"text_id": i, "text": t}) + "\n"
                           for i, t in enumerate(["西湖", "南宋古籍", "皮卡丘"])))
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rs = np.random.RandomState(0)
    with NPackWriter(str(img_dir / "imgs.npack")) as w:
        for i in range(3):
            import io

            from PIL import Image
            buf = io.BytesIO()
            arr = rs.randint(0, 255, (48, 48, 3), np.uint8)
            Image.fromarray(arr).save(buf, format="JPEG", quality=95)
            w.put(i, buf.getvalue())
    outs = {}
    for backend in ("jit", "engine"):
        t_out = str(tmp_path / f"t_{backend}.jsonl")
        i_out = str(tmp_path / f"i_{backend}.jsonl")
        extract_features.main([
            "--extract-text-feats", "--extract-image-feats",
            "--text-data", str(txt), "--image-data", str(img_dir),
            "--text-feat-output-path", t_out,
            "--image-feat-output-path", i_out,
            "--text-batch-size", "2", "--img-batch-size", "2",
            "--resume", "ignored", "--backend", backend,
            "--text-artifact", engine_mod.engine_path(d, "text", 2),
            "--image-artifact", engine_mod.engine_path(d, "image", 2)])
        outs[backend] = (open(t_out).read(), open(i_out).read())
    for ref_s, eng_s in zip(outs["jit"], outs["engine"]):
        for a, b in zip(ref_s.splitlines(), eng_s.splitlines()):
            ra, rb = json.loads(a), json.loads(b)
            assert ra.keys() == rb.keys()
            np.testing.assert_allclose(ra["feature"], rb["feature"],
                                       atol=1e-5, rtol=1e-5)

    # int8 engines: the quantized calling convention survives
    # serialization, and a quantize mismatch fails fast
    qd = str(tmp_path / "engines_q")
    engine_mod.main(["build", "--tiny-model", "--towers", "text,image",
                     "--batch-sizes", "1", "--precision", "fp32",
                     "--attn-impl", "xla", "--quantize", "int8-text",
                     "--out-dir", qd])
    results = sb.main(["--batch-sizes", "1", "--n", "2", "--warmup", "1",
                       "--precision", "fp32", "--backend", "engine",
                       "--quantize", "int8-text", "--engine-dir", qd,
                       "--batch-sizes", "1"])
    assert np.isfinite(results["text@bs1"]["mean"])
    with pytest.raises(SystemExit, match="calling convention"):
        sb.main(["--batch-sizes", "1", "--n", "2", "--warmup", "1",
                 "--precision", "fp32", "--backend", "engine",
                 "--engine-dir", qd])

    # fixed-shape discipline: wrong batch size fails fast, like TRT
    with pytest.raises(SystemExit, match="fixed-shape"):
        extract_features.main([
            "--extract-text-feats", "--text-data", str(txt),
            "--text-feat-output-path", str(tmp_path / "x.jsonl"),
            "--text-batch-size", "3", "--resume", "ignored",
            "--backend", "engine",
            "--text-artifact", engine_mod.engine_path(d, "text", 2)])


def test_engine_cold_load_in_fresh_process(tmp_path):
    """The whole point: a NEW process executes the engine without
    tracing/compiling the model (the model-building code is never
    imported there)."""
    _cfg, params, run, path = _build(tmp_path)
    texts = _texts()
    ref = np.asarray(run(texts))
    np.save(tmp_path / "ref.npy", ref)
    np.savez(tmp_path / "params.npz",
             **{str(i): np.asarray(v)
                for i, v in enumerate(jax.tree.leaves(params))})
    # worker rebuilds the pytree STRUCTURE from a treedef pickle
    with open(tmp_path / "treedef.pkl", "wb") as f:
        pickle.dump(jax.tree.structure(params), f)
    worker = tmp_path / "worker.py"
    worker.write_text(f'''
import pickle
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from nans_clip_tpu.deploy.engine import load_engine

data = np.load(r"{tmp_path}/params.npz")
leaves = [jnp.asarray(data[str(i)]) for i in range(len(data.files))]
with open(r"{tmp_path}/treedef.pkl", "rb") as f:
    params = jax.tree.unflatten(pickle.load(f), leaves)
eng = load_engine(r"{path}", params)
t = np.zeros((2, 52), np.int32); t[:, 0] = 101; t[:, 1] = 768; t[:, 2] = 102
out = np.asarray(eng(jnp.asarray(t)))
ref = np.load(r"{tmp_path}/ref.npy")
assert np.array_equal(out, ref), np.abs(out - ref).max()
print("COLD-ENGINE-OK")
''')
    out = subprocess.run([sys.executable, str(worker)],
                         capture_output=True, text=True,
                         env=dict(os.environ, PYTHONPATH=REPO,
                                  JAX_PLATFORMS=""))
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"
    assert "COLD-ENGINE-OK" in out.stdout
