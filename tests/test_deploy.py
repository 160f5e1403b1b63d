"""Deploy layer tests: AOT compile + StableHLO export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.deploy import compile_tower, export_stablehlo, load_stablehlo
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
from tests.test_trainer import TINY, _batch

OPTS = ModelOptions(attn_impl="xla")  # fp32, CPU-test friendly


def test_aot_matches_jit():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, texts = _batch(4)
    run_img = compile_tower(TINY, params, "image", 4, OPTS, normalize_out=False)
    run_txt = compile_tower(TINY, params, "text", 4, OPTS, normalize_out=False)
    ref_i = encode_image(params, TINY, jnp.asarray(images), OPTS)
    ref_t = encode_text(params, TINY, jnp.asarray(texts), OPTS)
    np.testing.assert_allclose(np.asarray(run_img(jnp.asarray(images))),
                               np.asarray(ref_i), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(run_txt(jnp.asarray(texts))),
                               np.asarray(ref_t), atol=1e-5, rtol=1e-5)


def test_stablehlo_roundtrip(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, _ = _batch(2)
    path = str(tmp_path / "img_tower.stablehlo")
    export_stablehlo(TINY, params, "image", 2, path, OPTS)
    fn = load_stablehlo(path)
    out = fn(params, jnp.asarray(images))
    ref = encode_image(params, TINY, jnp.asarray(images), OPTS)
    ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_speed_benchmark_cli(tmp_path, monkeypatch):
    """speed_benchmark smoke on the tiny model: both backends produce the
    full stats table and the JSON artifact (reference
    deploy/speed_benchmark.py:88-187 field set)."""
    import json
    import os

    import nans_clip_tpu.deploy.speed_benchmark as sb
    from nans_clip_tpu.configs import tiny_config
    from nans_clip_tpu.eval import model_io

    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)

    def fake_load(vision, text, resume, precision="bf16", attn_impl="auto",
                  cfg_override=None):
        return cfg, params, batch_stats, ModelOptions(attn_impl="xla")

    monkeypatch.setattr(model_io, "load_eval_model", fake_load)

    for backend in ("jit", "aot"):
        out = str(tmp_path / f"{backend}.json")
        results = sb.main(["--batch-sizes", "1,2", "--n", "3", "--warmup", "1",
                           "--inner", "2", "--precision", "fp32",
                           "--backend", backend, "--json-output", out])
        assert set(results) == {"image@bs1", "text@bs1", "image@bs2", "text@bs2"}
        for s in results.values():
            for k in ("mean", "std", "min", "max", "median", "p95", "p99",
                      "ms_per_sample", "samples_per_sec"):
                assert np.isfinite(s[k]), k
            assert s["inner"] == 2
        assert os.path.isfile(out)
        with open(out) as f:
            assert set(json.load(f)) == set(results)

    # weight-only int8 serving flag: params quantized before the drive
    # (the xla fallback dequantizes on entry; the tower-kernel numerics
    # are covered by test_quantize.py)
    results = sb.main(["--batch-sizes", "1", "--n", "2", "--warmup", "1",
                       "--precision", "fp32", "--quantize", "int8"])
    assert set(results) == {"image@bs1", "text@bs1"}
    for s in results.values():
        assert np.isfinite(s["mean"])

    # --device-time: two-point fit separates device ms from dispatch
    # overhead (r5; the method behind the device-corrected deployment
    # rows in PARITY.md)
    for backend in ("jit", "aot"):
        results = sb.main(["--batch-sizes", "1", "--n", "4", "--warmup", "1",
                           "--precision", "fp32", "--device-time",
                           "--backend", backend])
        for s in results.values():
            assert s["inner"] >= 8  # implied floor
            assert np.isfinite(s["mean_device"])
            assert np.isfinite(s["dispatch_overhead_ms"])
            assert np.isfinite(s["ms_per_sample_device"])
            # slope must sit at or below the RTT-amortized mean
            assert s["mean_device"] <= s["mean"] * 1.5
