"""CoreML export path (reference deploy/pytorch_to_coreml.py analog).

Stage 1 (self-contained StableHLO + manifest) runs everywhere and is
fully tested here; stage 2 (.mlpackage conversion) needs coremltools +
the StableHLO->MIL converter, absent in this container — its test is
skip-gated and the no-toolchain behavior (clean skip, artifacts still
written) is what the default test asserts.
"""

import importlib.util
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu.deploy.coreml import (export_coreml,
                                         export_tower_stablehlo,
                                         write_manifest)
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip
from tests.test_trainer import TINY, _batch

OPTS = ModelOptions(attn_impl="xla")


def _normalize(f):
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def test_stage1_artifacts_and_selfcontained_module(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    out = export_coreml(TINY, params, str(tmp_path / "clip_cn"),
                        convert_text=True, convert_vision=True,
                        precision="fp16", context_length=52)
    assert set(out) == {"image", "text"}
    for tower in ("image", "text"):
        assert out[tower]["mlpackage"] is None  # toolchain absent here

    # the exported image module is SELF-CONTAINED (weights baked in) and
    # takes reference-layout NCHW input
    from jax import export as jexport
    with open(out["image"]["stablehlo"], "rb") as f:
        mod = jexport.deserialize(f.read())
    images, texts = _batch(1)
    nchw = jnp.transpose(jnp.asarray(images, jnp.float32), (0, 3, 1, 2))
    got = mod.call(nchw)
    ref = _normalize(encode_image(params, TINY, jnp.asarray(images), OPTS))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    with open(out["text"]["stablehlo"], "rb") as f:
        tmod = jexport.deserialize(f.read())
    got_t = tmod.call(jnp.asarray(texts, jnp.int32)[:1])
    ref_t = _normalize(encode_text(params, TINY,
                                   jnp.asarray(texts)[:1], OPTS))
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               atol=1e-5, rtol=1e-5)


def test_manifest_contents(tmp_path):
    p = str(tmp_path / "m.json")
    write_manifest(TINY, "image", p, precision="fp32", context_length=52)
    m = json.load(open(p))
    r = TINY.vision.image_resolution
    assert m["input"]["shape"] == [1, 3, r, r]
    assert m["input"]["layout"] == "NCHW"
    assert len(m["input"]["preprocessing"]["mean"]) == 3
    assert m["output"]["shape"] == [1, TINY.embed_dim]
    assert m["output"]["l2_normalized"] is True
    assert m["coreml"]["compute_precision"] == "fp32"
    assert m["coreml"]["convert_to"] == "mlprogram"

    write_manifest(TINY, "text", p, context_length=24)
    m = json.load(open(p))
    assert m["input"]["shape"] == [1, 24]
    assert m["input"]["dtype"] == "int32"


def test_stablehlo_portability(tmp_path):
    """The module must stay portable: CPU lowering, no Mosaic kernels.
    Check actual custom_call TARGETS, not a substring of the module text
    — jax.export's loc() debug metadata embeds enclosing Python function
    names, so this test's own name would otherwise match itself."""
    import re
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    path = export_tower_stablehlo(TINY, params, "text",
                                  str(tmp_path / "t.stablehlo"))
    from jax import export as jexport
    with open(path, "rb") as f:
        mod = jexport.deserialize(f.read())
    assert mod.platforms == ("cpu",)
    targets = set(re.findall(r"custom_call @([\w.]+)", mod.mlir_module()))
    assert not targets, f"non-portable custom calls: {targets}"


@pytest.mark.skipif(importlib.util.find_spec("coremltools") is None,
                    reason="coremltools not installed (stage 2 runs on a "
                           "Mac with coremltools + stablehlo_coreml)")
def test_stage2_mlpackage(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    out = export_coreml(TINY, params, str(tmp_path / "clip_cn"),
                        convert_text=True, convert_vision=False)
    assert out["text"]["mlpackage"] is not None
