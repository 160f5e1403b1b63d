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
