"""AOT-compiled fixed-shape inference — the TensorRT/ONNX analog.

The reference exports each tower to ONNX then builds fixed-shape TensorRT
engines (deploy/pytorch_to_onnx.py, deploy/onnx_to_tensorrt.py:80-94). The
TPU equivalent is ahead-of-time XLA compilation: ``jax.jit(...).lower(...)
.compile()`` produces a fixed-shape executable (no retracing, no dispatch
cache lookup), and ``jax.export`` serializes the StableHLO for portable
artifacts (the ONNX-file analog).

The fp16-overflow guard the reference needed in TensorRT
(fix_fp16_network, deploy/tensorrt_utils.py:65-97) has no analog here:
LayerNorm/softmax statistics are fp32 by construction (ops/).

CoreML (reference deploy/pytorch_to_coreml.py) is intentionally out of
scope for a TPU framework: the portable artifact is the exported StableHLO
module. A user targeting Apple hardware converts it off-line with Apple's
own toolchain (coremltools >= 8 consumes StableHLO via its MIL importer;
alternatively StableHLO -> ONNX -> coremltools). Nothing in the serving
path here depends on that conversion.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.configs import CLIPConfig
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text


def _tower_fn(cfg: CLIPConfig, options: ModelOptions, tower: str,
              batch_stats: Optional[dict], normalize_out: bool):
    if tower == "image":
        def fn(params, x):
            f = encode_image(params, cfg, x, options,
                             batch_stats=batch_stats if cfg.is_resnet else None)
            if normalize_out:
                f = f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)
            return f.astype(jnp.float32)
    elif tower == "text":
        def fn(params, x):
            f = encode_text(params, cfg, x, options)
            if normalize_out:
                f = f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)
            return f.astype(jnp.float32)
    else:
        raise ValueError(tower)
    return fn


def example_input(cfg: CLIPConfig, tower: str, batch_size: int,
                  context_length: int = 52):
    if tower == "image":
        r = cfg.vision.image_resolution
        return jax.ShapeDtypeStruct((batch_size, r, r, 3), jnp.float32)
    return jax.ShapeDtypeStruct((batch_size, context_length), jnp.int32)


def compile_tower(cfg: CLIPConfig, params, tower: str, batch_size: int,
                  options: ModelOptions = ModelOptions(compute_dtype="bfloat16"),
                  batch_stats: Optional[dict] = None,
                  context_length: int = 52, normalize_out: bool = True):
    """AOT-compile one tower at a fixed batch size. Returns ``fn(x) -> f32``
    with params already bound (weights stay device-resident)."""
    fn = _tower_fn(cfg, options, tower, batch_stats, normalize_out)
    x_spec = example_input(cfg, tower, batch_size, context_length)
    lowered = jax.jit(fn).lower(params, x_spec)
    compiled = lowered.compile()

    def run(x):
        return compiled(params, x)

    run.compiled = compiled
    run.batch_size = batch_size
    return run


def export_stablehlo(cfg: CLIPConfig, params, tower: str, batch_size: int,
                     path: str,
                     options: ModelOptions = ModelOptions(compute_dtype="bfloat16"),
                     batch_stats: Optional[dict] = None,
                     context_length: int = 52) -> str:
    """Serialize a tower to a portable StableHLO artifact (jax.export)."""
    from jax import export as jexport

    fn = _tower_fn(cfg, options, tower, batch_stats, normalize_out=True)
    x_spec = example_input(cfg, tower, batch_size, context_length)
    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    exported = jexport.export(jax.jit(fn))(params_spec, x_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    """Deserialize an exported tower; returns fn(params, x)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
