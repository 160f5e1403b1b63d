"""CoreML export — the reference `deploy/pytorch_to_coreml.py` analog.

The reference wraps each tower in an nn.Module, `torch.jit.trace`s it and
hands the trace to `coremltools.convert(..., convert_to="mlprogram")`
(reference deploy/pytorch_to_coreml.py:16-31, 120-177). A JAX framework
has no torch trace; the portable trace format here is StableHLO. The
export therefore runs in two stages:

1. ALWAYS (works in any container, zero extra deps): each requested tower
   is exported as a SELF-CONTAINED StableHLO module — weights baked in as
   constants, fixed shapes, fp32 math, CPU-platform lowering so the module
   contains only portable StableHLO ops (never Pallas/Mosaic custom calls)
   — plus a ``*.manifest.json`` carrying everything the reference bakes
   into its CoreML artifacts: input name/shape/layout, output name and
   feature dim, requested compute precision, the image-normalization
   mean/std, context length and deployment-target note.
2. IF a StableHLO→CoreML toolchain is importable (``coremltools`` plus a
   MIL importer for StableHLO, e.g. the Apple-community
   ``stablehlo_coreml`` converter), the module is converted and saved as
   ``*.mlpackage`` exactly like the reference's output files. When the
   toolchain is absent (this zero-egress container, or any Linux box),
   stage 2 is skipped with a pointer: the ``.stablehlo`` + manifest pair
   is the complete, reproducible input for running the conversion on a
   Mac with the toolchain installed.

Input conventions match the reference CoreML artifacts: the image tower
takes NCHW fp32 ``[1, 3, R, R]`` (already normalized, like the
reference's traced `preprocess` output); the text tower takes int32
``[1, context_length]`` token ids.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.configs import CLIPConfig
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.utils.transform import OPENAI_MEAN, OPENAI_STD

#: CPU-platform, plain-XLA lowering: the exported module must not contain
#: TPU custom calls if it is to be consumed by a CoreML converter.
_EXPORT_OPTIONS = ModelOptions(attn_impl="xla")


def _closed_tower_fn(cfg: CLIPConfig, params, tower: str,
                     batch_stats: Optional[dict]):
    """fn(x) with the weights CLOSED OVER (baked into the module as
    constants) — the CoreML artifact is self-contained, like the
    reference's traced torch module. Params stay fp32."""
    from nans_clip_tpu.deploy.aot import _tower_fn
    inner = _tower_fn(cfg, _EXPORT_OPTIONS, tower, batch_stats,
                      normalize_out=True)
    if tower == "image":
        # reference CoreML takes NCHW (torch layout); our stack is NHWC
        return lambda x: inner(params, jnp.transpose(x, (0, 2, 3, 1)))
    return lambda x: inner(params, x)


def _example_spec(cfg: CLIPConfig, tower: str, context_length: int):
    if tower == "image":
        r = cfg.vision.image_resolution
        return jax.ShapeDtypeStruct((1, 3, r, r), jnp.float32)
    return jax.ShapeDtypeStruct((1, context_length), jnp.int32)


def export_tower_stablehlo(cfg: CLIPConfig, params, tower: str, path: str,
                           batch_stats: Optional[dict] = None,
                           context_length: int = 52) -> str:
    """Stage 1: write the self-contained portable module to ``path``."""
    from jax import export as jexport
    fn = _closed_tower_fn(cfg, params, tower, batch_stats)
    spec = _example_spec(cfg, tower, context_length)
    exported = jexport.export(jax.jit(fn), platforms=["cpu"])(spec)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def write_manifest(cfg: CLIPConfig, tower: str, path: str,
                   precision: str = "fp16",
                   context_length: int = 52) -> str:
    """The deployment metadata the reference bakes into its CoreML models
    (input/output tensor specs, precision, preprocessing constants)."""
    if tower == "image":
        r = cfg.vision.image_resolution
        inp = {"name": "image", "shape": [1, 3, r, r], "dtype": "float32",
               "layout": "NCHW",
               "preprocessing": {"resize": r, "rescale": "1/255",
                                 "mean": list(OPENAI_MEAN),
                                 "std": list(OPENAI_STD)}}
        out_name = "image_features"
    else:
        inp = {"name": "text", "shape": [1, context_length],
               "dtype": "int32",
               "preprocessing": {"tokenizer": "WordPiece",
                                 "vocab_size": cfg.text.vocab_size,
                                 "context_length": context_length}}
        out_name = "text_features"
    manifest = {
        "format": "stablehlo",
        "tower": tower,
        "model": cfg.name,
        "input": inp,
        "output": {"name": out_name, "shape": [1, cfg.embed_dim],
                   "dtype": "float32", "l2_normalized": True},
        "coreml": {"convert_to": "mlprogram",
                   "compute_precision": precision,
                   "minimum_deployment_target": "iOS15"},
    }
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def _load_converter():
    """Feature-detect a StableHLO→CoreML toolchain. Returns
    (coremltools, hlo_convert) or (None, None)."""
    try:
        import coremltools as ct
    except ImportError:
        return None, None
    try:  # Apple-community StableHLO→MIL converter
        from stablehlo_coreml import convert as hlo_convert
        return ct, hlo_convert
    except ImportError:
        return ct, None


def convert_mlpackage(stablehlo_path: str, manifest_path: str,
                      out_path: str) -> Optional[str]:
    """Stage 2: StableHLO → .mlpackage when the toolchain is present.

    Returns the saved path, or None (with a message) when the toolchain
    is unavailable — the stage-1 artifacts are the complete conversion
    input for a machine that has it."""
    ct, hlo_convert = _load_converter()
    if ct is None or hlo_convert is None:
        print("coremltools + stablehlo_coreml not installed — skipping "
              ".mlpackage conversion. Run on a Mac:\n"
              "  pip install coremltools stablehlo-coreml-experimental\n"
              f"  python -m nans_clip_tpu.deploy.coreml --convert-only "
              f"{stablehlo_path}")
        return None
    from jax import export as jexport
    with open(stablehlo_path, "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(manifest_path) as f:
        manifest = json.load(f)
    precision = (ct.precision.FLOAT16
                 if manifest["coreml"]["compute_precision"] == "fp16"
                 else ct.precision.FLOAT32)
    target = getattr(ct.target, "iOS15")
    mil_program = hlo_convert(exported.mlir_module(),
                              minimum_deployment_target=target)
    model = ct.convert(mil_program, convert_to="mlprogram",
                       compute_precision=precision,
                       minimum_deployment_target=target)
    model.save(out_path)
    print(f"{manifest['tower']} model converted to CoreML and saved at: "
          f"{out_path}")
    return out_path


def export_coreml(cfg: CLIPConfig, params, save_path: str,
                  batch_stats: Optional[dict] = None,
                  convert_text: bool = True, convert_vision: bool = True,
                  precision: str = "fp16", context_length: int = 52):
    """Both stages for the requested towers; returns {tower: paths}."""
    results = {}
    towers = ([("text", convert_text), ("image", convert_vision)])
    for tower, enabled in towers:
        if not enabled:
            continue
        hlo = export_tower_stablehlo(
            cfg, params, tower, f"{save_path}.{tower}.stablehlo",
            batch_stats=batch_stats, context_length=context_length)
        man = write_manifest(cfg, tower, f"{save_path}.{tower}.manifest.json",
                             precision=precision,
                             context_length=context_length)
        pkg = convert_mlpackage(hlo, man, f"{save_path}.{tower}.mlpackage")
        results[tower] = {"stablehlo": hlo, "manifest": man,
                          "mlpackage": pkg}
    return results


def main(argv=None):
    """CLI mirroring the reference's pytorch_to_coreml.py flags."""
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--convert-only", default=None, metavar="STABLEHLO",
                    help="skip stage 1: convert an existing *.stablehlo "
                         "(with its sibling *.manifest.json) to .mlpackage "
                         "— the Mac-side half of the workflow")
    ap.add_argument("--model-arch", default=None,
                    help="e.g. ViT-B-16 (registry name)")
    ap.add_argument("--pytorch-ckpt-path", default=None,
                    help=".pt / HF / Orbax checkpoint; random init if absent")
    ap.add_argument("--save-coreml-path", default=None,
                    help="output path PREFIX (reference convention); "
                         "required unless --convert-only")
    ap.add_argument("--convert-text", action="store_true")
    ap.add_argument("--convert-vision", action="store_true")
    ap.add_argument("--precision", default="fp16", choices=["fp16", "fp32"])
    ap.add_argument("--context-length", type=int, default=52)
    args = ap.parse_args(argv)

    if args.convert_only:
        hlo = args.convert_only
        assert hlo.endswith(".stablehlo"), hlo
        man = hlo[:-len(".stablehlo")] + ".manifest.json"
        out = convert_mlpackage(hlo, man, hlo[:-len(".stablehlo")]
                                + ".mlpackage")
        if out is None:
            raise SystemExit("conversion toolchain unavailable")
        return
    if not args.model_arch or not args.save_coreml_path:
        ap.error("--model-arch and --save-coreml-path are required "
                 "(unless --convert-only)")

    from nans_clip_tpu.api import create_model
    from nans_clip_tpu.configs import MODEL_INFO
    arch = args.model_arch
    if "@" not in arch:  # reference-style bare arch (ViT-B-16, RN50, ...)
        vision, text, _ = MODEL_INFO[arch]
        arch = f"{vision}@{text}"
    model = create_model(arch, args.pytorch_ckpt_path)
    export_coreml(model.cfg, model.params, args.save_coreml_path,
                  batch_stats=model.batch_stats,
                  convert_text=args.convert_text,
                  convert_vision=args.convert_vision,
                  precision=args.precision,
                  context_length=args.context_length)


if __name__ == "__main__":
    main()
