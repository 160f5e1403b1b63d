"""Serialized serving engines — the TensorRT engine-FILE analog.

``deploy.aot.compile_tower`` is the engine *build* (reference
deploy/onnx_to_tensorrt.py:80-94 builds one .trt per model/batch/
precision); this module makes the build artifact *persistent*:
``save_engine`` writes the compiled XLA executable plus a compatibility
header to disk, ``load_engine`` restores it WITHOUT re-tracing or
re-compiling — on the tunneled v5e a fresh Mosaic compile of a fused
tower costs minutes, a load is sub-second. Weights are NOT baked into
the file (unlike TRT): the executable takes the param pytree as an
argument, so one engine serves any checkpoint of the same architecture
— pass params at load time.

Like TRT engines, the artifact is specific to the device generation and
compiler stack: the header records jax version, backend and PJRT
platform_version, and ``load_engine`` raises on mismatch (pass
``strict=False`` to downgrade to a warning, e.g. across compatible
compiler point-releases).

Security note: the container format is a pickle (the upstream
``jax.experimental.serialize_executable`` payload itself is pickle);
load engines only from paths you built — the same trust model as a TRT
engine file or a torch checkpoint.
"""

from __future__ import annotations

import logging
import pickle
import warnings
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_MAGIC = "nans-clip-tpu-engine-v1"


def _platform_version() -> str:
    try:
        return str(jax.devices()[0].client.platform_version)
    except Exception:  # pragma: no cover - platform without the attr
        return "unknown"


def _read_payload(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("magic") != _MAGIC:
        raise ValueError(f"{path}: not a nans-clip-tpu engine file")
    return payload


def batch_stats_digest(batch_stats) -> Optional[str]:
    """Stable fingerprint of a BN-statistics pytree. ResNet towers close
    their running means/vars into the traced function, so they are BAKED
    into the engine (unlike the weights, which stay arguments) — the
    digest lets consumers refuse an engine whose baked stats don't match
    the checkpoint they serve. None for stat-less (ViT) models."""
    import hashlib

    import numpy as np

    leaves = jax.tree.leaves(batch_stats)
    if not leaves:
        return None
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    return h.hexdigest()[:16]


def save_engine(path: str, run, meta: Optional[dict] = None) -> str:
    """Persist a ``compile_tower`` result (or any object exposing
    ``.compiled`` from ``jit(...).lower(...).compile()``)."""
    from jax.experimental.serialize_executable import serialize

    compiled = getattr(run, "compiled", run)
    blob, in_tree, out_tree = serialize(compiled)
    try:
        device_ids = [d.id for d in
                      compiled._executable.xla_executable.local_devices()]
    except AttributeError:  # pragma: no cover - runtime without the attr
        device_ids = None
    payload = {
        "magic": _MAGIC,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "platform_version": _platform_version(),
        "device_ids": device_ids,
        "batch_size": getattr(run, "batch_size", None),
        "meta": meta or {},
        "blob": blob,
        "in_tree": in_tree,
        "out_tree": out_tree,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    logger.info("engine saved: %s", path)
    return path


def load_engine(path: str, params=None, strict: bool = True,
                payload: Optional[dict] = None):
    """Restore an engine. Returns ``fn(x)`` with ``params`` bound (the
    ``compile_tower`` calling convention) when ``params`` is given, else
    the raw ``fn(params, x)``. The result carries ``.batch_size`` and
    ``.meta``. ``payload`` skips re-reading a file the caller already
    loaded (a large-tower engine is hundreds of MB)."""
    from jax.experimental.serialize_executable import deserialize_and_load

    if payload is None:
        payload = _read_payload(path)
    checks = [("jax", jax.__version__),
              ("backend", jax.default_backend()),
              ("platform_version", _platform_version())]
    for key, now in checks:
        built = payload.get(key)
        if built != now:
            msg = (f"{path}: engine built for {key}={built!r}, this "
                   f"process has {now!r} — rebuild the engine "
                   f"(compile_tower + save_engine), like a TRT engine "
                   f"after a driver/device change")
            if strict:
                raise ValueError(msg)
            warnings.warn(msg)
    # deserialize_and_load defaults execution_devices to ALL local
    # devices, which re-targets a 1-device engine onto an N-device
    # assignment ("Expected args ... to have N shards" under the
    # 8-device CPU test mesh) — restore the engine's OWN device set.
    execution_devices = None
    if payload.get("device_ids") is not None:
        by_id = {d.id: d for d in jax.devices()}
        try:
            execution_devices = [by_id[i] for i in payload["device_ids"]]
        except KeyError as e:
            raise ValueError(
                f"{path}: engine was built on device ids "
                f"{payload['device_ids']}, not all present here "
                f"(have {sorted(by_id)})") from e
    fn = deserialize_and_load(payload["blob"], payload["in_tree"],
                              payload["out_tree"],
                              execution_devices=execution_devices)

    # A deserialized executable does not auto-commit host arrays the way
    # a live jit(...).compile() object does; re-create the placement from
    # its input shardings (weights once, per-call input each call).
    in_shardings = getattr(fn, "input_shardings", None)

    def _place(args):
        if in_shardings is None:
            return args
        return tuple(
            jax.tree.map(jax.device_put, a, s)
            for a, s in zip(args, in_shardings[0]))

    if params is None:
        def run(*args):
            return fn(*_place(args))
    else:
        if in_shardings is not None:    # place the weights ONCE
            params = jax.tree.map(jax.device_put, params, in_shardings[0][0])

        def run(x):
            if in_shardings is not None:
                x = jax.tree.map(jax.device_put, x, in_shardings[0][1])
            return fn(params, x)
    run.batch_size = payload.get("batch_size")
    run.meta = payload.get("meta", {})
    return run


def read_header(path: str, payload: Optional[dict] = None) -> dict:
    """The engine's compatibility header, without deserializing the
    executable (the blob stays untouched)."""
    if payload is None:
        payload = _read_payload(path)
    return {k: v for k, v in payload.items()
            if k not in ("blob", "in_tree", "out_tree")}


def engine_path(out_dir: str, tower: str, batch_size: int) -> str:
    """The ``build`` CLI's naming convention — one engine per tower x
    batch, like the reference's one .trt per tower/batch/precision
    (deploy/onnx_to_tensorrt.py:80-94)."""
    return f"{out_dir.rstrip('/')}/{tower}_bs{batch_size}.engine"


def main(argv=None):
    """``build``: compile fixed-shape tower engines and persist them;
    ``inspect``: print an engine's compatibility header.

    Mirrors the reference's engine-build CLI (deploy/onnx_to_tensorrt.py)
    — there the artifact chain is .pt -> .onnx -> .trt per tower and
    batch size; here it is checkpoint -> compiled XLA executable, one
    ``.engine`` per tower x batch size, consumed by
    ``eval.extract_features --backend engine`` and
    ``deploy.speed_benchmark --backend engine``.
    """
    import argparse
    import os
    import time

    p = argparse.ArgumentParser(prog="nans_clip_tpu.deploy.engine")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="compile + save tower engines")
    b.add_argument("--vision-model", default="ViT-B-16")
    b.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    b.add_argument("--resume", default=None)
    b.add_argument("--precision", default="bf16")
    b.add_argument("--attn-impl", default="auto")
    b.add_argument("--towers", default="image,text")
    b.add_argument("--batch-sizes", default="1")
    b.add_argument("--context-length", type=int, default=52)
    b.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8-text"],
                   help="weight-only int8 serving (utils/quantize.py) "
                        "baked into the engine's calling convention — "
                        "pass the SAME quantized params at load time")
    b.add_argument("--out-dir", required=True)
    b.add_argument("--tiny-model", action="store_true",
                   help="2-layer debug config (configs.tiny_config)")
    i = sub.add_parser("inspect", help="print an engine header")
    i.add_argument("path")
    args = p.parse_args(argv)

    if args.cmd == "inspect":
        for key, val in read_header(args.path).items():
            print(f"{key}: {val}")
        return

    from nans_clip_tpu.deploy.aot import compile_tower
    from nans_clip_tpu.eval.model_io import load_eval_model

    cfg_override = None
    if args.tiny_model:
        from nans_clip_tpu.configs import tiny_config
        cfg_override = tiny_config()
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision,
        attn_impl=args.attn_impl, cfg=cfg_override)
    if args.quantize:
        from nans_clip_tpu.utils.quantize import (quantize_for_serving,
                                                  towers_for_mode)
        params = quantize_for_serving(params, towers_for_mode(args.quantize))
    os.makedirs(args.out_dir, exist_ok=True)
    for tower in args.towers.split(","):
        for bs in [int(s) for s in args.batch_sizes.split(",")]:
            t0 = time.time()
            run = compile_tower(cfg, params, tower, bs, options=options,
                                batch_stats=batch_stats,
                                context_length=args.context_length)
            path = save_engine(
                engine_path(args.out_dir, tower, bs), run,
                meta={"tower": tower, "model": cfg.name,
                      "vision_model": args.vision_model,
                      "text_model": args.text_model,
                      "precision": args.precision,
                      "attn_impl": args.attn_impl,
                      "quantize": args.quantize,
                      "context_length": args.context_length,
                      # ResNet towers bake BN running stats into the
                      # executable; consumers match this against their
                      # checkpoint's stats (ViT: None)
                      "batch_stats_digest": batch_stats_digest(batch_stats)
                      if (tower == "image" and cfg.is_resnet) else None})
            print(f"built {path} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
