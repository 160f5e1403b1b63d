"""Inference latency/throughput benchmark CLI.

Twin of reference deploy/speed_benchmark.py:88-187 (100-iter warm latency
per backend/tower) and benchmark_utils.py:11-42 (mean/sd/min/max/median/
p95/p99 stats). Backends here: ``jit`` (dispatch-cached) and ``aot``
(ahead-of-time compiled executable, the TensorRT analog).

Timing forces full execution by consuming an fp32 scalar each iteration —
block_until_ready is unreliable on tunneled platforms.

Usage:
  python -m nans_clip_tpu.deploy.speed_benchmark \
      --vision-model ViT-B-16 --text-model RoBERTa-wwm-ext-base-chinese \
      [--resume ckpt.pt] --batch-sizes 1,8,64,256 --n 50
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--resume", default=None)
    p.add_argument("--batch-sizes", default="1,8,64,256")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--context-length", type=int, default=52)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--attn-impl", default="auto")
    p.add_argument("--json-output", default=None)
    p.add_argument("--backend", default="jit",
                   choices=["jit", "aot", "engine"],
                   help="jit = dispatch-cached jax.jit; aot = ahead-of-"
                        "time lowered+compiled executable at fixed shapes "
                        "(the TensorRT-engine analog, same machinery as "
                        "deploy.compile_tower); engine = saved pre-compiled "
                        "engines from `python -m nans_clip_tpu.deploy.engine"
                        " build` (--engine-dir) — no compile in this "
                        "process at all, like benchmarking a .trt file")
    p.add_argument("--engine-dir", default=None,
                   help="directory of {tower}_bs{N}.engine files for "
                        "--backend engine")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8-text"],
                   help="weight-only quantized serving (utils/quantize.py):"
                        " the whole-tower kernel streams half the weight "
                        "bytes — the batch-1 bottleneck; non-tower shapes "
                        "dequantize on entry. int8-text quantizes only the "
                        "text tower (the measured win; wide image towers "
                        "are compute-bound and don't profit)")
    p.add_argument("--inner", type=int, default=1,
                   help="forwards per dispatch (chained through a fori_loop "
                        "data dependency). >1 gives DEVICE-side latency on "
                        "tunneled hosts where each dispatch pays a fixed "
                        "RTT (~27.5 ms here) that would swamp batch-1 "
                        "numbers; the per-iter time divides it out")
    p.add_argument("--device-time", action="store_true",
                   help="two-point fit: also time a 4x-deeper inner loop "
                        "and report the SLOPE as pure device ms/forward "
                        "plus the per-dispatch overhead intercept. Immune "
                        "to dispatch-RTT variance that --inner alone still "
                        "amortizes into the mean (jit/aot backends; "
                        "implies --inner >= 8)")
    return p.parse_args(argv)


def stats(times_ms):
    t = np.asarray(times_ms)
    return {
        "mean": float(t.mean()), "std": float(t.std()), "min": float(t.min()),
        "max": float(t.max()), "median": float(np.median(t)),
        "p95": float(np.percentile(t, 95)), "p99": float(np.percentile(t, 99)),
    }


def bench_fn(fn, args_tuple, n, warmup):
    for _ in range(warmup):
        float(fn(*args_tuple))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args_tuple))
        times.append(1000 * (time.perf_counter() - t0))
    return stats(times)


def main(argv=None):
    args = parse_args(argv)
    from nans_clip_tpu.eval.model_io import load_eval_model
    from nans_clip_tpu.models.clip import encode_image, encode_text

    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision,
        attn_impl=args.attn_impl)
    if args.quantize:
        from nans_clip_tpu.utils.quantize import (quantize_for_serving,
                                                  towers_for_mode)
        params = quantize_for_serving(params, towers_for_mode(args.quantize))
    resolution = cfg.vision.image_resolution
    rs = np.random.RandomState(0)

    if args.device_time:
        assert args.backend in ("jit", "aot"), \
            "--device-time needs the jit/aot fori_loop backends"
        args.inner = max(args.inner, 8)

    results = {}
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        images = jnp.asarray(rs.randn(bs, resolution, resolution, 3), jnp.float32)
        texts = jnp.zeros((bs, args.context_length), jnp.int32)
        texts = texts.at[:, 0].set(101).at[:, 1].set(768).at[:, 2].set(102)

        def _loop(enc, cast, inner):
            def run(p, x):
                def body(i, acc):
                    return acc + jnp.sum(enc(
                        p, cast(x, acc)).astype(jnp.float32))
                return jax.lax.fori_loop(0, inner, body,
                                         jnp.zeros((), jnp.float32))
            return jax.jit(run)

        def _img_loop(inner):
            return _loop(lambda p, x: encode_image(
                p, cfg, x, options,
                batch_stats=batch_stats if cfg.is_resnet else None),
                lambda x, acc: x + (acc * 1e-12).astype(x.dtype), inner)

        # the acc-dependent select keeps the loop body loop-variant so XLA
        # cannot hoist the forward out of the fori_loop (ids are ints, so
        # the float perturbation trick doesn't apply)
        def _txt_loop(inner):
            return _loop(lambda p, t: encode_text(p, cfg, t, options),
                         lambda t, acc: jnp.where(
                             acc < jnp.float32(np.inf), t, t + 1), inner)

        img_jit, txt_jit = _img_loop(args.inner), _txt_loop(args.inner)
        deep = {}
        if args.device_time:
            deep = {"image": _img_loop(4 * args.inner),
                    "text": _txt_loop(4 * args.inner)}

        if args.backend == "engine":
            # Saved engines return the f32 feature matrix; sync by summing
            # it on host (batch-1 feature fetch is a few KB — the fixed
            # dispatch RTT dominates either way). --inner doesn't apply:
            # the engine is the single-forward executable.
            assert args.engine_dir, "--backend engine needs --engine-dir"
            assert args.inner == 1, "--inner >1 requires jit/aot backends"
            from nans_clip_tpu.deploy.engine import (engine_path, load_engine,
                                                     read_header)

            def _eng(tower):
                path = engine_path(args.engine_dir, tower, bs)
                built_q = read_header(path).get("meta", {}).get("quantize")
                if built_q != args.quantize:
                    raise SystemExit(
                        f"{path} was built with --quantize {built_q}, this "
                        f"run passed --quantize {args.quantize}; the param "
                        f"pytree must match the engine's calling convention")
                eng = load_engine(path, params)
                return lambda p, x: np.asarray(eng(x), np.float32).sum()
            img_jit, txt_jit = _eng("image"), _eng("text")
        elif args.backend == "aot":
            img_jit = img_jit.lower(params, images).compile()
            txt_jit = txt_jit.lower(params, texts).compile()
            if args.device_time:
                deep = {t: f.lower(params, x).compile()
                        for (t, f), x in zip(deep.items(), (images, texts))}

        for tower, fn, x in (("image", img_jit, images), ("text", txt_jit, texts)):
            s = bench_fn(fn, (params, x), args.n, args.warmup)
            s = {k: v / args.inner for k, v in s.items()}
            s["ms_per_sample"] = s["mean"] / bs
            s["samples_per_sec"] = 1000.0 * bs / s["mean"]
            s["inner"] = args.inner
            if args.device_time:
                # wall(N) = overhead + N*device: the slope between the two
                # inner depths is pure device time per forward; the
                # intercept is the per-dispatch overhead (tunnel RTT +
                # host glue), reported separately instead of amortized in
                s4 = bench_fn(deep[tower], (params, x), max(3, args.n // 4),
                              args.warmup)
                w1 = s["median"] * args.inner
                w4 = s4["median"]
                dev = (w4 - w1) / (3 * args.inner)
                s["mean_device"] = dev
                s["ms_per_sample_device"] = dev / bs
                s["samples_per_sec_device"] = 1000.0 * bs / dev if dev > 0 else None
                s["dispatch_overhead_ms"] = w1 - args.inner * dev
            results[f"{tower}@bs{bs}"] = s
            line = (f"[{args.vision_model} {tower} bs={bs}] "
                    f"mean {s['mean']:.2f} ms | p95 {s['p95']:.2f} | "
                    f"p99 {s['p99']:.2f} | {s['ms_per_sample']:.3f} "
                    f"ms/sample | {s['samples_per_sec']:.0f}/s")
            if args.device_time:
                line += (f" | device {s['mean_device']:.3f} ms "
                         f"(+{s['dispatch_overhead_ms']:.1f} ms/dispatch)")
            print(line)

    if args.json_output:
        with open(args.json_output, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
