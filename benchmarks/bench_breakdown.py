"""Train-step time breakdown (ViT-B/16 + RoBERTa-base, 1 chip, bs512).

Attributes the production train step's wall time to segments, all measured
in ONE process (cross-process runs drift ±4% on the tunneled chip):

  fwd        — loss forward only (both towers + global InfoNCE)
  bwd        — value_and_grad minus fwd
  optimizer  — AdamW update + apply (precomputed grads)
  dispatch   — full step minus (grad + optimizer): jit glue + tunnel RTT
  img/txt    — per-tower fwd and fwd+bwd splits (pseudo-loss on features)

Derives training MFU two ways: over model FLOPs (3x fwd: fwd 2PD, bwd 4PD)
and against the 234.8 TFLOP/s measured Pallas matmul peak (PARITY.md int8
probe). The reference has no analog — its only training-time profiling is
wall-clock batch time in the train log (training/train.py:183,264).

Timing: cheap segments run INNER iterations inside one jitted fori_loop
with a loop-carried data dependency (bench.py methodology — the ~27.5 ms
tunnel RTT would otherwise dominate); the full step and optimizer are
per-dispatch like production. Sync = consuming an fp32 scalar.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, iters, inner=1):
    for _ in range(2):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(f"  {label:28s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--vision-model", default="ViT-B-16")
    ap.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    ap.add_argument("--attn-impl", default="auto")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--trace", default=None,
                    help="optional: jax.profiler trace dir for the full step")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu for smoke tests)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import MEASURED_PEAK_TFLOPS, _clip_pair_flops
    from nans_clip_tpu.configs import load_config
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import (encode_image, encode_text,
                                           init_clip, normalize)
    from nans_clip_tpu.parallel import create_mesh
    from nans_clip_tpu.parallel.loss import clip_loss
    from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)
    from nans_clip_tpu.training.trainer import make_optimizer

    cfg = load_config(f"{args.vision_model}@{args.text_model}")
    options = ModelOptions(attn_impl=args.attn_impl, compute_dtype="bfloat16",
                           remat=False, deterministic=False)
    tcfg = TrainConfig(lr=1e-4, warmup=10, max_steps=1000)

    mesh = create_mesh()
    ctx = jax.set_mesh(mesh)
    ctx.__enter__()

    B = args.batch
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, batch_stats, tcfg)
    rs = np.random.RandomState(0)
    r = cfg.vision.image_resolution
    images = jnp.asarray(rs.randn(B, r, r, 3), jnp.bfloat16)
    texts = jnp.zeros((B, 52), jnp.int32)
    texts = texts.at[:, 0].set(101)
    texts = texts.at[:, 1:30].set(jnp.asarray(rs.randint(1000, 20000, (B, 29))))
    texts = texts.at[:, 30].set(102)
    rng = jax.random.PRNGKey(7)

    # ---- the production loss (same math as trainer.make_train_step) ----
    def loss_fn(p, im, tx, key):
        i_rng, t_rng = jax.random.split(key)
        img_f = encode_image(p, cfg, im, options, rng=i_rng)
        txt_f = encode_text(p, cfg, tx, options, rng=t_rng)
        scale = jnp.exp(p["logit_scale"].astype(jnp.float32))
        loss, _ = clip_loss(normalize(img_f), normalize(txt_f), scale)
        return loss

    def perturb(x, acc):
        return x + (acc * 1e-12).astype(x.dtype)

    INNER = args.inner

    def inner_loop(body):
        def run(p, im, tx, key):
            def step(i, acc):
                return acc + body(p, perturb(im, acc), tx,
                                  jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, INNER, step,
                                     jnp.zeros((), jnp.float32))
        return jax.jit(run)

    def gnorm(tree):
        return sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                   for g in jax.tree.leaves(tree))

    fwd = inner_loop(loss_fn)
    grad = inner_loop(
        lambda p, im, tx, k:
        (lambda lv: lv[0] + gnorm(lv[1]) * 1e-12)
        (jax.value_and_grad(loss_fn)(p, im, tx, k)))

    # per-tower pseudo-loss: sum of squared features (bwd cotangent flows
    # through the whole tower; FLOP-equivalent to the real loss's tower part)
    def img_only(p, im, tx, k):
        f = encode_image(p, cfg, im, options, rng=k)
        return jnp.sum(jnp.square(f.astype(jnp.float32)))

    def txt_only(p, im, tx, k):
        f = encode_text(p, cfg, tx, options, rng=k)
        return jnp.sum(jnp.square(f.astype(jnp.float32)))

    img_fwd = inner_loop(img_only)
    txt_fwd = inner_loop(txt_only)
    img_grad = inner_loop(
        lambda p, im, tx, k:
        (lambda lv: lv[0] + gnorm(lv[1]) * 1e-12)
        (jax.value_and_grad(img_only)(p, im, tx, k)))
    txt_grad = inner_loop(
        lambda p, im, tx, k:
        (lambda lv: lv[0] + gnorm(lv[1]) * 1e-12)
        (jax.value_and_grad(txt_only)(p, im, tx, k)))

    # optimizer-only: fori_loop carrying (params, opt_state) over a fixed
    # grads pytree — the production optax chain incl. schedule + wd mask
    tx_opt = make_optimizer(tcfg, state.params)

    @jax.jit
    def opt_loop(p0, os0, g):
        import optax

        def step(i, carry):
            p, os = carry
            upd, os = tx_opt.update(g, os, p)
            return (optax.apply_updates(p, upd), os)
        p, os = jax.lax.fori_loop(0, INNER, step, (p0, os0))
        return gnorm({"k": p["logit_scale"]})

    # full production step (per-dispatch, like the train loop)
    step_full = make_train_step(cfg, tcfg, options)
    st = {"state": state, "rng": rng}

    def run_full():
        st["rng"], srng = jax.random.split(st["rng"])
        st["state"], m = step_full(st["state"], images, texts, srng)
        return float(m["loss"])

    print(f"breakdown @ bs{B} {args.vision_model}+{args.text_model} "
          f"(backend={jax.default_backend()}, attn={args.attn_impl}):",
          flush=True)
    t_step = timed("full train step", run_full, args.iters)
    # the full step donates its input state; measure segments on the live one
    live = st["state"]
    grads_fixed = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-6, live.params)
    t_fwd = timed("loss fwd", lambda: float(fwd(live.params, images, texts, rng)),
                  args.iters, INNER)
    t_grad = timed("loss fwd+bwd", lambda: float(grad(live.params, images, texts, rng)),
                   args.iters, INNER)
    t_img_f = timed("image tower fwd", lambda: float(img_fwd(live.params, images, texts, rng)),
                    args.iters, INNER)
    t_img_g = timed("image tower fwd+bwd", lambda: float(img_grad(live.params, images, texts, rng)),
                    args.iters, INNER)
    t_txt_f = timed("text tower fwd", lambda: float(txt_fwd(live.params, images, texts, rng)),
                    args.iters, INNER)
    t_txt_g = timed("text tower fwd+bwd", lambda: float(txt_grad(live.params, images, texts, rng)),
                    args.iters, INNER)
    t_opt = timed("optimizer (AdamW+sched)",
                  lambda: float(opt_loop(live.params, live.opt_state,
                                         grads_fixed)),
                  args.iters, INNER)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            run_full()
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", flush=True)

    flops_fwd = _clip_pair_flops(cfg, texts.shape[1])
    pairs = B / t_step
    train_tflops = pairs * 3.0 * flops_fwd / 1e12
    out = {
        "metric": f"train-step breakdown bs{B}",
        "pairs_per_sec": round(pairs, 1),
        "ms": {
            "full_step": round(t_step * 1e3, 2),
            "loss_fwd": round(t_fwd * 1e3, 2),
            "loss_bwd": round((t_grad - t_fwd) * 1e3, 2),
            "optimizer": round(t_opt * 1e3, 2),
            "dispatch_overhead": round((t_step - t_grad - t_opt) * 1e3, 2),
            "img_fwd": round(t_img_f * 1e3, 2),
            "img_bwd": round((t_img_g - t_img_f) * 1e3, 2),
            "txt_fwd": round(t_txt_f * 1e3, 2),
            "txt_bwd": round((t_txt_g - t_txt_f) * 1e3, 2),
        },
        "train_tflops_per_sec": round(train_tflops, 1),
        "mfu_vs_measured_peak_pct": round(
            100 * train_tflops / MEASURED_PEAK_TFLOPS, 1),
        "fwd_tflops_per_sec": round(B / t_fwd * flops_fwd / 1e12, 1),
        "bwd_tflops_per_sec": round(
            B / (t_grad - t_fwd) * 2.0 * flops_fwd / 1e12, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
