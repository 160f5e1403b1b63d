"""Same-process full-step A/B: combined whole-layer bwd kernel (arm B)
vs the shipping two-fullgrad-kernel chain (arm A) at ViT-B bs512,
steps-per-call-4 config (the r3 763.6 pairs/s floor).

Recorded r4 result (gates.py LAYER_BWD_ROUTE provenance): A 761.7 /
B 701.2 / A2 761.2 pairs/s -> 0.92x, losses bit-identical — the
combined kernel is a MEASURED NEGATIVE and ships as the
NANS_LAYER_BWD=1 opt-in only."""
import json
import os
import sys
import time



import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.configs import load_config
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.parallel import create_mesh
from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                    make_train_step)

BATCH, K, WARMUP, ITERS = 512, 4, 2, 6

cfg = load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
options = ModelOptions(attn_impl="auto", compute_dtype="bfloat16",
                       remat=False, deterministic=False)
tcfg = TrainConfig(lr=1e-4, warmup=10, max_steps=1000)

mesh = create_mesh()
ctx = jax.set_mesh(mesh)
ctx.__enter__()

params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
state = create_train_state(params, batch_stats, tcfg)

rs = np.random.RandomState(0)
r = cfg.vision.image_resolution
texts = jnp.zeros((BATCH, 52), jnp.int32)
texts = texts.at[:, 0].set(101)
texts = texts.at[:, 1:30].set(jnp.asarray(rs.randint(1000, 20000, (BATCH, 29))))
texts = texts.at[:, 30].set(102)
images = jnp.asarray(rs.randn(K, BATCH, r, r, 3), jnp.bfloat16)
texts_k = jnp.broadcast_to(texts, (K,) + texts.shape)


def build_step():
    inner = make_train_step(cfg, tcfg, options)

    @jax.jit
    def step(state, images_k, texts_k, rng):
        def body(s, xs):
            im, tx, rn = xs
            return inner(s, im, tx, rn)
        state, ms = jax.lax.scan(body, state,
                                 (images_k, texts_k, jax.random.split(rng, K)))
        return state, jax.tree.map(lambda m: m[-1], ms)
    return step


def run(step, label, state):
    rng = jax.random.PRNGKey(7)
    for i in range(WARMUP):
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, images, texts_k, srng)
        print(f"{label} warmup {i}: loss={float(metrics['loss']):.4f}",
              flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, images, texts_k, srng)
        loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (ITERS * K)
    print(json.dumps({"arm": label, "pairs_per_sec": round(BATCH / dt, 1),
                      "step_ms": round(dt * 1e3, 1), "loss": loss}),
          flush=True)
    return BATCH / dt


os.environ.pop("NANS_LAYER_BWD", None)
step_a = build_step()
a = run(step_a, "A(two-kernel)", state)

os.environ["NANS_LAYER_BWD"] = "1"
step_b = build_step()
b = run(step_b, "B(layer-bwd)", state)

# re-drive A to bound drift inside the same process
os.environ.pop("NANS_LAYER_BWD", None)
a2 = run(step_a, "A2(two-kernel)", state)

print(json.dumps({"A": round(a, 1), "B": round(b, 1), "A2": round(a2, 1),
                  "B_vs_bestA": round(b / max(a, a2), 4)}), flush=True)
print("DRIVE_DONE")
