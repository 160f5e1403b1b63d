"""Jitted contrastive train/eval steps over a device mesh.

TPU redesign of reference ``training/train.py``/``main.py``:

* one jitted ``train_step`` over a ``("data","model")`` mesh replaces
  DDP + NCCL + AMP GradScaler (bf16 needs no loss scaling);
* gradient accumulation with full global negatives
  (training/train.py:206-253's two-pass feature-cache protocol) is a
  ``lax.scan`` over microbatches with ``jax.checkpoint`` around the tower
  forward: all features are produced for ONE global loss, and the backward
  pass recomputes each microbatch's activations — mathematically the same
  gradient as the reference (the sum of its per-chunk backwards decomposes
  the global-loss gradient), with one fewer forward pass;
* NOTE on remat: the fused Pallas sub-blocks' custom_vjps already
  recompute activations inside their backward kernels (residuals are just
  the block inputs), so per-block ``ModelOptions.remat`` is REDUNDANT
  recompute on the fused path — measured 657 vs 617 pairs/s/chip at
  ViT-B bs256 with remat off. Keep remat for the unfused/XLA path or when
  HBM is tight (grad accumulation's scan still remats per microbatch);
* AdamW with the reference's weight-decay exclusion (bn/ln/bias/logit_scale,
  training/main.py:147-166), cosine schedule with linear warmup
  (training/scheduler.py:10-20), logit_scale clamped to ln(100)
  (training/train.py:261-262);
* freeze-vision (training/main.py:122-130) via zeroed updates;
* FLIP mask_ratio threading (training/train.py and clip/model.py:252-266);
* distillation: frozen teacher encoder inside the step + cosine KD loss
  (training/train.py:90-100,406-419).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nans_clip_tpu.configs import CLIPConfig
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text, normalize
from nans_clip_tpu.parallel.loss import clip_loss, kd_cosine_loss

LOGIT_SCALE_MAX = math.log(100.0)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-5
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.001
    warmup: int = 100
    max_steps: int = 1000
    mask_ratio: float = 0.0
    accum_freq: int = 1
    freeze_vision: bool = False
    label_smoothing: float = 0.0
    distillation: bool = False
    kd_loss_weight: float = 0.5
    grad_norm_clip: Optional[float] = None
    # Honor --skip-scheduler's documented semantics (constant lr after
    # warmup). NOTE: the reference parses this flag but never reads it
    # (training/train.py:173 calls scheduler(step) unconditionally); we
    # implement what its help text promises instead of replicating the bug.
    skip_scheduler: bool = False
    # Store Adam moments in this dtype ("bfloat16" halves optimizer HBM —
    # the lever that lifts ViT-H/14 from bs16 to bs32 on a 16 GB chip).
    # None keeps optax.adamw's fp32 state (reference-parity default).
    adam_state_dtype: Optional[str] = None


def no_decay_mask(params) -> Any:
    """True where weight decay must NOT apply (reference exclusion:
    'bn'/'ln'/'bias'/'logit_scale' substring in the torch param name,
    training/main.py:147). Notes on exact parity:

    * the reference DECAYS class/positional embeddings, so we do too;
    * the case-sensitive substring test does NOT match BERT's capitalized
      'LayerNorm.weight', so the reference decays text-tower LayerNorm
      scales (their biases are still caught by 'bias') — reproduced here
      by applying the ln/bn exclusion only outside the 'bert' subtree;
    * the RN50 downsample BatchNorm is the Sequential's anonymous index 1
      ('downsample.1.weight' — no 'bn' substring), so the reference DECAYS
      its scale; our pytree names it 'downsample'/'bn', so the bn
      exclusion is suppressed under 'downsample' (its bias is still
      caught by 'bias', same as the reference)."""
    bias_names = {"bias", "bqkv", "bo", "b1", "b2"}

    def is_excluded(path) -> bool:
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        in_text = "bert" in names
        in_downsample = "downsample" in names
        for n in names:
            if n == "logit_scale" or n in bias_names:
                return True
            if not in_text and not in_downsample and ("ln" in n or "bn" in n):
                return True
        return False

    return jax.tree_util.tree_map_with_path(lambda p, _: is_excluded(p), params)


def cosine_with_warmup(base_lr: float, warmup: int, total_steps: int,
                       skip_decay: bool = False) -> optax.Schedule:
    """Reference cosine_lr semantics (training/scheduler.py:10-20).

    ``skip_decay`` holds the post-warmup lr constant at ``base_lr``
    (--skip-scheduler)."""

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup, 1)
        if skip_decay:
            decayed = base_lr
        else:
            e = step - warmup
            es = max(total_steps - warmup, 1)
            decayed = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, warm, decayed)

    return schedule


def _scale_by_adam_compact(b1: float, b2: float, eps: float,
                           state_dtype) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in ``state_dtype`` (optax only
    exposes ``mu_dtype``). The EMAs are computed in fp32 each step and cast
    back for storage; bf16's 8 exponent bits keep the full fp32 range, and
    the ~2^-8 mantissa roundoff is damped geometrically by the EMA, so the
    update direction stays within ~1% of the fp32 optimizer (tested in
    tests/test_trainer.py). Halves Adam's HBM footprint: ViT-H+RoBERTa-large
    drops from 11.5 GB to 7.7 GB of param+state, freeing room for bs32."""

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, dtype=state_dtype)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=jax.tree.map(zeros, params),
                                      nu=jax.tree.map(zeros, params))

    def update(updates, state, params=None):
        del params
        f32 = lambda t: t.astype(jnp.float32)
        mu = jax.tree.map(lambda g, m: b1 * f32(m) + (1 - b1) * f32(g),
                          updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * f32(v) + (1 - b2) * jnp.square(f32(g)),
                          updates, state.nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(g.dtype),
            mu, nu, updates)
        cast = lambda t: t.astype(state_dtype)
        return out, optax.ScaleByAdamState(count=count,
                                           mu=jax.tree.map(cast, mu),
                                           nu=jax.tree.map(cast, nu))

    return optax.GradientTransformation(init, update)


def make_optimizer(tcfg: TrainConfig, params) -> optax.GradientTransformation:
    schedule = cosine_with_warmup(tcfg.lr, tcfg.warmup, tcfg.max_steps,
                                  skip_decay=tcfg.skip_scheduler)
    mask = jax.tree.map(lambda excluded: not excluded, no_decay_mask(params))
    chain = []
    if tcfg.grad_norm_clip:
        chain.append(optax.clip_by_global_norm(tcfg.grad_norm_clip))
    if tcfg.adam_state_dtype:
        chain.append(_scale_by_adam_compact(tcfg.beta1, tcfg.beta2, tcfg.eps,
                                            jnp.dtype(tcfg.adam_state_dtype)))
        chain.append(optax.add_decayed_weights(tcfg.wd, mask=mask))
        chain.append(optax.scale_by_learning_rate(schedule))
    else:
        chain.append(optax.adamw(schedule, b1=tcfg.beta1, b2=tcfg.beta2,
                                 eps=tcfg.eps, weight_decay=tcfg.wd, mask=mask))
    if tcfg.freeze_vision:
        def zero_visual(updates):
            return {**updates, "visual": jax.tree.map(jnp.zeros_like, updates["visual"])}
        chain.append(optax.stateless(lambda u, p=None: zero_visual(u)))
    return optax.chain(*chain)


def create_train_state(params, batch_stats, tcfg: TrainConfig) -> TrainState:
    tx = make_optimizer(tcfg, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), batch_stats=batch_stats or {})


def train_state_shardings(state: TrainState, mesh, fsdp: bool = False,
                          fsdp_min_size=None):
    """NamedSharding pytree covering the WHOLE TrainState (params, Adam
    moments, counters). The param rules (parallel/mesh.py) key on the last
    path entry + leaf shape, and the optimizer moments mirror the parameter
    dict inside ``ScaleByAdamState``, so one path-keyed map shards both
    identically; scalars and batch_stats fall through to replicated."""
    from jax.sharding import NamedSharding
    from nans_clip_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS, param_spec
    n = mesh.shape[DATA_AXIS] if fsdp else 1
    pp = mesh.shape.get(PIPE_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_spec(path, leaf, fsdp=n, pp=pp,
                             fsdp_min_size=fsdp_min_size)),
        state)


def shard_train_state(state: TrainState, mesh, fsdp: bool = False,
                      fsdp_min_size=None) -> TrainState:
    return jax.device_put(state, train_state_shardings(
        state, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min_size))


def _encode_all(params, cfg, options, images, texts, rng, tcfg, batch_stats,
                constrain: bool = True):
    """Both-tower features, optionally scanning accum_freq microbatches with
    remat (full-negative grad accumulation)."""
    img_rng, txt_rng = jax.random.split(rng)
    new_stats = batch_stats
    # freeze-vision freezes BN running statistics too: the reference puts
    # every BatchNorm2d in eval mode when the tower is frozen
    # (training/main.py:126-129), so the frozen RN50's inference outputs
    # stay pinned to the pretrained stats.
    bn_train = not tcfg.freeze_vision
    if tcfg.accum_freq <= 1:
        if cfg.is_resnet:
            if bn_train:
                img_f, new_stats = encode_image(params, cfg, images, options,
                                                batch_stats=batch_stats,
                                                training=True)
            else:
                img_f = encode_image(params, cfg, images, options,
                                     batch_stats=batch_stats, training=False)
        else:
            img_f = encode_image(params, cfg, images, options,
                                 mask_ratio=tcfg.mask_ratio, rng=img_rng)
        txt_f = encode_text(params, cfg, texts, options, rng=txt_rng)
        return img_f, txt_f, new_stats

    b = images.shape[0]
    m = tcfg.accum_freq
    micro = b // m
    assert micro * m == b, f"batch {b} not divisible by accum_freq {m}"
    im = images.reshape(m, micro, *images.shape[1:])
    tx = texts.reshape(m, micro, *texts.shape[1:])
    if constrain:
        # keep the microbatch stacks batch-sharded over 'data': without the
        # pin, the partitioner sometimes routes the remat'd scan body's
        # tiny re-slices through replicate-then-reshard ("involuntary full
        # rematerialization" SPMD warnings on pure-DP + FSDP meshes)
        from jax.sharding import PartitionSpec as P

        from nans_clip_tpu.parallel.mesh import DATA_AXIS
        spec_i = P(None, DATA_AXIS, *([None] * (im.ndim - 2)))
        spec_t = P(None, DATA_AXIS, *([None] * (tx.ndim - 2)))
        im = jax.lax.with_sharding_constraint(im, spec_i)
        tx = jax.lax.with_sharding_constraint(tx, spec_t)

    def enc(stats, mb):
        j, im_j, tx_j = mb
        r_i = jax.random.fold_in(img_rng, j)
        r_t = jax.random.fold_in(txt_rng, j)
        if cfg.is_resnet:
            # BN running stats update every microbatch forward, like the
            # reference's two-pass protocol that keeps the model in train
            # mode (training/train.py:206-253); stats thread through the
            # scan carry. With freeze-vision they stay frozen (see above).
            if bn_train:
                f_i, stats = encode_image(params, cfg, im_j, options,
                                          batch_stats=stats, training=True)
            else:
                f_i = encode_image(params, cfg, im_j, options,
                                   batch_stats=stats, training=False)
        else:
            f_i = encode_image(params, cfg, im_j, options,
                               mask_ratio=tcfg.mask_ratio, rng=r_i)
        f_t = encode_text(params, cfg, tx_j, options, rng=r_t)
        return stats, (f_i, f_t)

    new_stats, (img_f, txt_f) = jax.lax.scan(jax.checkpoint(enc), batch_stats,
                                             (jnp.arange(m), im, tx))
    return img_f.reshape(b, -1), txt_f.reshape(b, -1), new_stats


def make_train_step(cfg: CLIPConfig, tcfg: TrainConfig, options: ModelOptions,
                    teacher: Optional[Tuple[CLIPConfig, Any]] = None,
                    constrain: bool = True,
                    state_shardings: Optional[TrainState] = None) -> Callable:
    """Build the jitted train step. ``teacher``: (teacher_cfg, teacher_params)
    for distillation. Teacher params are threaded as a traced argument —
    closing a large pytree into the jaxpr embeds it as XLA constants and
    blows up compile time.

    ``state_shardings`` (a ``train_state_shardings`` tree) pins the OUTPUT
    state to those shardings. Required for FSDP: without the constraint the
    partitioner may materialize updated params/moments replicated, undoing
    the sharded-storage memory saving the input shardings bought."""
    teacher_opts = ModelOptions(attn_impl=options.attn_impl,
                                compute_dtype=options.compute_dtype)
    teacher_cfg = teacher[0] if teacher is not None else None
    # (cfg, params) or (cfg, params, batch_stats) — a ResNet-tower teacher
    # needs its BN running stats (read-only: the teacher runs in eval mode).
    teacher_bs = (teacher[2] if teacher is not None and len(teacher) > 2
                  else None)

    def step_fn(state: TrainState, images, texts, rng, teacher_params):
        tx = make_optimizer(tcfg, state.params)

        def loss_fn(params):
            img_f, txt_f, new_stats = _encode_all(params, cfg, options, images,
                                                  texts, rng, tcfg,
                                                  state.batch_stats,
                                                  constrain=constrain)
            img_n, txt_n = normalize(img_f), normalize(txt_f)
            scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
            loss, metrics = clip_loss(img_n, txt_n, scale,
                                      label_smoothing=tcfg.label_smoothing,
                                      constrain=constrain)
            if tcfg.distillation and teacher_params is not None:
                def t_enc(im_j):
                    return encode_image(teacher_params, teacher_cfg, im_j,
                                        teacher_opts, batch_stats=teacher_bs)
                if tcfg.accum_freq > 1:
                    # microbatch the teacher like the student: a single
                    # full-accumulated-batch teacher forward materializes
                    # activations the accumulation exists to avoid (the
                    # reference chunks teacher features too, train.py:206-253)
                    m = tcfg.accum_freq
                    im_r = images.reshape(m, images.shape[0] // m,
                                          *images.shape[1:])
                    t_feats = jax.lax.map(t_enc, im_r)
                    t_feats = t_feats.reshape(images.shape[0], -1)
                else:
                    t_feats = t_enc(images)
                t_feats = jax.lax.stop_gradient(t_feats)
                kd = kd_cosine_loss(t_feats, img_f)
                loss = loss + tcfg.kd_loss_weight * kd
                metrics = {**metrics, "kd_loss": kd}
            metrics = {**metrics, "logit_scale": params["logit_scale"]}
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # clamp logit_scale to [0, ln(100)] (training/train.py:261-262 —
        # the reference's torch.clamp(data, 0, 4.6052) has a LOWER bound too)
        params = {**params,
                  "logit_scale": jnp.clip(params["logit_scale"], 0.0,
                                          LOGIT_SCALE_MAX)}
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, batch_stats=new_stats)
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(new_state, state_shardings)
        return new_state, {"loss": loss, **metrics}

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    teacher_params = teacher[1] if teacher is not None else None

    def step(state, images, texts, rng):
        return jitted(state, images, texts, rng, teacher_params)

    # AOT hook: lets callers compile before first execution (multi-process
    # launches barrier between compile and run so the first collective's
    # Gloo/ICI context init isn't skewed by per-host compile-time variance).
    def lower(state, images, texts, rng):
        return jitted.lower(state, images, texts, rng, teacher_params)

    step.lower = lower
    # Unjitted 5-arg body + its teacher tree, for make_multi_train_step —
    # which must re-thread teacher_params as a traced argument (closing
    # them into its own jit would bake them in as XLA constants).
    step.raw = step_fn
    step.teacher_params = teacher_params
    return step


def make_multi_train_step(train_step, k: int) -> Callable:
    """K optimizer steps in ONE dispatch: ``lax.scan`` of the single-step
    body over ``[K, ...]``-stacked batches (``--steps-per-call``).

    Amortizes per-dispatch host overhead — on the tunneled bench chip this
    is the ~27.5 ms RTT (ViT-B bs512: 744.3 -> 763.6 pairs/s at k=4,
    PARITY.md training-floor table); on a real TPU-VM host the async
    enqueue already hides most of it, but the scan still drops k-1 host
    sync points and Python-side step costs. The scanned trajectory is the
    SAME computation as k sequential calls — params bit-comparable
    (tests/test_trainer.py::test_scan_of_steps_matches_sequential,
    tests/test_main_cli.py::test_steps_per_call_matches_single).

    Takes (state, images[K,B,...], texts[K,B,...], rngs[K,2]); returns
    (new_state, metrics of the LAST step) — the state the caller logs and
    checkpoints at the dispatch boundary."""
    raw, teacher_params = train_step.raw, train_step.teacher_params

    def multi(state, images, texts, rngs, teacher_params):
        def body(s, xs):
            im, tx, rn = xs
            return raw(s, im, tx, rn, teacher_params)

        state, ms = jax.lax.scan(body, state, (images, texts, rngs))
        return state, jax.tree.map(lambda x: x[-1], ms)

    jitted = jax.jit(multi, donate_argnums=(0,))

    def stepk(state, images, texts, rngs):
        assert images.shape[0] == k, (images.shape, k)
        return jitted(state, images, texts, rngs, teacher_params)

    return stepk


def make_eval_step(cfg: CLIPConfig, options: ModelOptions, constrain: bool = True) -> Callable:
    """In-batch validation loss/acc (reference evaluate(),
    training/train.py:334-404); reductions are global under jit (the psum
    analog of dist.all_reduce)."""
    eval_options = dataclasses.replace(options, deterministic=True)

    def step_fn(params, batch_stats, images, texts):
        if cfg.is_resnet:
            img_f = encode_image(params, cfg, images, eval_options, batch_stats=batch_stats)
        else:
            img_f = encode_image(params, cfg, images, eval_options)
        txt_f = encode_text(params, cfg, texts, eval_options)
        img_n, txt_n = normalize(img_f), normalize(txt_f)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        loss, metrics = clip_loss(img_n, txt_n, scale, constrain=constrain)
        return {"loss": loss, **metrics}

    return jax.jit(step_fn)
