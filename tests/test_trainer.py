"""Train-step tests on a virtual 8-device mesh (4 data x 2 model)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nans_clip_tpu import configs as C
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.parallel import (clip_loss, create_mesh, shard_batch,
                                    shard_params)
from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                    make_eval_step, make_train_step,
                                    no_decay_mask)

TINY = C.CLIPConfig(
    embed_dim=64,
    vision=C.VisionConfig(embed_dim=64, image_resolution=32, layers=2,
                          width=64, patch_size=16, head_width=32),
    text=C.TextConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128),
    name="tiny",
)


def _batch(b=16, seed=0):
    rs = np.random.RandomState(seed)
    images = rs.randn(b, 32, 32, 3).astype(np.float32)
    texts = np.zeros((b, 52), np.int32)
    texts[:, 0] = 101
    texts[:, 1:12] = rs.randint(1000, 20000, (b, 11))
    texts[:, 12] = 102
    return images, texts


def test_clip_loss_basic():
    img = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    loss_self, m = clip_loss(img, img, jnp.asarray(100.0), constrain=False)
    assert float(m["i2t_acc"]) == 1.0
    assert float(loss_self) < 0.01
    txt = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    loss_rand, m2 = clip_loss(img, txt, jnp.asarray(1.0), constrain=False)
    assert float(loss_rand) > 1.0


def test_no_decay_mask():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    mask = no_decay_mask(params)
    assert mask["logit_scale"] is True
    assert mask["visual"]["ln_pre"]["scale"] is True
    assert mask["visual"]["transformer"]["attn"]["bqkv"] is True
    assert mask["visual"]["transformer"]["attn"]["wqkv"] is False
    assert mask["bert"]["encoder"]["mlp"]["w1"] is False
    # Reference parity: the case-sensitive 'ln' substring test does NOT
    # match BERT's 'LayerNorm.weight', so text-tower LN *scales* are
    # DECAYED by the reference (their biases are caught by 'bias').
    assert mask["bert"]["encoder"]["mlp_ln"]["scale"] is False
    assert mask["bert"]["encoder"]["mlp_ln"]["bias"] is True
    assert mask["bert"]["embeddings"]["ln"]["scale"] is False
    assert mask["text_projection"] is False


def test_train_step_loss_decreases_on_mesh():
    assert len(jax.devices()) == 8
    mesh = create_mesh(data=4, model=2)
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(lr=3e-4, warmup=2, max_steps=30)
    images, texts = _batch(16)

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        state = create_train_state(params, {}, tcfg)
        step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"))
        im = shard_batch(jnp.asarray(images), mesh)
        tx = shard_batch(jnp.asarray(texts), mesh)
        losses = []
        for i in range(8):
            state, metrics = step(state, im, tx, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_grad_accum_matches_full_batch():
    """accum_freq=2 must produce the same update as accum_freq=1 (full
    global negatives, reference two-pass protocol semantics)."""
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    images, texts = _batch(8)
    im, tx = jnp.asarray(images), jnp.asarray(texts)

    out = {}
    for accum in (1, 2):
        tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=10, accum_freq=accum)
        state = create_train_state(jax.tree.map(jnp.copy, params), {}, tcfg)
        step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"),
                               constrain=False)
        state, metrics = step(state, im, tx, jax.random.PRNGKey(42))
        out[accum] = (state.params, metrics)

    p1, p2 = out[1][0], out[2][0]
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    max_diff = max(jax.tree.leaves(diffs))
    # Gradients agree to ~5e-7 rel (verified directly); Adam's eps region
    # amplifies that to ~3e-5 in the params. Anything semantic (e.g. plain
    # per-microbatch loss averaging) diverges at the 1e-2 level.
    assert max_diff < 2e-4, f"grad-accum diverges from full batch: {max_diff}"
    assert abs(float(out[1][1]["loss"]) - float(out[2][1]["loss"])) < 1e-5


def test_logit_scale_clamp():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    params["logit_scale"] = jnp.asarray(10.0)  # way above ln(100)
    tcfg = TrainConfig(lr=0.0, warmup=1, max_steps=10)
    state = create_train_state(params, {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"), constrain=False)
    images, texts = _batch(8)
    state, _ = step(state, jnp.asarray(images), jnp.asarray(texts), jax.random.PRNGKey(0))
    assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6


def test_freeze_vision():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=10, freeze_vision=True)
    state = create_train_state(params, {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"), constrain=False)
    images, texts = _batch(8)
    before = jax.tree.map(lambda x: np.asarray(x), state.params["visual"])
    state, _ = step(state, jnp.asarray(images), jnp.asarray(texts), jax.random.PRNGKey(0))
    after = state.params["visual"]
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)), before, after)
    assert all(jax.tree.leaves(same))
    # text tower must have moved
    assert not np.array_equal(np.asarray(state.params["text_projection"]),
                              np.zeros(1))  # sanity
    moved = float(jnp.abs(state.params["bert"]["encoder"]["attn"]["wqkv"]).sum())
    assert moved > 0


def test_eval_step():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    ev = make_eval_step(TINY, ModelOptions(attn_impl="xla"), constrain=False)
    images, texts = _batch(8)
    m = ev(params, {}, jnp.asarray(images), jnp.asarray(texts))
    assert set(m) >= {"loss", "i2t_acc", "t2i_acc"}
    assert np.isfinite(float(m["loss"]))


def test_bn_stats_update_under_grad_accum():
    """With accum_freq > 1 on a ResNet tower, BN running stats must still
    update every microbatch (the reference keeps the model in train mode
    during its two-pass protocol, training/train.py:206-253)."""
    rn_cfg = C.CLIPConfig(
        embed_dim=64,
        vision=C.ResNetConfig(embed_dim=64, image_resolution=32,
                              layers=(1, 1, 1, 1), width=8, head_width=16),
        text=C.TextConfig(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=128),
        name="tiny-rn")
    params, batch_stats = init_clip(jax.random.PRNGKey(0), rn_cfg)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=10, accum_freq=2)
    state = create_train_state(params, batch_stats, tcfg)
    step = make_train_step(rn_cfg, tcfg, ModelOptions(attn_impl="xla"),
                           constrain=False)
    images, texts = _batch(8)
    before = jax.tree.map(np.asarray, state.batch_stats)
    state, _ = step(state, jnp.asarray(images), jnp.asarray(texts),
                    jax.random.PRNGKey(0))
    after = state.batch_stats
    changed = jax.tree.map(lambda a, b: not np.array_equal(a, np.asarray(b)),
                           before, after)
    assert any(jax.tree.leaves(changed)), "BN stats frozen under grad accum"


def test_distillation_kd_loss():
    from nans_clip_tpu.parallel import kd_cosine_loss
    t = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    s = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    kd = kd_cosine_loss(t, s)
    assert np.isfinite(float(kd))
    assert float(kd_cosine_loss(s, s)) < 1e-5


def test_adam_compact_state_tracks_fp32():
    """bf16-moment Adam (TrainConfig.adam_state_dtype) must store its state
    in bf16 and stay within ~1% of the fp32 optax.adamw trajectory."""
    from nans_clip_tpu.training.trainer import make_optimizer

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 4)
    params = {"w": jax.random.normal(keys[0], (32, 32)) * 0.02,
              "bias": jnp.zeros((32,)),
              "logit_scale": jnp.asarray(2.659)}

    tcfg32 = TrainConfig(lr=1e-3, warmup=1, max_steps=50, wd=0.01)
    tcfg16 = dataclasses.replace(tcfg32, adam_state_dtype="bfloat16")
    tx32, tx16 = make_optimizer(tcfg32, params), make_optimizer(tcfg16, params)
    s32, s16 = tx32.init(params), tx16.init(params)

    mu16 = jax.tree.leaves(s16)  # state dtype check: some leaf must be bf16
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in mu16)

    p32 = p16 = params
    for i in range(10):
        g = jax.tree.map(
            lambda p, k=keys[i % 4], i=i: 0.1 * jax.random.normal(
                jax.random.fold_in(k, i), p.shape), params)
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = jax.tree.map(lambda p, u: p + u, p32, u32)
        p16 = jax.tree.map(lambda p, u: p + u, p16, u16)

    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        denom = float(jnp.abs(a - jnp.asarray(params["w"]).mean()).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2 * max(1.0, denom), rtol=2e-2)


def test_adam_compact_trains():
    """End-to-end: a train step built with bf16 optimizer state runs and
    reduces the loss like the fp32 one."""
    opts = ModelOptions(attn_impl="xla")
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=20,
                       adam_state_dtype="bfloat16")
    state = create_train_state(params, None, tcfg)
    step = make_train_step(TINY, tcfg, opts, constrain=False)
    images, texts = _batch()
    losses = []
    for i in range(3):
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(texts),
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_no_decay_mask_downsample_bn_decayed():
    """Reference parity quirk: the RN50 downsample BN is the Sequential's
    anonymous index 1 ('downsample.1.weight' — no 'bn' substring), so the
    reference DECAYS its scale while every named bnN scale is excluded."""
    fake = {"visual": {"layer1": {
        "bn1": {"scale": 1.0, "bias": 1.0},
        "downsample": {"conv": {"kernel": 1.0},
                       "bn": {"scale": 1.0, "bias": 1.0}}}}}
    mask = no_decay_mask(fake)
    assert mask["visual"]["layer1"]["bn1"]["scale"] is True
    assert mask["visual"]["layer1"]["downsample"]["bn"]["scale"] is False
    assert mask["visual"]["layer1"]["downsample"]["bn"]["bias"] is True
    assert mask["visual"]["layer1"]["downsample"]["conv"]["kernel"] is False


def test_freeze_vision_freezes_bn_stats():
    """--freeze-vision must pin BN running statistics too (the reference
    puts BatchNorm2d in eval mode, training/main.py:126-129): the frozen
    RN50's inference outputs cannot drift with the finetuning data."""
    from tests.ref_loader import TINY_RN_KWARGS, tiny_config

    cfg = tiny_config(TINY_RN_KWARGS)
    params, stats = init_clip(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(8, 64, 64, 3), np.float32)
    _, texts = _batch(8)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=10, freeze_vision=True)
    # snapshot before the step: the jitted step donates the input state
    stats0 = jax.tree.map(np.asarray, stats)
    visual0 = jax.tree.map(np.asarray, params["visual"])
    state = create_train_state(params, stats, tcfg)
    step = make_train_step(cfg, tcfg, ModelOptions(attn_impl="xla",
                                                   deterministic=True),
                           constrain=False)
    new_state, _ = step(state, images, jnp.asarray(texts), jax.random.PRNGKey(1))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        a, np.asarray(b)), stats0, new_state.batch_stats)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        a, np.asarray(b)), visual0, new_state.params["visual"])


def test_skip_scheduler_constant_lr():
    """--skip-scheduler holds lr at base after warmup (the reference parses
    the flag but never applies it; we honor its documented semantics)."""
    from nans_clip_tpu.training.trainer import cosine_with_warmup
    const = cosine_with_warmup(1e-3, warmup=5, total_steps=100,
                               skip_decay=True)
    assert float(const(0)) < 1e-3  # warmup still ramps
    np.testing.assert_allclose(float(const(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(const(99)), 1e-3, rtol=1e-6)
    decay = cosine_with_warmup(1e-3, warmup=5, total_steps=100)
    assert float(decay(99)) < 1e-4  # cosine decays to ~0


def test_scan_of_steps_matches_sequential():
    """bench_train's --steps-per-call wraps the train step in a lax.scan
    (K optimizer steps per dispatch). The recorded throughput numbers are
    only meaningful if a scanned step IS the production step — same
    params trajectory, no donation/batch-stats aliasing surprises."""
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(lr=1e-3, warmup=2, max_steps=10)
    opts = ModelOptions(attn_impl="xla")
    K = 3
    rngs = jax.random.split(jax.random.PRNGKey(42), K)
    ims = jnp.stack([jnp.asarray(_batch(8, seed=s)[0]) for s in range(K)])
    txs = jnp.stack([jnp.asarray(_batch(8, seed=s)[1]) for s in range(K)])

    step = make_train_step(TINY, tcfg, opts, constrain=False)
    seq_state = create_train_state(jax.tree.map(jnp.copy, params), {}, tcfg)
    for k in range(K):
        seq_state, seq_metrics = step(seq_state, ims[k], txs[k], rngs[k])

    scan_state = create_train_state(jax.tree.map(jnp.copy, params), {}, tcfg)

    @jax.jit
    def multi(state, ims, txs, rngs):
        def body(s, xs):
            im, tx, rn = xs
            return step(s, im, tx, rn)
        return jax.lax.scan(body, state, (ims, txs, rngs))

    scan_state, scan_metrics = multi(scan_state, ims, txs, rngs)

    assert int(scan_state.step) == int(seq_state.step) == K
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         seq_state.params, scan_state.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6
    assert abs(float(scan_metrics["loss"][-1])
               - float(seq_metrics["loss"])) < 1e-6
