"""Distillation train-step test: frozen teacher, cosine KD loss."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu import configs as C
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.training import TrainConfig, create_train_state, make_train_step
from tests.test_trainer import TINY, _batch

# teacher with a different embed dim exercises the bilinear resize in the
# KD loss (reference cosineSimilarityLoss, training/train.py:406-419)
TEACHER = C.CLIPConfig(
    embed_dim=32,
    vision=C.VisionConfig(embed_dim=32, image_resolution=32, layers=2,
                          width=64, patch_size=16, head_width=32),
    text=C.TextConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128),
    name="teacher")


def test_distillation_step():
    student, _ = init_clip(jax.random.PRNGKey(0), TINY)
    teacher_params, _ = init_clip(jax.random.PRNGKey(1), TEACHER)
    tcfg = TrainConfig(lr=1e-4, warmup=2, max_steps=10,
                       distillation=True, kd_loss_weight=0.5)
    state = create_train_state(student, {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"),
                           teacher=(TEACHER, teacher_params), constrain=False)
    images, texts = _batch(8)
    t_before = jax.tree.map(np.asarray, teacher_params)
    losses = []
    for i in range(3):
        state, m = step(state, jnp.asarray(images), jnp.asarray(texts),
                        jax.random.PRNGKey(i))
        assert "kd_loss" in m
        assert np.isfinite(float(m["kd_loss"]))
        losses.append(float(m["loss"]))
    # teacher stays frozen
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)),
                        t_before, teacher_params)
    assert all(jax.tree.leaves(same))
    # total loss includes KD: loss > plain contrastive component alone is
    # hard to assert; instead check KD decreases as student aligns
    assert losses[-1] <= losses[0] + 1e-3


def test_distillation_teacher_microbatched_under_accum():
    """With accum_freq > 1 the teacher is encoded per microbatch (lax.map)
    instead of one full-accumulated-batch forward; the KD loss must equal
    the accum_freq=1 value on the same data (deterministic towers)."""
    student, _ = init_clip(jax.random.PRNGKey(0), TINY)
    teacher_params, _ = init_clip(jax.random.PRNGKey(1), TEACHER)
    images, texts = _batch(8)
    im, tx = jnp.asarray(images), jnp.asarray(texts)

    def kd_of(accum):
        tcfg = TrainConfig(lr=1e-4, warmup=2, max_steps=10,
                           distillation=True, kd_loss_weight=0.5,
                           accum_freq=accum)
        state = create_train_state(jax.tree.map(jnp.copy, student), {}, tcfg)
        step = make_train_step(TINY, tcfg,
                               ModelOptions(attn_impl="xla",
                                            deterministic=True),
                               teacher=(TEACHER, teacher_params),
                               constrain=False)
        _, m = step(state, im, tx, jax.random.PRNGKey(0))
        return float(m["kd_loss"]), float(m["loss"])

    kd1, loss1 = kd_of(1)
    kd2, loss2 = kd_of(2)
    assert abs(kd1 - kd2) < 1e-5, (kd1, kd2)
    assert abs(loss1 - loss2) < 1e-4, (loss1, loss2)


def test_kd_loss_matches_reference_torch():
    """kd_cosine_loss == the reference's own cosineSimilarityLoss
    (training/train.py:406-419) including the dim-mismatch path: the
    STUDENT interpolates up/down to the teacher's shape (bilinear,
    align_corners=False, NO antialias), cosine in the teacher dim."""
    import os
    import pytest
    ref_train = "/root/reference/cn_clip/training/train.py"
    if not os.path.exists(ref_train):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from nans_clip_tpu.parallel.loss import kd_cosine_loss
    src = open(ref_train).read()
    ns = {}
    i = src.index("def cosineSimilarityLoss")
    exec("import torch\nimport torch.nn.functional as F\n" + src[i:i + 700], ns)
    ref_fn = ns["cosineSimilarityLoss"]
    rs = np.random.RandomState(0)
    for td, sd in [(32, 64), (64, 32), (48, 48)]:
        t = rs.randn(8, td).astype(np.float32)
        s = rs.randn(8, sd).astype(np.float32)
        ref = float(ref_fn(torch.from_numpy(t), torch.from_numpy(s)))
        ours = float(kd_cosine_loss(jnp.asarray(t), jnp.asarray(s)))
        assert abs(ref - ours) < 2e-5, (td, sd, ref, ours)


def test_resnet_teacher_batch_stats():
    """A ResNet-tower teacher threads its BN running stats through the
    3-tuple teacher spec (a 2-tuple teacher used to crash encode_image's
    batch_stats assert for ResNet teachers)."""
    rn_teacher = C.CLIPConfig(
        embed_dim=32,
        vision=C.ResNetConfig(embed_dim=32, image_resolution=32,
                              layers=(1, 1, 1, 1), width=8, head_width=16),
        text=C.TextConfig(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=128),
        name="rn-teacher")
    student, _ = init_clip(jax.random.PRNGKey(0), TINY)
    t_params, t_stats = init_clip(jax.random.PRNGKey(1), rn_teacher)
    tcfg = TrainConfig(lr=1e-4, warmup=2, max_steps=10,
                       distillation=True, kd_loss_weight=0.5)
    state = create_train_state(student, {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"),
                           teacher=(rn_teacher, t_params, t_stats),
                           constrain=False)
    images, texts = _batch(8)
    state, m = step(state, jnp.asarray(images), jnp.asarray(texts),
                    jax.random.PRNGKey(0))
    assert np.isfinite(float(m["kd_loss"]))
    assert np.isfinite(float(m["loss"]))
