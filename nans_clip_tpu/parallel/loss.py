"""Global-batch contrastive InfoNCE loss.

The reference's most distinctive comms pattern is gathering features across
GPUs for a [global_B, global_B] logit matrix (training/train.py:53-115),
with two code paths (differentiable ``torch.distributed.nn.all_gather`` vs
non-differentiable gather + local-splice). On TPU this collapses into one
path: the loss is written over the *global* batch and jitted over the mesh
— XLA inserts the (always-differentiable) all-gather over ICI when the
sharded features feed the logits matmul. ``--gather-with-grad`` /
``--skip-aggregate`` distinctions disappear by construction.

Label smoothing matches the LoRA trainer's loss (train_lora.py:96-110).
The distillation loss mirrors ``cosineSimilarityLoss``
(training/train.py:406-419) including the bilinear resize for
teacher/student dim mismatch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nans_clip_tpu.parallel.mesh import DATA_AXIS
from jax.sharding import PartitionSpec as P


def _ce(logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0) -> jax.Array:
    """Mean softmax cross entropy with integer labels, fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


def clip_loss(image_features: jax.Array, text_features: jax.Array,
              logit_scale: jax.Array, label_smoothing: float = 0.0,
              constrain: bool = True) -> Tuple[jax.Array, dict]:
    """Symmetric InfoNCE over the (globally sharded) batch.

    Features must be L2-normalized. Returns (loss, metrics with in-batch
    i2t/t2i accuracy — reference training/train.py:109-124).
    """
    if constrain:
        image_features = jax.lax.with_sharding_constraint(image_features, P(DATA_AXIS, None))
        text_features = jax.lax.with_sharding_constraint(text_features, P(DATA_AXIS, None))
    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)
    logits_per_image = logit_scale * img @ txt.T          # [B, B] global
    if constrain:
        logits_per_image = jax.lax.with_sharding_constraint(logits_per_image, P(DATA_AXIS, None))
    logits_per_text = logits_per_image.T
    labels = jnp.arange(logits_per_image.shape[0])
    loss = (_ce(logits_per_image, labels, label_smoothing)
            + _ce(logits_per_text, labels, label_smoothing)) / 2.0
    metrics = {
        "i2t_acc": jnp.mean(jnp.argmax(logits_per_image, axis=-1) == labels),
        "t2i_acc": jnp.mean(jnp.argmax(logits_per_text, axis=-1) == labels),
    }
    return loss, metrics


def kd_cosine_loss(teacher_features: jax.Array, student_features: jax.Array) -> jax.Array:
    """1 - mean cosine similarity. On dim mismatch the STUDENT is resized
    bilinearly up to the teacher's shape and the cosine is computed in the
    teacher dimension, exactly like the reference's cosineSimilarityLoss
    (training/train.py:406-419 interpolates feature2 = the student) —
    gradients flow through the student interpolation."""
    t = teacher_features.astype(jnp.float32)
    s = student_features.astype(jnp.float32)
    if t.shape != s.shape:
        # antialias=False: torch F.interpolate does not antialias, and jax
        # does by default on downscale — with it the values diverge
        s = jax.image.resize(s, t.shape, "bilinear", antialias=False)
    cos = jnp.sum(t * s, axis=1) / (
        jnp.linalg.norm(t, axis=1) * jnp.linalg.norm(s, axis=1) + 1e-8)
    return 1.0 - jnp.mean(cos)
