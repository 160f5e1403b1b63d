"""Activation functions shared by the towers.

Parity anchors: QuickGELU (reference clip/model.py:180-182), BERT's exact
erf-GELU (reference modeling_bert.py:39-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — the OpenAI-CLIP GELU approximation."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact GELU (erf form), as used by Google BERT."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


ACT2FN = {
    "gelu": gelu_erf,
    "gelu_new": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
}


def dropout(x: jax.Array, rate: float, rng: jax.Array | None, deterministic: bool) -> jax.Array:
    """Inverted dropout; no-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
