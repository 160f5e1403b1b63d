"""Shared model utilities: options, param helpers."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelOptions:
    """Static (hashable) knobs threaded through the towers.

    One knob set replaces the reference's fp16/amp/fp32 x flash/no-flash
    configuration matrix (training/main.py:102-113, params.py:141-199).
    """

    attn_impl: str = "auto"          # "auto" | "xla" | "pallas" | "fused"
                                     # fused = whole-attention-sub-block Pallas
                                     # kernel (ViT towers, width<=1024)
    remat: bool = False              # per-block activation checkpointing
    compute_dtype: Optional[str] = None  # None = param dtype; "bfloat16" for mixed precision
    deterministic: bool = True       # disables dropout
    tp: int = 1                      # model-axis size: >1 routes the
                                     # transformer sub-blocks through the
                                     # shard_map tensor-parallel wrappers
                                     # (parallel/tp.py); requires an ambient
                                     # mesh with a 'model' axis of this size
    pp: int = 1                      # pipe-axis size: >1 runs the stacked
                                     # transformer layers as a GPipe pipeline
                                     # (parallel/pp.py); requires an ambient
                                     # mesh with a 'pipe' axis of this size;
                                     # mutually exclusive with tp>1
    pp_microbatches: int = 0         # 0 = auto (<= 4*pp divisor of the
                                     # per-data-shard batch, >= 2 samples
                                     # per microbatch; pp.bubble_fraction
                                     # reports the resulting GPipe bubble)

    def cast(self, x: jax.Array) -> jax.Array:
        if self.compute_dtype is None:
            return x
        return x.astype(jnp.dtype(self.compute_dtype))


def cast_tree(tree, options: ModelOptions):
    if options.compute_dtype is None:
        return tree
    from nans_clip_tpu.utils.quantize import is_quantized
    dt = jnp.dtype(options.compute_dtype)

    def cast(a):
        if is_quantized(a):
            # int8-quantized leaves are atomic: the int8 payload is not
            # floating, and the per-channel scales are documented fp32
            # (utils/quantize.py) — downcasting them to bf16 would add
            # avoidable dequant error on the shipped serving path for a
            # few KB of savings
            return a
        return a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, tree, is_leaf=is_quantized)


def normal(rng, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype)


def linear_params(rng, d_in, d_out, std=0.02):
    return {"kernel": normal(rng, (d_in, d_out), std), "bias": jnp.zeros((d_out,))}


def ln_params(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
