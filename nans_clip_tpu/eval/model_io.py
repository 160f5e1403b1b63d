"""Shared eval-side model loading: reference .pt or our Orbax checkpoints."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.configs import load_config
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                               params_from_state_dict)


def load_eval_model(vision_model: str, text_model: str, resume: str,
                    precision: str = "bf16", attn_impl: str = "auto",
                    cfg=None):
    """Build (cfg, params, batch_stats, options) from any checkpoint kind.

    ``cfg`` overrides the ``Vision@Text`` registry lookup (the CLIs'
    ``--tiny-model`` debug config); ``resume`` may then be empty to keep
    the random init."""
    cfg = cfg or load_config(f"{vision_model}@{text_model}")
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    if resume:
        assert os.path.exists(resume), f"checkpoint {resume} does not exist"
        if os.path.isdir(resume):  # orbax save dir (full TrainState tree)
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            # restore with the on-disk structure (we don't know the optimizer
            # state's shape here), then take the subtrees we need
            restored = ckptr.restore(os.path.abspath(resume))
            params = restored["params"]
            batch_stats = restored.get("batch_stats") or batch_stats
        else:
            sd = load_torch_state_dict(resume)
            loaded, loaded_stats = params_from_state_dict(sd, cfg)
            params.update(loaded)
            if loaded_stats:
                batch_stats = loaded_stats
    compute_dtype = None if precision == "fp32" else "bfloat16"
    options = ModelOptions(attn_impl=attn_impl, compute_dtype=compute_dtype)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return cfg, params, batch_stats, options
