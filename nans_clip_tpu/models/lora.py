"""Functional LoRA adapters.

The reference wraps frozen ``nn.Linear``s in ``LoRALinear`` whose ``weight``
property computes ``W + (alpha/r) B @ A`` live so autograd reaches A/B
through torch's C++ MHA kernel (clip/lora.py:47-65). In JAX none of that
machinery is needed: adapters are a separate pytree and ``merge_lora``
produces effective params functionally — differentiate w.r.t. the adapter
pytree and the base stays frozen by construction.

Injection points match what ``inject_lora`` (clip/lora.py:78-121)
ACTUALLY trains:
* ViT: the attention out projection only — the reference's q/k/v branch
  is dead code on ``nn.MultiheadAttention`` (it has ``in_proj_weight``,
  never ``q_proj`` submodules, so those getattr checks never match; the
  reference's own docstring, clip/lora.py:64, says out_proj);
* BERT: self-attention query and value projections only;
* ``text_only`` restricts to the BERT tower.

A is Kaiming-uniform, B zeros (clip/lora.py:39-43), so merged-at-init
equals the base model. Adapter-only checkpoints mirror
``get_lora_state_dict`` (clip/lora.py:126-137).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform(rng, shape):
    # torch kaiming_uniform_(a=sqrt(5)) on a [out, in]-shaped weight:
    # bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1 / fan_in)
    fan_in = shape[-1]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_lora(rng: jax.Array, params: dict, rank: int = 4,
              text_only: bool = False) -> dict:
    """Build the adapter pytree for a CLIP params pytree."""
    adapters: dict = {}
    keys = jax.random.split(rng, 4)

    if not text_only and "visual" in params and "transformer" in params["visual"]:
        attn = params["visual"]["transformer"]["attn"]
        L, w, _ = attn["wqkv"].shape
        adapters["visual"] = {
            "wo": {"a": _kaiming_uniform(keys[1], (L, rank, w)),
                   "b": jnp.zeros((L, w, rank))},
        }

    if "bert" in params:
        attn = params["bert"]["encoder"]["attn"]
        L, h, three_h = attn["wqkv"].shape
        # query (j=0) and value (j=2) only
        adapters["bert"] = {
            "wqkv_qv": {"a": _kaiming_uniform(keys[2], (L, 2, rank, h)),
                        "b": jnp.zeros((L, 2, three_h // 3, rank))},
        }
    return adapters


def _delta_fused(a: jax.Array, b: jax.Array) -> jax.Array:
    """a: [L, J, r, W_in], b: [L, J, W_out, r] -> [L, W_in, J*W_out]."""
    d = jnp.einsum("ljrw,ljor->lwjo", a, b)
    L, w, j, o = d.shape
    return d.reshape(L, w, j * o)


def merge_lora(params: dict, adapters: dict, alpha: float = 16.0,
               rank: Optional[int] = None) -> dict:
    """Effective params with LoRA deltas applied (differentiable in adapters)."""
    if not adapters:
        return params
    from nans_clip_tpu.utils.quantize import is_quantized
    for tower, key in (("visual", "transformer"), ("bert", "encoder")):
        if tower in adapters and tower in params \
                and is_quantized(params[tower][key]["attn"]["wqkv"]):
            raise ValueError(
                "cannot merge LoRA into int8-quantized params — merge "
                "first, then quantize_for_serving the merged tree")
    r = rank or _infer_rank(adapters)
    scale = alpha / r
    out = dict(params)

    if "visual" in adapters:
        va = adapters["visual"]
        visual = dict(params["visual"])
        transformer = dict(visual["transformer"])
        attn = dict(transformer["attn"])
        dtype = attn["wo"].dtype
        attn["wo"] = attn["wo"] + (scale * jnp.einsum(
            "lrw,lor->lwo", va["wo"]["a"], va["wo"]["b"])).astype(dtype)
        transformer["attn"] = attn
        visual["transformer"] = transformer
        out["visual"] = visual

    if "bert" in adapters:
        ba = adapters["bert"]["wqkv_qv"]
        bert = dict(params["bert"])
        encoder = dict(bert["encoder"])
        attn = dict(encoder["attn"])
        L, h, three_h = attn["wqkv"].shape
        # scatter q (block 0) and v (block 2) deltas into the fused weight
        dq = jnp.einsum("lrw,lor->lwo", ba["a"][:, 0], ba["b"][:, 0])
        dv = jnp.einsum("lrw,lor->lwo", ba["a"][:, 1], ba["b"][:, 1])
        zeros = jnp.zeros_like(dq)
        delta = jnp.concatenate([dq, zeros, dv], axis=-1)
        attn["wqkv"] = attn["wqkv"] + (scale * delta).astype(attn["wqkv"].dtype)
        encoder["attn"] = attn
        bert["encoder"] = encoder
        out["bert"] = bert
    return out


def _infer_rank(adapters: dict) -> int:
    for tower in adapters.values():
        for mod in tower.values():
            return mod["a"].shape[-2]
    raise ValueError("empty adapter tree")


def count_lora_params(adapters: dict) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(adapters))


def save_lora(path: str, adapters: dict, meta: Optional[dict] = None):
    """Adapter-only checkpoint (npz of the flattened tree)."""
    flat = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_flatten_with_path(adapters)[0]}
    import json
    np.savez(path, __meta__=json.dumps(meta or {}), **flat)


def load_lora(path: str, template: dict) -> Tuple[dict, dict]:
    """Restore adapters into the template's structure. Returns (adapters, meta)."""
    import json
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    restored = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, restored), meta
