"""Checkpoint save/restore (Orbax) with reference-compatible semantics.

Mirrors reference training/main.py:201-237,315-346:
* per-epoch and per-step saves plus an always-updated ``epoch_latest``;
* auto-resume from ``epoch_latest`` when ``--resume`` is unset;
* ``--reset-optimizer`` restores params only; ``--reset-data-offset``
  ignores the saved data position;
* optional export of the reference's ``.pt`` state_dict layout
  (utils/torch_interop.py) so checkpoints stay interchangeable with the
  reference tooling.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, tag: str, state, meta: dict,
                    torch_format: bool = False, cfg=None,
                    update_latest: bool = True):
    """Save TrainState + meta under ``ckpt_dir/tag`` (atomic via orbax).

    ``epoch_latest`` is a small pointer file (LATEST) to the real save, so
    "save epoch + update latest" costs one full write, not two.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    ckptr = _ckptr()
    tree = {"params": state.params, "opt_state": state.opt_state,
            "batch_stats": state.batch_stats, "step": state.step}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, f"{tag}.meta.json"), "w") as f:
        json.dump(meta, f)
    if update_latest:
        with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
            f.write(tag)
    if torch_format and cfg is not None:
        from nans_clip_tpu.utils.torch_interop import (save_torch_checkpoint,
                                                       state_dict_from_params)
        host_params = jax.tree.map(np.asarray, state.params)
        host_stats = jax.tree.map(np.asarray, state.batch_stats)
        sd = state_dict_from_params(host_params, cfg, host_stats)
        save_torch_checkpoint(os.path.join(ckpt_dir, f"{tag}.pt"), sd,
                              {"epoch": meta.get("epoch", 0), "step": meta.get("step", 0),
                               "name": meta.get("name", "")})


def resolve_tag(ckpt_dir: str, tag: str) -> str:
    """Follow the LATEST pointer when asked for ``epoch_latest``."""
    latest_file = os.path.join(ckpt_dir, "LATEST")
    if tag == "epoch_latest" and os.path.exists(latest_file):
        with open(latest_file) as f:
            return f.read().strip()
    return tag


def restore_checkpoint(ckpt_dir: str, tag: str, state,
                       reset_optimizer: bool = False,
                       missing_ok: bool = False) -> Tuple[Any, Optional[dict]]:
    """Restore into the template ``state``. Returns (state, meta|None).

    A missing checkpoint RAISES unless ``missing_ok``: silently returning
    the template would train from random init and overwrite epoch_latest
    with untrained weights on a typo'd --resume tag."""
    tag = resolve_tag(ckpt_dir, tag)
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    meta_path = os.path.join(ckpt_dir, f"{tag}.meta.json")
    if not os.path.isdir(path):
        if missing_ok:
            return state, None
        raise FileNotFoundError(f"checkpoint '{tag}' not found in {ckpt_dir}")
    ckptr = _ckptr()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "step": state.step, "opt_state": state.opt_state}
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "dtype") else x, template)
    if reset_optimizer:
        # the stored opt_state is about to be DISCARDED, so restore it
        # against the ON-DISK structure (from checkpoint metadata): the
        # new state's optimizer may legitimately differ (bf16 Adam
        # moments, frozen params) and would fail the tree/dtype match
        # before it could be discarded
        md = ckptr.metadata(path)
        mtree = md.item_metadata if hasattr(md, "item_metadata") else md
        abstract["opt_state"] = jax.tree.map(
            lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype),
            mtree["opt_state"],
            is_leaf=lambda v: hasattr(v, "shape") and hasattr(v, "dtype"))
    restored = ckptr.restore(path, abstract)
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    new_state = state._replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        step=restored["step"],
        opt_state=state.opt_state if reset_optimizer else restored["opt_state"],
    )
    return new_state, meta


def latest_exists(ckpt_dir: str, tag: str = "epoch_latest") -> bool:
    tag = resolve_tag(ckpt_dir, tag)
    return os.path.isdir(os.path.join(os.path.abspath(ckpt_dir), tag))
