"""merge_pretrained: initialize towers from SEPARATE CLIP-visual and
Chinese-BERT state dicts (reference restore_model semantics,
clip/model.py:468-490)."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.utils.torch_interop import (merge_pretrained,
                                               state_dict_from_params)
from tests.test_trainer import TINY


def test_merge_separate_tower_dicts():
    # donor model provides the weights, target starts from a different init
    donor, _ = init_clip(jax.random.PRNGKey(7), TINY)
    donor_np = jax.tree.map(np.asarray, donor)
    sd = state_dict_from_params(donor_np, TINY)

    clip_sd = {k: v for k, v in sd.items()
               if k.startswith("visual") or k == "logit_scale"}
    bert_sd = {k: v for k, v in sd.items() if k.startswith("bert")}
    # pooler keys must be dropped silently
    bert_sd["bert.pooler.dense.weight"] = np.zeros((4, 4), np.float32)

    target, stats = init_clip(jax.random.PRNGKey(0), TINY)
    target = jax.tree.map(np.asarray, target)
    merged, stats = merge_pretrained(target, stats, TINY,
                                     clip_sd=clip_sd, bert_sd=bert_sd)

    # visual + bert towers come from the donor...
    np.testing.assert_allclose(merged["visual"]["proj"], donor_np["visual"]["proj"])
    np.testing.assert_allclose(merged["bert"]["encoder"]["attn"]["wqkv"],
                               donor_np["bert"]["encoder"]["attn"]["wqkv"])
    np.testing.assert_allclose(np.asarray(merged["logit_scale"]),
                               np.asarray(donor_np["logit_scale"]))
    # ...text_projection is NOT in either dict -> stays from target init
    np.testing.assert_allclose(merged["text_projection"], target["text_projection"])


def test_merge_bert_only():
    donor, _ = init_clip(jax.random.PRNGKey(7), TINY)
    donor_np = jax.tree.map(np.asarray, donor)
    sd = state_dict_from_params(donor_np, TINY)
    bert_sd = {k: v for k, v in sd.items() if k.startswith("bert")}

    target, stats = init_clip(jax.random.PRNGKey(0), TINY)
    target_np = jax.tree.map(np.asarray, target)
    merged, _ = merge_pretrained(target_np, stats, TINY, bert_sd=bert_sd)
    np.testing.assert_allclose(merged["bert"]["embeddings"]["word"],
                               donor_np["bert"]["embeddings"]["word"])
    # visual untouched
    np.testing.assert_allclose(merged["visual"]["proj"], target_np["visual"]["proj"])
