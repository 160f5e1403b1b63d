"""LoRA tests: zero-init identity, gradient flow, adapter save/load."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import encode_image, encode_text, init_clip, normalize
from nans_clip_tpu.models.lora import (count_lora_params, init_lora, load_lora,
                                       merge_lora, save_lora)
from nans_clip_tpu.parallel.loss import clip_loss
from tests.test_trainer import TINY, _batch

OPTS = ModelOptions(attn_impl="xla")


def test_lora_zero_init_is_identity():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    adapters = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = merge_lora(params, adapters, alpha=16.0)
    images, texts = _batch(4)
    a = encode_image(params, TINY, jnp.asarray(images), OPTS)
    b = encode_image(merged, TINY, jnp.asarray(images), OPTS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    at = encode_text(params, TINY, jnp.asarray(texts), OPTS)
    bt = encode_text(merged, TINY, jnp.asarray(texts), OPTS)
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-6)


def test_lora_structure():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    adapters = init_lora(jax.random.PRNGKey(1), params, rank=4)
    assert "visual" in adapters and "bert" in adapters
    L = TINY.vision.layers
    # ViT adapts the out projection ONLY (the reference's q/k/v injection
    # is dead code on nn.MultiheadAttention — clip/lora.py:64 docstring)
    assert set(adapters["visual"]) == {"wo"}
    assert adapters["visual"]["wo"]["a"].shape == (L, 4, TINY.vision.width)
    # text_only
    t_only = init_lora(jax.random.PRNGKey(1), params, rank=4, text_only=True)
    assert "visual" not in t_only and "bert" in t_only
    assert count_lora_params(adapters) > count_lora_params(t_only)


def test_lora_grads_flow_and_train():
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    adapters = init_lora(jax.random.PRNGKey(1), params, rank=2)
    images, texts = _batch(8)
    im, tx = jnp.asarray(images), jnp.asarray(texts)

    def loss_fn(ad):
        merged = merge_lora(params, ad, alpha=16.0)
        fi = encode_image(merged, TINY, im, OPTS)
        ft = encode_text(merged, TINY, tx, OPTS)
        scale = jnp.exp(params["logit_scale"])
        loss, _ = clip_loss(normalize(fi), normalize(ft), scale,
                            label_smoothing=0.05, constrain=False)
        return loss

    l0, grads = jax.value_and_grad(loss_fn)(adapters)
    # b matrices are zero-init: their grads must be nonzero (via a),
    # and a's grads are zero at init (since b is zero) -- standard LoRA.
    gb = float(jnp.abs(grads["visual"]["wo"]["b"]).max())
    assert gb > 0, "no gradient reaches LoRA b matrices"
    # a sufficiently small SGD step decreases the loss (first-order check)
    gnorm2 = sum(float(jnp.vdot(g, g)) for g in jax.tree.leaves(grads))
    lr = 0.01 / np.sqrt(gnorm2)
    ad2 = jax.tree.map(lambda p, g: p - lr * g, adapters, grads)
    l1 = loss_fn(ad2)
    assert float(l1) < float(l0), (float(l0), float(l1), gnorm2)


def test_lora_save_load(tmp_path):
    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    adapters = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # make them non-trivial
    adapters = jax.tree.map(lambda x: x + 0.01, adapters)
    path = str(tmp_path / "lora.npz")
    save_lora(path, adapters, {"rank": 4, "alpha": 16.0})
    template = init_lora(jax.random.PRNGKey(2), params, rank=4)
    restored, meta = load_lora(path, template)
    assert meta["rank"] == 4
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                        adapters, restored)
    assert all(jax.tree.leaves(same))


def test_lora_cli_cycle(tmp_path):
    """End-to-end ``train_lora`` CLI on the tiny model: 2 epochs over a
    built dataset -> best/last adapters + training_log.csv; the saved
    adapters load, differ from zero-init, and merge into a model that
    produces finite features."""
    import base64
    import io
    import json as _json
    import os

    from PIL import Image

    from nans_clip_tpu.preprocess.build_dataset import build_split
    from nans_clip_tpu.training.train_lora import main as lora_main

    root = tmp_path / "data"
    root.mkdir()
    rs = np.random.RandomState(0)
    with open(root / "train_imgs.tsv", "w") as f:
        for i in range(16):
            buf = io.BytesIO()
            Image.fromarray(rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                buf, format="JPEG")
            f.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
    with open(root / "train_texts.jsonl", "w", encoding="utf-8") as f:
        for t in range(16):
            f.write(_json.dumps({"text_id": t, "text": f"图{t}",
                                 "image_ids": [t]}, ensure_ascii=False) + "\n")
    build_split(str(root), "train")
    data = str(root / "train")

    out = str(tmp_path / "lora_out")
    adapters = lora_main([
        "--train-data", data, "--val-data", data, "--tiny-model",
        "--output-dir", out, "--epochs", "2", "--batch-size", "4",
        "--accum-freq", "2", "--lora-rank", "2", "--precision", "fp32",
        "--num-threads", "2",
    ])
    for fname in ("best_lora.npz", "last_lora.npz", "training_log.csv"):
        assert os.path.isfile(os.path.join(out, fname)), fname
    with open(os.path.join(out, "training_log.csv")) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("epoch,")

    from nans_clip_tpu.configs import tiny_config
    cfg = tiny_config()
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    template = init_lora(jax.random.PRNGKey(0), params, rank=2)
    loaded, meta = load_lora(os.path.join(out, "last_lora.npz"), template)
    assert meta["rank"] == 2
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), loaded, adapters)
    # the optimizer moved the zero-initialized `b` matrices: the merged
    # model is no longer the base model
    bs = [np.asarray(v)
          for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
          if jax.tree_util.keystr(k).endswith("'b']")]
    assert bs and any(np.abs(x).max() > 0 for x in bs)

    merged = merge_lora(params, loaded, alpha=16.0)
    feats = encode_image(merged, cfg, jnp.zeros((2, 32, 32, 3), jnp.float32),
                         OPTS)
    assert np.isfinite(np.asarray(feats)).all()
