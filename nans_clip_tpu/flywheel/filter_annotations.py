"""CLIP-in-the-loop annotation quality filter.

Port of reference scripts/filter_annotations.py:33-60: score each
(image, caption) pair with the model itself and drop captions whose cosine
similarity is below ``--threshold`` (default 0.15). Uses OUR framework's
encoders on TPU instead of the torch model.

  python -m nans_clip_tpu.flywheel.filter_annotations \
      --annotations data/annotations.json --images-dir data/images \
      --resume ckpt.pt [--threshold 0.15] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import preprocess_images
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize

logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", default="data/annotations.json")
    p.add_argument("--images-dir", default="data/images")
    p.add_argument("--output", default=None, help="default: in-place")
    p.add_argument("--threshold", type=float, default=0.15)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--resume", required=True)
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--caption-field", default="modern_chinese")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    from PIL import Image

    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume)
    resolution = cfg.vision.image_resolution

    @jax.jit
    def score(params, batch_stats, raw, tokens):
        x = preprocess_images(jax.random.PRNGKey(0), raw, resolution, augment=False)
        fi = encode_image(params, cfg, x, options,
                          batch_stats=batch_stats if cfg.is_resnet else None)
        ft = encode_text(params, cfg, tokens, options)
        fi = fi / jnp.linalg.norm(fi.astype(jnp.float32), axis=-1, keepdims=True)
        ft = ft / jnp.linalg.norm(ft.astype(jnp.float32), axis=-1, keepdims=True)
        return jnp.sum(fi.astype(jnp.float32) * ft.astype(jnp.float32), axis=-1)

    with open(args.annotations, encoding="utf-8") as f:
        annotations = json.load(f)
    images_dir = Path(args.images_dir)

    kept, removed = [], []
    bs = 16
    batch_anns, batch_raw, batch_txt = [], [], []

    def flush():
        if not batch_anns:
            return
        raw = np.stack(batch_raw)
        pad = bs - len(batch_anns)
        if pad:
            raw = np.concatenate([raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
        toks = tokenize(batch_txt + [""] * pad)
        sims = np.asarray(score(params, batch_stats, jnp.asarray(raw),
                                jnp.asarray(toks)))[: len(batch_anns)]
        for ann, sim in zip(batch_anns, sims):
            if float(sim) < args.threshold:
                logger.info("drop sim=%.4f < %.2f | %s", sim, args.threshold,
                            ann["filename"])
                removed.append(ann)
            else:
                kept.append(ann)
        batch_anns.clear(); batch_raw.clear(); batch_txt.clear()

    for ann in annotations:
        path = images_dir / ann["filename"]
        caption = ann.get(args.caption_field, "").strip()
        if not path.exists() or not caption:
            kept.append(ann)
            continue
        # resize BEFORE the RGB convert, matching the model's transform
        # (reference clip/utils.py:179-186): the order changes pixels for
        # palette/RGBA images, shifting scores near the keep threshold
        img = Image.open(path).resize((resolution, resolution),
                                      Image.BICUBIC).convert("RGB")
        batch_anns.append(ann)
        batch_raw.append(np.asarray(img, np.uint8))
        batch_txt.append(caption)
        if len(batch_anns) == bs:
            flush()
    flush()

    logger.info("kept %d | removed %d (sim < %.2f)", len(kept), len(removed),
                args.threshold)
    if not args.dry_run:
        out = args.output or args.annotations
        with open(out, "w", encoding="utf-8") as f:
            json.dump(kept, f, ensure_ascii=False, indent=1)
        logger.info("filtered annotations written to %s", out)
    return kept, removed


if __name__ == "__main__":
    main()
