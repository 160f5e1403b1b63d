"""Fork-style retrieval evaluator — behavioral twin of reference
``evaluate.py``:

* loads a whole npack split into memory with ground-truth maps
  (evaluate.py:48-101);
* optional hard-negative distractor pool appended to the image gallery
  with non-colliding ids from 100000 (evaluate.py:104-125);
* metrics R@K / NDCG@K / mAP / MeanRecall both directions
  (evaluate.py:158-210);
* optional zero-shot-vs-LoRA comparison table + json dump
  (evaluate.py:248-319).

Usage:
  python -m nans_clip_tpu.eval.retrieval_suite \
      --data /tmp/vdata/valid --resume ckpt.pt \
      --vision-model ViT-B-16 --text-model RoBERTa-wwm-ext-base-chinese \
      [--lora best_lora.npz] [--distractor-dir DIR] [--output results.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import PairDataset, preprocess_images
from nans_clip_tpu.data.dataset import preprocess_text
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="npack dataset dir")
    p.add_argument("--resume", required=True)
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--lora", default=None, help="adapter .npz for comparison")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="defaults to the alpha stored in the adapter file")
    p.add_argument("--distractor-dir", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--context-length", type=int, default=52)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--output", default=None)
    return p.parse_args(argv)


def metrics_at_k(sims: np.ndarray, ground_truth: Dict[int, set],
                 k_list=(1, 5, 10)) -> Dict[str, float]:
    """R@K / NDCG@K / mAP / MR over a [Q, G] similarity matrix
    (reference evaluate.py:158-210 semantics)."""
    recalls = {k: 0 for k in k_list}
    ndcgs = {k: 0.0 for k in k_list}
    map_sum = 0.0
    total = 0
    order = np.argsort(-sims, axis=1)
    for i in range(sims.shape[0]):
        gt = ground_truth.get(i)
        if not gt:
            continue
        pred = order[i]
        for k in k_list:
            topk = pred[:k]
            hits = [1 if idx in gt else 0 for idx in topk]
            if sum(hits) > 0:
                recalls[k] += 1
            dcg = sum(rel / math.log2(rank + 2) for rank, rel in enumerate(hits))
            idcg = sum(1 / math.log2(rank + 2) for rank in range(min(len(gt), k)))
            ndcgs[k] += dcg / idcg if idcg > 0 else 0.0
        hits_so_far = 0
        ap = 0.0
        for rank, idx in enumerate(pred):
            if int(idx) in gt:
                hits_so_far += 1
                ap += hits_so_far / (rank + 1)
        map_sum += ap / len(gt)
        total += 1
    out = {}
    for k in k_list:
        out[f"R@{k}"] = 100.0 * recalls[k] / max(total, 1)
        out[f"NDCG@{k}"] = 100.0 * ndcgs[k] / max(total, 1)
    out["mAP"] = 100.0 * map_sum / max(total, 1)
    out["MR"] = sum(out[f"R@{k}"] for k in k_list) / len(k_list)
    return out


def load_split(data_dir: str) -> Tuple[List[int], List[Tuple[int, str]],
                                       Dict[int, List[int]], "PairDataset"]:
    """(image_ids, [(text_id, text)], text->image ground truth, dataset)."""
    ds = PairDataset(data_dir)
    text_by_id: Dict[int, str] = {}
    gt = defaultdict(list)
    for i in range(len(ds)):
        image_id, text_id, raw = ds.get_pair(i)
        text_by_id[text_id] = raw
        gt[text_id].append(image_id)
    image_ids = [int(k) for k in ds.imgs.keys()]
    texts = sorted(text_by_id.items())
    return image_ids, texts, dict(gt), ds


def compute_features(cfg, params, batch_stats, options, ds, image_ids, texts,
                     batch_size, context_length, distractors=None):
    resolution = cfg.vision.image_resolution

    def img_fwd(p, bs_, x):
        x = preprocess_images(jax.random.PRNGKey(0), x, resolution, augment=False)
        f = encode_image(p, cfg, x, options, batch_stats=bs_ if cfg.is_resnet else None)
        f = f.astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def txt_fwd(p, t):
        f = encode_text(p, cfg, t, options).astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    img_fn, txt_fn = jax.jit(img_fwd), jax.jit(txt_fwd)

    feats = []
    keys = np.asarray(image_ids, np.uint64)
    for i in range(0, len(keys), batch_size):
        chunk = keys[i:i + batch_size]
        raw, _ = ds.imgs.decode_jpeg_batch(chunk, resolution)
        pad = batch_size - len(chunk)
        if pad:
            raw = np.concatenate([raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
        feats.append(np.asarray(img_fn(params, batch_stats, jnp.asarray(raw)))[: len(chunk)])
    gallery_ids = list(image_ids)
    if distractors:
        # batch the distractors like the gallery (one padded dispatch per
        # image would cost batch_size x the encoder FLOPs + a tunnel RTT each)
        for i in range(0, len(distractors), batch_size):
            chunk = distractors[i:i + batch_size]
            raw = np.stack([r for _, r in chunk])
            pad = batch_size - len(chunk)
            if pad:
                raw = np.concatenate(
                    [raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
            feats.append(np.asarray(
                img_fn(params, batch_stats, jnp.asarray(raw)))[: len(chunk)])
            gallery_ids.extend(did for did, _ in chunk)
    image_features = np.concatenate(feats)

    tfeats = []
    for i in range(0, len(texts), batch_size):
        chunk = [preprocess_text(t) for _, t in texts[i:i + batch_size]]
        tok = tokenize(chunk, context_length)
        pad = batch_size - len(chunk)
        if pad:
            tok = np.concatenate([tok, np.zeros((pad, tok.shape[1]), tok.dtype)])
        tfeats.append(np.asarray(txt_fn(params, jnp.asarray(tok)))[: len(chunk)])
    text_features = np.concatenate(tfeats)
    return image_features, text_features, gallery_ids


def evaluate_model(cfg, params, batch_stats, options, ds, image_ids, texts, gt,
                   batch_size, context_length, distractors=None):
    img_f, txt_f, gallery_ids = compute_features(
        cfg, params, batch_stats, options, ds, image_ids, texts, batch_size,
        context_length, distractors)
    img_pos = {img: j for j, img in enumerate(gallery_ids)}
    txt_pos = {tid: j for j, (tid, _) in enumerate(texts)}

    sims_t2i = txt_f @ img_f.T                      # [T, G]
    gt_t2i = {txt_pos[tid]: {img_pos[i] for i in imgs if i in img_pos}
              for tid, imgs in gt.items() if tid in txt_pos}
    t2i = metrics_at_k(sims_t2i, gt_t2i)

    gt_i2t = defaultdict(set)
    for tid, imgs in gt.items():
        for img in imgs:
            if img in img_pos and tid in txt_pos:
                gt_i2t[img_pos[img]].add(txt_pos[tid])
    i2t = metrics_at_k(sims_t2i.T, dict(gt_i2t))
    return {"text_to_image": t2i, "image_to_text": i2t}


def load_distractors(distractor_dir: str, resolution: int, start_id: int = 100000):
    from PIL import Image
    out = []
    exts = {".jpg", ".jpeg", ".png", ".webp"}
    for i, name in enumerate(sorted(os.listdir(distractor_dir))):
        p = os.path.join(distractor_dir, name)
        if os.path.splitext(name)[1].lower() not in exts or not os.path.isfile(p):
            continue
        try:
            img = Image.open(p).convert("RGB").resize((resolution, resolution),
                                                      Image.BICUBIC)
            out.append((start_id + i, np.asarray(img, np.uint8)))
        except Exception:
            continue
    return out


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision)
    image_ids, texts, gt, ds = load_split(args.data)
    logging.info("split: %d images, %d texts, %d gt entries",
                 len(image_ids), len(texts), len(gt))
    distractors = None
    if args.distractor_dir:
        distractors = load_distractors(args.distractor_dir,
                                       cfg.vision.image_resolution)
        logging.info("added %d distractors to the gallery", len(distractors))

    results = {"zeroshot": evaluate_model(cfg, params, batch_stats, options, ds,
                                          image_ids, texts, gt, args.batch_size,
                                          args.context_length, distractors)}

    if args.lora:
        from nans_clip_tpu.models.lora import init_lora, load_lora, merge_lora
        template = init_lora(jax.random.PRNGKey(0), params, rank=4)
        try:
            adapters, meta = load_lora(args.lora, template)
        except KeyError:
            # rank mismatch: re-template from stored rank
            data = np.load(args.lora)
            meta = json.loads(str(data["__meta__"]))
            template = init_lora(jax.random.PRNGKey(0), params,
                                 rank=int(meta.get("rank", 4)))
            adapters, meta = load_lora(args.lora, template)
        alpha = (args.lora_alpha if args.lora_alpha is not None
                 else meta.get("alpha", 16.0))  # alpha=0 ablation is valid
        merged = merge_lora(params, adapters, alpha=alpha)
        results["lora"] = evaluate_model(cfg, merged, batch_stats, options, ds,
                                         image_ids, texts, gt, args.batch_size,
                                         args.context_length, distractors)

    for name, res in results.items():
        for direction, m in res.items():
            logging.info("%s %s | " + " | ".join(f"{k} {v:.1f}" for k, v in m.items()),
                         name, direction)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=1)
        logging.info("results dumped to %s", args.output)
    return results


if __name__ == "__main__":
    main()
