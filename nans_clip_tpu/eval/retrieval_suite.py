"""Fork-style retrieval evaluator — behavioral twin of reference
``evaluate.py``:

* loads a whole split into memory with ground-truth maps keyed the way the
  reference keys them (evaluate.py:48-101): queries are UNIQUE TEXT STRINGS
  (not text_ids — duplicate captions collapse into one query with a merged
  ground-truth set), the gallery is the sorted unique image ids, and pairs
  whose image is missing from the store are dropped from the ground truth;
* texts are tokenized RAW — the fork's evaluate.py does NOT apply the
  training-time ``_preprocess_text`` lowercasing (evaluate.py:147);
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
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import PairDataset, preprocess_images
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
    p.add_argument("--image-transform", choices=["pil", "native"],
                   default="pil",
                   help="pil = host PIL bicubic resize, numerically identical "
                        "to the reference preprocess; native = C++ "
                        "libjpeg decode + on-device resize (faster)")
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


def load_split(data_dir: str) -> Tuple[List[int], List[str],
                                       Dict[int, set], Dict[int, set],
                                       "PairDataset"]:
    """(gallery image_ids, unique texts, t2i gt, i2t gt, dataset).

    Mirrors reference evaluate.py:48-101: the gallery is the sorted set of
    image ids that actually decode from the store; queries are unique raw
    text strings; ground truth maps are keyed by POSITION (text index /
    image gallery position), with pairs pointing at missing images dropped.
    """
    ds = PairDataset(data_dir)
    pairs = []
    for i in range(len(ds)):
        image_id, _text_id, raw = ds.get_pair(i)
        pairs.append((image_id, raw))

    unique_image_ids = sorted({p[0] for p in pairs})
    available = {int(k) for k in ds.imgs.keys()}
    image_ids = [iid for iid in unique_image_ids if iid in available]
    imgid_to_pos = {iid: pos for pos, iid in enumerate(image_ids)}

    # reference uses list(set(...)); dict.fromkeys gives a deterministic
    # order with the same dedup semantics (metrics are order-independent)
    unique_texts = list(dict.fromkeys(p[1] for p in pairs))
    text_to_idx = {t: i for i, t in enumerate(unique_texts)}

    text_to_images: Dict[int, set] = {}
    image_to_texts: Dict[int, set] = {}
    for img_id, text in pairs:
        tidx = text_to_idx[text]
        pos = imgid_to_pos.get(img_id)
        if pos is None:
            continue
        text_to_images.setdefault(tidx, set()).add(pos)
        image_to_texts.setdefault(pos, set()).add(tidx)
    return image_ids, unique_texts, text_to_images, image_to_texts, ds


def compute_features(cfg, params, batch_stats, options, ds, image_ids, texts,
                     batch_size, context_length, distractors=None,
                     pil: bool = True):
    resolution = cfg.vision.image_resolution

    def img_fwd(p, bs_, x):
        if not pil:
            x = preprocess_images(jax.random.PRNGKey(0), x, resolution,
                                  augment=False)
        f = encode_image(p, cfg, x, options, batch_stats=bs_ if cfg.is_resnet else None)
        f = f.astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def txt_fwd(p, t):
        f = encode_text(p, cfg, t, options).astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    img_fn, txt_fn = jax.jit(img_fwd), jax.jit(txt_fwd)

    def decode_batch(chunk):
        import io

        from PIL import Image

        if not pil:
            # PIL-bit-exact native decode (r4) — same pixels as the pil
            # path, threaded-C speed; normalize runs on device
            raw, ok = ds.imgs.decode_jpeg_batch_pil(
                np.asarray(chunk, np.uint64), resolution)
            if not ok.all():
                # the native decoder only handles baseline RGB/grayscale
                # JPEG; CMYK JPEGs and any libjpeg-warned stream are
                # rejected (ok=0) but are valid images the reference
                # evaluates fine — fall back to PIL per image (same policy
                # as deploy/server._decode_batch) and only fail on bytes
                # PIL cannot decode either
                okb = np.asarray(ok, bool)
                for j in np.flatnonzero(~okb):
                    k = int(np.asarray(chunk)[j])
                    try:
                        img = Image.open(io.BytesIO(ds.imgs.get(k)))
                        raw[j] = np.asarray(
                            img.convert("RGB").resize(
                                (resolution, resolution), Image.BICUBIC),
                            np.uint8)
                    except Exception as e:
                        raise RuntimeError(
                            f"image_id {k} is undecodable (native and PIL"
                            f" both failed: {e}); rebuild the dataset or"
                            " drop the corrupt record") from e
            return raw
        # reference-exact path: evaluate.py:71 converts to RGB FIRST, then
        # applies the preprocess transform (resize + normalize)
        from nans_clip_tpu.utils.transform import image_transform
        t = image_transform(resolution)
        return np.stack(
            [t(Image.open(io.BytesIO(ds.imgs.get(int(k)))).convert("RGB"))
             for k in chunk])

    feats = []
    for i in range(0, len(image_ids), batch_size):
        chunk = image_ids[i:i + batch_size]
        raw = decode_batch(chunk)
        pad = batch_size - len(chunk)
        if pad:
            raw = np.concatenate([raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
        feats.append(np.asarray(img_fn(params, batch_stats, jnp.asarray(raw)))[: len(chunk)])
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
    image_features = np.concatenate(feats)

    tfeats = []
    for i in range(0, len(texts), batch_size):
        # raw text, NO _preprocess_text — reference evaluate.py:147
        chunk = texts[i:i + batch_size]
        tok = tokenize(chunk, context_length)
        pad = batch_size - len(chunk)
        if pad:
            tok = np.concatenate([tok, np.zeros((pad, tok.shape[1]), tok.dtype)])
        tfeats.append(np.asarray(txt_fn(params, jnp.asarray(tok)))[: len(chunk)])
    text_features = np.concatenate(tfeats)
    return image_features, text_features


def evaluate_model(cfg, params, batch_stats, options, ds, image_ids, texts,
                   text_to_images, image_to_texts, batch_size, context_length,
                   distractors=None, pil=True):
    img_f, txt_f = compute_features(
        cfg, params, batch_stats, options, ds, image_ids, texts, batch_size,
        context_length, distractors, pil=pil)
    sims_t2i = txt_f @ img_f.T                      # [T, G(+distractors)]
    t2i = metrics_at_k(sims_t2i, text_to_images)
    i2t = metrics_at_k(sims_t2i.T[: len(image_ids)], image_to_texts)
    return {"text_to_image": t2i, "image_to_text": i2t}


def load_distractors(distractor_dir: str, resolution: int, start_id: int = 100000,
                     pil: bool = True):
    """[(id, image)] with non-colliding ids (reference evaluate.py:104-125).

    With ``pil`` the image is the normalized CHW float array from the
    reference transform; otherwise the raw uint8 square resize for the
    on-device preprocess path.
    """
    from PIL import Image

    from nans_clip_tpu.utils.transform import image_transform
    t = image_transform(resolution)
    out = []
    exts = {".jpg", ".jpeg", ".png", ".webp"}
    for i, name in enumerate(sorted(os.listdir(distractor_dir))):
        p = os.path.join(distractor_dir, name)
        if os.path.splitext(name)[1].lower() not in exts or not os.path.isfile(p):
            continue
        try:
            # evaluate.py:120 converts to RGB BEFORE the preprocess
            # transform; palette/CMYK distractors (plausible in a
            # .png/.webp dir) resample differently the other way round
            img = Image.open(p).convert("RGB")
            if pil:
                out.append((start_id + i, t(img)))
            else:
                arr = np.asarray(img.resize(
                    (resolution, resolution), Image.BICUBIC), np.uint8)
                out.append((start_id + i, arr))
        except Exception:
            continue
    return out


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    pil = args.image_transform == "pil"
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision)
    image_ids, texts, text_to_images, image_to_texts, ds = load_split(args.data)
    logging.info("split: %d images, %d texts, %d t2i gt entries",
                 len(image_ids), len(texts), len(text_to_images))
    distractors = None
    if args.distractor_dir:
        distractors = load_distractors(args.distractor_dir,
                                       cfg.vision.image_resolution, pil=pil)
        logging.info("added %d distractors to the gallery", len(distractors))

    results = {"zeroshot": evaluate_model(
        cfg, params, batch_stats, options, ds, image_ids, texts,
        text_to_images, image_to_texts, args.batch_size, args.context_length,
        distractors, pil=pil)}

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
        results["lora"] = evaluate_model(
            cfg, merged, batch_stats, options, ds, image_ids, texts,
            text_to_images, image_to_texts, args.batch_size,
            args.context_length, distractors, pil=pil)

    for name, res in results.items():
        for direction, m in res.items():
            logging.info("%s %s | " + " | ".join(f"{k} {v:.1f}" for k, v in m.items()),
                         name, direction)
    if args.output:
        n_dis = len(distractors) if distractors else 0
        out = dict(results)
        out["num_domain_images"] = len(image_ids)
        out["num_distractors"] = n_dis
        out["num_total_images"] = len(image_ids) + n_dis
        out["num_texts"] = len(texts)
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)
        logging.info("results dumped to %s", args.output)
    return results


if __name__ == "__main__":
    main()
