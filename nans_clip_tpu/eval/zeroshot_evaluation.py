"""Zero-shot classification (ELEVATER / ImageNet protocol).

Behavioral twin of reference eval/zeroshot_evaluation.py:
* classifier matrix: per class, embed every template prompt, mean-ensemble,
  renormalize (:107-119);
* logits = 100 * image_features @ classifier (:128-147);
* top-1 accuracy + ELEVATER-format prediction json dump (:255-274).

Images come from an ImageFolder-style directory (class subdirs) — the
reference used torchvision.datasets.ImageFolder (eval/data.py:154-163).

Usage:
  python -m nans_clip_tpu.eval.zeroshot_evaluation \
      --datapath IMAGEFOLDER --dataset imagenet \
      --resume ckpt.pt --vision-model ViT-B-16 \
      --text-model RoBERTa-wwm-ext-base-chinese --save-dir OUT
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import preprocess_images
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.eval.templates import (apply_template, imagenet_classnames,
                                          templates_for_dataset)
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="imagenet")
    p.add_argument("--datapath", required=True, help="ImageFolder root")
    p.add_argument("--index", default=None,
                   help="json list of classnames (defaults per dataset)")
    p.add_argument("--img-batch-size", type=int, default=64)
    p.add_argument("--text-batch-size", type=int, default=256)
    p.add_argument("--context-length", type=int, default=52)
    p.add_argument("--resume", required=True)
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--save-dir", default=".")
    p.add_argument("--num-workers", type=int, default=8)
    return p.parse_args(argv)


def zero_shot_classifier(cfg, params, options, classnames, templates,
                         context_length=52, batch_size=256):
    """[E, n_classes] mean-ensembled, renormalized classifier matrix."""
    txt_fn = jax.jit(lambda p, t: encode_text(p, cfg, t, options))
    weights = []
    for classname in classnames:
        prompts = [apply_template(t, classname) for t in templates]
        feats = []
        for i in range(0, len(prompts), batch_size):
            tok = tokenize(prompts[i:i + batch_size], context_length)
            f = np.asarray(txt_fn(params, jnp.asarray(tok)), np.float32)
            feats.append(f)
        feats = np.concatenate(feats)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(axis=0)
        mean /= np.linalg.norm(mean)
        weights.append(mean)
    return np.stack(weights, axis=1)  # [E, C]


def iter_imagefolder(root):
    """(path, class_index) pairs, classes sorted like torchvision."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                yield os.path.join(cdir, fname), ci
    return


def run(cfg, params, batch_stats, options, classifier, datapath,
        batch_size=64, num_threads=8):
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    resolution = cfg.vision.image_resolution

    def load_one(path):
        img = Image.open(path).convert("RGB").resize(
            (resolution, resolution), Image.BICUBIC)
        return np.asarray(img)

    def img_forward(p, bs_, x):
        x = preprocess_images(jax.random.PRNGKey(0), x, resolution, augment=False)
        f = encode_image(p, cfg, x, options,
                         batch_stats=bs_ if cfg.is_resnet else None)
        f = f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)
        return 100.0 * f @ jnp.asarray(classifier)

    img_fn = jax.jit(img_forward)

    samples = list(iter_imagefolder(datapath))
    assert samples, f"no images under {datapath}"
    top1 = 0
    n = 0
    predictions = []
    for i in range(0, len(samples), batch_size):
        chunk = samples[i:i + batch_size]
        imgs = np.zeros((batch_size, resolution, resolution, 3), np.uint8)
        with ThreadPoolExecutor(max_workers=max(1, num_threads)) as pool:
            for j, arr in enumerate(pool.map(load_one,
                                             [p_ for p_, _ in chunk])):
                imgs[j] = arr
        logits = np.asarray(img_fn(params, batch_stats, jnp.asarray(imgs)))[: len(chunk)]
        pred = logits.argmax(-1)
        for (path, label), p_, lg in zip(chunk, pred, logits):
            top1 += int(p_ == label)
            n += 1
            predictions.append(lg.astype(np.float64).round(8).tolist())
    return top1 / n, predictions


def main(argv=None):
    args = parse_args(argv)
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision)

    if args.index:
        with open(args.index, encoding="utf-8") as f:
            classnames = json.load(f)
    elif args.dataset.lower().startswith("imagenet"):
        classnames = imagenet_classnames()
    else:
        # ImageFolder class dirs are the classnames
        classnames = sorted(d for d in os.listdir(args.datapath)
                            if os.path.isdir(os.path.join(args.datapath, d)))
    templates = templates_for_dataset(args.dataset)
    print(f"{len(classnames)} classes, {len(templates)} templates")

    classifier = zero_shot_classifier(cfg, params, options, classnames,
                                      templates, args.context_length,
                                      args.text_batch_size)
    acc, predictions = run(cfg, params, batch_stats, options, classifier,
                           args.datapath, args.img_batch_size, args.num_workers)
    print(f"zeroshot top-1 accuracy: {acc * 100:.2f}%")

    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, f"{args.dataset}.json")
    with open(out, "w") as f:
        json.dump({"model_name": "nans-clip-tpu", "dataset_name": args.dataset,
                   "num_trainable_params": 0,
                   "num_params": sum(int(np.prod(np.shape(x)))
                                     for x in jax.tree.leaves(params)),
                   "n_shot": 0, "rnd_seeds": [123],
                   "predictions": [predictions],
                   "top1_accuracy": acc * 100}, f)
    print(f"Results saved to {out}")
    return acc


if __name__ == "__main__":
    main()
