"""Zero-shot classification (ELEVATER / ImageNet protocol).

Behavioral twin of reference eval/zeroshot_evaluation.py:
* classifier matrix: per class, embed every template prompt (prompts run
  through the eval ``_preprocess_text`` lowercasing, :111), mean-ensemble,
  renormalize (:107-119);
* logits = softmax(100 * image_features @ classifier), top-1 accuracy
  computed on them (:128-147);
* classnames come from ``--label-file`` (one per line, :232-233);
  ``--index`` optionally REARRANGES the dumped prediction rows (:152-158);
* ELEVATER-format prediction json dump with 6-digit float precision and
  softmaxed probabilities (:255-274).

Images come from an ImageFolder-style directory (class subdirs) — the
reference used torchvision.datasets.ImageFolder (eval/data.py:154-163).

Usage:
  python -m nans_clip_tpu.eval.zeroshot_evaluation \
      --datapath IMAGEFOLDER --dataset imagenet --label-file labels.txt \
      --resume ckpt.pt --vision-model ViT-B-16 \
      --text-model RoBERTa-wwm-ext-base-chinese --save-dir OUT
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import preprocess_images
from nans_clip_tpu.data.dataset import preprocess_text
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.eval.templates import (apply_template, imagenet_classnames,
                                          templates_for_dataset)
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="imagenet")
    p.add_argument("--datapath", required=True, help="ImageFolder root")
    p.add_argument("--label-file", default=None,
                   help="classnames, one per line (reference :232); falls "
                        "back to the bundled ImageNet-CN list, then to the "
                        "ImageFolder class dirs")
    p.add_argument("--index", default=None,
                   help="json list of row indices to rearrange the dumped "
                        "predictions (reference :152-158)")
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
    """[E, n_classes] mean-ensembled, renormalized classifier matrix.

    Prompts go through the eval ``_preprocess_text`` lowercasing before
    tokenization, exactly like the reference (:111)."""
    txt_fn = jax.jit(lambda p, t: encode_text(p, cfg, t, options))
    weights = []
    for classname in classnames:
        prompts = [preprocess_text(apply_template(t, classname))
                   for t in templates]
        feats = []
        for i in range(0, len(prompts), batch_size):
            chunk = prompts[i:i + batch_size]
            tok = tokenize(chunk, context_length)
            pad = batch_size - len(chunk)
            if pad and len(prompts) > batch_size:
                tok = np.concatenate(
                    [tok, np.zeros((pad, tok.shape[1]), tok.dtype)])
            f = np.asarray(txt_fn(params, jnp.asarray(tok)),
                           np.float32)[: len(chunk)]
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
    """(top1 accuracy, softmaxed prediction rows) — reference run()
    semantics (:128-163): probabilities, not raw logits."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    resolution = cfg.vision.image_resolution

    def load_one(path):
        # RGB conversion BEFORE resize: the reference loads via torchvision
        # ImageFolder's default_loader, which does Image.open().convert('RGB')
        # and only THEN applies the transform's Resize (eval/data.py:155 +
        # torchvision pil_loader). Resizing first would NEAREST-resample
        # palette PNGs and mis-interpolate CMYK JPEGs. (extract_features
        # keeps resize-first — there the reference applies the bare
        # transform to an already-decoded RGB-unconverted image.)
        img = Image.open(path).convert("RGB").resize(
            (resolution, resolution), Image.BICUBIC)
        return np.asarray(img)

    def img_forward(p, bs_, x):
        x = preprocess_images(jax.random.PRNGKey(0), x, resolution, augment=False)
        f = encode_image(p, cfg, x, options,
                         batch_stats=bs_ if cfg.is_resnet else None)
        f = f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)
        return jax.nn.softmax(100.0 * f @ jnp.asarray(classifier), axis=-1)

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
        probs = np.asarray(img_fn(params, batch_stats, jnp.asarray(imgs)),
                           np.float64)[: len(chunk)]
        pred = probs.argmax(-1)
        for (path, label), p_, row in zip(chunk, pred, probs):
            top1 += int(p_ == label)
            n += 1
            predictions.append(row.tolist())
    return top1 / n, predictions


def json_prec_dump(data, prec=6):
    """Round every float to ``prec`` digits (reference :255-258)."""
    return json.dumps(
        json.loads(json.dumps(data), parse_float=lambda x: round(float(x), prec)))


def main(argv=None):
    args = parse_args(argv)
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision)

    if args.label_file:
        with open(args.label_file, encoding="utf8") as f:
            classnames = [line.strip() for line in f.readlines()]
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

    if args.index:
        with open(args.index, encoding="utf-8") as f:
            index = json.load(f)
        predictions = [predictions[i] for i in index]

    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    n_visual = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(params["visual"]))
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, f"{args.dataset}.json")
    output_dict = {
        "model_name": "CN-CLIP-" + args.vision_model,
        "dataset_name": args.dataset,
        "num_trainable_params": 0,
        "num_params": n_params,
        "num_visual_params": n_visual,
        "num_backbone_params": n_params,
        "n_shot": 0,
        "rnd_seeds": [123],
        "predictions": [predictions],
    }
    with open(out, "w", encoding="utf-8") as f:
        f.write(json_prec_dump(output_dict))
    print(f"Results saved to {out}")
    return acc


if __name__ == "__main__":
    main()
