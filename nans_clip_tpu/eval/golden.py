"""Egress-ready golden-value gates against CN-CLIP's published numbers.

Two product-level checks that could never run in the build container (zero
egress: no published checkpoints or datasets are downloadable) but are
fully automated the moment either appears:

1. **Pokemon probabilities** — the published ViT-B-16 quickstart output,
   reference README_En.md:214:
   ``[1.268734e-03, 5.436878e-02, 6.795761e-04, 9.436829e-01]``.
2. **MUGE zero-shot text-to-image retrieval** — the published ViT-B-16
   validation row, reference Results.md:13: R@1 52.1 / R@5 76.7 /
   R@10 84.4 / **MR 71.1** (gate: MR within ±0.2, SURVEY §7 step 4).

Usage (one command each):

    python -m nans_clip_tpu.eval.golden pokemon --checkpoint clip_cn_vit-b-16.pt
    python -m nans_clip_tpu.eval.golden muge --checkpoint clip_cn_vit-b-16.pt \
        --muge-dir MUGE/   # containing valid_imgs.tsv + valid_texts.jsonl
                           # (the official download layout) or a prebuilt
                           # datasets/<name>/valid npack dir

``tests/test_golden_live.py`` runs both through pytest, skip-gated on the
``NANS_GOLDEN_CKPT`` / ``NANS_GOLDEN_MUGE`` env vars — zero new code needed
on the day a checkpoint/dataset is mounted or egress opens.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

# README_En.md:214 (fp16 CUDA reference output; bf16-MXU/XLA agreement with
# the fp32 CPU oracle measured at ~5e-4 in tests, so 2e-3 abs is a real gate)
POKEMON_GOLDEN = np.array(
    [1.268734e-03, 5.436878e-02, 6.795761e-04, 9.436829e-01], np.float32)
POKEMON_LABELS = ["杰尼龟", "妙蛙种子", "小火龙", "皮卡丘"]
POKEMON_ATOL = 2e-3

# Results.md:13 — CN-CLIP ViT-B/16, MUGE official validation, zero-shot
MUGE_GOLDEN = {"r1": 52.1, "r5": 76.7, "r10": 84.4, "mean_recall": 71.1}
MUGE_MR_TOL = 0.2

_POKEMON_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                 "assets", "pokemon.jpeg"),
    "/root/reference/examples/pokemon.jpeg",
)


def _find_pokemon_image(explicit: str | None) -> str:
    if explicit:
        return explicit
    for c in _POKEMON_CANDIDATES:
        if os.path.exists(c):
            return os.path.abspath(c)
    raise FileNotFoundError(
        "pokemon.jpeg not found; pass --image (reference examples/pokemon.jpeg)")


def check_pokemon(checkpoint: str, image_path: str | None = None) -> dict:
    """Load the published ViT-B-16 checkpoint and gate the quickstart probs."""
    from PIL import Image

    import nans_clip_tpu as nc

    model, preprocess = nc.load_from_name(
        checkpoint, vision_model_name="ViT-B-16",
        text_model_name="RoBERTa-wwm-ext-base-chinese",
        input_resolution=224)
    img = preprocess(Image.open(_find_pokemon_image(image_path)))[None]
    ids = nc.tokenize(POKEMON_LABELS)
    logits, _ = model.get_similarity(img, ids)
    logits = np.asarray(logits.astype("float32"))[0]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    err = float(np.abs(probs - POKEMON_GOLDEN).max())
    ok = err < POKEMON_ATOL
    return {"check": "pokemon", "ok": bool(ok), "max_abs_err": err,
            "atol": POKEMON_ATOL, "probs": probs.tolist(),
            "golden": POKEMON_GOLDEN.tolist()}


def check_pokemon_int8(checkpoint: str, image_path: str | None = None,
                       atol: float = 0.05) -> dict:
    """Quality gate for the int8 serving mode (utils/quantize.py) on the
    published checkpoint: the quantized model's pokemon probabilities must
    track the full-precision ones within ``atol`` (per-output-channel
    weight-only int8 is empirically well inside 0.01 on trained weights;
    the gate is deliberately loose so it only catches real regressions)."""
    from PIL import Image

    import nans_clip_tpu as nc

    model, preprocess = nc.load_from_name(
        checkpoint, vision_model_name="ViT-B-16",
        text_model_name="RoBERTa-wwm-ext-base-chinese",
        input_resolution=224)
    img = preprocess(Image.open(_find_pokemon_image(image_path)))[None]
    ids = nc.tokenize(POKEMON_LABELS)

    def probs_of(m):
        logits, _ = m.get_similarity(img, ids)
        logits = np.asarray(logits.astype("float32"))[0]
        p = np.exp(logits - logits.max())
        return p / p.sum()

    full = probs_of(model)
    quant = probs_of(model.quantize())
    err = float(np.abs(full - quant).max())
    return {"check": "pokemon_int8", "ok": bool(err < atol),
            "max_abs_shift": err, "atol": atol,
            "full_probs": full.tolist(), "int8_probs": quant.tolist()}


def _ensure_npack_valid(muge_dir: str, work_dir: str) -> tuple[str, str]:
    """Return (npack valid dir, valid_texts.jsonl). Accepts either the raw
    official download (valid_imgs.tsv + valid_texts.jsonl) — converted via
    our builder — or an already-built npack dataset dir."""
    texts = os.path.join(muge_dir, "valid_texts.jsonl")
    prebuilt = os.path.join(muge_dir, "datasets")
    if os.path.isdir(prebuilt):
        for name in os.listdir(prebuilt):
            v = os.path.join(prebuilt, name, "valid")
            if os.path.exists(os.path.join(v, "imgs.npack")):
                return v, texts
    if os.path.exists(os.path.join(muge_dir, "valid", "imgs.npack")):
        return os.path.join(muge_dir, "valid"), texts
    if not os.path.exists(os.path.join(muge_dir, "valid_imgs.tsv")):
        raise FileNotFoundError(
            f"{muge_dir}: need valid_imgs.tsv+valid_texts.jsonl (official "
            "MUGE layout) or a prebuilt npack 'valid' split")
    out = os.path.join(work_dir, "ds")
    subprocess.run(
        [sys.executable, "-m", "nans_clip_tpu.preprocess.build_dataset",
         "--data-dir", muge_dir, "--splits", "valid", "--out-dir", out],
        check=True)
    return os.path.join(out, "valid"), texts


def check_muge(checkpoint: str, muge_dir: str, work_dir: str | None = None,
               batch_size: int = 64) -> dict:
    """Full 3-stage MUGE zero-shot T2I eval; gate MR vs the published row."""
    from nans_clip_tpu.eval import evaluation, extract_features
    from nans_clip_tpu.eval import make_topk_predictions as topk

    tmp = work_dir or tempfile.mkdtemp(prefix="muge_golden_")
    os.makedirs(tmp, exist_ok=True)
    valid_dir, texts_jsonl = _ensure_npack_valid(muge_dir, tmp)
    img_feats = os.path.join(tmp, "imgs.img_feat.jsonl")
    txt_feats = os.path.join(tmp, "valid_texts.txt_feat.jsonl")
    preds = os.path.join(tmp, "valid_predictions.jsonl")
    score_json = os.path.join(tmp, "score.json")

    extract_features.main([
        "--extract-image-feats", "--extract-text-feats",
        "--image-data", valid_dir, "--text-data", texts_jsonl,
        "--image-feat-output-path", img_feats,
        "--text-feat-output-path", txt_feats,
        "--img-batch-size", str(batch_size),
        "--text-batch-size", str(batch_size),
        "--resume", checkpoint,
        "--vision-model", "ViT-B-16",
        "--text-model", "RoBERTa-wwm-ext-base-chinese"])
    topk.main(["--image-feats", img_feats, "--text-feats", txt_feats,
               "--top-k", "10", "--output", preds])
    evaluation.main([texts_jsonl, preds, score_json])
    with open(score_json) as f:
        score = json.load(f)["scoreJson"]
    mr = score["mean_recall"]
    ok = abs(mr - MUGE_GOLDEN["mean_recall"]) <= MUGE_MR_TOL
    return {"check": "muge_zeroshot_t2i", "ok": bool(ok), "scores": score,
            "golden": MUGE_GOLDEN, "mr_tolerance": MUGE_MR_TOL}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pk = sub.add_parser("pokemon")
    pk.add_argument("--checkpoint", required=True)
    pk.add_argument("--image", default=None)
    pq = sub.add_parser("pokemon-int8")
    pq.add_argument("--checkpoint", required=True)
    pq.add_argument("--image", default=None)
    mg = sub.add_parser("muge")
    mg.add_argument("--checkpoint", required=True)
    mg.add_argument("--muge-dir", required=True)
    mg.add_argument("--work-dir", default=None)
    mg.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args(argv)
    if args.cmd == "pokemon":
        result = check_pokemon(args.checkpoint, args.image)
    elif args.cmd == "pokemon-int8":
        result = check_pokemon_int8(args.checkpoint, args.image)
    else:
        result = check_muge(args.checkpoint, args.muge_dir, args.work_dir,
                            args.batch_size)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
