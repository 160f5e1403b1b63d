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

Gate set (round 4 widened it to the full published-table coverage):
pokemon probs, pokemon-int8 quality, MUGE zero-shot T2I MR, Flickr30K-CN
and COCO-CN zero-shot retrieval (both directions, Results.md:27-82),
ImageNet-CN zero-shot top-1 48.3 (Results.md:94), and the fork's
Southern-Song LoRA before/after R@1 (复现计划.md §五).

Usage (one command each):

    python -m nans_clip_tpu.eval.golden pokemon --checkpoint clip_cn_vit-b-16.pt
    python -m nans_clip_tpu.eval.golden muge --checkpoint clip_cn_vit-b-16.pt \
        --muge-dir MUGE/   # containing valid_imgs.tsv + valid_texts.jsonl
                           # (the official download layout) or a prebuilt
                           # datasets/<name>/valid npack dir
    python -m nans_clip_tpu.eval.golden flickr30k-cn --checkpoint ... \
        --data-dir Flickr30k-CN/        # test_imgs.tsv + test_texts.jsonl
    python -m nans_clip_tpu.eval.golden coco-cn --checkpoint ... --data-dir ...
    python -m nans_clip_tpu.eval.golden imagenet --checkpoint ... \
        --datapath imagenet/val         # ImageFolder layout
    python -m nans_clip_tpu.eval.golden lora-song --checkpoint ... \
        --data-dir SongDynasty/lmdb/valid --lora best_lora.npz

``tests/test_golden_live.py`` runs every gate through pytest, skip-gated on
the ``NANS_GOLDEN_*`` env vars — zero new code needed on the day a
checkpoint/dataset is mounted or egress opens.
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

# Published ViT-B/16 ZERO-SHOT retrieval rows for the other two benchmark
# tables (reference Results.md:27-82, official test sets; the deployment
# docs' backend-parity protocol uses the same ±0.2 MR tolerance)
RETRIEVAL_GOLDEN = {
    "muge": {"split": "valid",     # MUGE publishes its MR (71.1) directly
             "t2i": {"r1": 52.1, "r5": 76.7, "r10": 84.4,
                     "mean_recall": 71.1}},
    "flickr30k-cn": {"split": "test",
                     "t2i": {"r1": 62.7, "r5": 86.9, "r10": 92.8},
                     "i2t": {"r1": 74.6, "r5": 93.5, "r10": 97.1}},
    "coco-cn": {"split": "test",
                "t2i": {"r1": 62.2, "r5": 86.6, "r10": 94.9},
                "i2t": {"r1": 57.0, "r5": 84.1, "r10": 93.6}},
}


def _golden_mr(row: dict) -> float:
    """The PUBLISHED MR when the table prints one (MUGE); Flickr/COCO
    tables publish only R@K, so the gate value is their mean (the
    reference's evaluation.py mean_recall definition)."""
    if "mean_recall" in row:
        return row["mean_recall"]
    return (row["r1"] + row["r5"] + row["r10"]) / 3.0

# Results.md:94 — CN-CLIP ViT-B/16 zero-shot ImageNet-CN top-1 (ELEVATER
# protocol; same ±0.2 gate as the retrieval MRs)
IMAGENET_GOLDEN_TOP1 = 48.3
IMAGENET_TOL = 0.2

# Fork Southern-Song LoRA results (CLIP南宋古籍项目复现计划.md:90-91, §五):
# given the fork's OWN dataset + trained adapter artifacts the eval is
# deterministic, so the gate is tight (±0.5 absorbs bf16-vs-fp16 rank
# flips near ties, nothing more)
LORA_SONG_GOLDEN = {
    "zeroshot": {"t2i_r1": 65.9, "i2t_r1": 77.3},
    "lora": {"t2i_r1": 71.6, "i2t_r1": 86.4},
}
LORA_SONG_TOL = 0.5

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


def _ensure_npack_split(data_dir: str, work_dir: str,
                        split: str = "valid") -> tuple[str, str]:
    """Return (npack split dir, {split}_texts.jsonl). Accepts either the raw
    official download ({split}_imgs.tsv + {split}_texts.jsonl) — converted
    via our builder — or an already-built npack dataset dir."""
    texts = os.path.join(data_dir, f"{split}_texts.jsonl")
    prebuilt = os.path.join(data_dir, "datasets")
    if os.path.isdir(prebuilt):
        for name in os.listdir(prebuilt):
            v = os.path.join(prebuilt, name, split)
            if os.path.exists(os.path.join(v, "imgs.npack")):
                return v, texts
    if os.path.exists(os.path.join(data_dir, split, "imgs.npack")):
        return os.path.join(data_dir, split), texts
    if not os.path.exists(os.path.join(data_dir, f"{split}_imgs.tsv")):
        raise FileNotFoundError(
            f"{data_dir}: need {split}_imgs.tsv+{split}_texts.jsonl "
            f"(official layout) or a prebuilt npack '{split}' split")
    out = os.path.join(work_dir, "ds")
    subprocess.run(
        [sys.executable, "-m", "nans_clip_tpu.preprocess.build_dataset",
         "--data-dir", data_dir, "--splits", split, "--out-dir", out],
        check=True)
    return os.path.join(out, split), texts


def check_retrieval(dataset: str, checkpoint: str, data_dir: str,
                    work_dir: str | None = None, batch_size: int = 64) -> dict:
    """Full 3-stage zero-shot retrieval eval for one published benchmark
    (muge: T2I only, like the official leaderboard; flickr30k-cn / coco-cn:
    both directions via the _tr mirror); gate each direction's MR within
    ±0.2 of the published ViT-B/16 row."""
    from nans_clip_tpu.eval import (evaluation, evaluation_tr,
                                    extract_features,
                                    transform_ir_annotation_to_tr)
    from nans_clip_tpu.eval import make_topk_predictions as topk

    golden = RETRIEVAL_GOLDEN[dataset]
    split = golden["split"]
    tmp = work_dir or tempfile.mkdtemp(prefix=f"{dataset}_golden_")
    os.makedirs(tmp, exist_ok=True)
    split_dir, texts_jsonl = _ensure_npack_split(data_dir, tmp, split)
    img_feats = os.path.join(tmp, "imgs.img_feat.jsonl")
    txt_feats = os.path.join(tmp, f"{split}_texts.txt_feat.jsonl")

    extract_features.main([
        "--extract-image-feats", "--extract-text-feats",
        "--image-data", split_dir, "--text-data", texts_jsonl,
        "--image-feat-output-path", img_feats,
        "--text-feat-output-path", txt_feats,
        "--img-batch-size", str(batch_size),
        "--text-batch-size", str(batch_size),
        "--resume", checkpoint,
        "--vision-model", "ViT-B-16",
        "--text-model", "RoBERTa-wwm-ext-base-chinese"])

    directions = {}
    ok = True
    preds = os.path.join(tmp, "predictions.jsonl")
    score_json = os.path.join(tmp, "score.json")
    topk.main(["--image-feats", img_feats, "--text-feats", txt_feats,
               "--top-k", "10", "--output", preds])
    evaluation.main([texts_jsonl, preds, score_json])
    with open(score_json) as f:
        score = json.load(f)["scoreJson"]
    mr_golden = _golden_mr(golden["t2i"])
    ok &= abs(score["mean_recall"] - mr_golden) <= MUGE_MR_TOL
    directions["t2i"] = {"scores": score, "golden": golden["t2i"],
                         "golden_mr": mr_golden}

    if "i2t" in golden:
        tr_annot = transform_ir_annotation_to_tr.transform(texts_jsonl,
            os.path.join(tmp, f"{split}_texts.tr.jsonl"))
        preds_tr = os.path.join(tmp, "predictions_tr.jsonl")
        score_tr = os.path.join(tmp, "score_tr.json")
        topk.main(["--image-feats", img_feats, "--text-feats", txt_feats,
                   "--top-k", "10", "--tr", "--output", preds_tr])
        evaluation_tr.main([tr_annot, preds_tr, score_tr])
        with open(score_tr) as f:
            score2 = json.load(f)["scoreJson"]
        mr2_golden = _golden_mr(golden["i2t"])
        ok &= abs(score2["mean_recall"] - mr2_golden) <= MUGE_MR_TOL
        directions["i2t"] = {"scores": score2, "golden": golden["i2t"],
                             "golden_mr": mr2_golden}

    return {"check": f"{dataset}_zeroshot_retrieval", "ok": bool(ok),
            "directions": directions, "mr_tolerance": MUGE_MR_TOL}


def check_muge(checkpoint: str, muge_dir: str, work_dir: str | None = None,
               batch_size: int = 64) -> dict:
    """Back-compat wrapper: MUGE zero-shot T2I gate (Results.md:13)."""
    r = check_retrieval("muge", checkpoint, muge_dir, work_dir, batch_size)
    score = r["directions"]["t2i"]["scores"]
    return {"check": "muge_zeroshot_t2i", "ok": r["ok"], "scores": score,
            "golden": MUGE_GOLDEN, "mr_tolerance": MUGE_MR_TOL}


def check_imagenet(checkpoint: str, datapath: str,
                   label_file: str | None = None,
                   work_dir: str | None = None,
                   batch_size: int = 64) -> dict:
    """Zero-shot ImageNet-CN classification through the ELEVATER protocol
    (eval/zeroshot_evaluation.py, reference-parity incl. its 183-prompt
    cvinw 'openai' template routing); gate top-1 vs Results.md:94."""
    from nans_clip_tpu.eval import zeroshot_evaluation

    tmp = work_dir or tempfile.mkdtemp(prefix="imagenet_golden_")
    argv = ["--dataset", "imagenet", "--datapath", datapath,
            "--resume", checkpoint, "--vision-model", "ViT-B-16",
            "--text-model", "RoBERTa-wwm-ext-base-chinese",
            "--img-batch-size", str(batch_size), "--save-dir", tmp]
    if label_file:
        argv += ["--label-file", label_file]
    acc = zeroshot_evaluation.main(argv)
    top1 = acc * 100.0
    ok = abs(top1 - IMAGENET_GOLDEN_TOP1) <= IMAGENET_TOL
    return {"check": "imagenet_zeroshot_top1", "ok": bool(ok),
            "top1": top1, "golden": IMAGENET_GOLDEN_TOP1,
            "tolerance": IMAGENET_TOL}


def check_lora_song(checkpoint: str, data_dir: str, lora_path: str,
                    batch_size: int = 32) -> dict:
    """Fork Southern-Song LoRA gate (复现计划.md §五): zero-shot AND
    LoRA-merged T→I / I→T R@1 on the fork's valid split + trained adapter,
    each within ±0.5 of the published before/after numbers."""
    from nans_clip_tpu.eval import retrieval_suite

    results = retrieval_suite.main([
        "--data", data_dir, "--resume", checkpoint,
        "--vision-model", "ViT-B-16",
        "--text-model", "RoBERTa-wwm-ext-base-chinese",
        "--lora", lora_path, "--batch-size", str(batch_size)])
    got = {mode: {"t2i_r1": results[mode]["text_to_image"]["R@1"],
                  "i2t_r1": results[mode]["image_to_text"]["R@1"]}
           for mode in ("zeroshot", "lora")}
    ok = all(abs(got[m][k] - LORA_SONG_GOLDEN[m][k]) <= LORA_SONG_TOL
             for m in got for k in got[m])
    return {"check": "lora_song_r1", "ok": bool(ok), "got": got,
            "golden": LORA_SONG_GOLDEN, "tolerance": LORA_SONG_TOL}


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
    for name in ("flickr30k-cn", "coco-cn"):
        rp = sub.add_parser(name)
        rp.add_argument("--checkpoint", required=True)
        rp.add_argument("--data-dir", required=True,
                        help="official download dir (test_imgs.tsv + "
                             "test_texts.jsonl) or prebuilt npack dataset")
        rp.add_argument("--work-dir", default=None)
        rp.add_argument("--batch-size", type=int, default=64)
    im = sub.add_parser("imagenet")
    im.add_argument("--checkpoint", required=True)
    im.add_argument("--datapath", required=True, help="ImageFolder val root")
    im.add_argument("--label-file", default=None)
    im.add_argument("--work-dir", default=None)
    im.add_argument("--batch-size", type=int, default=64)
    ls = sub.add_parser("lora-song")
    ls.add_argument("--checkpoint", required=True)
    ls.add_argument("--data-dir", required=True,
                    help="the fork's Southern-Song valid split (LMDB or npack)")
    ls.add_argument("--lora", required=True, help="trained adapter (.npz)")
    ls.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args(argv)
    if args.cmd == "pokemon":
        result = check_pokemon(args.checkpoint, args.image)
    elif args.cmd == "pokemon-int8":
        result = check_pokemon_int8(args.checkpoint, args.image)
    elif args.cmd == "muge":
        result = check_muge(args.checkpoint, args.muge_dir, args.work_dir,
                            args.batch_size)
    elif args.cmd in ("flickr30k-cn", "coco-cn"):
        result = check_retrieval(args.cmd, args.checkpoint, args.data_dir,
                                 args.work_dir, args.batch_size)
    elif args.cmd == "imagenet":
        result = check_imagenet(args.checkpoint, args.datapath,
                                args.label_file, args.work_dir,
                                args.batch_size)
    else:
        result = check_lora_song(args.checkpoint, args.data_dir, args.lora,
                                 args.batch_size)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
