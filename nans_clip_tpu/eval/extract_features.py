"""Feature extraction CLI — jsonl-compatible with the reference
(eval/extract_features.py:165-203): normalized features written as
``{"text_id": ..., "feature": [...]}`` / ``{"image_id": ..., "feature": [...]}``.

TPU redesign: one jitted batched encoder per tower (padded final batch, so
one compiled shape), images streamed from the npack store through the C++
decode pool.

Usage:
  python -m nans_clip_tpu.eval.extract_features \
      --extract-image-feats --extract-text-feats \
      --image-data DATADIR/valid --text-data DATADIR/valid_texts.jsonl \
      --resume ckpt.pt --vision-model ViT-B-16 \
      --text-model RoBERTa-wwm-ext-base-chinese
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import NPackReader, preprocess_images
from nans_clip_tpu.data.dataset import preprocess_text
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--extract-image-feats", action="store_true")
    p.add_argument("--extract-text-feats", action="store_true")
    p.add_argument("--image-data", default=None,
                   help="npack dataset dir (uses imgs.npack)")
    p.add_argument("--text-data", default=None, help="jsonl with text_id/text")
    p.add_argument("--image-feat-output-path", default=None)
    p.add_argument("--text-feat-output-path", default=None)
    p.add_argument("--img-batch-size", type=int, default=64)
    p.add_argument("--text-batch-size", type=int, default=64)
    p.add_argument("--context-length", type=int, default=52)
    p.add_argument("--resume", required=True)
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--num-threads", type=int, default=8)
    p.add_argument("--image-transform", choices=["pil", "native"], default="pil",
                   help="both are numerically faithful to the reference "
                        "eval transform (clip/utils.py:179-186): pil = "
                        "host PIL decode+bicubic; native = the threaded "
                        "C++ pool with the PIL-BIT-EXACT bicubic kernel "
                        "(r4) — same pixels, faster at scale (normalize "
                        "runs on device)")
    # serialized-artifact backends — the extract_features_{onnx,tensorrt}
    # analogs (reference eval/extract_features_onnx.py:121-138,
    # extract_features_tensorrt.py:11): "stablehlo" runs towers from
    # exported StableHLO (the ONNX-file analog, re-compiles on load);
    # "engine" runs saved pre-compiled executables (the TRT-engine-file
    # analog, deploy/engine.py — no re-trace, no re-compile on load).
    p.add_argument("--backend", choices=["jit", "stablehlo", "engine"],
                   default="jit")
    p.add_argument("--image-artifact", default=None)
    p.add_argument("--text-artifact", default=None)
    p.add_argument("--tiny-model", action="store_true",
                   help="2-layer debug config (configs.tiny_config)")
    return p.parse_args(argv)


def _load_engine_fn(path: str, params, batch_size: int, tower: str,
                    batch_stats=None):
    """Bind a saved engine and check its conventions up front — the TRT
    fixed-shape discipline (batch shape, quantize layout, baked BN
    stats) — instead of failing mid-extraction with an XLA error."""
    from nans_clip_tpu.deploy.engine import (_read_payload,
                                             batch_stats_digest, load_engine)
    payload = _read_payload(path)
    meta = payload.get("meta", {})
    if meta.get("quantize"):
        raise SystemExit(
            f"{path}: engine was built with --quantize {meta['quantize']}; "
            f"extract_features loads unquantized checkpoints — rebuild the "
            f"engine without --quantize")
    built_digest = meta.get("batch_stats_digest")
    if built_digest is not None \
            and built_digest != batch_stats_digest(batch_stats):
        raise SystemExit(
            f"{path}: engine baked different BN running stats than this "
            f"checkpoint's (ResNet engines must be rebuilt per checkpoint)")
    eng = load_engine(path, params, payload=payload)
    if eng.batch_size is not None and eng.batch_size != batch_size:
        raise SystemExit(
            f"{path}: engine was built at batch_size={eng.batch_size} but "
            f"--{tower}-batch-size is {batch_size}; rebuild the engine or "
            f"pass the matching batch size (engines are fixed-shape, like "
            f"TensorRT engines)")
    return lambda _params, x: eng(x)


def extract_text_features(args, cfg, params, options, out_path):
    if args.backend == "engine":
        assert args.text_artifact, "--backend engine needs --text-artifact"
        txt_fn = _load_engine_fn(args.text_artifact, params,
                                 args.text_batch_size, "text")
    elif args.backend == "stablehlo":
        from nans_clip_tpu.deploy.aot import load_stablehlo
        assert args.text_artifact, "--backend stablehlo needs --text-artifact"
        txt_fn = load_stablehlo(args.text_artifact)
    else:
        txt_fn = jax.jit(lambda p, t: encode_text(p, cfg, t, options))
    ids, texts = [], []
    with open(args.text_data, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            ids.append(obj["text_id"])
            texts.append(obj["text"])
    n = len(ids)
    bs = args.text_batch_size
    written = 0
    with open(out_path, "w") as fout:
        for i in range(0, n, bs):
            # lowercase + CJK-quote normalization before tokenizing, like the
            # reference eval dataset (eval/data.py:23-26,50)
            chunk = [preprocess_text(str(t)) for t in texts[i:i + bs]]
            tok = tokenize(chunk, args.context_length)
            pad = bs - len(chunk)
            if pad:
                tok = np.concatenate([tok, np.zeros((pad, tok.shape[1]), tok.dtype)])
            feats = txt_fn(params, jnp.asarray(tok))
            feats = np.array(feats, np.float32)[: len(chunk)]
            feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
            for tid, feat in zip(ids[i:i + bs], feats):
                fout.write(json.dumps({"text_id": tid, "feature": feat.tolist()}) + "\n")
                written += 1
    print(f"{written} text features are stored in {out_path}")


def extract_image_features(args, cfg, params, batch_stats, options, out_path):
    resolution = cfg.vision.image_resolution
    pil = args.image_transform == "pil"

    if args.backend in ("stablehlo", "engine"):
        if args.backend == "engine":
            assert args.image_artifact, "--backend engine needs --image-artifact"
            artifact_fn = _load_engine_fn(args.image_artifact, params,
                                          args.img_batch_size, "img",
                                          batch_stats=batch_stats)
        else:
            from nans_clip_tpu.deploy.aot import load_stablehlo
            assert args.image_artifact, "--backend stablehlo needs --image-artifact"
            artifact_fn = load_stablehlo(args.image_artifact)

        def img_fn(p, bs_, x):
            if not pil:
                x = preprocess_images(jax.random.PRNGKey(0), x, resolution,
                                      augment=False)
            return artifact_fn(p, x)
    else:
        def img_forward(p, bs_, x):
            if not pil:
                x = preprocess_images(jax.random.PRNGKey(0), x, resolution,
                                      augment=False)
            return encode_image(p, cfg, x, options,
                                batch_stats=bs_ if cfg.is_resnet else None)

        img_fn = jax.jit(img_forward)

    def decode_batch(chunk):
        if not pil:
            # r4: the native path uses the PIL-BIT-EXACT full-decode +
            # bicubic kernel (csrc), so "native" now means the same
            # pixels as the pil path at threaded-C speed; only the
            # normalize runs on device instead of host
            raw, ok = reader.decode_jpeg_batch_pil(chunk, resolution,
                                                   args.num_threads)
            if not ok.all():
                # fail like the pil path does on a corrupt file — a zero
                # image would silently pollute the feature jsonl and every
                # downstream top-k run
                bad = np.asarray(chunk)[~ok.astype(bool)]
                raise RuntimeError(
                    f"JPEG decode failed for image_ids {bad[:8].tolist()} "
                    f"({int((~ok.astype(bool)).sum())} total); rebuild the "
                    "dataset or drop the corrupt records")
            return raw
        # reference-exact path: PIL decode + bicubic square resize +
        # normalize (clip/utils.py:179-186)
        import io

        from PIL import Image

        from nans_clip_tpu.utils.transform import image_transform
        t = image_transform(resolution)
        return np.stack([t(Image.open(io.BytesIO(reader.get(int(k)))))
                         for k in chunk])

    imgs_path = os.path.join(args.image_data, "imgs.npack")
    reader = NPackReader(imgs_path)
    keys = reader.keys()
    n = len(keys)
    bs = args.img_batch_size
    written = 0
    with open(out_path, "w") as fout:
        for i in range(0, n, bs):
            chunk = keys[i:i + bs]
            raw = decode_batch(chunk)
            pad = bs - len(chunk)
            if pad:
                raw = np.concatenate([raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
            feats = img_fn(params, batch_stats, jnp.asarray(raw))
            feats = np.array(feats, np.float32)[: len(chunk)]
            feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
            for key, feat in zip(chunk.tolist(), feats):
                fout.write(json.dumps({"image_id": int(key), "feature": feat.tolist()}) + "\n")
                written += 1
    reader.close()
    print(f"{written} image features are stored in {out_path}")


def main(argv=None):
    args = parse_args(argv)
    cfg_override = None
    if args.tiny_model:
        from nans_clip_tpu.configs import tiny_config
        cfg_override = tiny_config()
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision,
        cfg=cfg_override)

    if args.extract_text_feats:
        out = args.text_feat_output_path or f"{args.text_data[:-6]}.txt_feat.jsonl"
        extract_text_features(args, cfg, params, options, out)
    if args.extract_image_feats:
        out = args.image_feat_output_path or os.path.join(
            args.image_data, "imgs.img_feat.jsonl")
        extract_image_features(args, cfg, params, batch_stats, options, out)


if __name__ == "__main__":
    main()
