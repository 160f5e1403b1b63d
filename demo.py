"""Interactive retrieval demo — twin of reference ``demo.py``.

Precomputes gallery image features from an npack dataset, then serves:
* text -> image gallery search,
* image -> candidate-text ranking,
with optional LoRA adapters merged in (reference demo.py:95-212).

Uses Gradio when installed; otherwise falls back to a REPL/CLI mode (this
image has no gradio and no egress).

  python demo.py --data DATADIR/valid --resume ckpt.pt \
      [--lora best_lora.npz] [--cli "西湖 山水"]
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.data import PairDataset, preprocess_images
from nans_clip_tpu.data.dataset import preprocess_text
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.models.clip import encode_image, encode_text
from nans_clip_tpu.tokenizer import tokenize

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="npack dataset dir (gallery)")
    p.add_argument("--resume", required=True)
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--lora", default=None)
    p.add_argument("--topk", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--cli", default=None, help="run one query and exit")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8-text"],
                   help="weight-only int8 serving (utils/quantize.py): "
                        "batch-1 query latency 1.21-1.45x on the text "
                        "tower; int8-text leaves the image tower bf16 "
                        "(applied AFTER any LoRA merge)")
    return p.parse_args(argv)


class RetrievalEngine:
    def __init__(self, args):
        cfg, params, batch_stats, options = load_eval_model(
            args.vision_model, args.text_model, args.resume)
        if args.lora:
            from nans_clip_tpu.models.lora import init_lora, load_lora, merge_lora
            data = np.load(args.lora)
            meta = json.loads(str(data["__meta__"]))
            template = init_lora(jax.random.PRNGKey(0), params,
                                 rank=int(meta.get("rank", 4)))
            adapters, meta = load_lora(args.lora, template)
            params = merge_lora(params, adapters, alpha=meta.get("alpha", 16.0))
            logger.info("merged LoRA adapters from %s", args.lora)
        if args.quantize:
            from nans_clip_tpu.utils.quantize import (quantize_for_serving,
                                                      towers_for_mode)
            towers = towers_for_mode(args.quantize)
            params = quantize_for_serving(params, towers)
            logger.info("int8-quantized towers: %s", towers)
        self.cfg, self.params, self.batch_stats, self.options = cfg, params, batch_stats, options
        self.ds = PairDataset(args.data)
        self.resolution = cfg.vision.image_resolution

        def img_fwd(p, bs_, x):
            x = preprocess_images(jax.random.PRNGKey(0), x, self.resolution, augment=False)
            f = encode_image(p, cfg, x, options,
                             batch_stats=bs_ if cfg.is_resnet else None).astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        def txt_fwd(p, t):
            f = encode_text(p, cfg, t, options).astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        self._img_fn = jax.jit(img_fwd)
        self._txt_fn = jax.jit(txt_fwd)

        # gallery features
        keys = self.ds.imgs.keys()
        feats = []
        bs = args.batch_size
        for i in range(0, len(keys), bs):
            chunk = keys[i:i + bs]
            raw, _ = self.ds.imgs.decode_jpeg_batch(chunk, self.resolution)
            pad = bs - len(chunk)
            if pad:
                raw = np.concatenate([raw, np.zeros((pad,) + raw.shape[1:], raw.dtype)])
            feats.append(np.asarray(self._img_fn(params, batch_stats,
                                                 jnp.asarray(raw)))[: len(chunk)])
        self.gallery_ids = keys.astype(np.int64)
        self.gallery = np.concatenate(feats)
        # candidate texts
        self.texts = {}
        for i in range(len(self.ds)):
            image_id, text_id, raw = self.ds.get_pair(i)
            self.texts.setdefault(text_id, raw)
        logger.info("gallery: %d images, %d candidate texts",
                    len(self.gallery_ids), len(self.texts))

    def search_by_text(self, query: str, topk: int = 8):
        tok = tokenize([preprocess_text(query)])
        f = np.asarray(self._txt_fn(self.params, jnp.asarray(tok)))[0]
        scores = self.gallery @ f
        order = np.argsort(-scores)[:topk]
        return [(int(self.gallery_ids[i]), float(scores[i])) for i in order]

    def rank_texts_for_image(self, image_id: int, topk: int = 8):
        raw, ok = self.ds.imgs.decode_jpeg_batch(
            np.asarray([image_id], np.uint64), self.resolution)
        f = np.asarray(self._img_fn(self.params, self.batch_stats,
                                    jnp.asarray(raw)))[0]
        ids = sorted(self.texts)
        tok = tokenize([preprocess_text(self.texts[t]) for t in ids])
        tf = np.asarray(self._txt_fn(self.params, jnp.asarray(tok)))
        scores = tf @ f
        order = np.argsort(-scores)[:topk]
        return [(self.texts[ids[i]], float(scores[i])) for i in order]


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    args = parse_args(argv)
    engine = RetrievalEngine(args)

    if args.cli is not None:
        for image_id, score in engine.search_by_text(args.cli, args.topk):
            print(f"image_id={image_id}  score={score:.4f}")
        return

    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed — interactive REPL (empty line to quit):")
        while True:
            q = input("query> ").strip()
            if not q:
                return
            for image_id, score in engine.search_by_text(q, args.topk):
                print(f"  image_id={image_id}  score={score:.4f}")

    def text_search(q):
        import io
        from PIL import Image
        out = []
        for image_id, score in engine.search_by_text(q, args.topk):
            raw = engine.ds.imgs.get(image_id)
            out.append((Image.open(io.BytesIO(raw)), f"{image_id} ({score:.3f})"))
        return out

    ui = gr.Interface(fn=text_search, inputs=gr.Textbox(label="中文查询"),
                      outputs=gr.Gallery(label="检索结果"),
                      title="NanS-CLIP TPU 检索演示")
    ui.launch(server_port=args.port)


if __name__ == "__main__":
    main()
