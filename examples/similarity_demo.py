"""Minimal similarity demo — the reference README's first example
(README_En.md:200-216) on this framework.

  python examples/similarity_demo.py --image pokemon.jpeg --ckpt clip_cn_vit-b-16.pt

With the published ViT-B-16 checkpoint the probabilities should be
approximately [1.27e-3, 5.44e-2, 6.80e-4, 9.44e-1] for
["杰尼龟", "妙蛙种子", "小火龙", "皮卡丘"].
"""

import argparse

import jax
import numpy as np
from PIL import Image

import nans_clip_tpu as nc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--ckpt", required=True, help=".pt checkpoint path")
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--texts", nargs="+",
                   default=["杰尼龟", "妙蛙种子", "小火龙", "皮卡丘"])
    p.add_argument("--quantize", default=None, choices=[None, "int8",
                                                        "int8-text"],
                   help="weight-only int8 serving (1.21-1.45x batch-1 "
                        "text latency; see utils/quantize.py)")
    args = p.parse_args()

    model, preprocess = nc.load_from_name(
        args.ckpt, vision_model_name=args.vision_model,
        text_model_name=args.text_model, input_resolution=args.resolution)
    if args.quantize:
        from nans_clip_tpu.utils.quantize import towers_for_mode
        model = model.quantize(towers=towers_for_mode(args.quantize))

    image = preprocess(Image.open(args.image))[None]
    tokens = nc.tokenize(args.texts)

    logits_per_image, _ = model.get_similarity(image, tokens)
    probs = np.asarray(jax.nn.softmax(logits_per_image, axis=-1))[0]
    for text, prob in zip(args.texts, probs):
        print(f"  {text}: {prob:.6f}")


if __name__ == "__main__":
    main()
