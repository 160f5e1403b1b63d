"""Data-pipeline throughput benchmark (host side).

Measures the native decode pool + C++ tokenizer against the pure-Python
fallbacks on a synthetic dataset — the loader must outrun the TPU step
(e.g. ViT-B/16 training consumes ~500 img/s/chip) or training is
input-bound.

  python -m nans_clip_tpu.data.bench_loader [--images 512] [--size 224]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tempfile
import time

import numpy as np


def build_synthetic(root: str, n: int, src_size: int = 400):
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    with open(os.path.join(root, "bench_imgs.tsv"), "w") as fi, \
            open(os.path.join(root, "bench_texts.jsonl"), "w", encoding="utf-8") as ft:
        for i in range(n):
            arr = rs.randint(0, 255, (src_size, src_size, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            fi.write(f"{i}\t{base64.urlsafe_b64encode(buf.getvalue()).decode()}\n")
            ft.write(json.dumps({"text_id": i, "text": f"南宋古籍绘画第{i}卷山水人物",
                                 "image_ids": [i]}, ensure_ascii=False) + "\n")
    from nans_clip_tpu.preprocess.build_dataset import build_split
    return build_split(root, "bench")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--threads", type=int, default=8)
    args = p.parse_args(argv)

    print(f"host CPUs: {os.cpu_count()} (decode-pool scaling needs >1)")
    root = tempfile.mkdtemp(prefix="nans_bench_")
    build_synthetic(root, args.images)

    from nans_clip_tpu.data import DataLoader, PairDataset
    from nans_clip_tpu.data.fast_tokenizer import get_fast_tokenizer
    from nans_clip_tpu.tokenizer import tokenize

    ds = PairDataset(os.path.join(root, "bench"))

    # decode throughput: native pool vs PIL
    keys = ds.imgs.keys()
    t0 = time.perf_counter()
    ds.imgs.decode_jpeg_batch(keys, args.size, args.threads)
    native = len(keys) / (time.perf_counter() - t0)
    r_py = type(ds.imgs)(ds.imgs.path, native=False)
    t0 = time.perf_counter()
    r_py.decode_jpeg_batch(keys, args.size, 1)
    pil = len(keys) / (time.perf_counter() - t0)
    print(f"decode+resize: native {native:.0f} img/s ({args.threads} threads) "
          f"vs PIL {pil:.0f} img/s -> {native / pil:.1f}x")

    # tokenizer throughput
    texts = [f"南宋古籍绘画第{i}卷山水人物图册设色绢本" for i in range(2000)]
    ft = get_fast_tokenizer()
    if ft:
        t0 = time.perf_counter()
        ft.encode_batch(texts, 52)
        fast = len(texts) / (time.perf_counter() - t0)
    else:
        fast = 0.0
    t0 = time.perf_counter()
    tokenize(texts, 52)
    py = len(texts) / (time.perf_counter() - t0)
    print(f"tokenize: native {fast:.0f} texts/s vs python {py:.0f} texts/s"
          + (f" -> {fast / py:.1f}x" if fast else " (native unavailable)"))

    # end-to-end loader
    loader = DataLoader(ds, batch_size=args.batch_size, decode_size=args.size,
                        shuffle=True, num_threads=args.threads)
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch.images.shape[0]
    dt = time.perf_counter() - t0
    print(f"loader end-to-end: {n / dt:.0f} samples/s "
          f"(batch {args.batch_size}, decode {args.size}px)")


if __name__ == "__main__":
    main()
