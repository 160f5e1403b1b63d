"""Build npack datasets from the reference's raw input format.

Input (identical to reference preprocess/build_lmdb_dataset.py:43-95):
  ``{split}_texts.jsonl`` — lines of {"text_id": int, "text": str,
  "image_ids": [int, ...]}
  ``{split}_imgs.tsv``    — lines of "<image_id>\t<urlsafe-b64 JPEG>"

Output per split directory:
  ``imgs.npack``  — image_id -> raw JPEG bytes
  ``pairs.npack`` — pair index -> (image_id, text_id, raw_text)
  (one pair record per text x image_id, matching the reference's 1:N
  expansion)

Usage:
  python -m nans_clip_tpu.preprocess.build_dataset \
      --data-dir DIR --splits train,valid
"""

from __future__ import annotations

import argparse
import base64
import json
import os

from nans_clip_tpu.data.npack import NPackWriter, encode_pair


def _stable_id(v) -> int:
    """Numeric ids pass through; string ids (the reference's
    dataset_transform keeps raw filenames) hash with a process-stable
    digest (lmdb_to_npack._image_key), never the salted builtin hash."""
    from nans_clip_tpu.preprocess.lmdb_to_npack import _image_key
    return _image_key(v)


def build_split(data_dir: str, split: str, out_dir: str | None = None) -> dict:
    out_dir = out_dir or os.path.join(data_dir, split)
    os.makedirs(out_dir, exist_ok=True)

    imgs_tsv = os.path.join(data_dir, f"{split}_imgs.tsv")
    texts_jsonl = os.path.join(data_dir, f"{split}_texts.jsonl")

    n_images = 0
    with NPackWriter(os.path.join(out_dir, "imgs.npack")) as w:
        with open(imgs_tsv, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                image_id, b64 = line.split("\t", 1)
                w.put(_stable_id(image_id), base64.urlsafe_b64decode(b64))
                n_images += 1

    n_pairs = 0
    with NPackWriter(os.path.join(out_dir, "pairs.npack")) as w:
        with open(texts_jsonl, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                for image_id in obj["image_ids"]:
                    w.put(n_pairs, encode_pair(_stable_id(image_id),
                                               _stable_id(obj["text_id"]),
                                               obj["text"]))
                    n_pairs += 1

    meta = {"num_samples": n_pairs, "num_images": n_images, "split": split}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def build_split_lmdb(data_dir: str, split: str, out_dir: str | None = None) -> dict:
    """Build the split in the REFERENCE's LMDB layout (same record formats
    as preprocess/build_lmdb_dataset.py:43-95: pairs pickle tuples keyed by
    index + num_samples, imgs urlsafe-b64 keyed by image_id + num_images),
    via the in-tree LMDB engine — for interop with reference tooling."""
    import pickle

    from nans_clip_tpu.data import lmdb_store

    out_dir = out_dir or os.path.join(data_dir, "lmdb", split)
    env_pairs = lmdb_store.open(os.path.join(out_dir, "pairs"),
                                map_size=1 << 32)
    env_imgs = lmdb_store.open(os.path.join(out_dir, "imgs"),
                               map_size=1 << 32)
    tp = env_pairs.begin(write=True)
    n_pairs = 0
    with open(os.path.join(data_dir, f"{split}_texts.jsonl"), encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            for image_id in obj["image_ids"]:
                tp.put(str(n_pairs).encode(),
                       pickle.dumps((image_id, obj["text_id"], obj["text"])))
                n_pairs += 1
    tp.put(b"num_samples", str(n_pairs).encode())
    tp.commit()
    ti = env_imgs.begin(write=True)
    n_images = 0
    with open(os.path.join(data_dir, f"{split}_imgs.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            image_id, b64 = line.split("\t", 1)
            ti.put(image_id.encode(), b64.encode())
            n_images += 1
    ti.put(b"num_images", str(n_images).encode())
    ti.commit()
    env_pairs.close()
    env_imgs.close()
    return {"num_samples": n_pairs, "num_images": n_images, "split": split,
            "format": "lmdb", "out_dir": out_dir}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--splits", default="train,valid")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--format", choices=["npack", "lmdb"], default="npack",
                    help="npack = this framework's store; lmdb = the "
                         "reference's on-disk layout (interop)")
    args = ap.parse_args()
    build = build_split if args.format == "npack" else build_split_lmdb
    for split in args.splits.split(","):
        meta = build(args.data_dir, split,
                     os.path.join(args.out_dir, split) if args.out_dir else None)
        print(f"{split}: {meta}")


if __name__ == "__main__":
    main()
