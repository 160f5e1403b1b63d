"""CLI tests for the two standalone preprocess scripts.

* ``dataset_transform`` — competition CSV -> (tsv + jsonl) converter
  (reference ``dataset_transform.py``): deterministic split, non-numeric
  image-id hashing, missing-image skip, and the output actually feeds
  ``build_dataset.build_split``.
* ``transform_openai_weights`` — torch.jit archive -> plain state dict
  (reference ``preprocess/transform_openai_pretrain_weights.py``).
"""

import base64
import csv
import io
import json
import os

import numpy as np
import pytest


def _write_inputs(root, names):
    from PIL import Image
    img_dir = root / "imgs"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    for name in names:
        Image.fromarray(rs.randint(0, 255, (24, 24, 3), dtype=np.uint8)).save(
            img_dir / name, format="JPEG")
    csv_path = root / "data.csv"
    with open(csv_path, "w", encoding="utf-8", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image_id", "caption"])
        w.writeheader()
        for i, name in enumerate(names):
            w.writerow({"image_id": name, "caption": f"说明文字{i}"})
        # one row pointing at a file that doesn't exist: must be skipped
        w.writerow({"image_id": "missing.jpg", "caption": "no image"})
    return str(csv_path), str(img_dir)


def _read_split(out_dir, split):
    with open(os.path.join(out_dir, f"{split}_imgs.tsv"), encoding="utf-8") as f:
        imgs = [ln.split("\t", 1) for ln in f.read().splitlines()]
    with open(os.path.join(out_dir, f"{split}_texts.jsonl"), encoding="utf-8") as f:
        texts = [json.loads(ln) for ln in f.read().splitlines()]
    return imgs, texts


def test_dataset_transform_cli(tmp_path):
    from PIL import Image

    from nans_clip_tpu.preprocess.dataset_transform import main

    names = [f"{i}.jpg" for i in range(8)] + ["pic_a.jpg", "pic_b.jpg"]
    csv_path, img_dir = _write_inputs(tmp_path, names)
    out = str(tmp_path / "out")
    main(["--csv", csv_path, "--images-dir", img_dir, "--out-dir", out,
          "--test-size", "0.2", "--seed", "42"])

    ti, tt = _read_split(out, "train")
    vi, vt = _read_split(out, "valid")
    # 10 existing images split 8/2; the missing-image row was dropped
    assert len(ti) == len(tt) == 8
    assert len(vi) == len(vt) == 2
    # every id is numeric (non-numeric names were digest-hashed) and
    # pairs line up 1:1 between the two files
    for imgs, texts in ((ti, tt), (vi, vt)):
        for (img_id, b64), rec in zip(imgs, texts):
            int(img_id)
            assert rec["text_id"] == int(img_id)
            assert rec["image_ids"] == [int(img_id)]
            Image.open(io.BytesIO(base64.b64decode(b64)))  # decodable payload

    # deterministic: same seed -> identical files
    out2 = str(tmp_path / "out2")
    main(["--csv", csv_path, "--images-dir", img_dir, "--out-dir", out2,
          "--test-size", "0.2", "--seed", "42"])
    for split in ("train", "valid"):
        for suffix in ("imgs.tsv", "texts.jsonl"):
            with open(os.path.join(out, f"{split}_{suffix}")) as a, \
                    open(os.path.join(out2, f"{split}_{suffix}")) as b:
                assert a.read() == b.read()

    # the converted output feeds the npack builder end-to-end
    from nans_clip_tpu.data import PairDataset
    from nans_clip_tpu.preprocess.build_dataset import build_split
    build_split(out, "train")
    ds = PairDataset(os.path.join(out, "train"))
    assert len(ds) == 8


def test_transform_openai_weights_cli(tmp_path):
    torch = pytest.importorskip("torch")

    from nans_clip_tpu.preprocess.transform_openai_weights import main

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Linear(4, 3)

        def forward(self, x):
            return self.proj(x)

    raw = str(tmp_path / "jit_ckpt.pt")
    torch.jit.save(torch.jit.script(Tiny()), raw)
    main(["--raw-ckpt-path", raw])
    out = str(tmp_path / "jit_ckpt.state_dict.pt")
    assert os.path.isfile(out)
    sd = torch.load(out, map_location="cpu")
    assert set(sd) == {"proj.weight", "proj.bias"}
    assert sd["proj.weight"].shape == (3, 4)
