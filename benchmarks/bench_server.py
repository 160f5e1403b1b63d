"""Chip measurement: serving-daemon round trip with the r4 native decode.

Recorded r4 results (PARITY.md serving section): text batch-1 34.5 ms;
image 224px native 71.3 / fast 64.2 / pil 72.9 ms; image 1080p native
109.0 / fast 87.3 / pil 131.3 ms; native-vs-pil feature diff 0.0.

Starts the daemon in-process (jit backend, ViT-B-16 random ckpt, batch-1
bucket), measures /encode_text and /encode_image round trips for a 224px
and a 1080p JPEG, for native / fast / PIL decode modes (toggled directly
on the service object between measurement blocks — same process, same
compiled program, so the device term is shared and the decode delta is
isolated)."""
import base64
import io
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import torch
from PIL import Image

from ref_loader import load_reference_clip


def make_ckpt(path):
    ref_mod = load_reference_clip()
    vk = json.load(open("/root/reference/cn_clip/clip/model_configs/ViT-B-16.json"))
    tk = json.load(open("/root/reference/cn_clip/clip/model_configs/"
                        "RoBERTa-wwm-ext-base-chinese.json"))
    torch.manual_seed(0)
    m = ref_mod.CLIP(**{**vk, **tk}).float()
    torch.save({"state_dict": m.state_dict()}, path)


CKPT = "/tmp/b16_server.pt"
make_ckpt(CKPT)

from nans_clip_tpu.deploy.server import ClipService, make_server
from nans_clip_tpu.eval.model_io import load_eval_model

cfg, params, batch_stats, options = load_eval_model(
    "ViT-B-16", "RoBERTa-wwm-ext-base-chinese", CKPT, "bf16")
service = ClipService(cfg, params, batch_stats, options, max_batch=1,
                      dynamic_batching=False)
srv = make_server(service, "127.0.0.1", 18123)
threading.Thread(target=srv.serve_forever, daemon=True).start()

import urllib.request


def post(path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:18123{path}", json.dumps(obj).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


rs = np.random.RandomState(0)
img224 = rs.randint(0, 256, (224, 224, 3), np.uint8)
y, x = np.mgrid[0:1080, 0:1920]
img1080 = (np.stack([x % 256, y % 256, (x + y) % 256], -1)
           + rs.randint(0, 30, (1080, 1920, 3))).clip(0, 255).astype(np.uint8)


def b64(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


b224, b1080 = b64(img224), b64(img1080)

# warm (compiles)
post("/encode_text", {"texts": ["预热"]})
post("/encode_image", {"images": [b224]})
print("warmup done", flush=True)


def bench(path, obj, n=50):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        post(path, obj)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    return (f"mean {ts.mean():.1f} median {np.median(ts):.1f} "
            f"p95 {np.percentile(ts, 95):.1f} ms")


print("text batch-1:", bench("/encode_text", {"texts": ["南宋官窑青瓷"]}),
      flush=True)
for mode, nat, fast in (("native", True, False), ("fast", True, True),
                        ("pil", False, False)):
    service.native_decode = nat
    service.fast_decode = fast
    print(f"image 224px [{mode}]:",
          bench("/encode_image", {"images": [b224]}), flush=True)
    print(f"image 1080p [{mode}]:",
          bench("/encode_image", {"images": [b1080]}), flush=True)

# feature identity native vs pil through the daemon
service.native_decode = True
service.fast_decode = False
f1 = post("/encode_image", {"images": [b1080]})["features"]
service.native_decode = False
f2 = post("/encode_image", {"images": [b1080]})["features"]
print("native-vs-pil feature max diff:",
      float(np.abs(np.asarray(f1) - np.asarray(f2)).max()))
print("BENCH_DONE")
