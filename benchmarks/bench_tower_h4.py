"""ViT-H tower-vs-per-block at batch 4 — validates TOWER_MAX_RESTREAMS
for the W=1280 cell (tile=1 means b=4 re-streams the 1.26 GB of layer
weights 4x; the b<=4*tile gate was measured on lighter towers where the
restream is cheap relative to the saved activation round trips)."""

from __future__ import annotations

import json

import numpy as np

from bench_tower_h import BATCH, build, drive  # noqa: F401  (same harness)
import bench_tower_h


def main():
    import nans_clip_tpu.ops.tower_kernel as tk

    bench_tower_h.BATCH = 4
    orig_tile = tk.tower_batch_tile
    tk.tower_batch_tile = lambda *a, **k: 0
    try:
        fn, one, params, x = bench_tower_h.build()
        ref = np.asarray(one(params, x))
        ms_block = bench_tower_h.drive(fn, params, x)
    finally:
        tk.tower_batch_tile = orig_tile
    print(f"per-block  batch-4 ViT-H image: {ms_block:.3f} ms/call")

    assert tk.fits_tower(4, 257, 1280, 5120, 2)  # the gate routes it today
    fn2, one2, _, _ = bench_tower_h.build()
    out = np.asarray(one2(params, x))
    rel = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
    ms_tower = bench_tower_h.drive(fn2, params, x)
    print(f"tower      batch-4 ViT-H image: {ms_tower:.3f} ms/call  rel={rel:.2e}")
    print(json.dumps({
        "metric": "tower_h_batch4", "per_block_ms": round(ms_block, 3),
        "tower_ms": round(ms_tower, 3),
        "speedup": round(ms_block / ms_tower, 3), "rel_err": float(rel)}))


if __name__ == "__main__":
    main()
