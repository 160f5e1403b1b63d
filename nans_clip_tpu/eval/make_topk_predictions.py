"""kNN top-k retrieval over extracted features.

Reference behavior (eval/make_topk_predictions.py:69-88): per text query,
tiled matmul over image-feature chunks, global sort, top-10 jsonl. TPU
redesign: the whole query set runs as batched jitted matmuls + on-device
``lax.top_k`` over the full gallery — one [Q_chunk, N] MXU contraction per
chunk instead of a Python loop per query.

Output line format is identical: {"text_id": ..., "image_ids": [...]}
(or the transposed {"image_id": ..., "text_ids": [...]} in --tr mode).
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-feats", required=True)
    p.add_argument("--text-feats", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--eval-batch-size", type=int, default=1024,
                   help="query chunk size")
    p.add_argument("--output", required=True)
    p.add_argument("--tr", action="store_true",
                   help="image-to-text retrieval (the _tr variant)")
    return p.parse_args(argv)


def load_feats(path: str, id_key: str):
    ids, feats = [], []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            ids.append(obj[id_key])
            feats.append(obj["feature"])
    return np.asarray(ids), np.asarray(feats, np.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_scores(queries: jax.Array, gallery: jax.Array, k: int):
    k = min(k, gallery.shape[0])  # galleries smaller than k (ref sorts all)
    # exact fp32 contraction: the TPU default runs bf16 passes, which can
    # swap near-tie ranks at the k boundary vs the reference's fp32 torch
    # matmul (the pipeline-parity test promises IDENTICAL top-k lists)
    scores = jnp.matmul(queries, gallery.T,
                        precision=jax.lax.Precision.HIGHEST)
    return jax.lax.top_k(scores, k)


def topk(query_ids, query_feats, gallery_ids, gallery_feats, k, chunk):
    """Yields (query_id, [gallery ids ranked]) for all queries."""
    n = len(query_ids)
    gallery = jnp.asarray(gallery_feats)
    for i in range(0, n, chunk):
        q = query_feats[i:i + chunk]
        pad = chunk - len(q)
        if pad:
            q = np.concatenate([q, np.zeros((pad, q.shape[1]), q.dtype)])
        _, idx = _topk_scores(jnp.asarray(q), gallery, k)
        idx = np.asarray(idx)[: chunk - pad]
        for qid, row in zip(query_ids[i:i + chunk], idx):
            yield qid, gallery_ids[row].tolist()


def main(argv=None):
    args = parse_args(argv)
    image_ids, image_feats = load_feats(args.image_feats, "image_id")
    text_ids, text_feats = load_feats(args.text_feats, "text_id")

    with open(args.output, "w") as fout:
        if args.tr:
            for qid, ranked in topk(image_ids, image_feats, text_ids, text_feats,
                                    args.top_k, args.eval_batch_size):
                fout.write(json.dumps({"image_id": int(qid), "text_ids": ranked}) + "\n")
        else:
            for qid, ranked in topk(text_ids, text_feats, image_ids, image_feats,
                                    args.top_k, args.eval_batch_size):
                fout.write(json.dumps({"text_id": int(qid), "image_ids": ranked}) + "\n")
    print(f"Top-{args.top_k} predictions are saved in {args.output}")


if __name__ == "__main__":
    main()
