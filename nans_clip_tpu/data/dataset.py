"""Sharded, prefetched dataset over npack stores.

Reference semantics preserved (training/data.py):
* dataset padded (wrapping from the start) so length is a multiple of the
  global batch (pad_dataset, data.py:118-121; asserted data.py:178);
* deterministic epoch-seeded shuffling for train AND validation (the
  reference shuffles val too, to avoid duplicate-text in-batch accuracy
  bias — data.py:162-165);
* per-process sharding by strided index (DistributedSampler equivalent);
* text preprocessing: lowercase + CJK curly-quote normalization
  (data.py:31-34), then WordPiece tokenization to ``context_length``.

TPU redesign: instead of N torch worker processes doing PIL decode +
augment, a background prefetch thread drives the C++ decode pool
(csrc/npack.cpp) which emits fixed-size uint8 RGB batches; normalization
and augmentation happen on device (data/augment.py) inside the jitted step.
"""

from __future__ import annotations

import json
import logging
import math
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from nans_clip_tpu.data.npack import NPackReader, decode_pair
from nans_clip_tpu.tokenizer import Tokenizer, get_tokenizer


def preprocess_text(text: str) -> str:
    """Adapt text to the Chinese BERT vocab (reference data.py:29-33)."""
    return text.lower().replace("“", '"').replace("”", '"')


class PairDataset:
    """imgs.npack + pairs.npack under one directory.

    Pointing it at a reference-built LMDB split (a directory containing
    ``pairs``/``imgs`` LMDB envs, training/data.py:43-46) converts it to
    npack in place on first use (preprocess/lmdb_to_npack.py)."""

    def __init__(self, path: str):
        assert os.path.isdir(path), f"dataset dir {path} does not exist"
        self.path = path
        if (not os.path.exists(os.path.join(path, "pairs.npack"))
                and os.path.isdir(os.path.join(path, "pairs"))):
            from nans_clip_tpu.preprocess.lmdb_to_npack import convert_split
            logging.info("converting LMDB split %s to npack (one-time)", path)
            convert_split(path)
        self.pairs = NPackReader(os.path.join(path, "pairs.npack"))
        self.imgs = NPackReader(os.path.join(path, "imgs.npack"))
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        else:
            self.meta = {"num_samples": len(self.pairs), "num_images": len(self.imgs)}
        self.num_samples = self.meta["num_samples"]
        self.num_images = self.meta["num_images"]

    def __len__(self) -> int:
        return self.num_samples

    def get_pair(self, i: int):
        _, raw = self.pairs.get_at(i % self.num_samples)
        return decode_pair(raw)


@dataclass
class Batch:
    images: np.ndarray      # uint8 [B, S, S, 3]
    texts: np.ndarray       # int32 [B, L]
    image_ids: np.ndarray   # int64 [B]
    text_ids: np.ndarray    # int64 [B]


def pad_len(n: int, global_batch: int) -> int:
    """Padded dataset length (reference pad_dataset, data.py:118-121)."""
    return max(1, math.ceil(n / global_batch)) * global_batch


class DataLoader:
    """Epoch iterator yielding fixed-size host batches for one process."""

    MAX_DECODE_RETRIES = 2

    def __init__(self, dataset: PairDataset, batch_size: int,
                 decode_size: int = 224, context_length: int = 52,
                 shuffle: bool = True, seed: int = 123, epoch: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 tokenizer: Optional[Tokenizer] = None,
                 num_threads: int = 8, prefetch: int = 2,
                 exact_decode: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.global_batch_size = batch_size * process_count
        self.decode_size = decode_size
        self.context_length = context_length
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = epoch
        self.process_index = process_index
        self.process_count = process_count
        self.tokenizer = tokenizer or get_tokenizer()
        # Native WordPiece (exact parity, ~8x faster) when buildable; only
        # for the default vocab — custom tokenizers use the Python path.
        self._fast_tok = None
        if tokenizer is None:
            from nans_clip_tpu.data.fast_tokenizer import get_fast_tokenizer
            self._fast_tok = get_fast_tokenizer()
        self.num_threads = num_threads
        self.prefetch = prefetch
        # exact_decode: full decode + PIL-bit-exact bicubic (the eval
        # transform's pixels) instead of the DCT-scaled bilinear fast path
        # — for byte-level parity with the reference's non-augment train
        # transform (training/data.py:85-90) at some host-decode cost
        self.exact_decode = exact_decode

        self.padded_len = pad_len(len(dataset), self.global_batch_size)
        self.num_batches = self.padded_len // self.global_batch_size
        self.num_samples = self.padded_len
        self.decode_failures = 0
        self.start_batch = 0

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """Position the next iteration at ``epoch``, optionally skipping its
        first ``start_batch`` per-process batches (mid-epoch resume: the
        epoch's shuffle order is a pure function of seed+epoch, so skipping
        is index arithmetic — the skipped records are never decoded)."""
        self.epoch = epoch
        self.start_batch = start_batch

    def _indices(self) -> np.ndarray:
        idx = np.arange(self.padded_len) % len(self.ds)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        return idx[self.process_index::self.process_count]

    def _tokenize(self, raw_texts) -> np.ndarray:
        if self._fast_tok is not None:
            return self._fast_tok.encode_batch(raw_texts, self.context_length)
        texts = np.zeros((len(raw_texts), self.context_length), np.int32)
        tok = self.tokenizer
        for j, raw in enumerate(raw_texts):
            ids = [tok.cls_id] + tok.encode(raw)[: self.context_length - 2] + [tok.sep_id]
            texts[j, : len(ids)] = ids
        return texts

    def _make_batch(self, idx: np.ndarray) -> Batch:
        idx = np.array(idx)
        pairs = [self.ds.get_pair(int(i)) for i in idx]
        image_ids = np.asarray([p[0] for p in pairs], np.int64)
        text_ids = np.asarray([p[1] for p in pairs], np.int64)
        raw_texts = [preprocess_text(p[2]) for p in pairs]
        decode = (self.ds.imgs.decode_jpeg_batch_pil if self.exact_decode
                  else self.ds.imgs.decode_jpeg_batch)
        images, ok = decode(
            image_ids.astype(np.uint64), self.decode_size, self.num_threads)
        # Corrupt/missing JPEGs: resample the whole pair (image AND caption,
        # keeping the pairing consistent) from a deterministically shifted
        # index; counted + logged rather than silently trained on zeros.
        for attempt in range(1, self.MAX_DECODE_RETRIES + 1):
            bad = np.flatnonzero(~ok)
            if bad.size == 0:
                break
            self.decode_failures += int(bad.size)
            failed_ids = image_ids[bad].tolist()
            n_ds = len(self.ds)
            off = (attempt * 9973) % n_ds
            if off == 0 and n_ds > 1:
                # the prime stride is an identity when n_ds divides it
                # (e.g. exactly 9973 samples) — fall back to a small shift
                off = attempt % n_ds or 1
            idx[bad] = (idx[bad] + off) % n_ds
            for j in bad:
                p = self.ds.get_pair(int(idx[j]))
                image_ids[j], text_ids[j] = p[0], p[1]
                raw_texts[j] = preprocess_text(p[2])
            re_imgs, re_ok = decode(
                image_ids[bad].astype(np.uint64), self.decode_size,
                self.num_threads)
            images[bad] = re_imgs
            ok[bad] = re_ok
            logging.warning(
                "decode failed for image_ids %s; resampled (%d total failures)",
                failed_ids[:8], self.decode_failures)
        if not ok.all():
            logging.warning("decode still failing after %d retries for "
                            "image_ids %s; training on zero images",
                            self.MAX_DECODE_RETRIES,
                            image_ids[~ok][:8].tolist())
        texts = self._tokenize(raw_texts)
        return Batch(images=images, texts=texts, image_ids=image_ids,
                     text_ids=text_ids)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Batch]:
        indices = self._indices()
        n = self.num_batches
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that watches the stop event: a consumer that
            # abandons the iterator mid-epoch (max_steps break, preemption)
            # must not leave the producer blocked in q.put forever, pinning
            # the batch buffers it holds
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in range(min(self.start_batch, n), n):
                    if stop.is_set():
                        return
                    sl = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    if not put(self._make_batch(sl)):
                        return
                put(None)
            except BaseException as e:  # surface in the consumer, don't hang it
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
