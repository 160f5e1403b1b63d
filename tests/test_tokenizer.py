"""Tokenizer golden-vector tests (vs reference bert_tokenizer output)."""

import json
import os

import numpy as np
import pytest

from nans_clip_tpu.tokenizer import Tokenizer, get_tokenizer, tokenize

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokenizer.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def test_vocab_size():
    assert get_tokenizer().vocab_size() == 21128


def test_special_ids():
    t = get_tokenizer()
    assert t.pad_id == 0
    assert t.cls_id == 101
    assert t.sep_id == 102
    assert t.vocab["[UNK]"] == 100


def test_golden_tokens(golden):
    t = get_tokenizer()
    for case in golden:
        assert t.tokenize(case["text"]) == case["tokens"], case["text"]
        assert t.encode(case["text"]) == case["ids"], case["text"]


def test_tokenize_framing():
    ids = tokenize("西湖美景", context_length=52)
    assert ids.shape == (1, 52)
    assert ids[0, 0] == 101  # [CLS]
    row = ids[0]
    n = int((row != 0).sum())
    assert row[n - 1] == 102  # [SEP]
    assert (row[n:] == 0).all()


def test_tokenize_truncation():
    # 100 CJK chars -> truncated to context_length-2 + CLS/SEP
    text = "宋" * 100
    ids = tokenize(text, context_length=52)
    assert ids.shape == (1, 52)
    assert (ids[0] != 0).all()
    assert ids[0, -1] == 102


def test_tokenize_batch():
    ids = tokenize(["西湖", "南宋古籍", "a photo"])
    assert ids.shape == (3, 52)
    assert (ids[:, 0] == 101).all()
    assert ids.dtype == np.int32
