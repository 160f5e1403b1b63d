"""C++ tokenizer parity vs the Python implementation (and thus the golden
reference vectors)."""

import json
import os
import random

import numpy as np
import pytest

from nans_clip_tpu.data.fast_tokenizer import get_fast_tokenizer
from nans_clip_tpu.tokenizer import get_tokenizer, tokenize

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokenizer.json")

ft = get_fast_tokenizer()
pytestmark = pytest.mark.skipif(ft is None, reason="native tokenizer unavailable")


def test_golden_parity():
    with open(GOLDEN, encoding="utf-8") as f:
        golden = json.load(f)
    for case in golden:
        assert ft.encode(case["text"]) == case["ids"], case["text"]


def test_batch_framing_matches_python():
    texts = ["西湖美景", "", "Hello 世界", "宋" * 100]
    out = ft.encode_batch(texts, 52)
    ref = tokenize(texts, 52)
    np.testing.assert_array_equal(out, ref)


def test_random_fuzz_parity():
    pt = get_tokenizer()
    rng = random.Random(7)
    alphabet = "南宋古籍绘画佛经abcXYZ019, .!?？。¥$#@[]（）café é 　驪"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        assert ft.encode(s) == pt.encode(s), repr(s)


def test_final_sigma_matches_python():
    """CPython's str.lower applies the Unicode Final_Sigma rule (word-final
    greek capital sigma lowers to U+03C2); the native tokenizer's
    per-codepoint table used to always produce U+03C3."""
    tok = get_tokenizer()
    for text in ["ΚΑΛΟΣ", "ΟΔΥΣΣΕΥΣ ΚΑΙ ΣΙΣΥΦΟΣ", "ΣΣ", "Σ", "abcΣ def",
                 "ΚΑΛΟΣ。国", "χΣω", "ΚΑΛΟΣ' δ", "Σ3"]:
        assert ft.encode(text) == tok.encode(text), text
