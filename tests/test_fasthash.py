"""Parity gates for the vectorized DuckDB hash kernels (functions/fasthash).

Every value the text stack produces is keyed on md5, and every SQL oracle
recomputes those keys in DuckDB — so the vectorized kernels must be
bit-identical to the hashlib construction they replace. These tests enforce
that, including unicode, empties, and whitespace edge cases.
"""

import hashlib

import numpy as np
import pytest

from asterixdb_analytics_ray.functions import fasthash as fh
from asterixdb_analytics_ray.pipelines.textops import _shingle_hashes

CASES = [
    "hello world foo bar",
    "",
    "single",
    "two words",
    "héllo wörld 你好 🙂",
    "  leading and   trailing  ",
    "tab\tand\nnewline separated words",
    "a " * 500,
    "repeat repeat repeat repeat",
]


def _py_md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def test_md5_hex_parity():
    got = fh.md5_hex(CASES).to_pylist()
    want = [hashlib.md5(s.encode()).hexdigest() for s in CASES]
    assert got == want


def test_sha256_hex_parity():
    got = fh.sha256_hex(CASES).to_pylist()
    want = [hashlib.sha256(s.encode()).hexdigest() for s in CASES]
    assert got == want


def test_md5_prefix_u64_parity():
    got = fh.md5_prefix_u64(CASES)
    want = np.array([_py_md5_u64(s) for s in CASES], dtype=np.uint64)
    assert got.dtype == np.uint64
    assert np.array_equal(got, want)


def test_empty_inputs():
    assert len(fh.md5_hex([])) == 0
    assert fh.md5_prefix_u64([]).shape == (0,)
    h, lens = fh.shingle_hashes_batch([], k=3)
    assert len(h) == 0 and len(lens) == 0


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_shingle_hashes_batch_matches_per_doc(k):
    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(50)] + ["naïve", "中文", "x"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for _ in range(200)
    ] + CASES
    h, lens = fh.shingle_hashes_batch(texts, k=k)
    assert lens.sum() == len(h)
    parts = np.split(h, np.cumsum(lens)[:-1])
    for t, got in zip(texts, parts):
        want = _shingle_hashes(t, k)
        assert np.array_equal(got, want), t[:60]


def test_word_hashes_batch_parity():
    texts = CASES
    h, n = fh.word_hashes_batch(texts)
    assert n.sum() == len(h)
    parts = np.split(h, np.cumsum(n)[:-1])
    for t, got in zip(texts, parts):
        want = np.array([_py_md5_u64(w) for w in t.split()], dtype=np.uint64)
        assert np.array_equal(got, want)


def test_pandas_series_input():
    import pandas as pd

    s = pd.Series(CASES, index=np.arange(10, 10 + len(CASES)))  # odd index
    got = fh.md5_prefix_u64(s)
    want = np.array([_py_md5_u64(x) for x in CASES], dtype=np.uint64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k", [2, 3])
def test_shingle_hashes_batch_multiset(k):
    texts = CASES + ["a b a b a b", "x x x", "one two one two one"]
    h, lens = fh.shingle_hashes_batch(texts, k=k, unique=False)
    assert lens.sum() == len(h)
    parts = np.split(h, np.cumsum(lens)[:-1])
    for t, got in zip(texts, parts):
        words = t.split()
        if not words:
            want = []
        elif len(words) < k:
            want = [" ".join(words)]
        else:
            want = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        want = np.array([_py_md5_u64(s) for s in want], dtype=np.uint64)
        # multiset equality (order within doc unspecified)
        assert np.array_equal(np.sort(got), np.sort(want)), t[:60]
