"""Vectorized md5/sha256 kernels (embedded DuckDB, bit-identical to hashlib).

The text stack keys everything on md5 so each operator's DuckDB SQL oracle
can recompute the exact same values (see ``sql_oracle``).  Round 3 noted the
cost: ``hashlib.md5`` per shingle/token is a Python-loop bottleneck that caps
per-worker token throughput.  These helpers keep the md5 contract but run the
digest as ONE vectorized call per batch through DuckDB's C++ md5/sha256
kernel over a zero-copy Arrow registration — ~3-5× the hashlib loop, with no
change to any produced value (parity is pytest-enforced against hashlib,
including unicode and empty strings).

Per-worker state: one cached in-process DuckDB connection with ``threads=1``
(a Ray map_batches task/actor owns one CPU slot; DuckDB must not fan out
underneath it) and insertion-order preservation on (the default — asserted
here because row order IS the doc alignment).

Reference parity anchor: the oracles' ``('0x'||substr(md5(s),1,16))::UBIGINT``
construction (sql_oracle.py) — same engine, same kernel, same bytes.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa

_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        c = duckdb.connect()
        c.execute("SET threads=1")
        c.execute("SET preserve_insertion_order=true")
        _CON = c
    return _CON


def _as_arrow(strings) -> pa.ChunkedArray | pa.Array:
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        return strings
    if hasattr(strings, "to_numpy") and not isinstance(strings, pa.Array):
        # pandas Series — go through numpy object to avoid index baggage
        return pa.array(strings.to_numpy(), pa.string())
    return pa.array(strings, pa.string())


def _run(strings, expr: str) -> pa.ChunkedArray:
    arr = _as_arrow(strings)
    if len(arr) == 0:
        return pa.chunked_array([[]], type=pa.string())
    con = _con()
    tbl = pa.table({"s": arr})
    con.register("__fasthash_in", tbl)
    try:
        out = con.execute(f"SELECT {expr} AS h FROM __fasthash_in").arrow()
    finally:
        con.unregister("__fasthash_in")
    return out["h"]


def md5_hex(strings) -> pa.ChunkedArray:
    """md5 hex digests (lowercase), one vectorized call for the whole batch."""
    return _run(strings, "md5(s)")


def sha256_hex(strings) -> pa.ChunkedArray:
    """sha256 hex digests (lowercase), vectorized."""
    return _run(strings, "sha256(s)")


def md5_prefix_u64(strings) -> np.ndarray:
    """uint64 = first 8 bytes (big-endian) of md5(utf8(s)).

    Bit-identical to ``int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
    "big")`` and to DuckDB ``('0x'||substr(md5(s),1,16))::UBIGINT`` — the
    shared hash of the shingle/MinHash/SimHash/CMS/sampling stack."""
    arr = _as_arrow(strings)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    out = _run(arr, "('0x' || substr(md5(s), 1, 16))::UBIGINT")
    return out.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)


# ---------------------------------------------------------------------------
# batched word k-gram shingling (the all-C path: Arrow split -> Arrow k-gram
# join -> DuckDB md5; no per-doc Python in the hot loop)
# ---------------------------------------------------------------------------


def split_words(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch: returns (flat_words: object ndarray,
    n_words_per_doc: int64 ndarray), matching Python ``str.split()``
    (runs of whitespace collapse; leading/trailing produce nothing)."""
    import pandas as pd

    s = texts if isinstance(texts, pd.Series) else pd.Series(texts)
    toks = s.str.split()
    n = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = toks.explode().dropna().to_numpy(dtype=object)
    return flat, n


def shingle_hashes_batch(
    texts, k: int = 3, unique: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-k-gram md5-prefix hashes for a whole batch.

    Returns ``(hashes, lens)`` where ``hashes`` is the concatenation of each
    doc's shingle hashes and ``lens[i]`` is doc i's count.  With
    ``unique=True`` (default) each doc's hashes are sorted unique —
    ``np.split(hashes, np.cumsum(lens)[:-1])`` reproduces
    ``[_shingle_hashes(t, k) for t in texts]`` exactly (pytest-enforced).
    With ``unique=False`` every occurrence is kept (multiset semantics, for
    repetition metrics); within-doc order is positional for full docs with
    the short-doc shingle appended last.

    Docs with fewer than k words contribute one shingle (all words joined),
    empty docs contribute none — same contract as ``_shingle_hashes``.
    """
    import pyarrow.compute as pc

    flat, n = split_words(texts)
    n_docs = len(n)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs, dtype=np.int64)

    doc = np.repeat(np.arange(n_docs, dtype=np.int64), n)
    wa = pa.array(flat, pa.string())

    m = len(flat) - k + 1
    if m > 0:
        # k-gram start positions valid where the k-th word is the same doc
        ok = doc[:m] == doc[k - 1 :]
        cols = [wa.slice(i, m) for i in range(k)]
        grams = pc.binary_join_element_wise(*cols, " ")
        grams = pc.filter(grams, pa.array(ok))
        gram_doc = doc[:m][ok]
    else:
        grams = pa.array([], pa.string())
        gram_doc = np.empty(0, dtype=np.int64)

    # short docs (0 < n_words < k): one shingle = all words joined
    short = np.flatnonzero((n > 0) & (n < k))
    if len(short):
        starts = np.cumsum(n) - n
        extra = [
            " ".join(flat[starts[i] : starts[i] + n[i]]) for i in short
        ]
        grams = pa.concat_arrays(
            [grams.combine_chunks() if isinstance(grams, pa.ChunkedArray) else grams,
             pa.array(extra, pa.string())]
        )
        gram_doc = np.concatenate([gram_doc, short.astype(np.int64)])

    h = md5_prefix_u64(grams)
    if not unique:
        # multiset semantics: keep every occurrence, grouped by doc
        # (stable sort keeps positional order; short-doc extras are last)
        order = np.argsort(gram_doc, kind="stable")
        return h[order], np.bincount(gram_doc, minlength=n_docs).astype(
            np.int64
        )
    # per-doc sorted unique, vectorized: lexsort then boundary-keep
    order = np.lexsort((h, gram_doc))
    h = h[order]
    gd = gram_doc[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (gd[1:] != gd[:-1]) | (h[1:] != h[:-1])
    h = h[keep]
    gd = gd[keep]
    lens = np.bincount(gd, minlength=n_docs).astype(np.int64)
    return h, lens


def word_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-unigram md5-prefix hashes (NOT uniqued — SimHash votes
    weight repeated words).  Returns (hashes, n_words_per_doc)."""
    flat, n = split_words(texts)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), n
    return md5_prefix_u64(pa.array(flat, pa.string())), n


def round_like_sql(x, decimals: int = 9):
    """Round half AWAY from zero — DuckDB/ANSI ``round()`` semantics
    (``sign(x)·floor(|x|·10^d + 0.5)/10^d``, the exact double-op sequence
    DuckDB executes), unlike ``np.round``'s half-to-even. Needed when a
    pipeline's values can land EXACTLY on a rounding boundary (e.g.
    personalized PageRank: teleport 0.15 times powers of 0.85 over
    power-of-two out-degrees terminates in decimal), where the two
    conventions diverge by one output ulp and the driver's hash compare
    fails on bit-identical inputs."""
    import numpy as np

    p = 10.0**decimals
    ax = np.abs(x)
    return np.sign(x) * np.floor(ax * p + 0.5) / p
