"""Text-analysis + deduplication pipelines over the ``documents`` table.

Beyond the reference's graph operators, these are the data-pipeline stages a
large-scale training corpus needs (SURVEY-adjacent scope): token counting,
fingerprinting, quality scoring, language ID, exact dedup, MinHash-LSH /
SimHash / n-gram-Jaccard near-dup. All are streaming ``map_batches`` stages
over Arrow batches; the only shuffles are the dedup groupbys and the LSH
band-bucket groupby.

Scale notes (100 TB corpus):
- per-batch work is vectorized (numpy / pyarrow.compute / pandas str ops) or
  tight per-doc loops over precomputed arrays; stateful pieces (hash seeds,
  language profiles) are built once and broadcast via ``ray.put``;
- exact dedup shuffles a 16-byte digest + doc id per row, never the text;
- MinHash-LSH shuffles (band_id, band_hash, doc_id) rows — bounded by
  docs × bands — and verifies candidate pairs with exact Jaccard inside the
  bucket group, so no quadratic pair blow-up outside hot buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import fasthash

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _tokens(texts: pd.Series) -> pd.Series:
    return texts.str.split()


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens) — whitespace tokenization, vectorized."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": _tokens(df["text"]).str.len().fillna(0).astype(np.int64),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, fingerprint) — md5 content digest (matches DuckDB ``md5``)."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": fasthash.md5_hex(t["text"]),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def quality_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_words, avg_word_len, stopword_ratio, score).

    Heuristic quality features: word count, mean word length, stopword ratio;
    score = words weighted down by stopword share. Deterministic and
    SQL-replicable (the DuckDB oracle uses the same closed formula).
    """
    return docs.map_batches(_quality_fn, batch_format="pandas")


def _quality_fn(df: pd.DataFrame) -> pd.DataFrame:
    """The per-doc quality kernel shared by ``quality_scores`` and
    ``quality_by_lang`` — one explode, two reduceat segment sums."""
    toks = _tokens(df["text"])
    n_words = toks.str.len().fillna(0).astype(np.int64)
    nw_np = n_words.to_numpy()
    # vectorized per-doc sums: one explode, two reduceat segment sums
    # (replaces two per-row Python lambdas)
    total_len = np.zeros(len(df), dtype=np.int64)
    stop = np.zeros(len(df), dtype=np.int64)
    flat = toks.explode().dropna()
    if len(flat):
        nz = nw_np > 0
        starts = np.cumsum(nw_np) - nw_np
        total_len[nz] = np.add.reduceat(
            flat.str.len().to_numpy(np.int64), starts[nz]
        )
        stop[nz] = np.add.reduceat(
            flat.isin(STOPWORDS).to_numpy().astype(np.int64), starts[nz]
        )
    nw = nw_np.astype(np.float64)
    safe = np.maximum(nw, 1.0)
    avg_len = np.round(total_len / safe, 6)
    stop_ratio = np.round(stop / safe, 6)
    score = np.round(nw * (1.0 - stop_ratio), 6)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_words": n_words,
            "avg_word_len": avg_len,
            "stopword_ratio": stop_ratio,
            "score": score,
        }
    )


def repetition_scores(docs: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """(doc_id, n_grams, n_unique, max_gram_count, dup_fraction) — within-doc
    repetition / boilerplate signal: the duplicate word-k-gram fraction
    (Gopher-style repetition filter; Rae et al. 2021).

    ``dup_fraction = 1 - n_unique/n_grams`` over the doc's k-gram MULTISET
    (so templated/boilerplate text scores high), ``max_gram_count`` is the
    hottest single k-gram's multiplicity. Pure map-side: whole-batch shingle
    hashing (multiset variant), then per-doc run-length stats off one
    lexsort — no shuffle, no per-doc Python. Docs with zero k-grams
    (empty/whitespace text) are omitted, matching the oracle's ``unnest``.

    Reference parity anchor: the reference has no corpus-quality analytics
    (SURVEY §2.5 covers its MR utilities); this extends the LLM-pipeline
    operator set alongside ``quality_scores``."""

    def fn(df: pd.DataFrame) -> pa.Table:
        h, lens = fasthash.shingle_hashes_batch(df["text"], k, unique=False)
        n_docs = len(df)
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        order = np.lexsort((h, doc))
        hs, ds = h[order], doc[order]
        run = np.ones(len(hs), dtype=bool)
        run[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
        run_starts = np.flatnonzero(run)
        run_doc = ds[run_starts]
        run_counts = np.diff(np.append(run_starts, len(hs)))
        n_unique = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
        max_cnt = np.zeros(n_docs, dtype=np.int64)
        if len(run_doc):
            first = np.ones(len(run_doc), dtype=bool)
            first[1:] = run_doc[1:] != run_doc[:-1]
            firsts = np.flatnonzero(first)
            max_cnt[run_doc[firsts]] = np.maximum.reduceat(run_counts, firsts)
        m = lens > 0
        dup = np.round(1.0 - n_unique[m] / lens[m].astype(np.float64), 6)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[m]),
                "n_grams": pa.array(lens[m]),
                "n_unique": pa.array(n_unique[m]),
                "max_gram_count": pa.array(max_cnt[m]),
                "dup_fraction": pa.array(dup),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, text) keeping the MINIMUM doc_id per distinct text.

    Content-addressed dedup: the full 256-bit sha256 digest is the document
    identity AND the only shuffle key — the text never rides through the
    groupby (at 100 TB the digest column is ~64 B/row vs KB-scale texts).
    Winners (min doc_id per digest) are a tiny (h, doc_id) table; their texts
    are recovered with one int64-keyed hash join back to the corpus, where
    text moves once, as payload, never as a key. Digest equality == text
    equality at 2^-128 collision odds (standard content addressing).
    """
    from ray.data.aggregate import Min

    from ..stages.blocks import partitions_for, safe_join

    def digest(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": fasthash.sha256_hex(t["text"]),
            }
        )

    winners = (
        docs.map_batches(digest, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    out = safe_join(
        docs.select_columns(["doc_id", "text"]),
        winners,
        "inner",
        partitions_for(docs.count()),  # data-proportional (see blocks.py)
        on=("doc_id",),
    )
    return out.select_columns(["doc_id", "text"])


# ---------------------------------------------------------------------------
# language ID: char n-gram profiles (stateful 2-pass pipeline)
# ---------------------------------------------------------------------------


def _char_ngrams(text: str, n: int = 3) -> list[str]:
    t = f" {text.lower()} "
    return [t[i : i + n] for i in range(max(0, len(t) - n + 1))]


def _profile(texts: list[str], top: int = 300) -> dict[str, float]:
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        c.update(_char_ngrams(t))
    total = sum(c.values()) or 1
    # deterministic tie-break (count desc, gram asc) — Counter.most_common
    # breaks ties by insertion order, which no independent implementation
    # (e.g. the DuckDB oracle's row_number) could reproduce
    items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return {g: cnt / total for g, cnt in items}


@ray.remote
def _combine_gram_counts(final: bool, top: int, *tables) -> "pa.Table":
    """One node of the profile-count aggregation tree: concat partial
    (lang, gram, c) tables and re-combine with a pandas groupby-sum.
    After any first-level combine the output is bounded by the distinct
    (lang, gram) vocabulary — corpus-size independent. The root node
    (``final=True``) additionally reduces to the top-``top`` grams per
    language with ``_profile``'s exact weight (count / language total) and
    tie-break (count desc, gram asc)."""
    parts = [t for t in tables if t is not None and t.num_rows]
    if not parts:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "w" if final else "c": pa.array(
                    [], pa.float64() if final else pa.int64()
                ),
            }
        )
    df = (
        pa.concat_tables(parts)
        .to_pandas()
        .groupby(["lang", "gram"], sort=False, as_index=False)["c"]
        .sum()
    )
    if not final:
        return pa.Table.from_pandas(df, preserve_index=False)
    out = []
    for lang, g in df.groupby("lang", sort=False):
        total = int(g["c"].sum()) or 1
        g = g.sort_values(
            ["c", "gram"], ascending=[False, True], kind="mergesort"
        ).head(top)
        out.append(
            pd.DataFrame(
                {
                    "lang": g["lang"].to_numpy(),
                    "gram": g["gram"].to_numpy(),
                    "w": g["c"].to_numpy(np.float64) / total,
                }
            )
        )
    return pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False)


def language_id(
    docs: ray.data.Dataset, train_frac_seed: int = 7
) -> ray.data.Dataset:
    """(doc_id, pred_lang) — nearest char-trigram profile classifier.

    Pass 1 builds per-language trigram profiles from the labeled ``lang``
    column as a MULTI-LEVEL combine: per-block partial ``(lang, gram)``
    Counter tables → an aggregation TREE of plain Ray tasks (arity 8,
    pandas groupby-sum per node — the ``imru.tree_reduce`` shape) whose
    root also takes the top-300 per language. No task ever holds a
    language's corpus slice: after level 1 every table is bounded by the
    DISTINCT (lang, gram) vocabulary (kilobyte–megabyte scale, independent
    of corpus size), so the pass survives a 100 TB monolingual corpus
    (reference cost-shape analog: the sorted streaming group-by in
    ``jobgen/JobGen.java:1124-1215``). A Ray-Data ``groupby`` here measured
    ~9 s of pure hash-aggregate spin-up on a 63k-row combine — the task
    tree does the same combine in milliseconds. The counts, weights
    (count / language gram total), and (count desc, gram asc) tie-break
    are bit-identical to the original single-task ``Counter`` build, so
    predictions are unchanged. The profiles are broadcast via ``ray.put``
    and pass 2 scores every document in stateless tasks that fetch them
    zero-copy from the object store.
    """
    top = 300

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        # C-speed per-(block, lang) combine: Counter.update folds each doc's
        # gram list without materializing a per-occurrence DataFrame — the
        # tree then carries only DISTINCT (lang, gram) rows per block
        from collections import Counter

        out_l: list = []
        out_g: list = []
        out_c: list = []
        for lang, sub in df.groupby("lang", sort=False)["text"]:
            c: Counter = Counter()
            for t in sub:
                c.update(_char_ngrams(t))
            out_l.extend([lang] * len(c))
            out_g.extend(c.keys())
            out_c.extend(c.values())
        return pd.DataFrame(
            {
                "lang": pd.Series(out_l, dtype=object),
                "gram": pd.Series(out_g, dtype=object),
                "c": pd.Series(out_c, dtype=np.int64),
            }
        )

    partials = docs.map_batches(
        partial_counts, batch_format="pandas", batch_size=None
    ).materialize()
    refs = list(partials.to_arrow_refs())
    profiles: dict[str, dict[str, float]] = {}
    if refs:
        while True:
            last = len(refs) == 1
            refs = [
                _combine_gram_counts.remote(last, top, *refs[i : i + 8])
                for i in range(0, len(refs), 8)
            ]
            if last:
                break
        # root output is ≤ top·n_langs rows — the same size class as the
        # scoring matrix the driver assembles below
        prof_df = ray.get(refs[0]).to_pandas()
        for lang, g in prof_df.groupby("lang", sort=False):
            profiles[lang] = dict(zip(g["gram"], g["w"]))
    # pre-assemble the scoring matrix ONCE on the driver: combined gram
    # vocabulary (≤ top·n_langs rows) and a (|vocab| × n_langs) weight
    # matrix, broadcast together — the per-batch work is then one
    # vectorized Series.map lookup + one bincount + one matmul, no
    # per-doc/per-lang Python loops (the per-doc Counter scoring this
    # replaces was the last per-doc-Python corpus stage)
    langs = sorted(profiles)
    vocab: dict[str, int] = {}
    for lang in langs:
        for g_ in profiles[lang]:
            vocab.setdefault(g_, len(vocab))
    W = np.zeros((len(vocab), len(langs)))
    for j, lang in enumerate(langs):
        for g_, w in profiles[lang].items():
            W[vocab[g_], j] = w
    vocab_ser = pd.Series(
        np.arange(len(vocab), dtype=np.int64), index=list(vocab)
    )
    ref = ray.put((langs, vocab_ser, W))

    # plain tasks (broadcast profiles fetched zero-copy per task): an actor
    # pool would pin CPUs and can starve concurrent stages on small clusters
    def classify(df: pd.DataFrame) -> pd.DataFrame:
        langs, vocab_ser, W = ray.get(ref)
        nv, nl = len(vocab_ser), len(langs)
        n = len(df)
        grams_per_doc = [_char_ngrams(t) for t in df["text"]]
        counts = np.fromiter(
            (len(g) for g in grams_per_doc), dtype=np.int64, count=n
        )
        flat = [g_ for gs in grams_per_doc for g_ in gs]
        scores = np.zeros((n, nl))
        if flat:
            gid = pd.Series(flat).map(vocab_ser).to_numpy(np.float64)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            hit = ~np.isnan(gid)
            C = np.bincount(
                doc_of[hit] * nv + gid[hit].astype(np.int64),
                minlength=n * nv,
            ).reshape(n, nv)
            # normalization by doc total is a positive per-row scalar —
            # argmax-invariant, so it is skipped entirely
            scores = C.astype(np.float64) @ W
        # argmax takes the FIRST maximal column = smallest lang (columns
        # sorted), matching the oracle's (score DESC, lang ASC) tie-break
        pred = np.asarray(langs, dtype=object)[np.argmax(scores, axis=1)]
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})

    return docs.map_batches(classify, batch_format="pandas")


# ---------------------------------------------------------------------------
# near-duplicate detection
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (stable across processes).

    Hash = first 8 bytes of md5 (big-endian) so an independent SQL
    implementation (DuckDB ``md5``) reproduces the exact values — which is
    what lets the MinHash-LSH pipeline be oracle-checked end to end."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(out)


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: ray.data.Dataset, num_perm: int = 64, shingle_k: int = 3
) -> ray.data.Dataset:
    """(doc_id, sig: fixed-size-list<uint64>) MinHash signatures."""
    a, b = _minhash_params(num_perm)
    a_ref, b_ref = ray.put(a), ray.put(b)

    def sig(df: pd.DataFrame) -> pa.Table:
        a = ray.get(a_ref)
        b = ray.get(b_ref)
        P = len(a)
        # empty docs keep the identity signature (same as before)
        sigs = np.full((len(df), P), np.uint64((1 << 61) - 1), dtype=np.uint64)
        # whole-batch shingle hashing (vectorized md5), then per-doc
        # (a*x + b) mod p minima via chunked minimum.reduceat — identical
        # uint64 arithmetic to the old per-doc loop, no Python in the hot path
        h, lens = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        if h.size:
            starts = np.cumsum(lens) - lens
            nz_idx = np.flatnonzero(lens > 0)
            # cap the (shingles × perms) intermediate at ~64 MB
            rows_cap = max(1024, (64 << 20) // (P * 8))
            c0 = 0
            while c0 < len(nz_idx):
                c1, tot = c0, 0
                while c1 < len(nz_idx) and (
                    c1 == c0 or tot + lens[nz_idx[c1]] <= rows_cap
                ):
                    tot += lens[nz_idx[c1]]
                    c1 += 1
                d0, dl = nz_idx[c0], nz_idx[c1 - 1]
                lo, hi = starts[d0], starts[dl] + lens[dl]
                v = (a[None, :] * h[lo:hi, None] + b[None, :]) % _MERSENNE
                sigs[nz_idx[c0:c1]] = np.minimum.reduceat(
                    v, starts[nz_idx[c0:c1]] - lo, axis=0
                )
                c0 = c1
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1)), len(a)
                ),
            }
        )

    return docs.map_batches(sig, batch_format="pandas")


def shingle_sets(docs: ray.data.Dataset, shingle_k: int = 3) -> ray.data.Dataset:
    """(doc_id, sh: binary) — each doc's sorted-unique shingle hashes, packed
    as little-endian uint64 bytes (Acero hash joins carry binary payload
    columns but not list columns).

    The distributed verify side of the near-dup pipelines: computed once in a
    streaming ``map_batches`` pass, then hash-joined to candidate pairs by
    doc id, so no driver ever holds the corpus.
    """

    def fn(df: pd.DataFrame) -> pa.Table:
        h, lens = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        parts = np.split(h, np.cumsum(lens)[:-1])
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "sh": pa.array([p.tobytes() for p in parts], pa.binary()),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def _verify_pairs_distributed(
    cand: ray.data.Dataset,
    shingles: ray.data.Dataset,
    threshold: float,
    n_hint: int | None = None,
    measure: str = "jaccard",
) -> ray.data.Dataset:
    """Exact-Jaccard verification of (doc_a, doc_b) candidates, fully
    distributed: two int64-keyed hash joins pull each side's shingle set to
    the pair's row, then the Jaccard is computed inside the join task. The
    shingle sets move as join payload bounded by |candidates| — never the
    corpus, never through the driver (the round-1 broadcast-a-text-dict
    formulation is gone)."""
    from ..stages.blocks import effective_partitions, partitions_for, safe_join

    # zero candidates leave only schema-less empty blocks, which Acero's
    # join rejects ("no match for key field doc_a") — return a typed empty
    # result instead (a no-near-dup corpus is a normal outcome, not an error)
    cand = cand.materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    measure: pa.array([], pa.float64()),
                }
            )
        )
    P = partitions_for(n_hint) if n_hint else effective_partitions()
    a_side = shingles.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "sh_a": t["sh"]}),
        batch_format="pyarrow",
    )
    b_side = shingles.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "sh_b": t["sh"]}),
        batch_format="pyarrow",
    )
    joined = safe_join(
        safe_join(cand, a_side, "inner", P, on=("doc_a",)),
        b_side,
        "inner",
        P,
        on=("doc_b",),
    )

    def verify(t: pa.Table) -> pa.Table:
        sa_col = t["sh_a"].to_pylist()
        sb_col = t["sh_b"].to_pylist()
        jac = np.empty(t.num_rows)
        for i in range(t.num_rows):
            sa = np.frombuffer(sa_col[i], dtype=np.uint64)
            sb = np.frombuffer(sb_col[i], dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            if measure == "containment":
                den = min(len(sa), len(sb))
            else:
                den = len(sa) + len(sb) - inter
            jac[i] = inter / den if den else 0.0
        # threshold the UNROUNDED value (matching the SQL oracle's WHERE
        # clause exactly — both sides compute the identical IEEE division);
        # round only the projected column
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                measure: np.round(jac, 6),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_bucket: int = 512,
    salt_hot: bool = True,
) -> ray.data.Dataset:
    """Near-dup pairs (doc_a < doc_b, jaccard ≥ threshold) via MinHash-LSH.

    signatures → explode to (band_id, band_hash, doc_id) → bucket groupby →
    candidate pairs within buckets → DISTRIBUTED exact-Jaccard verification
    (candidates hash-joined to the per-doc shingle-set table — see
    ``_verify_pairs_distributed``) → dedup pairs.

    ``max_bucket`` bounds the quadratic candidate emission of a HOT bucket
    (a degenerate band hash — boilerplate/empty docs — puts k docs in one
    bucket and the exact contract emits k(k−1)/2 pairs inside ONE
    ``map_groups`` task; at corpus scale that serializes the pipeline and
    OOMs the worker — the analog of the reference's hot-MsgList frame
    segmentation, ``pregelix-api/.../graph/MsgList.java:34-81``).  Buckets
    over the limit are sorted by a hash of the FULL signature and chunked,
    emitting pairs only within chunks — identical/near-identical docs have
    equal signature hashes, sort adjacent, and keep their pairs, while
    collision-only crowds lose cross-chunk candidates (logged; every
    surviving pair is still exact-verified).  Buckets ≤ ``max_bucket`` are
    exact, so sane corpora (like the driver's) are unaffected.

    ``salt_hot`` (default on) bounds the bucket's ROW ingestion too: a
    pre-shuffle count pass (per-batch partial combine, so it ships only
    distinct band hashes per block) flags buckets over ``max_bucket`` and
    salts their shuffle key BEFORE the groupby —

    * by ``sig_hash % k`` (k = ⌈bucket/max_bucket⌉): equal/near-identical
      signatures still co-locate, collision-only crowds split across
      tasks (the same recall contract as the sorted chunking, enforced a
      shuffle earlier);
    * a signature CLASS that is itself over ``max_bucket`` (mass-identical
      docs — the run-``exact_dedup``-first case) is further spread by a
      doc-id hash into its own salt namespace, so even 1M identical docs
      land in ~max_bucket-row tasks (their cross-task pairs are dropped,
      as the chunking already dropped them — documented recall loss,
      warned on the DRIVER, and every surviving pair stays exact-verified).

    Sane corpora (like the driver's) have no over-cap buckets: the salt
    column is never added and results are bit-identical to ``salt_hot=
    False``.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_k)
    if salt_hot:
        # banded is consumed up to 3× (bucket counts, sig-class counts,
        # the pair shuffle) — materialize the signatures so only the cheap
        # numpy band hashing re-runs, never the md5 shingle pass
        sigs = sigs.materialize()

    def to_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sig = t["sig"].combine_chunks().flatten().to_numpy().reshape(n, num_perm)
        doc = t["doc_id"].to_numpy()
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.tile(doc, bands)
        hashes = np.empty(n * bands, dtype=np.uint64)
        for b_i in range(bands):
            seg = sig[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for r in range(rows_per_band):  # tiny fixed loop, vectorized inner
                h = h * np.uint64(1099511628211) + seg[:, r]
            hashes[b_i * n : (b_i + 1) * n] = h
        # full-signature hash: the hot-bucket sub-split key (equal for
        # identical signatures, so true near-dups sort adjacent)
        fh = np.zeros(n, dtype=np.uint64)
        for r in range(num_perm):
            fh = fh * np.uint64(1099511628211) + sig[:, r]
        # int64 VIEWS: Ray's sort/aggregate block machinery falls back to
        # pickled-object blocks on uint64 values ≥ 2^63 (observed at sf0.01:
        # 16 ArrowConversionError retries per run) — hash keys are opaque,
        # so reinterpret the bits (same idiom as the jaccard `sh` column)
        return pa.table(
            {
                "band_id": band_ids,
                "band_hash": hashes.view(np.int64),
                "doc_id": doc_rep,
                "sig_hash": np.tile(fh, bands).view(np.int64),
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow")

    group_keys = ["band_id", "band_hash"]
    if salt_hot:
        from ray.data.aggregate import Sum as _Sum

        def _bucket_counts(t: pa.Table) -> pa.Table:
            g = t.group_by(["band_id", "band_hash"]).aggregate(
                [("doc_id", "count")]
            )
            return g.rename_columns(["band_id", "band_hash", "c"])

        hot_df = (
            banded.map_batches(_bucket_counts, batch_format="pyarrow")
            .groupby(["band_id", "band_hash"])
            .aggregate(_Sum("c", alias_name="c"))
            .filter(expr=f"c > {max_bucket}")
            .to_pandas()
        )
        if len(hot_df):
            import warnings

            warnings.warn(
                f"[minhash-lsh] {len(hot_df)} hot LSH bucket(s) over "
                f"max_bucket={max_bucket} (largest {int(hot_df['c'].max())} "
                f"docs); salting their shuffle keys — cross-salt candidate "
                f"pairs are dropped (survivors remain exact-verified). Run "
                f"exact_dedup first if the corpus is mass-duplicated.",
                RuntimeWarning,
                stacklevel=2,
            )
            hot_ref = ray.put(hot_df[["band_id", "band_hash", "c"]])

            # signature classes that are THEMSELVES over the cap (counted
            # only among hot-bucket rows, so this aggregate stays small)
            def _sig_counts(df: pd.DataFrame) -> pd.DataFrame:
                hd = ray.get(hot_ref)
                m = df.merge(
                    hd[["band_id", "band_hash"]], on=["band_id", "band_hash"]
                )
                g = (
                    m.groupby(
                        ["band_id", "band_hash", "sig_hash"], sort=False
                    )
                    .size()
                    .rename("c2")
                    .reset_index()
                )
                g["c2"] = g["c2"].astype(np.int64)
                return g

            hot_sig_df = (
                banded.map_batches(_sig_counts, batch_format="pandas")
                .groupby(["band_id", "band_hash", "sig_hash"])
                .aggregate(_Sum("c2", alias_name="c2"))
                .filter(expr=f"c2 > {max_bucket}")
                .to_pandas()
            )
            hs_ref = ray.put(hot_sig_df) if len(hot_sig_df) else None
            KNUTH = np.uint64(0x9E3779B97F4A7C15)

            def add_salt(df: pd.DataFrame) -> pd.DataFrame:
                hd = ray.get(hot_ref)
                salt = np.zeros(len(df), dtype=np.int64)
                m = df.merge(hd, on=["band_id", "band_hash"], how="left")
                hot = m["c"].notna().to_numpy()
                if hot.any():
                    k = np.maximum(
                        1.0,
                        np.ceil(m["c"].to_numpy(np.float64)[hot] / max_bucket),
                    ).astype(np.uint64)
                    salt[hot] = (
                        df["sig_hash"].to_numpy().view(np.uint64)[hot] % k
                    ).astype(np.int64)
                if hs_ref is not None:
                    hs = ray.get(hs_ref)
                    m2 = df.merge(
                        hs, on=["band_id", "band_hash", "sig_hash"], how="left"
                    )
                    shot = m2["c2"].notna().to_numpy()
                    if shot.any():
                        k2 = np.maximum(
                            1.0,
                            np.ceil(
                                m2["c2"].to_numpy(np.float64)[shot]
                                / max_bucket
                            ),
                        ).astype(np.uint64)
                        spread = (
                            df["doc_id"].to_numpy()[shot].astype(np.uint64)
                            * KNUTH
                        ) % k2
                        cls = (
                            df["sig_hash"].to_numpy().view(np.uint64)[shot]
                            % np.uint64(65536)
                        ).astype(np.int64)
                        # negative namespace keeps mass-identical classes
                        # apart from the sig-salted rest of the bucket; a
                        # 16-bit class collision only merges two groups
                        # (extra candidates, all still exact-verified)
                        salt[shot] = -1 - (
                            cls * np.int64(1 << 32)
                            + spread.astype(np.int64)
                        )
                out = df.copy()
                out["salt"] = salt
                return out

            banded = banded.map_batches(add_salt, batch_format="pandas")
            group_keys = ["band_id", "band_hash", "salt"]

    def _hot_bucket_pairs(ids: np.ndarray, sig: np.ndarray) -> tuple:
        """Signature-sorted chunking for ONE over-cap bucket (see docstring).

        Rare by contract (sane corpora have no over-cap buckets), so a
        per-group Python call here is fine — the vectorized emitter below
        routes only size>max_bucket groups through this."""
        k = len(ids)
        order = np.lexsort((ids, sig.view(np.uint64) if sig.dtype == np.int64 else sig))
        ids = ids[order]
        dropped = k * (k - 1) // 2
        pa_, pb_ = [], []
        for s in range(0, k, max_bucket):
            c = ids[s : s + max_bucket]
            if len(c) < 2:
                continue
            ia, ib = np.triu_indices(len(c), k=1)
            pa_.append(c[ia])
            pb_.append(c[ib])
        a = np.concatenate(pa_) if pa_ else np.array([], dtype=ids.dtype)
        b = np.concatenate(pb_) if pb_ else np.array([], dtype=ids.dtype)
        dropped -= len(a)
        import warnings

        warnings.warn(
            f"[minhash-lsh] hot bucket: {k} docs > max_bucket={max_bucket}; "
            f"chunked by signature hash, {dropped} cross-chunk candidate "
            f"pairs dropped (survivors remain exact-verified). Raise "
            f"max_bucket (or run exact_dedup first) to avoid recall loss.",
            RuntimeWarning,
            stacklevel=2,
        )
        return np.minimum(a, b), np.maximum(a, b)

    # --- bucket-vectorized candidate emission -----------------------------
    # One pandas UDF per LSH bucket dies at many-small-buckets (the
    # sessionize/as-of lesson: ~80k buckets = ~80k Python calls). Instead,
    # shuffle by a HASH of the bucket key into ~NB coarse groups and emit
    # every contained bucket's pairs vectorized: sort by (bucket key,
    # doc_id), then for delta = 1.. emit (row, row+delta) pairs whose rows
    # share a bucket — O(Σ bucket_size · max_size) with zero per-bucket
    # Python. NB scales with the banded row count so one coarse group stays
    # ~2M rows regardless of corpus size.
    n_banded = docs.count() * bands
    NB = max(256, -(-n_banded // 2_000_000))
    KNUTH64 = np.uint64(0x9E3779B97F4A7C15)
    FNV = np.uint64(1099511628211)
    has_salt = "salt" in group_keys

    def add_bk(t: pa.Table) -> pa.Table:
        h = t["band_hash"].to_numpy().view(np.uint64) * KNUTH64
        h = h + t["band_id"].to_numpy().astype(np.uint64)
        if has_salt:
            h = h + t["salt"].to_numpy().astype(np.int64).astype(np.uint64) * FNV
        return t.append_column(
            "bk", pa.array((h % np.uint64(NB)).astype(np.int64))
        )

    def bucket_pairs_vec(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sig = g["sig_hash"].to_numpy()
        keys = [bid, bh] + ([g["salt"].to_numpy()] if has_salt else [])
        order = np.lexsort([ids] + keys[::-1])  # primary band_id … last doc
        bid, bh, ids, sig = bid[order], bh[order], ids[order], sig[order]
        newg = np.ones(len(g), dtype=bool)
        newg[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        if has_salt:
            st = keys[2][order]
            newg[1:] |= st[1:] != st[:-1]
        # de-dup doc within bucket (sorted, so equal docs are adjacent)
        keep = newg.copy()
        keep[1:] |= ids[1:] != ids[:-1]
        bid, bh, ids, sig, newg = (
            bid[keep], bh[keep], ids[keep], sig[keep], newg[keep],
        )
        gid = np.cumsum(newg) - 1
        sizes = np.bincount(gid)
        max_m = int(sizes.max()) if len(sizes) else 0
        out_a, out_b = [], []
        hot = sizes > max_bucket
        if hot.any():
            gstarts = np.cumsum(sizes) - sizes
            for gi in np.flatnonzero(hot):
                s, m = gstarts[gi], sizes[gi]
                a, b = _hot_bucket_pairs(ids[s : s + m], sig[s : s + m])
                out_a.append(a)
                out_b.append(b)
            cold = ~hot[gid]
            bid, ids, gid = bid[cold], ids[cold], gid[cold]
            max_m = int(sizes[~hot].max()) if (~hot).any() else 0
        for delta in range(1, max_m):
            same = gid[:-delta] == gid[delta:]
            if not same.any():
                break
            out_a.append(ids[:-delta][same])
            out_b.append(ids[delta:][same])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
            }
        )

    cand = (
        banded.map_batches(add_bk, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(bucket_pairs_vec, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .count()
        .drop_columns(["count()"])
    )
    sh = shingle_sets(docs, shingle_k).materialize()
    # partition hint by data VOLUME, not doc count: each shingle-set row
    # carries an ~8·|shingles| byte blob, so a doc-count hint under-partitions
    # the verify joins by the shingles-per-doc factor (~100-1000×).  128 B is
    # the per-row budget partitions_for's 50k-rows target implies (~6 MB per
    # aggregator partition).
    n_hint = max(docs.count(), (sh.size_bytes() or 0) // 128)
    return _verify_pairs_distributed(cand, sh, threshold, n_hint=n_hint)


def simhash_values(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash: uint64) — 64-bit SimHash over word-unigram hashes.

    The per-word hash is the first 8 bytes of md5 (big-endian), chosen so an
    independent SQL implementation (DuckDB ``md5``) can recompute the exact
    same values — the correctness oracle for this op."""

    def fn(df: pd.DataFrame) -> pa.Table:
        out = np.zeros(len(df), dtype=np.uint64)
        # whole-batch word hashing, then per-doc bit votes via doc-aligned
        # chunked reduceat (identical math to the old per-doc loop: a bit is
        # set iff strictly more than half the word hashes have it set)
        hs, n = fasthash.word_hashes_batch(df["text"])
        if len(hs):
            starts = np.cumsum(n) - n
            nz_idx = np.flatnonzero(n > 0)
            kbits = np.arange(64, dtype=np.uint64)[None, :]
            pows = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            rows_cap = max(1024, (64 << 20) // (64 * 8))  # ~64 MB bit matrix
            c0 = 0
            while c0 < len(nz_idx):
                c1, tot = c0, 0
                while c1 < len(nz_idx) and (
                    c1 == c0 or tot + n[nz_idx[c1]] <= rows_cap
                ):
                    tot += n[nz_idx[c1]]
                    c1 += 1
                d0, dl = nz_idx[c0], nz_idx[c1 - 1]
                lo, hi = starts[d0], starts[dl] + n[dl]
                bits = ((hs[lo:hi, None] >> kbits) & 1).astype(np.int64)
                ones = np.add.reduceat(bits, starts[nz_idx[c0:c1]] - lo, axis=0)
                votes = ones * 2 - n[nz_idx[c0:c1], None]
                out[nz_idx[c0:c1]] = ((votes > 0).astype(np.uint64) * pows).sum(
                    axis=1, dtype=np.uint64
                )
                c0 = c1
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()), "simhash": out})

    return docs.map_batches(fn, batch_format="pandas")


def simhash_dup_pairs(
    docs: ray.data.Dataset, max_dist: int = 3, bands: int = 4
) -> ray.data.Dataset:
    """Near-dup pairs (doc_a < doc_b, hamming(simhash) ≤ max_dist) — EXACT.

    Banding the 64-bit SimHash into ``bands`` equal slices guarantees (by
    pigeonhole) that any pair within ``max_dist < bands`` Hamming distance
    shares at least one identical band, so bucketing by (band_id, band_bits)
    + in-bucket verification finds every qualifying pair with no all-pairs
    scan — the standard SimHash retrieval layout at corpus scale. Shuffle
    rows are (band_id, band_bits, doc_id, simhash): docs × bands.
    """
    assert max_dist < bands, "pigeonhole exactness needs max_dist < bands"
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    sigs = simhash_values(docs)

    def to_bands(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy()
        doc = t["doc_id"].to_numpy()
        n = len(sh)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        bits = np.concatenate(
            [(sh >> np.uint64(b_i * width)) & mask for b_i in range(bands)]
        )
        return pa.table(
            {
                "band_id": band_ids,
                "band_bits": bits.astype(np.int64),
                "doc_id": np.tile(doc, bands),
                "simhash": np.tile(sh, bands).astype(np.int64),  # ride along
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        sh = sub["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(x)).count("1") for x in (sh[ia] ^ sh[ib])], dtype=np.int64
        )
        keep = ham <= max_dist
        return pd.DataFrame(
            {"doc_a": ids[ia][keep], "doc_b": ids[ib][keep], "hamming": ham[keep]}
        )

    from ray.data.aggregate import Min

    return (
        banded.groupby(["band_id", "band_bits"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_df: int | None = 100_000,
    measure: str = "jaccard",
) -> ray.data.Dataset:
    """Exact all-pairs word-k-gram Jaccard ≥ threshold — distributed.

    Inverted-index formulation (exact for any threshold > 0, since a pair
    with Jaccard > 0 must share a shingle):

      docs → (doc_id, shingle) exploded, unique per doc (streaming)
           → self-join on shingle (hash join) → (a < b) pair rows
           → groupby(a, b).count() = |A ∩ B|                (one wide shuffle)
           → join per-doc set sizes twice (tiny int64 joins)
           → jaccard = inter / (|A| + |B| − inter), filter ≥ threshold.

    No driver materialization and no O(N²) loop — cost is Σ df(s)² over
    shingle document-frequencies, the standard exact set-similarity-join
    bound. ``max_df`` bounds the bound: a per-batch-partial df count pass
    flags shingles whose document frequency exceeds it (a degenerate
    boilerplate stop-phrase would otherwise land its entire df²-pair
    postings group in ONE join partition), and hot postings get their join
    key salted by ``doc_id mod ⌈df/max_df⌉`` BEFORE the self-join — the
    same count-flag-then-salt contract as ``minhash_lsh_pairs`` /
    ``embeddings.cosine_dup_pairs_lsh``. Cross-salt candidate pairs whose
    ONLY shared shingles are hot are dropped (a ``RuntimeWarning`` reports
    it); every SURVIVING pair is re-verified with its full exact shingle
    sets (``_verify_pairs_distributed``), so reported jaccard values stay
    exact even though hot shingles no longer co-locate all their postings.
    ``max_df=None`` disables the count pass and salting entirely
    (lossless; the default cap never engages below ~10⁵-doc boilerplate).
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.blocks import partitions_for, safe_join

    def explode(df: pd.DataFrame) -> pa.Table:
        flat, counts = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        ids = df["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": np.repeat(ids, counts),
                # int64 view: Ray's hash-shuffle join keys on int64; values
                # are stable 64-bit hashes either way
                "sh": flat.view(np.int64),
            }
        )

    ex = docs.map_batches(explode, batch_format="pandas").materialize()
    P = partitions_for(ex.count())  # data-proportional (see blocks.py)

    hot_df = None
    if max_df is not None:
        # per-batch partial df counts (explode is unique-per-doc, so a
        # count of `sh` IS a document frequency) → tiny hot set on driver
        def df_partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["sh"]).aggregate([("doc_id", "count")])
            return g.rename_columns(["sh", "c"])

        hot_pdf = (
            ex.map_batches(df_partial, batch_format="pyarrow")
            .groupby("sh")
            .aggregate(Sum("c", alias_name="c"))
            .filter(expr=f"c > {max_df}")
            .to_pandas()
        )
        if len(hot_pdf):
            import warnings

            warnings.warn(
                f"[ngram-jaccard] {len(hot_pdf)} hot shingle(s) over "
                f"max_df={max_df} (largest df {int(hot_pdf['c'].max())}); "
                f"salting their postings keys by doc id — candidate pairs "
                f"whose only shared shingles are hot may be missed "
                f"(survivors stay exact-verified).",
                RuntimeWarning,
                stacklevel=2,
            )
            hot_pdf = hot_pdf.assign(
                k=np.ceil(hot_pdf["c"] / max_df).astype(np.int64)
            )
            hot_df = ray.put(hot_pdf[["sh", "k"]])

    if hot_df is not None:

        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            hd = ray.get(hot_df)
            df = df.merge(hd, on="sh", how="left")
            k = df.pop("k").fillna(1).astype(np.int64).to_numpy()
            doc = df["doc_id"].to_numpy().astype(np.uint64)
            df["salt"] = np.where(
                k > 1, doc % np.maximum(k.astype(np.uint64), 1), 0
            ).astype(np.int64)
            return df

        ex = ex.map_batches(add_salt, batch_format="pandas")
        join_on: tuple = ("sh", "salt")
        other = ex.map_batches(
            lambda t: pa.table(
                {"doc_b": t["doc_id"], "sh": t["sh"], "salt": t["salt"]}
            ),
            batch_format="pyarrow",
        )
    else:
        join_on = ("sh",)
        other = ex.map_batches(
            lambda t: pa.table({"doc_b": t["doc_id"], "sh": t["sh"]}),
            batch_format="pyarrow",
        )
    joined = safe_join(ex, other, "inner", P, on=join_on)

    def orient(t: pa.Table) -> pa.Table:
        a = t["doc_id"].to_numpy()
        b = t["doc_b"].to_numpy()
        keep = a < b
        return pa.table({"doc_a": a[keep], "doc_b": b[keep]})

    inter = (
        joined.map_batches(orient, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    if hot_df is not None:
        # salted join-count intersections UNDERCOUNT pairs that shared a
        # hot shingle cross-salt — recompute survivors' jaccard exactly
        # from their full shingle sets instead of the join counts
        cand = inter.select_columns(["doc_a", "doc_b"])
        return _verify_pairs_distributed(
            cand,
            shingle_sets(docs, shingle_k),
            threshold,
            n_hint=ex.count(),
            measure=measure,
        )

    sizes = ex.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    size_a = sizes.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "n_a": t["n_sh"]}),
        batch_format="pyarrow",
    )
    size_b = sizes.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "n_b": t["n_sh"]}),
        batch_format="pyarrow",
    )
    withsizes = safe_join(
        safe_join(inter, size_a, "inner", P, on=("doc_a",)),
        size_b,
        "inner",
        P,
        on=("doc_b",),
    )

    def finish(t: pa.Table) -> pa.Table:
        inter_c = t["inter"].to_numpy().astype(np.float64)
        if measure == "containment":
            den = np.minimum(t["n_a"].to_numpy(), t["n_b"].to_numpy()).astype(
                np.float64
            )
        else:
            den = (
                t["n_a"].to_numpy() + t["n_b"].to_numpy()
            ).astype(np.float64) - inter_c
        # unrounded threshold, rounded projection (mirrors the SQL oracle)
        jac = np.where(den > 0, inter_c / den, 0.0)
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                measure: np.round(jac, 6),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return withsizes.map_batches(finish, batch_format="pyarrow")


def containment_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_df: int | None = 100_000,
) -> ray.data.Dataset:
    """Asymmetric-duplicate detection via the overlap coefficient
    |A∩B| / min(|A|, |B|) over word-k-gram shingle sets: a document fully
    CONTAINED in a longer one scores 1.0 even when its Jaccard is tiny —
    the subset-dup case (quoted posts, boilerplate-wrapped articles,
    partial crawls) that Jaccard dedup misses in training corpora.

    → (doc_a < doc_b, containment) rows ≥ threshold; identical
    inverted-index + hot-shingle-salting plan as ``ngram_jaccard_pairs``
    (only the closing denominator differs)."""
    return ngram_jaccard_pairs(
        docs,
        threshold=threshold,
        shingle_k=shingle_k,
        max_df=max_df,
        measure="containment",
    )


def dup_shingle_stats(
    docs: ray.data.Dataset,
    shingle_k: int = 3,
    max_broadcast: int = 2_000_000,
) -> ray.data.Dataset:
    """Corpus-wide duplicated-shingle fraction per document — the
    RefinedWeb/Gopher-style "duplicated n-gram" quality signal: for each
    doc, the fraction of its DISTINCT word-k-gram shingles that also
    appear in at least one OTHER document (boilerplate, syndication,
    template text). Distinct from ``repetition_scores`` (within-doc
    duplication) and from pairwise dedup (this is a per-doc scalar, not a
    pair list).

    Plan (two bounded exchanges, no self-join):

      docs → (doc_id, sh) distinct-per-doc explode        (streaming)
           → per-batch partial (sh, c) counts → groupby(sh).sum = df
           → dup set = {sh : df ≥ 2}
           → |dup| ≤ ``max_broadcast``: broadcast the sorted uint64 array
             once (``ray.put``) and flag each doc's shingles map-side via
             ``searchsorted`` — per-doc partials → tiny groupby(doc_id)
             close (a doc's shingles can span split blocks);
             else: distributed hash join (sh → is_dup) + the same close.

    Docs with zero shingles (empty text) are absent, matching the SQL
    oracle's empty-unnest semantics. The engine counts 64-bit md5 shingle
    HASHES while the oracle counts the shingle STRINGS — hash-independent
    multiset identity, same methodology as ``ngram_jaccard_pairs``.
    Reference analog: the reference's df-count MR utility
    (FilterCount shape); scale note: both exchanges carry ≤ distinct
    shingles (pass 1) / ≤ docs (pass 2) rows, never the corpus text."""
    from ray.data.aggregate import Sum

    from ..stages.blocks import partitions_for, safe_join

    def explode(df: pd.DataFrame) -> pa.Table:
        flat, counts = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        ids = df["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": np.repeat(ids, counts), "sh": flat.view(np.int64)}
        )

    ex = docs.map_batches(explode, batch_format="pandas").materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["sh"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["sh", "c"])

    dfc = (
        ex.map_batches(df_partial, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Sum("c", alias_name="c"))
        .filter(expr="c >= 2")
        .select_columns(["sh"])
        .materialize()
    )
    n_dup = dfc.count()

    def close(partials: ray.data.Dataset) -> ray.data.Dataset:
        agg = partials.groupby("doc_id").aggregate(
            Sum("n", alias_name="n_shingles"), Sum("nd", alias_name="n_dup")
        )

        def finish(t: pa.Table) -> pa.Table:
            n = t["n_shingles"].to_numpy().astype(np.float64)
            nd = t["n_dup"].to_numpy().astype(np.float64)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_shingles": t["n_shingles"].cast(pa.int64()),
                    "n_dup": t["n_dup"].cast(pa.int64()),
                    "dup_frac": np.round(nd / n, 6),
                }
            )

        return agg.map_batches(finish, batch_format="pyarrow")

    if n_dup <= max_broadcast:
        dup_sorted = np.sort(
            dfc.to_pandas()["sh"].to_numpy().astype(np.int64)
        )
        dup_ref = ray.put(dup_sorted)

        def flag_partial(t: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)
            ids = t["doc_id"].to_numpy()
            sh = t["sh"].to_numpy()
            pos = np.searchsorted(dup, sh)
            is_dup = (pos < len(dup)) & (dup[np.minimum(pos, len(dup) - 1)] == sh)
            uids, inv = np.unique(ids, return_inverse=True)
            n = np.bincount(inv, minlength=len(uids))
            nd = np.bincount(inv, weights=is_dup, minlength=len(uids))
            return pa.table(
                {
                    "doc_id": uids,
                    "n": n.astype(np.int64),
                    "nd": nd.astype(np.int64),
                }
            )

        return close(ex.map_batches(flag_partial, batch_format="pyarrow"))

    # huge-dup-set path: distributed LEFT join (sh → marker), then the
    # identical per-batch partial + close
    P = partitions_for(ex.count())
    marked = safe_join(
        ex,
        dfc.map_batches(
            lambda t: pa.table(
                {"sh": t["sh"], "isd": np.ones(len(t), np.int64)}
            ),
            batch_format="pyarrow",
        ),
        "left_outer",
        P,
        on=("sh",),
    )

    def join_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        isd = t["isd"].to_numpy(zero_copy_only=False)
        is_dup = ~np.isnan(isd.astype(np.float64)) if isd.dtype.kind == "f" else (
            isd != 0
        )
        uids, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv, minlength=len(uids))
        nd = np.bincount(inv, weights=is_dup, minlength=len(uids))
        return pa.table(
            {
                "doc_id": uids,
                "n": n.astype(np.int64),
                "nd": nd.astype(np.int64),
            }
        )

    return close(marked.map_batches(join_partial, batch_format="pyarrow"))


def hll_registers(
    docs: ray.data.Dataset, b: int = 10, shingle_k: int = 3
) -> ray.data.Dataset:
    """HyperLogLog distinct-shingle sketch → its NON-EMPTY registers
    (reg: int32, rho: int32), a 2^b-register HLL over the corpus's word
    ``shingle_k``-gram hashes (the same 64-bit md5-prefix hashes the
    MinHash pipeline uses, so the fold is fully vectorized per batch).

    The classic mergeable sketch for web-scale distinct counting: each
    batch folds its shingles into a local 2^b register array (the
    per-block partial), the global combine is ``groupby(reg).max`` — at
    most 2^b rows ever shuffle, regardless of corpus size.  Register =
    top ``b`` hash bits, rho = leading-zero count of the remaining 64−b
    bits + 1 — recomputed EXACTLY by the SQL oracle (integer match; see
    ``sql_oracle.hll_registers_sql``).  ``hll_estimate`` turns the
    registers into the cardinality estimate (tested against the exact
    distinct count in pytest; the float estimator stays out of the
    integer-exact driver gate)."""
    from ray.data.aggregate import Max

    m = 1 << b
    shift = np.uint64(64 - b)
    mask = np.uint64((1 << (64 - b)) - 1)

    def fn(df: pd.DataFrame) -> pa.Table:
        regs = np.zeros(m, dtype=np.int32)
        # whole-batch shingle hashing; register folds don't need doc
        # boundaries (HLL is a pure set sketch), so process the flat array
        h, _lens = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        if len(h):
            idx = (h >> shift).astype(np.int64)
            v = h & mask
            bl = np.zeros(len(v), dtype=np.int32)  # bit_length, vectorized
            for s in (32, 16, 8, 4, 2, 1):
                big = v >= (np.uint64(1) << np.uint64(s))
                bl[big] += s
                v[big] >>= np.uint64(s)
            bl[v > 0] += 1
            rho = (int(shift) + 1 - bl).astype(np.int32)
            np.maximum.at(regs, idx, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "reg": nz.astype(np.int32),
                "rho": regs[nz],
            }
        )

    return (
        docs.map_batches(fn, batch_format="pandas")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(registers: "pa.Table | pd.DataFrame", b: int = 10) -> float:
    """Registers table → HLL cardinality estimate (Flajolet et al. 2007,
    64-bit hash: small-range linear counting, no large-range correction)."""
    df = registers.to_pandas() if hasattr(registers, "to_pandas") else registers
    m = 1 << b
    M = np.zeros(m)
    M[df["reg"].to_numpy()] = df["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m / np.sum(np.exp2(-M))
    V = int((M == 0).sum())
    if E <= 2.5 * m and V:
        E = m * np.log(m / V)
    return float(E)


def cms_registers(
    docs: ray.data.Dataset, depth: int = 4, width: int = 1024
) -> ray.data.Dataset:
    """Count-Min sketch over the corpus's token stream → its NON-EMPTY
    registers (r: int32, c: int32, n: int64). The mergeable heavy-hitter
    companion to ``hll_registers``: each batch folds its token counts into
    a local depth×width int64 array (the per-block partial), the global
    combine is ``groupby((r, c)).sum`` — at most depth·width rows ever
    shuffle, regardless of corpus size.

    Row hash r of a token = md5-prefix uint64 of ``f"{r} {token}"`` mod
    width — string-keyed like the shingle hashes, so the SQL oracle
    recomputes the registers integer-exactly (``sql_oracle
    .cms_registers_sql``). ``cms_estimate`` answers point queries (min
    over rows), upper-bounding the true count; pytest checks the bound and
    exactness for hot tokens."""

    def fn(df: pd.DataFrame) -> pa.Table:
        import pyarrow.compute as pc

        regs = np.zeros((depth, width), dtype=np.int64)
        flat, _n = fasthash.split_words(df["text"])
        if len(flat):
            vc = pd.Series(flat).value_counts(sort=False)
            toks = pa.array(vc.index.to_numpy(dtype=object), pa.string())
            cnts = vc.to_numpy(np.int64)
            for r in range(depth):
                # "{r} {token}" built vectorized, hashed in one md5 call
                keyed = pc.binary_join_element_wise(
                    pa.array([str(r)] * len(toks), pa.string()), toks, " "
                )
                h = fasthash.md5_prefix_u64(keyed)
                np.add.at(regs[r], (h % np.uint64(width)).astype(np.int64), cnts)
        r_idx, c_idx = np.nonzero(regs)
        return pa.table(
            {
                "r": r_idx.astype(np.int32),
                "c": c_idx.astype(np.int32),
                "n": regs[r_idx, c_idx],
            }
        )

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(fn, batch_format="pandas")
        .groupby(["r", "c"])
        .aggregate(Sum("n", alias_name="n"))
    )


def cms_estimate(
    registers: "pa.Table | pd.DataFrame",
    token: str,
    depth: int = 4,
    width: int = 1024,
) -> int:
    """Point-query the sketch: estimated count of ``token`` = min over
    rows of its register (classic CMS upper bound; Cormode–Muthukrishnan
    2005)."""
    df = registers.to_pandas() if hasattr(registers, "to_pandas") else registers
    lut = {(int(r), int(c)): int(n) for r, c, n in zip(df["r"], df["c"], df["n"])}
    est = []
    for r in range(depth):
        h = int.from_bytes(hashlib.md5(f"{r} {token}".encode()).digest()[:8], "big")
        est.append(lut.get((r, h % width), 0))
    return min(est)


def dup_clusters(
    docs: ray.data.Dataset,
    n_docs: int,
    threshold: float = 0.4,
    P: int | None = None,
    **lsh_kwargs,
) -> tuple[ray.data.Dataset, int]:
    """Near-dup cluster canonicalization — the standard corpus-dedup
    composition: MinHash-LSH dup pairs → connected components over the
    pair graph → one canonical doc per cluster.

    → ((doc_id, cluster_id, keep), cc_rounds) for every doc that appears
    in ≥1 dup pair; ``cluster_id`` = min doc_id in the doc's component,
    ``keep`` = 1 iff the doc IS the canonical representative. Docs with no
    near-dup are implicitly kept (absent from the output by design — at
    corpus scale the dup set is the small side, so the table a filter
    stage anti-joins against stays minimal; exactly how
    ``corpus.corpus_pipeline`` consumes its drop set).

    Plan shape: the pair graph reuses ``minhash_lsh_pairs`` (banded,
    salted, exact-verified) and components run on ``ShardedMinLabel`` —
    the CC scale path (per-shard state, no O(n) driver arrays during
    iteration). doc_ids must be dense 0..n_docs−1 (the corpus contract
    everywhere in this module). ``cc_rounds`` is returned so callers/tests
    can assert convergence within a fixed unroll bound (the oracle runs
    the same min-propagation unrolled).
    """
    from ..stages.partition import partition_edges
    from ..stages.sharded import ShardedMinLabel

    if P is None:
        P = min(16, max(2, n_docs // 2048))

    pairs = minhash_lsh_pairs(docs, threshold=threshold, **lsh_kwargs)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy().astype(np.int64)
        b = t["doc_b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    parts = partition_edges(edges, P)
    runner = ShardedMinLabel(n=n_docs, P=P)
    res = runner.run(parts)
    runner.shutdown()
    label_ref = ray.put(res.state["label"])

    def local_distinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": pc.unique(t["src"])})

    def attach(t: pa.Table) -> pa.Table:
        t = t.slice(0, 1)  # one row per doc_id group
        v = t["doc_id"].to_numpy().astype(np.int64)
        lab = ray.get(label_ref)[v]
        return pa.table(
            {
                "doc_id": v,
                "cluster_id": lab.astype(np.int64),
                "keep": (v == lab).astype(np.int64),
            }
        )

    out = (
        edges.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
    )
    return out, res.supersteps


def quality_by_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-language quality dashboard: → (lang, n_docs, mean_score,
    mean_stopword_ratio) — the slice-level rollup curation runs track
    (each language's corpus health at a glance).

    Per-batch: the shared ``_quality_fn`` kernel scores the batch, then a
    langs-bounded partial (n, Σscore, Σratio) folds — the shuffle is
    langs × blocks rows. Per-doc scores are the SAME rounded values the
    oracle computes, so only the Σ order differs (1e-6 grid, the
    windowed_counts precedent)."""
    from ray.data.aggregate import Sum

    from ..functions.fasthash import round_like_sql

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _quality_fn(df)
        q["lang"] = df["lang"].to_numpy()
        g = (
            q.groupby("lang", sort=False)
            .agg(n=("score", "size"), s=("score", "sum"),
                 r=("stopword_ratio", "sum"))
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("r", alias_name="r"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        nd = n.astype(np.float64)
        return pd.DataFrame(
            {
                "lang": df["lang"],
                "n_docs": n,
                "mean_score": round_like_sql(
                    df["s"].to_numpy(np.float64) / nd, 6
                ),
                "mean_stopword_ratio": round_like_sql(
                    df["r"].to_numpy(np.float64) / nd, 6
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


DEFAULT_SCRUB_TERMS: tuple[str, ...] = ("spark", "slow", "dup")


def scrub_terms(
    docs: ray.data.Dataset,
    terms: tuple[str, ...] = DEFAULT_SCRUB_TERMS,
    replacement: str = "<TERM>",
) -> ray.data.Dataset:
    """Blocklist term scrubbing: redact whole-word occurrences of ``terms``,
    returning ``(doc_id, n_hits, clean_text, clean_len)``.

    The training-data boilerplate/banned-term removal pass: unlike
    ``decontaminate`` (which DROPS matching documents) this REWRITES the
    text in place, so downstream stages see the cleaned corpus. Pure
    map-side — one compiled-RE2 pass per batch via
    ``pyarrow.compute.replace_substring_regex`` (zero-copy Arrow in/out,
    no Python row loop) and therefore shuffle-free at any scale.

    The word-boundary RE2 pattern is byte-identical between pyarrow and
    DuckDB (both RE2), so the oracle reproduces counts and the rewritten
    text exactly (``sql_oracle.scrub_terms_sql``).
    """
    pat = r"\b(?:" + "|".join(terms) + r")\b"

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = t["text"]
        clean = pc.replace_substring_regex(text, pat, replacement)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": pc.cast(pc.count_substring_regex(text, pat), pa.int64()),
                "clean_text": clean,
                "clean_len": pc.cast(pc.utf8_length(clean), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# segment-level exact dedup (the C4/RefinedWeb line/paragraph-dedup analog)
# ---------------------------------------------------------------------------


def segment_dedup(
    docs: ray.data.Dataset,
    seg_words: int = 10,
    seg_cap_bits: int = 20,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """Paragraph-level exact dedup, the C4/RefinedWeb line-dedup pass: split
    each document into consecutive ``seg_words``-token segments (this
    corpus is single-line, so the paragraph boundary is a fixed token
    window; on real data the same plan applies with a delimiter split),
    drop every segment whose exact text already occurred EARLIER in the
    corpus, and reassemble the survivors per document in original order.

    "Earlier" = the occurrence with minimum ``doc_id·2^seg_cap_bits +
    seg_idx`` (documents bounded at 2^(63-seg_cap_bits) ids and
    2^seg_cap_bits segments each — documented bound, same class as the
    Q2 combined key). Documents whose every segment is a duplicate
    disappear from the output (fully-duplicated docs dedup to nothing).

    → (doc_id, text_dedup, n_kept: int64, n_total: int64)

    Scale plan (three exchanges, text never rides a groupby key):

    1. digest pass — per batch: tokenize (``str.split`` ==
       DuckDB ``string_split_regex(trim, '\\s+')``), build segments, emit
       ONLY ``(h = sha256(seg), combined)`` (~72 B/row); ``groupby(h)``
       ``Min(combined)`` picks each distinct segment's first occurrence.
       Identical boilerplate segments collapse INTO the combine, so a
       million-copy segment costs one row per block after the partial.
    2. join-back — a second explode emits the full payload ``(combined,
       doc_id, seg_idx, seg, n_total)`` and inner-joins the winner set on
       ``combined`` — a UNIQUE int64 key, so the join is perfectly
       balanced no matter how hot a segment is (the h-keyed join would
       funnel a boilerplate segment's postings into one partition).
    3. reassembly — survivors bucket by ``doc_id % num_buckets`` and one
       vectorized pandas pass per BUCKET (not per doc) rebuilds
       ``text_dedup`` in segment order.

    The explode runs twice (digest + payload passes) — deliberate: pass 1
    ships only hashes, and re-running the cheap tokenize beats
    materializing an exploded copy of the whole corpus between passes.
    Reference cost-shape analog: the MR dedup groupbys
    (`pregelix/pregelix-core` shuffle jobs) with the combiner prune.
    """
    from ray.data.aggregate import Min

    from ..stages.blocks import partitions_for, safe_join

    cap = np.int64(1 << seg_cap_bits)

    def _segments(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        n = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy().astype(np.int64), n)
        flat = toks.explode().dropna().to_numpy(dtype=object)
        if not len(flat):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "seg_idx": pd.Series([], dtype=np.int64),
                    "seg": pd.Series([], dtype=object),
                    "n_total": pd.Series([], dtype=np.int64),
                }
            )
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, n)
        g = (
            pd.DataFrame(
                {
                    "doc_id": doc,
                    "seg_idx": pos // seg_words,
                    "tok": flat,
                }
            )
            .groupby(["doc_id", "seg_idx"], sort=False)["tok"]
            .agg(" ".join)
            .reset_index(name="seg")
        )
        tot = g.groupby("doc_id")["seg_idx"].size()
        g["n_total"] = g["doc_id"].map(tot).astype(np.int64)
        return g

    def digest(t: pa.Table) -> pa.Table:
        g = _segments(t.to_pandas())
        comb = g["doc_id"].to_numpy(np.int64) * cap + g["seg_idx"].to_numpy(
            np.int64
        )
        return pa.table(
            {
                "h": fasthash.sha256_hex(g["seg"])
                if len(g)
                else pa.array([], pa.string()),
                "combined": comb,
            }
        )

    winners = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(digest, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("combined", alias_name="combined"))
        .select_columns(["combined"])
    )

    def payload(t: pa.Table) -> pa.Table:
        g = _segments(t.to_pandas())
        comb = g["doc_id"].to_numpy(np.int64) * cap + g["seg_idx"].to_numpy(
            np.int64
        )
        return pa.table(
            {
                "combined": comb,
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "seg_idx": g["seg_idx"].to_numpy(np.int64),
                "seg": pa.array(g["seg"].tolist(), pa.string()),
                "n_total": g["n_total"].to_numpy(np.int64),
            }
        )

    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        payload, batch_format="pyarrow"
    )
    kept = safe_join(
        exploded,
        winners,
        "inner",
        partitions_for(docs.count()),
        on=("combined",),
    )

    def bucketize(t: pa.Table) -> pa.Table:
        b = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array(b % num_buckets, pa.int64())
        )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "seg_idx"])
        g = df.groupby("doc_id", sort=False)
        out = g["seg"].agg(" ".join).reset_index(name="text_dedup")
        out["n_kept"] = g.size().to_numpy().astype(np.int64)
        out["n_total"] = g["n_total"].first().to_numpy().astype(np.int64)
        return out

    return (
        kept.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reassemble, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# cross-source shingle-overlap matrix (corpus contamination forensics)
# ---------------------------------------------------------------------------


def source_overlap(
    docs: ray.data.Dataset,
    k: int = 3,
    max_sources: int = 62,
) -> ray.data.Dataset:
    """Pairwise shingle overlap between corpus SOURCES — which dumps/crawls
    share content (mirror sites, re-crawls, dataset contamination between
    providers): for every source pair, the number of distinct word-k-gram
    shingles both contain, plus the Jaccard of their shingle sets.

    → (src_a, src_b, shared: int64, jaccard) for src_a < src_b
    (lexicographic), one row per co-occurring pair.

    Scale plan — sources are BOUNDED (≤ ``max_sources``, asserted; 62 so
    the bitmask Sum below stays in int64), so the matrix is tiny even
    when the corpus is not:

    1. distinct (shingle-hash, source) pairs: per-batch dedup (combiner)
       → one composite-key groupby — the exchange carries distinct pairs
       per block, never the exploded shingle stream.
    2. per-shingle source BITMASK: each now-unique pair maps to
       ``1 << src_idx`` and ``groupby(h).Sum`` — Sum over unique powers
       of two IS bitwise-OR, so the stock Sum aggregate computes the
       exact source set with no custom combiner.
    3. pair counting: per batch, ``np.unique`` collapses identical masks
       (boilerplate shared by the same source set collapses to ONE
       row + count), then a loop over DISTINCT masks only (≤ min(2^S,
       rows/block)) scatters each mask's bit-pairs; (a,a) diagonal rows
       carry per-source set sizes. Partials close in a ≤ S²-row groupby.
    4. the ≤ S²-row result is finished driver-side (names + Jaccard =
       shared/(n_a + n_b − shared)) — a constant-bounded table by the
       max_sources contract.

    Hash-vs-string set identity: the engine counts 64-bit md5 shingle
    hashes, the oracle counts shingle strings (same methodology as
    ``ngram_jaccard_pairs``)."""
    from ray.data.aggregate import Sum

    # bounded source dictionary (one tiny distinct pass)
    src_names = sorted(
        r["source"]
        for r in docs.select_columns(["source"])
        .map_batches(
            lambda t: pa.table({"source": t["source"].unique()}),
            batch_format="pyarrow",
        )
        .groupby("source")
        .count()
        .select_columns(["source"])
        .take_all()
    )
    if len(src_names) > max_sources:
        raise ValueError(
            f"{len(src_names)} sources > max_sources={max_sources}; "
            "the int64 bitmask plan needs a bounded source dictionary — "
            "bucket sources first or raise max_sources (≤ 62)."
        )
    sidx = {s: i for i, s in enumerate(src_names)}
    sref = ray.put(sidx)

    def pairs_partial(t: pa.Table) -> pa.Table:
        idx = ray.get(sref)
        texts = t["text"].to_pandas()
        hashes, lens = fasthash.shingle_hashes_batch(texts, k=k, unique=True)
        src = t["source"].to_numpy(zero_copy_only=False)
        si = pd.Series(src).map(idx).to_numpy(np.int64)  # vectorized lookup
        h = hashes.astype(np.int64)  # reinterpret for arrow transport
        rows = pd.DataFrame(
            {"h": h, "sidx": np.repeat(si, lens)}
        ).drop_duplicates()
        return pa.Table.from_pandas(rows, preserve_index=False)

    distinct = (
        docs.select_columns(["source", "text"])
        .map_batches(pairs_partial, batch_format="pyarrow")
        .groupby(["h", "sidx"])
        .count()
    )

    masks = (
        distinct.map_batches(
            lambda t: pa.table(
                {
                    "h": t["h"],
                    "m": np.int64(1)
                    << t["sidx"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("h")
        .aggregate(Sum("m", alias_name="mask"))
    )

    def count_pairs(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(m, return_counts=True)
        a_out, b_out, c_out = [], [], []
        for v, c in zip(vals, cnts):
            bits = [i for i in range(len(src_names)) if v >> i & 1]
            for x in range(len(bits)):
                for y in range(x, len(bits)):
                    a_out.append(bits[x])
                    b_out.append(bits[y])
                    c_out.append(int(c))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "c": pa.array(c_out, pa.int64()),
            }
        )

    agg = (
        masks.map_batches(count_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("c", alias_name="shared"))
        .to_pandas()
    )  # ≤ S² rows by the max_sources contract — driver close is bounded

    diag = {
        int(r.a): int(r.shared) for r in agg.itertuples() if r.a == r.b
    }
    off = agg[agg.a < agg.b]
    na = off["a"].map(diag).to_numpy(np.int64)
    nb = off["b"].map(diag).to_numpy(np.int64)
    shared = off["shared"].to_numpy(np.int64)
    out = pa.table(
        {
            "src_a": pa.array(
                [src_names[int(i)] for i in off["a"]], pa.string()
            ),
            "src_b": pa.array(
                [src_names[int(i)] for i in off["b"]], pa.string()
            ),
            "shared": shared,
            "jaccard": shared.astype(np.float64)
            / (na + nb - shared).astype(np.float64),
        }
    )
    return ray.data.from_arrow(out)


def source_dup_rates(
    docs: ray.data.Dataset,
    threshold: float = 0.4,
) -> ray.data.Dataset:
    """Duplication hotspots by SOURCE: for every source, the count and
    fraction of its documents that participate in at least one MinHash
    near-duplicate pair — which dumps/providers need the aggressive dedup
    pass.

    → (source, n_docs: int64, dup_docs: int64, dup_rate), one closing
    division.

    Composition (no new shuffle machinery): the full banded-MinHash
    near-dup pipeline (``minhash_lsh_pairs``, salting and verification
    included) → the involved-doc set (both pair sides, combiner-deduped)
    → one join back to (doc_id, source) → a sources-bounded rollup
    against per-source totals."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.blocks import partitions_for, safe_join

    pairs = minhash_lsh_pairs(docs, threshold=threshold)

    def both_sides(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [
                t["doc_a"].cast(pa.int64()).combine_chunks(),
                t["doc_b"].cast(pa.int64()).combine_chunks(),
            ]
        )
        return pa.table({"doc_id": pc.unique(ids)})

    involved = (
        pairs.map_batches(both_sides, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .select_columns(["doc_id"])
    )

    flagged = safe_join(
        docs.select_columns(["doc_id", "source"]),
        involved,
        "inner",
        partitions_for(docs.count()),
        on=("doc_id",),
    )

    def dup_partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        g = pd.Series(src).value_counts()
        return pa.table(
            {
                "source": pa.array(g.index.to_numpy()),
                "dup_docs": g.to_numpy().astype(np.int64),
            }
        )

    def tot_partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        g = pd.Series(src).value_counts()
        return pa.table(
            {
                "source": pa.array(g.index.to_numpy()),
                "n_docs": g.to_numpy().astype(np.int64),
            }
        )

    dups = (
        flagged.map_batches(dup_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("dup_docs", alias_name="dup_docs"))
    )
    totals = (
        docs.select_columns(["source"])
        .map_batches(tot_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .materialize()
    )

    joined = safe_join(
        totals, dups, "left_outer", 2, on=("source",)
    )

    def close(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy().astype(np.int64)
        d = t["dup_docs"].to_numpy(zero_copy_only=False)
        d = np.where(np.isnan(d.astype(np.float64)), 0, d).astype(np.int64)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": n,
                "dup_docs": d,
                "dup_rate": d.astype(np.float64) / n.astype(np.float64),
            }
        )

    return joined.map_batches(close, batch_format="pyarrow")
