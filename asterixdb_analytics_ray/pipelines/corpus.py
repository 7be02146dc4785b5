"""Corpus-statistics operators over the ``documents`` table: token heavy
hitters, per-document TF-IDF top terms, deterministic hash sampling, exact
per-language length quantiles, eval-set decontamination, group-wise argmax
dedup, and unigram LM quality scoring.

These round out the training-data-pipeline surface next to the dedup /
quality stack in ``textops.py`` (reference analog: the Hadoop MR utility
jobs in ``pregelix-example/.../utils/`` — FilterCount, FindLargest,
VertexAggregator — which are exactly count/top-k/sample shapes).

Scale notes (100 TB corpus):
- every stage does its heavy reduction per batch (partial counts) before
  the groupby, so shuffle volume is bounded by distinct keys per block,
  not rows;
- ``hash_sample`` is pure map-side: no shuffle, restart-safe (the keep
  decision is a deterministic function of doc_id alone), and the SQL
  oracle recomputes the identical md5-prefix hash;
- ``length_quantiles`` reduces to a (lang, n_tokens) histogram — bounded
  by distinct lengths, not documents — so the driver-side quantile pick
  touches a kilobyte-scale table no matter the corpus size;
- ``tfidf_top_terms`` ranks by the integer key (tf DESC, df ASC, token)
  so the selected row set cannot be perturbed by float ulp differences
  between numpy and the SQL oracle; the tfidf score itself is emitted
  rounded to 9 decimals.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions import fasthash
from ..stages.blocks import partitions_for, safe_join


def _explode_tokens(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, token, tf) — whitespace tokenization (matches DuckDB
    ``string_split_regex(trim(text), '\\s+')``), tf counted batch-locally
    (each document is a single row, so its term frequencies are complete
    within the batch — no shuffle needed for tf)."""
    toks = df["text"].str.split()
    n = toks.str.len().fillna(0).astype(np.int64)
    flat = pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), n.to_numpy()),
            # .str.split() yields NaN for null text — (lst or []) would
            # raise on the truthy float; guard with an isinstance check
            "token": [
                t
                for lst in toks
                for t in (lst if isinstance(lst, list) else [])
            ],
        }
    )
    if not len(flat):
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "token": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        flat.groupby(["doc_id", "token"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    out["tf"] = out["tf"].astype(np.int64)
    return out


def top_tokens(docs: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Global token heavy hitters: (token, n) for the k most frequent
    tokens, ties broken by token ascending (both deterministic and
    SQL-reproducible).

    Per-batch ``value_counts`` is the local combine (stepPartial), the
    ``groupby(token).sum`` is the final combine (stepFinal) — shuffle rows
    are bounded by distinct tokens per block. The final sort+limit runs
    over the aggregated vocabulary table only."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame(
            {"token": counts.index.astype(object), "n": counts.to_numpy(np.int64)}
        )

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def _bigram_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial adjacent-pair counts: (w1, w2, cnt). Whitespace
    tokenization identical to ``_explode_tokens``; pairs never cross a
    document boundary (documents are atomic rows)."""
    toks = df["text"].str.split()
    lists = [lst if isinstance(lst, list) else [] for lst in toks]
    flat = np.array([t for lst in lists for t in lst], dtype=object)
    empty = pd.DataFrame(
        {
            "w1": pd.Series([], dtype=object),
            "w2": pd.Series([], dtype=object),
            "cnt": pd.Series([], dtype=np.int64),
        }
    )
    if flat.size < 2:
        return empty
    ends = np.cumsum([len(lst) for lst in lists])
    last = np.zeros(len(flat), dtype=bool)
    last[ends - 1] = True  # empty docs mark an already-last position (or -1
    # = the global last token) — both are last-of-doc anyway
    keep = np.flatnonzero(~last)
    if len(keep) == 0:
        return empty
    out = (
        pd.DataFrame({"w1": flat[keep], "w2": flat[keep + 1]})
        .groupby(["w1", "w2"], sort=False)
        .size()
        .rename("cnt")
        .reset_index()
    )
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def bigram_pmi(
    docs: ray.data.Dataset,
    k: int = 50,
    min_count: int = 5,
    max_broadcast_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Top-``k`` collocations by pointwise mutual information:
    (w1, w2, cnt, pmi) with pmi = ln((c12/B) / ((c1/U)·(c2/U))) over
    adjacent whitespace-token pairs (U = total tokens, B = total bigrams),
    restricted to pairs with c12 ≥ ``min_count``; ties broken (pmi desc,
    w1, w2). PMI per Church & Hanks, "Word association norms, mutual
    information, and lexicography", Computational Linguistics 16(1), 1990.

    Scale: both count tables are built with per-batch partials (shuffle
    rows bounded by distinct pairs/tokens per block). The unigram lookup
    is broadcast when the vocabulary fits (``max_broadcast_vocab``, the
    tfidf contract) and otherwise becomes two distributed hash joins on
    the min_count-filtered pair table. The float expression is evaluated
    in the exact double-op order of the DuckDB oracle."""
    import ray as _ray

    uni = (
        docs.map_batches(
            lambda df: pd.DataFrame(
                {
                    "token": (c := df["text"].str.split().explode().dropna().value_counts()).index.astype(object),
                    "n": c.to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    big = (
        docs.map_batches(_bigram_partial, batch_format="pandas")
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    U = float(uni.sum("n") or 0)
    B = float(big.sum("cnt") or 0)
    survivors = big.filter(expr=f"cnt >= {int(min_count)}")

    def _score(df: pd.DataFrame, c1: np.ndarray, c2: np.ndarray) -> pd.DataFrame:
        c12 = df["cnt"].to_numpy(np.float64)
        pmi = np.log((c12 / B) / ((c1 / U) * (c2 / U)))
        return pd.DataFrame(
            {
                "w1": df["w1"].to_numpy(object),
                "w2": df["w2"].to_numpy(object),
                "cnt": df["cnt"].to_numpy(np.int64),
                "pmi": np.round(pmi, 9),
            }
        )

    if uni.count() <= max_broadcast_vocab:
        vocab = uni.to_pandas()
        uref = _ray.put(pd.Series(vocab["n"].to_numpy(np.int64), index=vocab["token"]))

        def local(df: pd.DataFrame) -> pd.DataFrame:
            s = _ray.get(uref)
            return _score(
                df,
                df["w1"].map(s).to_numpy(np.float64),
                df["w2"].map(s).to_numpy(np.float64),
            )

        scored = survivors.map_batches(local, batch_format="pandas")
    else:  # distributed path: two hash joins on the filtered pair table
        P = partitions_for(survivors.count())
        j1 = safe_join(
            survivors,
            uni.map_batches(
                lambda t: t.rename_columns(["w1", "n1"]), batch_format="pyarrow"
            ),
            "inner",
            P,
            on=("w1",),
        )
        j2 = safe_join(
            j1,
            uni.map_batches(
                lambda t: t.rename_columns(["w2", "n2"]), batch_format="pyarrow"
            ),
            "inner",
            P,
            on=("w2",),
        )
        scored = j2.map_batches(
            lambda df: _score(
                df,
                df["n1"].to_numpy(np.float64),
                df["n2"].to_numpy(np.float64),
            ),
            batch_format="pandas",
        )
    return scored.sort(["pmi", "w1", "w2"], descending=[True, False, False]).limit(k)


def tfidf_top_terms(
    docs: ray.data.Dataset,
    top: int = 3,
    n_docs: int | None = None,
    max_broadcast_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document top-``top`` TF-IDF terms: (doc_id, token, tf, tfidf).

    tfidf = tf · ln(N / df). Document frequencies come from one
    token-keyed aggregate over the exploded (doc_id, token, tf) table.
    Scale-adaptive combine:

    * vocabulary ≤ ``max_broadcast_vocab`` rows (the normal case — even a
      100 TB corpus's vocab is millions, not billions): the (token, df)
      table is broadcast via ``ray.put`` and the whole operator becomes
      ONE batch-local pass over ``docs`` — explode, look up df, select
      per-doc top-N — with zero joins (document rows are atomic, so a
      doc's terms never straddle tasks);
    * larger: distributed hash join of the exploded table with the df
      table, then per-doc selection inside doc-id buckets (hundreds of
      vectorized group calls, not one per document).

    Ranking uses the integer key (tf DESC, df ASC, token ASC): the float
    score can never change which rows are selected, only annotate them.
    idf is evaluated with ``math.log`` on the (small) set of distinct df
    values per batch so the engine and the DuckDB oracle call the same
    libm."""
    import ray as _ray

    n_docs = int(docs.count()) if n_docs is None else int(n_docs)

    # Document frequencies with a per-batch partial combine (stepPartial):
    # each batch ships ≤ its distinct tokens, not its exploded rows — the
    # same two-level combine shape as top_tokens. Materialized because both
    # branches read it (and the vocabulary is the SMALL side by design).
    def _df_partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = _explode_tokens(df)["token"].value_counts()
        return pd.DataFrame(
            {"token": counts.index.astype(object), "df": counts.to_numpy(np.int64)}
        )

    df_tbl = (
        docs.map_batches(_df_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    n_vocab = df_tbl.count()

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-doc top-N + score over rows already carrying df
        (requires each doc's rows complete within ``g``)."""
        g = g.sort_values(
            ["doc_id", "tf", "df", "token"],
            ascending=[True, False, True, True],
        )
        g = g.groupby("doc_id", sort=False).head(top)
        uniq = {d: math.log(n_docs / d) for d in g["df"].unique()}
        idf = g["df"].map(uniq).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "token": g["token"].to_numpy(object),
                "tf": g["tf"].to_numpy(np.int64),
                "tfidf": np.round(g["tf"].to_numpy(np.float64) * idf, 9),
            }
        )

    if n_vocab <= max_broadcast_vocab:
        vocab = df_tbl.to_pandas()
        dref = _ray.put(
            pd.Series(
                vocab["df"].to_numpy(np.int64), index=vocab["token"]
            )
        )

        def local(df: pd.DataFrame) -> pd.DataFrame:
            e = _explode_tokens(df)
            e["df"] = e["token"].map(_ray.get(dref)).astype(np.int64)
            return _finish(e)

        return docs.map_batches(local, batch_format="pandas")

    ex = docs.map_batches(_explode_tokens, batch_format="pandas").materialize()
    npart = partitions_for(ex.count())
    joined = safe_join(ex, df_tbl, "inner", npart, on=("token",))

    # Per-doc top-N WITHOUT one-UDF-call-per-doc: bucket docs (hundreds of
    # groups instead of millions), then select inside each bucket with
    # vectorized pandas groupby.head — C-speed per bucket, exact per doc.
    n_buckets = np.int64(max(32, npart * 4))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = df["doc_id"].to_numpy(np.int64) % n_buckets
        return df

    return (
        joined.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(
            lambda g: _finish(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


def _hash64(ids: np.ndarray) -> np.ndarray:
    """uint64 md5-prefix hash of the decimal doc_id string — identical to
    DuckDB ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT``
    (same construction as textops._shingle_hashes)."""
    import pyarrow.compute as pc

    dec = pc.cast(pa.array(ids.astype(np.int64)), pa.string())
    return fasthash.md5_prefix_u64(dec)


def hash_sample(
    docs: ray.data.Dataset,
    rate: float = 0.25,
    rates_by_lang: dict[str, float] | None = None,
) -> ray.data.Dataset:
    """Deterministic corpus sample: keep a document iff
    hash64(doc_id) < rate · 2^64. Pure map-side (no shuffle, no RNG
    state), so it is trivially resumable and the same rows are kept on
    every run, at any parallelism, on any cluster size — the property a
    reservoir sampler gives up. ``rates_by_lang`` overrides the global
    rate per language (stratified sampling)."""
    W = float(1 << 64)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(df["doc_id"].to_numpy())
        if rates_by_lang is None:
            thr = np.full(len(df), rate * W)
        else:
            thr = (
                df["lang"]
                .map(lambda l: rates_by_lang.get(l, rate))
                .to_numpy(np.float64)
                * W
            )
        return df[h.astype(np.float64) < thr]

    return docs.map_batches(keep, batch_format="pandas")


def token_entropy(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document lexical-diversity scores: (doc_id, n_tokens,
    distinct_tokens, ttr, entropy) — type–token ratio and Shannon token
    entropy −Σ p·log2(p), p = tf/n (standard corpus-quality filters for
    training-data pipelines; repetitive/templated docs score low on both).

    Pure map-side (each document is one row, so its term frequencies are
    complete within the batch — the 100 TB shape: zero shuffles). The
    integer columns and ttr (one exact-int division) are bit-identical to
    the oracle; entropy is a float SUM whose accumulation order differs
    between numpy and DuckDB, so it is rounded at 6 decimals (the HITS
    precedent) where the ~1e-15 order noise cannot reach a boundary, and
    −0.0 from single-token docs is normalized with +0.0 on both sides."""
    from ..functions.fasthash import round_like_sql

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        tf = _explode_tokens(df)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_tokens": np.zeros(len(df), dtype=np.int64),
                "distinct_tokens": np.zeros(len(df), dtype=np.int64),
                "ttr": np.zeros(len(df), dtype=np.float64),
                "entropy": np.zeros(len(df), dtype=np.float64),
            }
        ).set_index("doc_id")
        if len(tf):
            g = tf.groupby("doc_id", sort=False)["tf"]
            n = g.transform("sum").to_numpy().astype(np.float64)
            p = tf["tf"].to_numpy().astype(np.float64) / n
            contrib = pd.Series(-(p * np.log2(p)), index=tf.index)
            agg = pd.DataFrame(
                {
                    "n_tokens": g.sum(),
                    "distinct_tokens": g.size(),
                    "ent": contrib.groupby(tf["doc_id"], sort=False).sum(),
                }
            )
            out.loc[agg.index, "n_tokens"] = agg["n_tokens"].astype(np.int64)
            out.loc[agg.index, "distinct_tokens"] = agg[
                "distinct_tokens"
            ].astype(np.int64)
            out.loc[agg.index, "ttr"] = round_like_sql(
                agg["distinct_tokens"].to_numpy().astype(np.float64)
                / agg["n_tokens"].to_numpy().astype(np.float64),
                9,
            )
            out.loc[agg.index, "entropy"] = (
                round_like_sql(agg["ent"].to_numpy(), 6) + 0.0
            )
        return out.reset_index()

    return docs.map_batches(per_batch, batch_format="pandas")


def length_quantiles(
    docs: ray.data.Dataset, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> pd.DataFrame:
    """Exact per-language token-length quantiles: (lang, p25, p50, p75,
    p95) with the discrete lower-quantile definition — the smallest
    n_tokens whose cumulative count reaches ceil(q·n).

    Exactness without a sort: the corpus reduces to a (lang, n_tokens)
    histogram (per-batch partial counts → one small groupby), bounded by
    languages × distinct lengths, so the driver-side cumsum/pick touches a
    tiny table regardless of corpus size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df["text"].str.split().str.len().fillna(0).astype(np.int64)
        counts = (
            pd.DataFrame({"lang": df["lang"], "n_tokens": n_tok})
            .groupby(["lang", "n_tokens"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        counts["n"] = counts["n"].astype(np.int64)
        return counts

    hist = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_tokens"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_tokens")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["n_tokens"].to_numpy(np.int64)
        row = {"lang": lang}
        for q in qs:
            target = math.ceil(q * total)
            row[f"p{int(round(q * 100))}"] = int(
                vals[int(np.searchsorted(cum, target))]
            )
        rows.append(row)
    return (
        pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    )


def decontaminate(
    docs: ray.data.Dataset,
    eval_max_doc_id: int = 5,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Eval-set contamination check: for every training document (doc_id
    ≥ ``eval_max_doc_id``), the fraction of its word-``shingle_k``-gram
    set that also appears in ANY eval document (doc_id < eval_max_doc_id).

    → (doc_id, n_shingles, n_hit: int64, contaminated: int32 0/1 at
    ``threshold``).

    The eval shingle-hash set is built once and broadcast via ``ray.put``
    (the decontamination blocklist is small relative to the corpus — the
    standard shape: eval benchmarks are MBs, training data is TBs), so the
    scan is pure map-side: no shuffle, no join, one pass over the corpus.
    Hashes are the md5-prefix uint64s shared with the MinHash/HLL stack,
    so the SQL oracle reproduces the same sets from the shingle strings.
    """
    import ray as _ray

    from .textops import _shingle_hashes

    evals = docs.filter(expr=f"doc_id < {eval_max_doc_id}").to_pandas()
    eval_set = np.unique(
        np.concatenate(
            [_shingle_hashes(t, shingle_k) for t in evals["text"]]
            or [np.array([], dtype=np.uint64)]
        )
    )
    eval_ref = _ray.put(np.sort(eval_set))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        ev = _ray.get(eval_ref)
        # whole-batch shingle hashing + ONE searchsorted against the sorted
        # blocklist, then per-doc hit counts via segment sums
        h, n_sh = fasthash.shingle_hashes_batch(df["text"], shingle_k)
        n_hit = np.zeros(len(df), dtype=np.int64)
        if len(h) and len(ev):
            idx = np.searchsorted(ev, h)
            idx[idx == len(ev)] = 0
            hit = (ev[idx] == h).astype(np.int64)
            nz = n_sh > 0
            starts = np.cumsum(n_sh) - n_sh
            n_hit[nz] = np.add.reduceat(hit, starts[nz])
        frac = np.divide(
            n_hit, n_sh, out=np.zeros(len(df), dtype=np.float64), where=n_sh > 0
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_shingles": n_sh,
                "n_hit": n_hit,
                "contaminated": (frac >= threshold).astype(np.int32),
            }
        )

    return docs.filter(expr=f"doc_id >= {eval_max_doc_id}").map_batches(
        scan, batch_format="pandas"
    )


def best_per_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Group-wise dedup: keep the single best document per ``source`` —
    best = longest by n_chars, ties to the smallest doc_id (both integer
    keys, so engine and SQL select the identical rows).

    Two-level combine, same shape as a MessageCombiner: each batch keeps
    its local best per source (stepPartial), then one small groupby picks
    the global best (stepFinal) — shuffle rows bounded by distinct sources
    per block, never the corpus."""

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return d.drop_duplicates("source", keep="first")[
            ["source", "doc_id", "n_chars"]
        ]

    def global_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return g.head(1).reset_index(drop=True)

    return (
        docs.map_batches(local_best, batch_format="pandas")
        .groupby("source")
        .map_groups(global_best, batch_format="pandas")
    )


def corpus_pipeline(
    docs: ray.data.Dataset,
    near_threshold: float = 0.5,
    eval_max_doc_id: int = 5,
    contam_threshold: float = 0.5,
    min_quality: float = 12.0,
    sample_rate: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """The composed end-to-end training-data pipeline — every stage exists
    and is individually oracle-checked; this chains them the way a real
    corpus build runs them, streaming, with no driver-side materialization
    of documents anywhere:

      1. **exact dedup** (content-addressed, min doc_id wins) — standard
         pipeline order: near-dup detection assumes exact dups are already
         collapsed (see ``minhash_lsh_pairs``' contract);
      2. **MinHash-LSH near-dup drop**: every verified pair (jaccard ≥
         ``near_threshold``) drops its LARGER doc_id — keep-first-by-id, the
         SQL-expressible greedy rule. The drop set is applied with a
         distributed left-outer anti-join (at web scale the near-dup set is
         a large fraction of the corpus — never broadcast);
      3. **eval decontamination**: the eval side (doc_id <
         ``eval_max_doc_id``) comes from the ORIGINAL corpus (an eval doc
         dropped by dedup must still poison training docs); training docs
         with shingle-overlap ≥ ``contam_threshold`` are dropped, eval docs
         themselves never enter the output;
      4. **quality filter**: heuristic score (``textops.quality_scores``
         formula) ≥ ``min_quality``;
      5. **deterministic hash sample** at ``sample_rate`` (pure function of
         doc_id — resumable, cluster-size independent).

    Stages 3–5 are FUSED into one map pass (one read of each surviving
    text). Returns (doc_id, n_tokens, score). 100 TB shape: two digest
    shuffles (dedup + anti-join) + the LSH band shuffle; everything else is
    map-side against a broadcast eval set (MBs — benchmarks are small)."""
    import ray as _ray

    from .textops import STOPWORDS, _shingle_hashes, exact_dedup, minhash_lsh_pairs

    survivors = exact_dedup(docs).materialize()  # consumed by 2 stages
    n_surv = survivors.count()
    # dedup's recovery join is partitioned data-proportionally (tiny P at
    # bench scale), which would serialize EVERY downstream map stage of the
    # pipeline onto that block count. Re-spread up to the CPU count when
    # under it — a no-op at production scale (blocks >> CPUs), measured
    # 390 s -> ~120 s on the 25k-doc replicated audit corpus.
    from ..stages.blocks import effective_partitions

    P_eff = effective_partitions()
    if survivors.num_blocks() < P_eff:
        survivors = survivors.repartition(P_eff).materialize()

    pairs = minhash_lsh_pairs(
        survivors,
        num_perm=num_perm,
        bands=bands,
        threshold=near_threshold,
        shingle_k=shingle_k,
    )
    # distinct larger-id per pair → (doc_id, _dup) drop table
    drops = (
        pairs.select_columns(["doc_b"])
        .groupby("doc_b")
        .count()
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": df["doc_b"].to_numpy(np.int64),
                    "_dup": np.ones(len(df), dtype=np.int8),
                }
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    if drops.count() > 0:
        P_join = partitions_for(n_surv)
        kept = safe_join(survivors, drops, "left_outer", P_join, on=("doc_id",))
        # same re-spread for the fused text pass downstream of the join;
        # the join emits exactly its partition count in blocks, so no
        # materialize is needed to know we're under the CPU count
        if P_join < P_eff:
            kept = kept.repartition(P_eff)
    else:
        kept = survivors  # empty right side would strip the join schema

    # broadcast eval shingle set (from the ORIGINAL docs — see docstring)
    evals = docs.filter(expr=f"doc_id < {eval_max_doc_id}").to_pandas()
    eval_set = np.unique(
        np.concatenate(
            [_shingle_hashes(t, shingle_k) for t in evals["text"]]
            or [np.array([], dtype=np.uint64)]
        )
    )
    eval_ref = _ray.put(np.sort(eval_set))
    W = float(1 << 64)

    def fused(df: pd.DataFrame) -> pd.DataFrame:
        if "_dup" in df.columns:
            df = df[df["_dup"].isna()]
        ids = df["doc_id"].to_numpy(np.int64)
        # cheapest gates first: the sample + eval-exclusion need no text
        gate = _hash64(ids).astype(np.float64) < sample_rate * W
        gate &= ids >= eval_max_doc_id
        df = df[gate]
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if not len(df):
            return empty
        toks = df["text"].str.split()
        n_tok = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        # stopword counts via explode + segment sums (no per-row lambda)
        stops = np.zeros(len(df), dtype=np.float64)
        flat = toks.explode().dropna()
        if len(flat):
            nzt = n_tok > 0
            tstarts = np.cumsum(n_tok) - n_tok
            stops[nzt] = np.add.reduceat(
                flat.isin(STOPWORDS).to_numpy().astype(np.int64), tstarts[nzt]
            )
        safe = np.maximum(n_tok.astype(np.float64), 1.0)
        ratio = np.round(stops / safe, 6)  # quality_scores' exact formula
        score = np.round(n_tok * (1.0 - ratio), 6)
        qok = score >= min_quality
        ev = _ray.get(eval_ref)
        contam = np.zeros(len(df), dtype=bool)
        if qok.any() and len(ev):
            # shingle only the quality-passing docs, whole-subset at once
            h, n_sh = fasthash.shingle_hashes_batch(
                df["text"].to_numpy()[qok], shingle_k
            )
            if len(h):
                idx = np.searchsorted(ev, h)
                idx[idx == len(ev)] = 0
                hit = (ev[idx] == h).astype(np.int64)
                n_hit = np.zeros(len(n_sh), dtype=np.int64)
                nzs = n_sh > 0
                sstarts = np.cumsum(n_sh) - n_sh
                n_hit[nzs] = np.add.reduceat(hit, sstarts[nzs])
                frac = np.divide(
                    n_hit,
                    n_sh,
                    out=np.zeros(len(n_sh), dtype=np.float64),
                    where=n_sh > 0,
                )
                contam[qok] = frac >= contam_threshold
        m = qok & ~contam
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[m],
                "n_tokens": n_tok[m],
                "score": score[m],
            }
        )

    return kept.map_batches(fused, batch_format="pandas")


def lm_score(
    docs: ray.data.Dataset,
    n_total: int | None = None,
    max_broadcast_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Unigram language-model quality score: (doc_id, n_tokens, lm_score)
    where lm_score = mean over the doc's tokens of ln(count(token) / T)
    (T = corpus token count) — the classic cheap LM-based quality filter
    (docs of rare/garbled tokens score low, fluent docs high). Empty docs
    score 0.

    Scale-adaptive, same contract as ``tfidf_top_terms``:

    * vocabulary ≤ ``max_broadcast_vocab``: broadcast the (token → ln p)
      Series via ``ray.put`` and score in ONE batch-local pass — exploded
      ``Series.map`` lookup (vectorized, no per-token Python dict loop) +
      per-doc ``np.add.reduceat`` segment sums;
    * larger (a 100 TB web corpus's long-tail vocab can be 10⁸–10⁹
      entries): distributed hash join of the exploded (doc_id, token, tf)
      table with the (token, n) table, per-doc mean inside doc-id buckets
      (hundreds of vectorized group calls), empty docs unioned in
      map-side — no driver- or worker-resident vocabulary anywhere.

    ln is evaluated with ``math.log`` on DISTINCT counts only (so engine
    and DuckDB oracle call the same libm); scores are rounded to 6
    decimals (per-doc summation-order tolerance vs the SQL oracle)."""
    import ray as _ray

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame(
            {"token": counts.index.astype(object), "n": counts.to_numpy(np.int64)}
        )

    counts_ds = (
        docs.map_batches(count_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    n_vocab = counts_ds.count()
    T = int(counts_ds.sum("n")) if n_total is None else int(n_total)

    if n_vocab <= max_broadcast_vocab:
        vocab = counts_ds.to_pandas()
        # math.log per DISTINCT count value (distinct counts ≪ vocab)
        by_count = {
            int(n): math.log(int(n) / T) for n in pd.unique(vocab["n"])
        }
        lref = _ray.put(
            pd.Series(
                vocab["n"].map(by_count).to_numpy(np.float64),
                index=vocab["token"],
            )
        )

        def score(df: pd.DataFrame) -> pd.DataFrame:
            lp = _ray.get(lref)
            toks = df["text"].str.split()
            n_tok = toks.str.len().fillna(0).astype(np.int64).to_numpy()
            scores = np.zeros(len(df), dtype=np.float64)
            flat = toks.explode().dropna()
            if len(flat):
                vals = flat.map(lp).to_numpy(np.float64)
                nz = n_tok > 0
                starts = np.cumsum(n_tok) - n_tok
                sums = np.add.reduceat(vals, starts[nz])
                scores[nz] = sums / n_tok[nz]
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "n_tokens": n_tok,
                    "lm_score": np.round(scores, 6),
                }
            )

        return docs.map_batches(score, batch_format="pandas")

    # distributed fallback: explode → hash join on token → bucketed mean
    ex = docs.map_batches(_explode_tokens, batch_format="pandas").materialize()
    npart = partitions_for(ex.count())
    joined = safe_join(ex, counts_ds, "inner", npart, on=("token",))
    n_buckets = np.int64(max(32, npart * 4))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = df["doc_id"].to_numpy(np.int64) % n_buckets
        return df

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        by_count = {int(n): math.log(int(n) / T) for n in pd.unique(g["n"])}
        contrib = g["tf"].to_numpy(np.float64) * g["n"].map(
            by_count
        ).to_numpy(np.float64)
        a = (
            pd.DataFrame(
                {"doc_id": g["doc_id"], "c": contrib, "tf": g["tf"]}
            )
            .groupby("doc_id", sort=False)
            .agg(s=("c", "sum"), n_tokens=("tf", "sum"))
        )
        return pd.DataFrame(
            {
                "doc_id": a.index.to_numpy(np.int64),
                "n_tokens": a["n_tokens"].to_numpy(np.int64),
                "lm_score": np.round(
                    a["s"].to_numpy() / a["n_tokens"].to_numpy(np.float64), 6
                ),
            }
        )

    scored = (
        joined.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(
            lambda g: agg_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )

    def empties(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df["text"].str.split().str.len().fillna(0).astype(np.int64)
        e = df[n_tok.to_numpy() == 0]
        return pd.DataFrame(
            {
                "doc_id": e["doc_id"].to_numpy(np.int64),
                "n_tokens": np.zeros(len(e), dtype=np.int64),
                "lm_score": np.zeros(len(e), dtype=np.float64),
            }
        )

    return scored.union(docs.map_batches(empties, batch_format="pandas"))


def source_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source corpus rollup — the curation dashboard primitive:
    → (source, n_docs, n_langs, mean_chars rounded 6).

    Per-batch (source, lang) partials (n, Σchars) make the shuffle
    sources × langs × blocks rows; the close per source touches a
    langs-sized group. Σchars is an exact integer in double, so the one
    closing division matches the oracle bit-for-bit before the half-away
    round (``round_like_sql``)."""
    from ray.data.aggregate import Sum

    from ..functions.fasthash import round_like_sql

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["source", "lang"], sort=False)
            .agg(n=("doc_id", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["sum_chars"] = g["sum_chars"].astype(np.int64)
        return g

    def close(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([n], dtype=np.int64),
                "n_langs": np.array([g["lang"].nunique()], dtype=np.int64),
                "mean_chars": round_like_sql(
                    np.array([g["sum_chars"].sum() / float(n)]), 6
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_chars", alias_name="sum_chars"))
        .groupby("source")
        .map_groups(close, batch_format="pandas")
    )


def vocab_stats(docs: ray.data.Dataset) -> pd.DataFrame:
    """Corpus-level vocabulary statistics — (total_tokens,
    distinct_tokens, hapax, ttr): the Heaps'-law dashboard numbers a
    curation run tracks across snapshots.

    Per-batch partial token counts → one vocabulary-bounded
    ``groupby.sum`` (the ``top_tokens`` shuffle shape) → per-block
    3-integer partials → a blocks-sized driver close. ttr =
    distinct/total is one exact-int double division."""
    from ray.data.aggregate import Sum

    from ..functions.fasthash import round_like_sql

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        g = ex.groupby("token", sort=False)["tf"].sum().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "total": [int(n.sum())],
                "distinct": [len(n)],
                "hapax": [int((n == 1).sum())],
            }
        )

    parts = counts.map_batches(fold, batch_format="pandas").to_pandas()
    total = int(parts["total"].sum())
    distinct = int(parts["distinct"].sum())
    return pd.DataFrame(
        {
            "total_tokens": np.array([total], dtype=np.int64),
            "distinct_tokens": np.array([distinct], dtype=np.int64),
            "hapax": np.array([int(parts["hapax"].sum())], dtype=np.int64),
            "ttr": round_like_sql(np.array([distinct / float(total)]), 9),
        }
    )


def zipf_slope(docs: ray.data.Dataset, top_n: int = 200) -> pa.Table:
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept of
    ln(frequency) against ln(rank) for the ``top_n`` most frequent tokens
    (ranks assigned count DESC, token ASC — deterministic ties both sides).
    Natural-language corpora sit near slope ≈ −1; the statistic is a cheap
    corpus-health / domain-shift indicator for training-data pipelines.

    → one row (slope, intercept, n_ranks: int64), 6-decimal rounded.

    Plan: reuses the two-level token-count combine of ``top_tokens`` (the
    shuffle carries ≤ distinct-tokens-per-block partials); the regression
    runs on the ``top_n``-row table only. The OLS is the population
    covar/var ratio — the exact formula DuckDB's ``regr_slope`` computes,
    so the oracle matches to FP noise below the 6-dp rounding."""
    from ..functions.fasthash import round_like_sql

    top = top_tokens(docs, k=top_n).to_pandas()
    n = len(top)
    if n < 2:
        return pa.table(
            {
                "slope": pa.array([0.0], pa.float64()),
                "intercept": pa.array([0.0], pa.float64()),
                "n_ranks": pa.array([n], pa.int64()),
            }
        )
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(np.float64))
    mx, my = x.mean(), y.mean()
    slope = float(np.sum((x - mx) * (y - my)) / np.sum((x - mx) ** 2))
    intercept = float(my - slope * mx)
    return pa.table(
        {
            "slope": pa.array(
                [float(round_like_sql(np.array([slope]), 6)[0])], pa.float64()
            ),
            "intercept": pa.array(
                [float(round_like_sql(np.array([intercept]), 6)[0])],
                pa.float64(),
            ),
            "n_ranks": pa.array([n], pa.int64()),
        }
    )


def split_leakage(
    docs: ray.data.Dataset,
    threshold: float = 0.4,
    val_rate: float = 0.2,
) -> ray.data.Dataset:
    """Train/val LEAKAGE AUDIT: near-duplicate pairs that straddle a
    deterministic hash split — the QA gate a training-data pipeline runs
    after splitting, since a val doc with a train near-dup inflates eval.

    → (doc_a < doc_b, jaccard) rows where exactly one side lands in the
    ``val_rate`` hash-split (hash64(doc_id) < rate·2^64 — the same
    deterministic md5-prefix split as ``hash_sample``, so the audited
    split IS the one `hash_sample` would produce).

    Plan: the near-dup candidates come from the full MinHash-LSH pipeline
    (`textops.minhash_lsh_pairs` — banded signatures, bounded+salted
    buckets, distributed exact verification); split membership is
    recomputed map-side per pair row from doc_id alone (no join, no
    broadcast — the split function is pure)."""
    from .textops import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold=threshold)
    W = float(1 << 64)
    thr = val_rate * W

    def crossing(df: pd.DataFrame) -> pd.DataFrame:
        va = _hash64(df["doc_a"].to_numpy()).astype(np.float64) < thr
        vb = _hash64(df["doc_b"].to_numpy()).astype(np.float64) < thr
        return df[va != vb]

    return pairs.map_batches(crossing, batch_format="pandas")


def oov_rate(
    docs: ray.data.Dataset, vocab_size: int = 20
) -> ray.data.Dataset:
    """Tokenizer/vocabulary coverage per source: build the corpus's
    top-``vocab_size`` token vocabulary, then measure each source's
    out-of-vocabulary token share — the pre-training health check for "is
    this source's text covered by the tokenizer we plan to train/use".

    → (source, n_docs: int64, oov_tokens: int64, total_tokens: int64,
    oov_share) — integer-exact folds, ONE closing division.

    Plan: the vocabulary is the existing ``top_tokens`` two-level combine
    (count-desc / token-asc tie-break at the boundary, SQL-reproducible)
    materialized at ≤ vocab_size rows and broadcast via ``ray.put``; the
    measurement pass is one ``map_batches`` over docs (exploded tokens ×
    one ``np.isin`` against the sorted vocab) emitting per-source partial
    (n_docs, oov, total) rows → a sources-bounded groupby. Docs with zero
    tokens count toward n_docs but contribute 0/0 tokens."""
    from ray.data.aggregate import Sum

    vocab = np.sort(
        np.array(
            [r["token"] for r in top_tokens(docs, k=vocab_size).take_all()],
            dtype=object,
        )
    )
    vref = ray.put(vocab)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        toks = df["text"].str.split()
        n = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        flat = toks.explode().dropna().to_numpy(dtype=object)
        oov_flat = ~np.isin(flat, v)
        src = np.repeat(df["source"].to_numpy(), n)
        g = (
            pd.DataFrame(
                {"source": src, "oov": oov_flat.astype(np.int64)}
            )
            .groupby("source", sort=False)
            .agg(oov=("oov", "sum"), total=("oov", "size"))
        )
        nd = df.groupby("source", sort=False).size().rename("n_docs")
        out = pd.concat([nd, g], axis=1).fillna(0).reset_index()
        for c in ("n_docs", "oov", "total"):
            out[c] = out[c].astype(np.int64)
        return out

    agg = (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("oov", alias_name="oov_tokens"),
            Sum("total", alias_name="total_tokens"),
        )
    )

    def close(t: pa.Table) -> pa.Table:
        o = t["oov_tokens"].to_numpy().astype(np.int64)
        n = t["total_tokens"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"].to_numpy().astype(np.int64),
                "oov_tokens": o,
                "total_tokens": n,
                "oov_share": o.astype(np.float64)
                / np.maximum(n, 1).astype(np.float64),
            }
        )

    return agg.map_batches(close, batch_format="pyarrow")


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> ray.data.Dataset:
    """RAG-prep chunking: split every document into overlapping
    ``chunk_tokens``-token windows at stride ``chunk_tokens − overlap``,
    carrying provenance — the map-side pass that feeds embedding/indexing
    stages downstream.

    → (doc_id, chunk_idx: int64, chunk_text, n_tokens: int64).

    Window rule (shared with the oracle): starts at 0, s, 2s, … with
    W = 1 if n ≤ chunk else ⌈(n − chunk)/s⌉ + 1 windows, so the LAST
    window always covers the tail with length in (chunk − s, chunk] —
    no degenerate tiny tails. Docs shorter than one chunk yield exactly
    one window; empty docs yield none.

    Purely map-side (no shuffle at all): each doc is one row, its chunks
    are assembled from one ``str.split`` with numpy window arithmetic —
    embarrassingly parallel at any corpus size."""
    s = chunk_tokens - overlap
    if s <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "chunk_idx": pd.Series([], dtype=np.int64),
                "chunk_text": pd.Series([], dtype=object),
                "n_tokens": pd.Series([], dtype=np.int64),
            }
        )
        toks = df["text"].str.split()
        n = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        flat = toks.explode().dropna().to_numpy(dtype=object)
        if not len(flat):
            return empty
        doc = np.repeat(df["doc_id"].to_numpy().astype(np.int64), n)
        # windows per doc: W = 1 if n ≤ chunk else ⌈(n−chunk)/s⌉+1
        W = np.where(
            n <= chunk_tokens, 1, -(-(n - chunk_tokens) // s) + 1
        ).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, n)
        # token at pos belongs to windows w_lo..w_hi (overlap fan-out),
        # all computed vectorized; each token is repeated per membership
        w_lo = np.maximum(0, -(-(pos - chunk_tokens + 1) // s))
        w_hi = np.minimum(np.repeat(W, n) - 1, pos // s)
        cnt = w_hi - w_lo + 1
        rep_tok = np.repeat(flat, cnt)
        rep_doc = np.repeat(doc, cnt)
        rep_pos = np.repeat(pos, cnt)
        # window id sequence w_lo, w_lo+1, … per token, arange-style
        offs = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
        )
        rep_w = np.repeat(w_lo, cnt) + offs
        g = (
            pd.DataFrame(
                {
                    "doc_id": rep_doc,
                    "chunk_idx": rep_w,
                    "pos": rep_pos,
                    "tok": rep_tok,
                }
            )
            .sort_values(["doc_id", "chunk_idx", "pos"], kind="stable")
            .groupby(["doc_id", "chunk_idx"], sort=False)
            .agg(chunk_text=("tok", " ".join), n_tokens=("tok", "size"))
            .reset_index()
        )
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        return g

    return docs.select_columns(["doc_id", "text"]).map_batches(
        chunks, batch_format="pandas"
    )
