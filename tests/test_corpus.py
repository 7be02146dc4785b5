"""Unit tests for pipelines/corpus.py — independent brute-force oracles in
pandas (the SQL conformance path is covered by test_oracle_conformance.py)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from asterixdb_analytics_ray.pipelines import corpus as C


@pytest.fixture(scope="module")
def docs_df():
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "the quick brown fox jumps over the lazy cat", "en", "s0"),
        (2, "der schnelle braune fuchs springt", "de", "s1"),
        (3, "the quick brown fox jumps over the lazy dog", "en", "s2"),
        (4, "completely different words entirely here now", "en", "s3"),
        (5, "", "en", "s4"),
        (6, "fox fox fox den", "en", "s5"),
        (7, "a b c d e f g h i j k", "de", "s5"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return df


@pytest.fixture(scope="module")
def docs(ray_session, docs_df):
    return ray.data.from_pandas(docs_df)


def test_top_tokens_exact(docs, docs_df):
    got = C.top_tokens(docs, k=5).to_pandas()
    exact = (
        docs_df["text"].str.split().explode().dropna().value_counts()
    )
    want = (
        pd.DataFrame({"token": exact.index, "n": exact.to_numpy(np.int64)})
        .sort_values(["n", "token"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["n", "token"], ascending=[False, True]).reset_index(
            drop=True
        ),
        want,
        check_dtype=False,
    )


def test_tfidf_top_terms(docs, docs_df):
    got = C.tfidf_top_terms(docs, top=2).to_pandas()
    # brute force
    n_docs = len(docs_df)
    tf = (
        docs_df.assign(token=docs_df["text"].str.split())
        .explode("token")
        .dropna(subset=["token"])
        .groupby(["doc_id", "token"])
        .size()
        .rename("tf")
        .reset_index()
    )
    df_counts = tf.groupby("token").size().rename("df").reset_index()
    m = tf.merge(df_counts, on="token")
    m["tfidf"] = np.round(
        m["tf"] * m["df"].map(lambda d: math.log(n_docs / d)), 9
    )
    want = (
        m.sort_values(
            ["doc_id", "tf", "df", "token"],
            ascending=[True, False, True, True],
        )
        .groupby("doc_id")
        .head(2)[["doc_id", "token", "tf", "tfidf"]]
        .reset_index(drop=True)
    )
    got = got.sort_values(["doc_id", "token"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "token"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every selected token actually occurs in its document
    texts = docs_df.set_index("doc_id")["text"]
    for _, r in got.iterrows():
        assert r["token"] in texts[r["doc_id"]].split()


def test_hash_sample_deterministic_and_stratified(docs):
    a = C.hash_sample(docs, rate=0.5).to_pandas().sort_values("doc_id")
    b = C.hash_sample(docs, rate=0.5).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # lower rate selects a subset of the higher rate's rows (nested samples)
    small = set(C.hash_sample(docs, rate=0.2).to_pandas()["doc_id"])
    assert small <= set(a["doc_id"])
    # stratified: rate 0 for one language removes exactly that language
    strat = C.hash_sample(docs, rate=1.0, rates_by_lang={"de": 0.0}).to_pandas()
    assert set(strat["lang"]) == {"en"}
    assert len(strat) == 6


def test_hash_sample_parallelism_invariant(docs):
    one = C.hash_sample(docs.repartition(1), rate=0.5).to_pandas()
    four = C.hash_sample(docs.repartition(4), rate=0.5).to_pandas()
    assert sorted(one["doc_id"]) == sorted(four["doc_id"])


def test_length_quantiles_exact(docs, docs_df):
    got = C.length_quantiles(docs, qs=(0.5, 0.75))
    lens = docs_df.assign(
        n_tokens=docs_df["text"].str.split().str.len().fillna(0).astype(int)
    )
    for _, row in got.iterrows():
        vals = np.sort(
            lens[lens["lang"] == row["lang"]]["n_tokens"].to_numpy()
        )
        for q, col in ((0.5, "p50"), (0.75, "p75")):
            # discrete lower quantile: ceil(q*n)-th smallest (1-based)
            want = vals[math.ceil(q * len(vals)) - 1]
            assert row[col] == want, (row["lang"], col)


def test_length_quantiles_empty_text_counts_as_zero(docs):
    got = C.length_quantiles(docs, qs=(0.25,))
    assert (got["p25"] >= 0).all()


def test_decontaminate_flags_overlap(docs):
    # eval set = docs 0-2; doc 3 is an exact dup of doc 0 → fully contaminated
    got = (
        C.decontaminate(docs, eval_max_doc_id=3, threshold=0.5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(got.index) == {3, 4, 5, 6, 7}
    assert got.loc[3, "n_hit"] == got.loc[3, "n_shingles"] > 0
    assert got.loc[3, "contaminated"] == 1
    assert got.loc[4, "n_hit"] == 0 and got.loc[4, "contaminated"] == 0
    # empty doc: zero shingles, not contaminated
    assert got.loc[5, "n_shingles"] == 0 and got.loc[5, "contaminated"] == 0


def test_best_per_source(docs, docs_df):
    got = C.best_per_source(docs).to_pandas().set_index("source")
    want = (
        docs_df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .drop_duplicates("source")
        .set_index("source")
    )
    assert len(got) == docs_df["source"].nunique()
    for src in want.index:
        assert got.loc[src, "doc_id"] == want.loc[src, "doc_id"]


def test_cms_registers_and_estimate(docs, docs_df):
    from asterixdb_analytics_ray.pipelines.textops import cms_estimate, cms_registers

    regs = cms_registers(docs, depth=4, width=1024).to_pandas()
    exact = docs_df["text"].str.split().explode().dropna().value_counts()
    # total mass per row equals total token count
    assert (regs.groupby("r")["n"].sum() == exact.sum()).all()
    # point estimates upper-bound the true counts; with 1024 cells and a
    # tiny vocab they are exact
    for tok, n in exact.items():
        est = cms_estimate(regs, tok, depth=4, width=1024)
        assert est >= n
        assert est == n  # no collisions at this vocab size
    assert cms_estimate(regs, "zzz-never-seen", 4, 1024) in (0, 1, 2)


def test_tfidf_join_path_matches_broadcast_path(docs):
    a = (
        C.tfidf_top_terms(docs, top=2)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    b = (
        C.tfidf_top_terms(docs, top=2, max_broadcast_vocab=0)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --- property-based (hypothesis): randomized corpora, exact invariants ---

from hypothesis import given, settings, strategies as st

_token = st.text(alphabet="abcdef", min_size=1, max_size=4)
_text = st.lists(_token, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=40), data=st.data())
def test_top_tokens_property(ray_session, texts, data):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
        }
    )
    df["n_chars"] = df["text"].str.len()
    k = data.draw(st.integers(min_value=1, max_value=10))
    got = C.top_tokens(ray.data.from_pandas(df), k=k).to_pandas()
    exact = df["text"].str.split().explode().dropna().value_counts()
    want = (
        pd.DataFrame({"token": exact.index, "n": exact.to_numpy(np.int64)})
        .sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    if len(want) == 0:
        # all-empty corpus: Ray returns an empty (schema-less) dataset
        assert len(got) == 0
        return
    pd.testing.assert_frame_equal(
        got.sort_values(["n", "token"], ascending=[False, True]).reset_index(
            drop=True
        ),
        want,
        check_dtype=False,
    )


@settings(max_examples=5, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60, unique=True
    ),
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
)
def test_hash_sample_nested_property(ray_session, ids, r1, r2):
    lo, hi = sorted([r1, r2])
    df = pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": "x",
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
    )
    ds = ray.data.from_pandas(df)

    def ids_of(rate):
        out = C.hash_sample(ds, rate=rate).to_pandas()
        return set(out["doc_id"]) if len(out) else set()

    a, b = ids_of(lo), ids_of(hi)
    assert a <= b  # samples are nested across rates
    assert b == ids_of(hi)  # deterministic: same rate → same rows


def test_lm_score_brute_force(docs, docs_df):
    got = C.lm_score(docs).to_pandas().set_index("doc_id")
    toks = docs_df["text"].str.split()
    counts = toks.explode().dropna().value_counts()
    T = int(counts.sum())
    for did, lst in zip(docs_df["doc_id"], toks):
        if not lst:
            assert got.loc[did, "lm_score"] == 0.0
            continue
        want = sum(math.log(counts[t] / T) for t in lst) / len(lst)
        assert abs(got.loc[did, "lm_score"] - want) < 1e-5
    # rare-token doc scores lower than common-token doc
    rare = got.loc[7, "lm_score"]   # "a b c ..." all-unique tokens
    common = got.loc[0, "lm_score"]  # mostly corpus-frequent tokens
    assert rare < common


def test_lm_score_fallback_matches_broadcast(docs):
    """An adversarially small max_broadcast_vocab forces the distributed
    hash-join fallback; results (incl. empty docs) must match the broadcast
    path exactly at round-6."""
    a = (
        C.lm_score(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        C.lm_score(docs, max_broadcast_vocab=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_lm_score_null_text(ray_session):
    """Null text values score 0 with 0 tokens on both paths (regression:
    str.split() yields NaN for None and the old per-row loop crashed)."""
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["hello world", None, "hello"],
            "lang": "en",
            "source": "s",
        }
    )
    ds = ray.data.from_pandas(df)
    for kw in ({}, {"max_broadcast_vocab": 1}):
        got = C.lm_score(ds, **kw).to_pandas().set_index("doc_id")
        assert got.loc[1, "n_tokens"] == 0 and got.loc[1, "lm_score"] == 0.0
        assert got.loc[0, "n_tokens"] == 2


def test_corpus_pipeline_composition(ray_session):
    """corpus_pipeline == the stagewise composition of its (individually
    tested) components: exact_dedup → minhash_lsh_pairs drop-doc_b →
    decontaminate drop → quality filter → hash_sample. The corpus is built
    so every stage drops at least one document."""
    from asterixdb_analytics_ray.pipelines import textops as T

    filler = [
        " ".join(f"w{i}x{j}" for j in range(15)) + " trailing unique words"
        for i in range(18)
    ]
    rows = [
        # eval docs (doc_id < 5)
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven eight nine ten eleven twelve"),
        (2, "ev2 " + filler[0]),
        (3, "ev3 only short"),
        (4, ""),
        # exact-dup pair: 6 dropped, 5 kept
        (5, "exact duplicate body " + filler[1]),
        (6, "exact duplicate body " + filler[1]),
        # contaminated: contains eval doc 0 verbatim
        (7, "alpha beta gamma delta epsilon zeta eta theta iota kappa plus"),
        # all-stopword doc: quality score 0
        (8, "the the a a of of to to in in is is and and"),
        # near-dup pair: long shared prefix, one word differs
        (9, " ".join(f"n{i}" for i in range(20)) + " tail_a"),
        (10, " ".join(f"n{i}" for i in range(20)) + " tail_b"),
        # short doc: 5 words < min_quality
        (11, "just five small words here"),
    ] + [(12 + i, t) for i, t in enumerate(filler[2:])]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"], df["source"] = "en", "s"
    df["n_chars"] = df["text"].str.len()
    ds = ray.data.from_pandas(df)

    got = C.corpus_pipeline(ds).to_pandas().sort_values("doc_id")

    # stagewise expected set
    surv = T.exact_dedup(ds).to_pandas()
    pairs = T.minhash_lsh_pairs(
        ray.data.from_pandas(surv.merge(df[["doc_id"]], on="doc_id")),
        threshold=0.5,
    ).to_pandas()
    keep = set(surv["doc_id"]) - set(pairs["doc_b"])
    flags = C.decontaminate(ds, eval_max_doc_id=5).to_pandas()
    contaminated = set(flags.loc[flags["contaminated"] == 1, "doc_id"])
    qual = T.quality_scores(ds).to_pandas().set_index("doc_id")
    W = float(1 << 64)
    expect = sorted(
        d
        for d in keep
        if d >= 5
        and d not in contaminated
        and qual.loc[d, "score"] >= 12.0
        and float(C._hash64(np.array([d]))[0]) < 0.5 * W
    )
    assert list(got["doc_id"]) == expect
    # stage coverage: each stage dropped something
    assert 6 not in set(surv["doc_id"])          # exact dedup fired
    assert 10 in set(pairs["doc_b"])             # near-dup drop fired
    assert 7 in contaminated                     # decontamination fired
    assert qual.loc[8, "score"] < 12.0           # quality filter fired
    assert len(expect) < len(keep)               # sample/eval gates fired
    # values match the standalone quality formula
    for d in expect:
        row = got.set_index("doc_id").loc[d]
        assert row["n_tokens"] == qual.loc[d, "n_words"]
        assert row["score"] == qual.loc[d, "score"]


def test_tfidf_null_text(ray_session):
    """Null text must not crash _explode_tokens (regression)."""
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["a b a", None, "b c"],
            "lang": "en",
            "source": "s",
        }
    )
    got = C.tfidf_top_terms(ray.data.from_pandas(df), top=2).to_pandas()
    assert set(got["doc_id"]) == {0, 2}


def test_run_job_corpus_cli_sink_and_gates(ray_session, tmp_path):
    """run_job --algorithm corpus_pipeline: the deployable job writes
    partitioned Parquet matching the library pipeline, and the optional
    lm_score / repetition gates compose on top (inner-join the LM passes,
    anti-join the repetition failures)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import run_job
    from asterixdb_analytics_ray.pipelines import textops as T

    filler = [
        " ".join(f"w{i}x{j}" for j in range(15)) + " trailing unique words"
        for i in range(14)
    ]
    rows = [(i, "ev eval doc") for i in range(5)]  # eval ids
    rows += [(5 + i, t) for i, t in enumerate(filler)]
    # a highly repetitive doc that passes quality but fails dup_fraction
    rows.append((19, " ".join(["loop around again"] * 12)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"], df["source"] = "en", "s"
    df["n_chars"] = df["text"].str.len()
    docs_path = str(tmp_path / "docs.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), docs_path)

    out_dir = str(tmp_path / "out")
    rc = run_job.main(
        [
            "--algorithm", "corpus_pipeline",
            "--input", docs_path,
            "--output", out_dir,
            "--partitions", "2",
            "--min-lm-score", "-99",
            "--max-dup-fraction", "0.2",
        ]
    )
    assert rc == 0
    got = (
        ray.data.read_parquet(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # expected: library pipeline minus repetition failures; lm gate at -99
    # passes everything but must add the lm_score column
    base = C.corpus_pipeline(ray.data.from_pandas(df)).to_pandas()
    rep = T.repetition_scores(ray.data.from_pandas(df)).to_pandas()
    rep_fail = set(rep.loc[rep["dup_fraction"] > 0.2, "doc_id"])
    assert 19 in rep_fail and 19 in set(base["doc_id"])  # the gate must bite
    expect = sorted(set(base["doc_id"]) - rep_fail)
    assert list(got["doc_id"]) == expect
    assert "lm_score" in got.columns


def test_oov_rate_brute_force(ray_session):
    """OOV share vs the top-k vocabulary, incl. the count-desc/token-asc
    boundary tie-break and an empty-text doc (counts toward n_docs only)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import oov_rate

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["a", "a", "b", "b", "b", "c"],
            "text": [
                "x x x y y z",      # x:3 y:2 z:1
                "x y q",            # q rare → OOV for vocab_size=3
                "x y z",
                "q r s",
                "",                 # empty doc
                "x q q q",
            ],
        }
    )
    out = (
        oov_rate(ray.data.from_pandas(docs).repartition(3), vocab_size=3)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    # corpus counts: x:6 q:5 y:4 z:2 r:1 s:1 → vocab (k=3) = {x, q, y}
    assert out.loc["a", "n_docs"] == 2
    assert out.loc["a", "oov_tokens"] == 1          # z
    assert out.loc["a", "total_tokens"] == 9
    assert out.loc["b", "n_docs"] == 3              # empty doc counted
    assert out.loc["b", "oov_tokens"] == 3          # z r s
    assert out.loc["b", "total_tokens"] == 6
    assert out.loc["c", "oov_tokens"] == 0
    assert out.loc["c", "oov_share"] == 0.0
    assert out.loc["b", "oov_share"] == pytest.approx(0.5)


def test_chunk_documents_window_rule(ray_session):
    """Window starts/lengths for short, exact-fit, and tail cases; overlap
    fan-out reconstructs each window's tokens exactly."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import chunk_documents

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b c",                                   # short: 1 window
                " ".join(f"t{i}" for i in range(8)),        # exact chunk
                " ".join(f"u{i}" for i in range(13)),       # tail window
                "",                                        # empty: none
            ],
        }
    )
    out = (
        chunk_documents(
            ray.data.from_pandas(docs).repartition(3),
            chunk_tokens=8, overlap=3,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 0: one short window
    d0 = out[out.doc_id == 0]
    assert list(d0.chunk_text) == ["a b c"] and list(d0.n_tokens) == [3]
    # doc 1: n == chunk → exactly one window
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.n_tokens.iloc[0] == 8
    # doc 2: n=13, s=5 → W = ceil(5/5)+1 = 2; windows [0:8], [5:13]
    d2 = out[out.doc_id == 2]
    assert len(d2) == 2
    assert d2.chunk_text.iloc[0] == " ".join(f"u{i}" for i in range(8))
    assert d2.chunk_text.iloc[1] == " ".join(f"u{i}" for i in range(5, 13))
    # doc 3 absent
    assert 3 not in set(out.doc_id)

    with pytest.raises(ValueError):
        chunk_documents(
            ray.data.from_pandas(docs), chunk_tokens=4, overlap=4
        )
