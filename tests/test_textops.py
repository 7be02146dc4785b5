import numpy as np
import pandas as pd
import pytest
import ray.data

from asterixdb_analytics_ray.pipelines import textops as T


@pytest.fixture(scope="module")
def docs(ray_session):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "the quick brown fox jumps over the lazy cat", "en", "s0"),  # near-dup of 0
        (2, "der schnelle braune fuchs springt", "de", "s1"),
        (3, "the quick brown fox jumps over the lazy dog", "en", "s2"),  # exact dup of 0
        (4, "completely different words entirely here now", "en", "s3"),
        (5, "", "en", "s4"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return ray.data.from_pandas(df)


def test_token_counts(docs):
    got = T.token_counts(docs).to_pandas().set_index("doc_id")["n_tokens"]
    assert got[0] == 9 and got[5] == 0 and got[4] == 6


def test_fingerprints_match_md5(docs):
    import hashlib

    got = T.fingerprints(docs).to_pandas().set_index("doc_id")["fingerprint"]
    assert got[0] == hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert got[0] == got[3] != got[1]


def test_exact_dedup(docs):
    got = T.exact_dedup(docs).to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [0, 1, 2, 4, 5]  # 3 deduped into 0


def test_quality_scores(docs):
    got = T.quality_scores(docs).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_words"] == 9
    assert got.loc[0, "stopword_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert got.loc[5, "score"] == 0


def test_language_id(docs):
    got = T.language_id(docs).to_pandas().set_index("doc_id")["pred_lang"]
    # training docs classify to their own language
    assert got[0] == "en" and got[2] == "de"


def test_minhash_lsh_finds_near_dups(docs):
    pairs = T.minhash_lsh_pairs(docs, threshold=0.4).to_pandas()
    pairset = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 3) in pairset  # exact dup always caught
    assert (0, 1) in pairset  # near dup (8/10 shingles shared)
    assert (0, 4) not in pairset


def test_lsh_agrees_with_exact_jaccard(docs):
    lsh = T.minhash_lsh_pairs(docs, threshold=0.4).to_pandas()
    exact = T.ngram_jaccard_pairs(docs, threshold=0.4).to_pandas()
    # identical jaccard values for every pair LSH surfaces, and no misses here
    got = {(a, b): j for a, b, j in lsh.itertuples(index=False)}
    want = {(a, b): j for a, b, j in exact.itertuples(index=False)}
    assert got == want


def test_ngram_jaccard_hot_shingle_salted(ray_session):
    """A degenerate boilerplate corpus (one shingle in EVERY doc) completes
    without a single df²-sized postings mega-group: the hot shingle's join
    key is salted by doc id (RuntimeWarning), and true near-dup pairs —
    which also share non-hot shingles — survive with EXACT jaccard values
    via the distributed full-set verify."""
    k = 60
    rows = []
    for i in range(0, k, 2):
        text = f"common boilerplate phrase unique{i} alpha{i} beta{i} gamma{i}"
        rows.append((i, text))
        rows.append((i + 1, text))  # identical twin -> jaccard 1.0
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs60 = ray.data.from_pandas(df)
    with pytest.warns(RuntimeWarning, match="hot shingle"):
        pairs = T.ngram_jaccard_pairs(
            docs60, threshold=0.5, max_df=10
        ).to_pandas()
    pairset = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert pairset == {(i, i + 1) for i in range(0, k, 2)}
    assert (pairs["jaccard"] == 1.0).all()


def test_ngram_jaccard_salting_identity_on_sane_corpus(docs):
    """No shingle over max_df -> the count pass flags nothing and results
    are bit-identical to the lossless max_df=None path."""
    a = T.ngram_jaccard_pairs(docs, threshold=0.4).to_pandas()
    b = T.ngram_jaccard_pairs(docs, threshold=0.4, max_df=None).to_pandas()
    key = lambda d: sorted(zip(d["doc_a"], d["doc_b"], d["jaccard"]))
    assert key(a) == key(b)


def test_simhash_dup_pairs_exact_vs_all_pairs(docs):
    """Banded bucketing (pigeonhole-exact for max_dist < bands) finds exactly
    the pairs a quadratic Hamming scan finds, at every cutoff."""
    vals = T.simhash_values(docs).to_pandas().sort_values("doc_id")
    sh = vals["simhash"].to_numpy().astype(np.uint64)
    ids = vals["doc_id"].to_numpy()
    for max_dist in (0, 3):
        want = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(sh[i]) ^ int(sh[j])).count("1")
                if ham <= max_dist:
                    want.add((ids[i], ids[j], ham))
        got = T.simhash_dup_pairs(docs, max_dist=max_dist).to_pandas()
        gotset = set(zip(got["doc_a"], got["doc_b"], got["hamming"]))
        assert gotset == want
    # the exact dup pair is found at distance 0
    assert (0, 3, 0) in gotset or (0, 3, 0) in want


def test_simhash_close_for_near_dups(docs):
    got = T.simhash_values(docs).to_pandas().set_index("doc_id")["simhash"]
    ham = bin(int(got[0]) ^ int(got[1])).count("1")
    ham_far = bin(int(got[0]) ^ int(got[4])).count("1")
    assert got[0] == got[3]
    assert ham < ham_far


def test_minhash_hot_bucket_bounded(ray_session):
    """A degenerate corpus (hundreds of identical docs -> one band bucket)
    must not emit O(k^2) candidate pairs from a single map_groups task: the
    hot bucket is chunked by full-signature hash at max_bucket, and the
    deterministic chunked pair count comes through verification intact
    (identical docs all verify at jaccard 1.0)."""
    k, cap = 300, 64
    df = pd.DataFrame(
        {
            "doc_id": np.arange(k, dtype=np.int64),
            "text": ["identical boilerplate text body"] * k,
        }
    )
    pairs = T.minhash_lsh_pairs(
        ray.data.from_pandas(df), threshold=0.5, max_bucket=cap,
        salt_hot=False,
    ).to_pandas()
    # chunked emission: ceil(k/cap) chunks of <=cap docs, triu within each.
    # identical signatures sort stably by doc_id, so chunks are contiguous
    # id ranges and every chunk pair survives exact verification at 1.0
    expect = 0
    for s in range(0, k, cap):
        c = min(cap, k - s)
        expect += c * (c - 1) // 2
    assert len(pairs) == expect
    assert expect < k * (k - 1) // 2  # strictly bounded below exact
    assert (pairs["jaccard"] == 1.0).all()


def test_minhash_hot_bucket_row_salting(ray_session):
    """salt_hot (default) bounds a degenerate bucket's ROW ingestion by
    salting the shuffle key pre-shuffle: a mass-identical corpus spreads
    across ~⌈k/cap⌉ doc-hash salt classes per bucket, the driver sees a
    RuntimeWarning, and the deterministic per-class pair count survives
    exact verification at jaccard 1.0."""
    k, cap = 300, 64
    df = pd.DataFrame(
        {
            "doc_id": np.arange(k, dtype=np.int64),
            "text": ["identical boilerplate text body"] * k,
        }
    )
    with pytest.warns(RuntimeWarning, match="hot LSH bucket"):
        pairs = T.minhash_lsh_pairs(
            ray.data.from_pandas(df), threshold=0.5, max_bucket=cap
        ).to_pandas()
    # simulate the salting: identical sigs -> one hot sig class per bucket,
    # spread by (doc_id * KNUTH) % ceil(k/cap); within a class, bucket_pairs
    # chunks sorted ids at cap
    KNUTH = np.uint64(0x9E3779B97F4A7C15)
    k2 = int(np.ceil(k / cap))
    spread = (np.arange(k, dtype=np.uint64) * KNUTH) % np.uint64(k2)
    expect = 0
    for s in range(k2):
        ids = np.sort(np.arange(k)[spread == s])
        for st in range(0, len(ids), cap):
            c = min(cap, len(ids) - st)
            expect += c * (c - 1) // 2
    assert len(pairs) == expect
    assert expect < k * (k - 1) // 2  # strictly bounded below exact
    assert (pairs["jaccard"] == 1.0).all()
    # every salt class is ~k/k2 rows: the biggest single map_groups input
    # is bounded far below the full bucket
    assert max(np.bincount(spread.astype(np.int64))) < k


def test_minhash_salting_identity_on_sane_corpus(docs):
    """No bucket over max_bucket -> the salt column is never added and
    results are identical to salt_hot=False."""
    a = T.minhash_lsh_pairs(docs, threshold=0.4).to_pandas()
    b = T.minhash_lsh_pairs(docs, threshold=0.4, salt_hot=False).to_pandas()
    key = lambda d: sorted(zip(d["doc_a"], d["doc_b"], d["jaccard"]))
    assert key(a) == key(b)


def test_minhash_small_buckets_exact_with_cap(docs):
    """Buckets at or under max_bucket keep the exact all-pairs contract."""
    base = T.minhash_lsh_pairs(docs, threshold=0.4).to_pandas()
    capped = T.minhash_lsh_pairs(docs, threshold=0.4, max_bucket=2).to_pandas()
    key = lambda d: set(zip(d["doc_a"], d["doc_b"]))
    # with max_bucket=2 some candidates drop; with the default none do
    assert key(capped) <= key(base)


def test_hll_estimate_accuracy(ray_session):
    """HLL estimate within the sketch's error bound of the exact distinct
    shingle count on a high-cardinality synthetic corpus (1024 registers →
    ~3.3% standard error; assert 10%)."""
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(vocab, size=40)) for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df)
    regs = T.hll_registers(ds)
    est = T.hll_estimate(regs.to_pandas())
    exact = len(
        {s for t in texts for s in
         (" ".join(t.split()[i:i + 3]) for i in range(len(t.split()) - 2))}
    )
    assert abs(est - exact) / exact < 0.10, (est, exact)


def test_hll_registers_merge_associative(ray_session):
    """Register tables from corpus halves merge (max) to the full corpus's
    registers — the sketch's defining mergeability property."""
    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(100)]
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64), "text": texts})
    full = (
        T.hll_registers(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("reg")["rho"]
    )
    a = T.hll_registers(ray.data.from_pandas(df.iloc[:50])).to_pandas()
    b = T.hll_registers(ray.data.from_pandas(df.iloc[50:])).to_pandas()
    merged = (
        pd.concat([a, b]).groupby("reg")["rho"].max()
    )
    pd.testing.assert_series_equal(merged, full, check_names=False)


def test_repetition_scores_brute_force(ray_session):
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import repetition_scores

    texts = [
        "a b c a b c a b c",      # heavy 3-gram repetition
        "all unique words here now",
        "x",                        # short doc: one shingle
        "",                         # no grams -> omitted
        "t t t t t t",             # single gram repeated
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = repetition_scores(docs, k=3).to_pandas().set_index("doc_id")
    assert 3 not in out.index  # empty doc omitted
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        if len(words) < 3:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[j : j + 3]) for j in range(len(words) - 2)]
        from collections import Counter

        c = Counter(grams)
        row = out.loc[i]
        assert row["n_grams"] == len(grams)
        assert row["n_unique"] == len(c)
        assert row["max_gram_count"] == max(c.values())
        assert abs(row["dup_fraction"] - round(1 - len(c) / len(grams), 6)) < 1e-9


def test_dup_clusters_canonicalization(ray_session):
    """dup_clusters: CC over an engineered near-dup chain resolves to the
    min doc id per cluster, converging well inside the oracle's 12-round
    unroll bound (the fixed-unroll CTE contract)."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [
        base,                          # cluster {0,1,2} (near-identical)
        base + "extra tail words",
        base + "another small suffix",
        "completely different content about graph engines " * 10,  # singleton
        "completely different content about graph engines " * 10 + "y",  # pairs with 3
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out, rounds = T.dup_clusters(docs, n_docs=len(texts), threshold=0.4, P=2)
    df = out.to_pandas().set_index("doc_id").sort_index()
    assert rounds <= 12
    # docs 0-2 form one cluster canonicalized to 0; 3-4 to 3
    assert set(df.index) == {0, 1, 2, 3, 4}
    assert list(df["cluster_id"]) == [0, 0, 0, 3, 3]
    assert list(df["keep"]) == [1, 0, 0, 1, 0]


def test_containment_catches_subset_dup(ray_session):
    """A short doc fully contained in a long one: containment = 1.0 even
    though jaccard is far below threshold."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i}" for i in range(200))
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [short, short + " " + filler, filler.upper()],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    got = containment_pairs(ds, threshold=0.9).to_pandas()
    assert len(got) == 1
    assert (got["doc_a"][0], got["doc_b"][0]) == (1, 2)
    assert got["containment"][0] == 1.0
    jac = ngram_jaccard_pairs(ds, threshold=0.9).to_pandas()
    assert len(jac) == 0  # jaccard misses the subset dup


def test_containment_salted_path_matches_unsalted(ray_session):
    """Force the hot-shingle salting path (max_df=2) and check the verified
    survivors equal the lossless run."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import containment_pairs

    base = ["common boiler plate three", "x y z w"]
    texts = []
    for i in range(12):
        extra = " ".join(f"t{i}_{j}" for j in range(3))  # fixed-size docs:
        texts.append(base[i % 2] + " " + extra)  # containment is 2/5 = 0.4
    docs = pd.DataFrame(
        {"doc_id": np.arange(12, dtype=np.int64), "text": texts}
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        salted = (
            containment_pairs(ds, threshold=0.3, max_df=2)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
    plain = (
        containment_pairs(ds, threshold=0.3, max_df=None)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # salting may drop cross-salt candidates; every SURVIVOR must be exact
    assert len(plain) > 0 and len(salted) > 0
    merged = salted.merge(plain, on=["doc_a", "doc_b"], suffixes=("_s", "_p"))
    assert len(merged) == len(salted)
    assert np.allclose(merged["containment_s"], merged["containment_p"])


def test_dup_shingle_stats_known_counts(ray_session):
    # doc 0 and 1 share ALL their shingles (exact dup); doc 2 is unique
    rows = [
        (0, "a b c d"),  # shingles: "a b c", "b c d"
        (1, "a b c d"),
        (2, "x y z w"),  # shingles: "x y z", "y z w" — unique
        (3, "a b c"),  # one shingle "a b c" — duplicated (in 0, 1)
        (4, ""),  # empty: absent from the output
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    got = T.dup_shingle_stats(ds).to_pandas().set_index("doc_id")
    assert 4 not in got.index
    assert got.loc[0, "n_shingles"] == 2 and got.loc[0, "n_dup"] == 2
    assert got.loc[0, "dup_frac"] == 1.0
    assert got.loc[2, "n_dup"] == 0 and got.loc[2, "dup_frac"] == 0.0
    assert got.loc[3, "n_shingles"] == 1 and got.loc[3, "dup_frac"] == 1.0


def test_dup_shingle_stats_join_path_matches_broadcast(docs):
    a = (
        T.dup_shingle_stats(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        T.dup_shingle_stats(docs, max_broadcast=0)  # force the join path
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_segment_dedup_brute_force(ray_session):
    """First-occurrence-wins over 10-token windows, incl. a fully-duplicated
    doc (dedups to nothing) and an intra-doc repeated segment."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import segment_dedup

    w = lambda i: f"w{i}"
    seg_a = " ".join(w(i) for i in range(10))          # shared boilerplate
    seg_b = " ".join(w(100 + i) for i in range(10))
    seg_c = " ".join(w(200 + i) for i in range(10))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                f"{seg_a} {seg_b}",          # doc 0: both first → kept whole
                f"{seg_a} {seg_c}",          # doc 1: seg_a dup → only seg_c
                f"{seg_a} {seg_b}",          # doc 2: full dup → dropped
                f"{seg_c} {seg_c}",          # doc 3: intra-doc dup → dropped
                "tail words only",           # doc 4: short tail segment, new
            ],
        }
    )
    out = (
        segment_dedup(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sorted(out.index) == [0, 1, 4]
    assert out.loc[0, "text_dedup"] == f"{seg_a} {seg_b}"
    assert out.loc[0, "n_kept"] == 2 and out.loc[0, "n_total"] == 2
    assert out.loc[1, "text_dedup"] == seg_c
    assert out.loc[1, "n_kept"] == 1 and out.loc[1, "n_total"] == 2
    assert out.loc[4, "text_dedup"] == "tail words only"
    assert out.loc[4, "n_kept"] == 1


def test_segment_dedup_order_preserved(ray_session):
    """Surviving segments reassemble in original order even when seg_idx
    survivors are non-contiguous."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import segment_dedup

    segs = [" ".join(f"s{j}_{i}" for i in range(10)) for j in range(4)]
    docs = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": [
                segs[1],                                  # claims segs[1]
                " ".join([segs[0], segs[1], segs[2], segs[3]]),
            ],
        }
    )
    out = (
        segment_dedup(ray.data.from_pandas(docs).repartition(2))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "text_dedup"] == " ".join([segs[0], segs[2], segs[3]])
    assert out.loc[1, "n_kept"] == 3 and out.loc[1, "n_total"] == 4


def test_source_overlap_brute_force(ray_session):
    """Bitmask plan vs a direct set computation, incl. a disjoint source
    (absent from the pair rows) and the >max_sources guard."""
    import itertools

    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import source_overlap

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["s1", "s1", "s2", "s2", "s3", "s4"],
            "text": [
                "a b c d e",          # s1: shingles abc bcd cde
                "x y z",              # s1: xyz
                "a b c d",            # s2: abc bcd  (shares with s1)
                "p q r s",            # s2: pqr qrs
                "a b c",              # s3: abc      (shares with s1, s2)
                "u v w",              # s4: uvw      (disjoint)
            ],
        }
    )
    out = (
        source_overlap(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index(["src_a", "src_b"])
        .sort_index()
    )

    def shingles(ts):
        out = set()
        for t in ts:
            w = t.split()
            out |= (
                {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
                if len(w) >= 3
                else {" ".join(w)}
            )
        return out

    sets = {
        s: shingles(docs[docs.source == s]["text"]) for s in docs.source.unique()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        if i:
            want[(a, b)] = (i, i / len(sets[a] | sets[b]))
    assert set(out.index) == set(want)
    for key, (i, j) in want.items():
        assert out.loc[key, "shared"] == i
        assert out.loc[key, "jaccard"] == pytest.approx(j, abs=1e-12)

    many = pd.DataFrame(
        {
            "doc_id": np.arange(70, dtype=np.int64),
            "source": [f"s{i}" for i in range(70)],
            "text": ["a b c"] * 70,
        }
    )
    with pytest.raises(ValueError, match="max_sources"):
        source_overlap(ray.data.from_pandas(many))


def test_source_dup_rates_brute_force(ray_session):
    """Planted near-dup docs in one source; a clean source reports 0."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import source_dup_rates

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    rng = np.random.default_rng(41)
    clean = [
        " ".join(rng.choice([f"u{j}" for j in range(500)], 40))
        for _ in range(6)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "source": ["dirty", "dirty"] + ["clean"] * 6,
            "text": [base, near] + clean,
        }
    )
    out = (
        source_dup_rates(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["dirty", "dup_docs"] == 2
    assert out.loc["dirty", "dup_rate"] == pytest.approx(1.0)
    assert out.loc["clean", "dup_docs"] == 0
    assert out.loc["clean", "dup_rate"] == 0.0
