import numpy as np
import pandas as pd
import pytest
import ray.data

from asterixdb_analytics_ray.imru import BGDLinearJob, KMeansJob, run_imru
from asterixdb_analytics_ray.pipelines import embeddings as E


@pytest.fixture(scope="module")
def emb(ray_session):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 8)) * 4
    pts = np.concatenate(
        [centers[i] + rng.normal(size=(40, 8)) * 0.3 for i in range(3)]
    )
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in pts],
            "label": np.repeat(np.arange(3), 40).astype(np.int32),
        }
    )
    return ray.data.from_pandas(df), pts


def _exact_topk(pts, q, k):
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = pn @ qn
    order = np.lexsort((np.arange(len(pts)), -sims))[:k]
    return order, sims[order]


def test_knn_brute_force_exact(emb):
    ds, pts = emb
    q = pts[7]
    got = E.knn_brute_force(ds, q[None, :], np.array([7]), k=5).to_pandas()
    want_ids, want_sims = _exact_topk(pts, q, 5)
    assert list(got["vec_id"]) == list(want_ids)
    np.testing.assert_allclose(got["sim"], np.round(want_sims, 6), atol=1e-6)
    assert got["vec_id"].iloc[0] == 7  # self is the nearest


def test_kmeans_imru_converges(emb):
    ds, pts = emb
    init = pts[[0, 45, 90]]  # one seed per true cluster (k-means is init-sensitive)
    job = KMeansJob(column="embedding", tol=1e-9)
    cents = run_imru(job, ds, init.copy(), max_iters=50)
    # every point is within its cluster spread of some centroid
    d = np.linalg.norm(pts[:, None, :] - cents[None], axis=2).min(axis=1)
    assert d.max() < 2.0


def test_tree_reduce_exact_and_deep(ray_session):
    """The aggregation tree (reference ReduceAggregationTreeFactory) folds
    many map-output blocks through multiple levels and matches the serial
    fold exactly for an integer-sum job (associative + exact)."""
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.imru import run_imru, tree_reduce

    class CountJob:
        def map(self, df, model):
            return int(df["x"].sum()), len(df)

        def reduce(self, a, b):
            return a[0] + b[0], a[1] + b[1]

        def update(self, reduced, model):
            return reduced

        def should_terminate(self, old, new, iteration):
            return True

    n = 1000
    ds = ray.data.from_pandas(
        [pd.DataFrame({"x": np.arange(i, i + 10)}) for i in range(0, n, 10)]
    )  # 100 blocks → 3 tree levels at arity 8
    total, rows = run_imru(CountJob(), ds, None, max_iters=1, reduce_arity=8)
    assert rows == n
    assert total == sum(range(n))
    assert tree_reduce(CountJob(), []) is None


def test_knn_ivf_high_recall(emb):
    ds, pts = emb
    qs = pts[[3, 55, 100]]
    qids = np.array([3, 55, 100])
    exact = E.knn_brute_force(ds, qs, qids, k=10).to_pandas()
    approx = E.knn_ivf(ds, qs, qids, k=10, n_clusters=6, nprobe=3).to_pandas()
    recall = 0.0
    for qid in qids:
        ev = set(exact[exact["query_id"] == qid]["vec_id"])
        av = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(ev & av) / len(ev)
    assert recall / len(qids) >= 0.9


def test_cosine_dup_pairs(emb):
    ds, pts = emb
    got = E.cosine_dup_pairs(ds, threshold=0.999).to_pandas()
    # near-identical vectors within a tight cluster only; pairs are oriented
    assert (got["vec_a"] < got["vec_b"]).all()
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sims = pn @ pn.T
    iu = np.triu_indices(len(pts), k=1)
    want = int((sims[iu] >= 0.999).sum())
    assert len(got) == want


def test_cosine_dup_pairs_multiblock_exact(emb):
    """Force several corpus blocks so the cross-block pair tasks (including
    pairs whose smaller id lives in the later block) are exercised."""
    ds, pts = emb
    got = (
        E.cosine_dup_pairs(ds.repartition(5), threshold=0.99)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sims = pn @ pn.T
    ia, ib = np.triu_indices(len(pts), k=1)
    m = sims[ia, ib] >= 0.99
    want = (
        pd.DataFrame(
            {
                "vec_a": ia[m],
                "vec_b": ib[m],
                "sim": np.round(sims[ia, ib][m], 6),
            }
        )
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"vec_a": np.int64, "vec_b": np.int64}), want
    )


def test_cosine_dup_pairs_ivf_recall(emb):
    ds, pts = emb
    exact = E.cosine_dup_pairs(ds, threshold=0.99).to_pandas()
    approx = E.cosine_dup_pairs_ivf(
        ds, threshold=0.99, n_clusters=6, nprobe=3
    ).to_pandas()
    ep = set(zip(exact["vec_a"], exact["vec_b"]))
    ap = set(zip(approx["vec_a"].astype(int), approx["vec_b"].astype(int)))
    assert ap <= ep  # no false positives (cells verify exactly)
    assert len(ap & ep) / max(len(ep), 1) >= 0.9  # high recall


def test_bgd_linear_recovers_weights(ray_session):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(500, 3))
    w_true = np.array([2.0, -1.0, 0.5])
    y = X @ w_true + 3.0
    df = pd.DataFrame(X, columns=["x1", "x2", "x3"])
    df["y"] = y
    ds = ray.data.from_pandas(df)
    job = BGDLinearJob(feature_cols=("x1", "x2", "x3"), target_col="y", lr=0.5)
    w = run_imru(job, ds, np.zeros(4), max_iters=200)
    np.testing.assert_allclose(w, [2.0, -1.0, 0.5, 3.0], atol=1e-3)


def test_kmeans_cells_match_numpy_oracle(ray_session):
    """The emb_kmeans_cells driver query vs an INDEPENDENT driver-side numpy
    Lloyd's with identical init (first-64 rows, rng seed 3), iteration count
    and tolerance — the reference-style golden for the one query without a
    SQL formulation (iterative ML)."""
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["emb_kmeans_cells"](sf)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    df = pd.read_parquet(f"{sf}/embeddings.parquet")
    pts = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    first = pts[:64]
    rng = np.random.default_rng(3)
    model = first[rng.choice(len(first), size=8, replace=False)]
    for _ in range(10):  # Lloyd's, euclidean; empty cells keep their centroid
        d2 = ((pts[:, None, :] - model[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        new = model.copy()
        for c in range(8):
            m = assign == c
            if m.any():
                new[c] = pts[m].mean(axis=0)
        done = bool(np.abs(new - model).max() < 1e-6)
        model = new
        if done:
            break
    cn = model / np.linalg.norm(model, axis=1, keepdims=True)
    pn = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    want = np.argmax(pn @ cn.T, axis=1)
    ids = df["vec_id"].to_numpy()
    order = np.argsort(ids)
    np.testing.assert_array_equal(got["cell"].to_numpy(), want[order])


def test_label_centroids_match_numpy(emb):
    import numpy as np

    from asterixdb_analytics_ray.pipelines.embeddings import label_centroids

    ds, _ = emb
    got = label_centroids(ds).to_pandas().set_index("label")
    df = ds.to_pandas()
    for lab, g in df.groupby("label"):
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        cent = m.mean(axis=0)
        c2 = float(cent @ cent)
        disp = float((m * m).sum() / len(m) - c2)
        assert got.loc[lab, "n"] == len(m)
        assert abs(got.loc[lab, "centroid_norm"] - np.sqrt(c2)) < 1e-5
        assert abs(got.loc[lab, "dispersion"] - disp) < 1e-5


def _lsh_reference(pts, threshold, n_bands, band_bits, H):
    """Brute-force reference for cosine_dup_pairs_lsh's semantics: pairs
    sharing >=1 band bucket whose exact cosine >= threshold."""
    bits = (pts @ H.T >= 0).reshape(len(pts), n_bands, band_bits)
    buckets = bits @ (1 << np.arange(band_bits))
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sims = pn @ pn.T
    out = set()
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            if (buckets[a] == buckets[b]).any() and sims[a, b] >= threshold:
                out.add((a, b, round(sims[a, b], 6)))
    return out


def test_lsh_dup_pairs_planted_recall(ray_session):
    """Gaussian-default LSH finds every planted near-dup (sim >= 0.999 pairs
    collide with prob ~1 at 16 bands x 4 bits) and emits zero false
    positives (survivors are exact-verified in-bucket)."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(60, 16))
    dups = base[:12] + rng.normal(size=(12, 16)) * 1e-3  # vec 60+i ~ vec i
    pts = np.concatenate([base, dups])
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [row.astype(np.float64) for row in pts],
        }
    )
    got = E.cosine_dup_pairs_lsh(
        ray.data.from_pandas(df), threshold=0.95, n_bands=16, band_bits=4
    ).to_pandas()
    found = set(zip(got["vec_a"], got["vec_b"]))
    assert {(i, 60 + i) for i in range(12)} <= found
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    for a, b, s in zip(got["vec_a"], got["vec_b"], got["sim"]):
        exact = float(pn[a] @ pn[b])
        assert exact >= 0.95  # no false positives survive verification
        assert abs(s - round(exact, 6)) < 1e-9


def test_lsh_dup_pairs_axis_semantics(ray_session):
    """Axis-hyperplane LSH (the oracle-checkable driver configuration)
    matches a brute-force reimplementation of the bucket->verify->dedup
    semantics exactly, across multiple blocks."""
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(150, 12))
    pts[50:75] = pts[:25] + rng.normal(size=(25, 12)) * 0.05
    H = np.eye(8, 12)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [row.astype(np.float64) for row in pts],
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = E.cosine_dup_pairs_lsh(
        ds, threshold=0.6, n_bands=2, band_bits=4, hyperplanes=H
    ).to_pandas()
    want = _lsh_reference(pts, 0.6, 2, 4, H)
    assert set(zip(got["vec_a"], got["vec_b"], got["sim"])) == want
    # each pair reported once despite multi-band collisions
    assert got.duplicated(["vec_a", "vec_b"]).sum() == 0


def test_lsh_dup_pairs_hot_bucket_salting(ray_session):
    """A degenerate corpus (300 near-identical vectors -> one mega-bucket
    per band) with max_bucket set completes with bounded per-task buckets,
    warns, keeps every surviving pair exact-verified, and — because equal
    full signatures share a salt — still finds the sign-identical dups.
    Without the cap the result is the lossless superset."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=16)
    pts = base + rng.normal(size=(300, 16)) * 1e-4  # all in one bucket
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [row.astype(np.float64) for row in pts],
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    full = E.cosine_dup_pairs_lsh(
        ds, threshold=0.999, n_bands=4, band_bits=4
    ).to_pandas()
    with pytest.warns(RuntimeWarning, match="hot bucket"):
        capped = E.cosine_dup_pairs_lsh(
            ds, threshold=0.999, n_bands=4, band_bits=4, max_bucket=50
        ).to_pandas()
    full_set = set(zip(full["vec_a"], full["vec_b"], full["sim"]))
    capped_set = set(zip(capped["vec_a"], capped["vec_b"], capped["sim"]))
    assert capped_set <= full_set  # lossy only, never wrong
    pn = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    for a, b, s in capped_set:
        assert float(pn[a] @ pn[b]) >= 0.999  # exact-verified survivors
    # sign-identical vectors share fullsig => same salt => pairs survive
    assert len(capped_set) > 0


def test_salt_mod_u64_power_of_two_split():
    """Regression for the round-4 ADVICE finding: the salt modulo must run
    entirely in uint64. Mixed uint64/int64 promotes to float64 and rounds
    signatures >= 2^53 to multiples of 2^11, so k=2 (the most common hot
    split factor) produced ONE salt class for every row — a silent no-op."""
    rng = np.random.default_rng(0)
    # int64-stored FNV values with both parities, magnitudes >= 2^53
    sig = rng.integers(2**62, 2**63 - 1, size=1000, dtype=np.int64)
    k = np.full(1000, 2, dtype=np.int64)
    salt = E._salt_mod_u64(sig, k)
    assert set(np.unique(salt)) == {0, 1}  # both parities present
    np.testing.assert_array_equal(
        salt, (sig.astype(np.uint64) % np.uint64(2)).astype(np.int64)
    )
    # the float64 promotion path would have produced a single class:
    bad = np.where(k > 1, sig.astype(np.uint64) % pd.Series(k), 0)
    assert len(np.unique(bad)) == 1  # documents exactly what the bug did
    # k<=1 rows salt to 0
    assert (E._salt_mod_u64(sig, np.zeros(1000, dtype=np.int64)) == 0).all()


def test_stratified_cell_sample_deterministic_and_bounded(ray_session):
    """Per-cell cap holds, every non-empty cell is represented, and the
    sample is a pure function of the data (identical across runs and
    partitionings)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import (
        stratified_cell_sample,
    )

    rng = np.random.default_rng(5)
    n, d, k, per = 400, 8, 4, 7
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.standard_normal((n, d))),
        }
    )
    a = (
        stratified_cell_sample(
            ray.data.from_pandas(emb).repartition(4),
            n_clusters=k, per_cell=per,
        )
        .to_pandas()
        .sort_values(["cell", "vec_id"])
        .reset_index(drop=True)
    )
    b = (
        stratified_cell_sample(
            ray.data.from_pandas(emb).repartition(9),
            n_clusters=k, per_cell=per,
        )
        .to_pandas()
        .sort_values(["cell", "vec_id"])
        .reset_index(drop=True)
    )
    assert a.equals(b)  # partitioning-independent
    sizes = a.groupby("cell").size()
    assert (sizes <= per).all() and len(sizes) >= 1
    # ranking matches the oracle's md5(CAST(vec_id AS VARCHAR)) rule:
    # recompute the expected winners for one cell brute-force
    from asterixdb_analytics_ray.pipelines.embeddings import (
        _normalize, train_kmeans_centroids,
    )

    cents = _normalize(
        train_kmeans_centroids(
            ray.data.from_pandas(emb).repartition(4), n_clusters=k, iters=10
        )
    )
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    cell = np.argmax(_normalize(m) @ cents.T, axis=1)
    for c in sizes.index:
        ids = emb["vec_id"].to_numpy()[cell == c]
        want = sorted(
            ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
        )[:per]
        assert sorted(a[a.cell == c]["vec_id"]) == sorted(want)


def test_ivf_recall_bounds_and_perfect_probe(ray_session):
    """recall ∈ [0,1]; probing ALL cells makes IVF exhaustive → recall 1."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import ivf_recall

    rng = np.random.default_rng(11)
    n, d = 300, 6
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.standard_normal((n, d))),
        }
    )
    ds = ray.data.from_pandas(emb).repartition(4)
    q = np.stack(emb["embedding"].to_numpy()[:2]).astype(np.float64)
    qi = np.array([0, 1], dtype=np.int64)

    part = ivf_recall(ds, q, qi, k=5, n_clusters=4, nprobe=1).to_pandas()
    assert ((part.recall >= 0) & (part.recall <= 1)).all()
    assert (part.n_hits <= 5).all()

    full = ivf_recall(ds, q, qi, k=5, n_clusters=4, nprobe=4).to_pandas()
    assert (full.recall == 1.0).all()


def test_silhouette_matches_pairwise_brute_force(ray_session):
    """The sufficient-statistic identity equals the direct pairwise
    squared-distance silhouette; singletons score 0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import silhouette_scores

    rng = np.random.default_rng(31)
    n, d = 120, 5
    m = rng.standard_normal((n, d))
    lab = rng.integers(0, 4, n)
    lab[0] = 9  # singleton cluster
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(m),
            "label": lab.astype(np.int64),
        }
    )
    out = (
        silhouette_scores(ray.data.from_pandas(emb).repartition(4))
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )

    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(-1)
    for i in range(n):
        own = lab == lab[i]
        if own.sum() == 1:
            assert out.loc[i, "s"] == 0.0
            continue
        a = d2[i][own].sum() / (own.sum() - 1)
        b = min(
            d2[i][lab == c].mean() for c in set(lab) if c != lab[i]
        )
        s = (b - a) / max(a, b)
        assert out.loc[i, "a"] == pytest.approx(a, abs=2e-6)
        assert out.loc[i, "b"] == pytest.approx(b, abs=2e-6)
        assert out.loc[i, "s"] == pytest.approx(s, abs=2e-6)
