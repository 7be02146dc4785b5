"""Unit tests for the round-5 operators: HITS, personalized + weighted
PageRank, k-core, k-truss, local clustering coefficient, Adamic–Adar +
Jaccard link prediction, maximal independent set, degree histogram, degree
assortativity, global transitivity, bigram PMI, token entropy/TTR,
int8 embedding quantization, deterministic random walks.

Each is verified against an independent brute-force numpy/python
formulation on micrographs or synthetic tables (the DuckDB parity check
lives in test_oracle_conformance.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from asterixdb_analytics_ray.sources.micrographs import (
    as_dataset,
    clique7,
    two_components,
    webmap20,
)


def _sym_simple(src, dst):
    """Symmetric simple edge set (both directions, self-loops dropped)."""
    m = src != dst
    a = np.concatenate([src[m], dst[m]])
    b = np.concatenate([dst[m], src[m]])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _oriented(src, dst):
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


# ---------------------------------------------------------------- HITS


def _hits_ref(src, dst, n, iters):
    A = np.zeros((n, n))
    A[src, dst] += 1.0  # multi-edges collapse upstream; micrographs are simple
    hub = np.ones(n)
    for _ in range(iters):
        auth = A.T @ hub
        hub = A @ auth
    return hub, auth


def test_hits_matches_dense_reference(ray_session):
    from asterixdb_analytics_ray.pipelines.hits import hits_table

    src, dst, n = webmap20()
    t = hits_table(as_dataset(src, dst), n, iters=10)
    hub_ref, auth_ref = _hits_ref(src, dst, n, 10)
    hub_ref = hub_ref / hub_ref.max()
    auth_ref = auth_ref / auth_ref.max()
    np.testing.assert_allclose(t["hub"].to_numpy(), hub_ref, atol=2e-7)
    np.testing.assert_allclose(t["auth"].to_numpy(), auth_ref, atol=2e-7)
    assert float(t["hub"].to_numpy().max()) == 1.0
    assert float(t["auth"].to_numpy().max()) == 1.0


# ------------------------------------------------- personalized PageRank


def test_personalized_pagerank_concentrates_on_source(ray_session):
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense

    src, dst, n = webmap20()
    outdeg = np.bincount(src, minlength=n)
    res = pagerank_dense(
        as_dataset(src, dst), n, outdeg, supersteps=10, teleport=0
    )
    ranks = res.state["rank"]
    # independent reference: dense iteration with teleport-to-0
    r = np.full(n, 1.0 / n)
    for _ in range(9):
        msgs = np.zeros(n)
        np.add.at(msgs, dst, r[src] / outdeg[src])
        r = 0.85 * msgs
        r[0] += 0.15
    np.testing.assert_allclose(ranks, r, atol=1e-12)
    # mass concentrates near the teleport source's component
    assert ranks[0] > ranks.mean()


# ---------------------------------------------------------------- k-core


def test_kcore_clique_vs_chain(ray_session):
    from asterixdb_analytics_ray.pipelines.kcore import kcore_table

    # clique7: {0,1,2,3} is a K4 (3-core); {4,5,6} is a K3 (2-core only);
    # two_components: chain + ring are both ≤ 2-core
    src, dst, n = clique7()
    us, ud = _sym_simple(src, dst)
    t = kcore_table(as_dataset(us, ud), n, k=3)
    assert t["v"].to_pylist() == [0, 1, 2, 3]
    assert t["core_deg"].to_pylist() == [3, 3, 3, 3]

    t2 = kcore_table(as_dataset(us, ud), n, k=2)
    assert t2["v"].to_pylist() == [0, 1, 2, 3, 4, 5, 6]

    src, dst, n = two_components()
    us, ud = _sym_simple(src, dst)
    t3 = kcore_table(as_dataset(us, ud), n, k=2)
    assert t3["v"].to_pylist() == [6, 7, 8, 9, 10, 11]  # the ring
    assert all(d == 2 for d in t3["core_deg"].to_pylist())
    t4 = kcore_table(as_dataset(us, ud), n, k=3)
    assert t4.num_rows == 0


def test_kcore_rounds_within_oracle_unroll(ray_session):
    from asterixdb_analytics_ray.pipelines.kcore import KCORE_MAX_ROUNDS, kcore

    src, dst, n = two_components()  # chain peels one layer per round
    us, ud = _sym_simple(src, dst)
    res = kcore(as_dataset(us, ud), n, k=2)
    assert len(res.rounds) < KCORE_MAX_ROUNDS


# ------------------------------------------------ clustering coefficient


def test_clustering_coefficient_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.triangles import clustering_coefficient

    src, dst, n = clique7()
    oa, ob = _oriented(src, dst)
    got = (
        clustering_coefficient(as_dataset(oa, ob), n)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    # brute force over the simple graph
    adj = [set() for _ in range(n)]
    for a, b in zip(oa, ob):
        adj[a].add(b)
        adj[b].add(a)
    for _, row in got.iterrows():
        v = int(row["v"])
        deg = len(adj[v])
        tri = sum(
            1
            for x in adj[v]
            for y in adj[v]
            if x < y and y in adj[x]
        )
        lcc = (2.0 * tri) / (deg * (deg - 1.0)) if deg >= 2 else 0.0
        assert row["deg"] == deg
        assert row["triangles"] == tri
        assert abs(row["lcc"] - lcc) < 1e-9
    assert set(got["v"]) == {v for v in range(n) if adj[v]}


def test_triangle_participation_total_is_3x(ray_session):
    from asterixdb_analytics_ray.pipelines.triangles import triangle_count

    src, dst, n = clique7()
    oa, ob = _oriented(src, dst)
    _, total_min = triangle_count(as_dataset(oa, ob), n, attribute="min")
    per_all, total_all = triangle_count(as_dataset(oa, ob), n, attribute="all")
    assert total_all == 3 * total_min
    assert per_all.to_pandas()["triangles"].sum() == 3 * total_min


# ------------------------------------------------------- Adamic–Adar


def test_adamic_adar_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.linkpred import adamic_adar_topk

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    got = (
        adamic_adar_topk(as_dataset(us, ud), n, k=1000, max_center_degree=256)
        .to_pandas()
        .reset_index(drop=True)
    )
    adj = [set() for _ in range(n)]
    for a, b in zip(us, ud):
        adj[a].add(b)
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if common:
                want[(a, b)] = (
                    len(common),
                    sum(1.0 / np.log(len(adj[z])) for z in common),
                )
    assert len(got) == len(want)
    for _, row in got.iterrows():
        cm, sc = want[(int(row["a"]), int(row["b"]))]
        assert row["common"] == cm
        assert abs(row["score"] - sc) < 1e-8
    # descending by score with (a, b) tie-break
    key = list(zip(-got["score"], got["a"], got["b"]))
    assert key == sorted(key)


def test_adamic_adar_center_cap_excludes_hubs(ray_session):
    from asterixdb_analytics_ray.pipelines.linkpred import adamic_adar_topk

    # star: center 0 connected to 1..9 — every leaf pair's only common
    # neighbor is the hub, so capping below 9 empties the result
    s = np.repeat(0, 9)
    d = np.arange(1, 10)
    us, ud = _sym_simple(s, d)
    got = adamic_adar_topk(as_dataset(us, ud), 10, k=100, max_center_degree=5)
    assert got.count() == 0
    full = adamic_adar_topk(as_dataset(us, ud), 10, k=100, max_center_degree=9)
    assert full.count() == 36  # C(9,2) leaf pairs


# ------------------------------------------------------- bigram PMI


def test_bigram_pmi_brute_force(ray_session):
    import math

    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import bigram_pmi

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "new york is big",
                "new york new york",
                "big apple new york",
                "",
                "york new",
                "the big apple the big apple",
            ],
        }
    )
    got = bigram_pmi(
        ray.data.from_pandas(docs), k=100, min_count=2
    ).to_pandas()
    toks = [t.split() for t in docs["text"]]
    uni: dict = {}
    big: dict = {}
    for lst in toks:
        for w in lst:
            uni[w] = uni.get(w, 0) + 1
        for w1, w2 in zip(lst, lst[1:]):
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
    U = sum(uni.values())
    B = sum(big.values())
    want = {
        p: (c, math.log((c / B) / ((uni[p[0]] / U) * (uni[p[1]] / U))))
        for p, c in big.items()
        if c >= 2
    }
    assert len(got) == len(want)
    for _, row in got.iterrows():
        c, pmi = want[(row["w1"], row["w2"])]
        assert row["cnt"] == c
        assert abs(row["pmi"] - pmi) < 1e-9


def test_bigram_pmi_distributed_join_path_matches(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import bigram_pmi

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b a b", "a b c", "c a b", "b c b c"],
        }
    )
    ds = ray.data.from_pandas(docs)
    broad = bigram_pmi(ds, k=10, min_count=1).to_pandas()
    dist = bigram_pmi(ds, k=10, min_count=1, max_broadcast_vocab=0).to_pandas()
    pd.testing.assert_frame_equal(
        broad.sort_values(["w1", "w2"]).reset_index(drop=True),
        dist.sort_values(["w1", "w2"]).reset_index(drop=True),
        check_dtype=False,
    )


# --------------------------------------------------- degree histogram


def test_degree_histogram(ray_session):
    from asterixdb_analytics_ray.pipelines.degrees import degree_histogram

    src, dst, n = webmap20()
    got = (
        degree_histogram(as_dataset(src, dst), n + 3)  # 3 isolated vertices
        .to_pandas()
        .sort_values("out_degree")
        .reset_index(drop=True)
    )
    deg = np.bincount(src, minlength=n + 3)
    want = pd.Series(deg).value_counts().sort_index()
    assert got["out_degree"].tolist() == want.index.tolist()
    assert got["n_vertices"].tolist() == want.tolist()
    assert int(got["n_vertices"].sum()) == n + 3


# ------------------------------------------------- int8 quantization


def test_quantize_int8_brute_force(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import quantize_int8

    rng = np.random.default_rng(7)
    m = rng.standard_normal((40, 8)).astype(np.float32)
    m[:, 3] = 0.0  # an all-zero dimension must quantize to 0, not NaN
    tbl = pa.table(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": pa.array(
                [list(map(float, row)) for row in m], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        quantize_int8(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    x = m.astype(np.float64)
    s = np.abs(x).max(axis=0)
    y = np.divide(127.0 * x, s, out=np.zeros_like(x), where=s != 0)
    code = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
    assert len(got) == 40 * 8
    np.testing.assert_array_equal(
        got["code"].to_numpy().reshape(40, 8), code
    )
    assert (np.abs(got["code"].to_numpy()) <= 127).all()
    assert (got[got["dim"] == 3]["code"] == 0).all()


# ------------------------------------------------------- random walks


def test_random_walks_deterministic_brute_force(ray_session):
    import hashlib

    from asterixdb_analytics_ray.pipelines.walks import random_walks

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    got = (
        random_walks(as_dataset(us, ud), n, walk_len=4)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    adj = {}
    for a, b in zip(us, ud):
        adj.setdefault(int(a), []).append(int(b))
    for v in adj:
        adj[v].sort()

    def h(wid, t, v):
        s = f"{wid}:{t}:{v}"
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")

    starts = sorted(adj)
    assert len(got) == len(starts) * 5
    for wid in starts:
        cur = wid
        walk = got[got["walk_id"] == wid].sort_values("step")
        assert walk["v"].iloc[0] == wid and walk["step"].iloc[0] == 0
        for t in range(1, 5):
            nbrs = adj[cur]
            cur = nbrs[h(wid, t, cur) % len(nbrs)]
            assert walk["v"].iloc[t] == cur, (wid, t)


def test_random_walks_restart_identical(ray_session):
    from asterixdb_analytics_ray.pipelines.walks import random_walks

    src, dst, n = two_components()
    us, ud = _sym_simple(src, dst)
    a = random_walks(as_dataset(us, ud), n).to_pandas()
    b = random_walks(as_dataset(us, ud), n).to_pandas()
    key = ["walk_id", "step"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# --------------------------------------------------- weighted PageRank


def test_weighted_pagerank_brute_force(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense

    src, dst, n = webmap20()
    rng = np.random.default_rng(3)
    w = rng.integers(1, 6, size=len(src)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "w": pa.array(w)})
    )
    wsum = np.zeros(n)
    np.add.at(wsum, src, w.astype(np.float64))
    res = pagerank_dense(ds, n, wsum, supersteps=10, weight_col="w")
    # independent dense reference
    r = np.full(n, 1.0 / n)
    for _ in range(9):
        msgs = np.zeros(n)
        np.add.at(msgs, dst, r[src] * w / wsum[src])
        r = 0.15 / n + 0.85 * msgs
    np.testing.assert_allclose(res.state["rank"], r, atol=1e-12)
    # unit weights reduce to plain PageRank
    ones = ds.map_batches(
        lambda t: t.set_column(2, "w", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    ru = pagerank_dense(ones, n, outdeg, supersteps=10, weight_col="w")
    rp = pagerank_dense(ds.select_columns(["src", "dst"]), n, outdeg, supersteps=10)
    np.testing.assert_allclose(ru.state["rank"], rp.state["rank"], atol=1e-15)


# ----------------------------------------------- maximal independent set


def test_mis_is_maximal_and_independent(ray_session):
    from asterixdb_analytics_ray.pipelines.mis import mis_table

    for fixture in (clique7, two_components, webmap20):
        src, dst, n = fixture()
        us, ud = _sym_simple(src, dst)
        got = set(mis_table(as_dataset(us, ud), n)["v"].to_pylist())
        adj = [set() for _ in range(n)]
        for a, b in zip(us, ud):
            adj[a].add(b)
        # independent: no two MIS members adjacent
        for v in got:
            assert not (adj[v] & got), (fixture.__name__, v)
        # maximal: every non-member has an MIS neighbor (or is isolated,
        # in which case it must be IN the set)
        for v in range(n):
            if v not in got:
                assert adj[v] & got, (fixture.__name__, v)


def test_mis_matches_greedy_priority_reference(ray_session):
    import hashlib

    from asterixdb_analytics_ray.pipelines.mis import MIS_MAX_ROUNDS, mis

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    res = mis(as_dataset(us, ud), n)
    got = set(np.flatnonzero(res.state["mis"] > 0).tolist())
    assert len(res.rounds) < 2 * MIS_MAX_ROUNDS

    # independent greedy reference: process vertices by descending priority
    # — with ONE fixed permutation the parallel rounds and the sequential
    # greedy produce the IDENTICAL set
    def h(v):
        return int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "big"
        ) >> 11

    adj = [set() for _ in range(n)]
    for a, b in zip(us, ud):
        adj[a].add(b)
    want, blocked = set(), set()
    for v in sorted(range(n), key=h, reverse=True):
        if v not in blocked:
            want.add(v)
            blocked |= adj[v] | {v}
    assert got == want


# ------------------------------------------------------------- k-truss


def _truss_ref(pairs, k):
    """Sequential reference peeling."""
    edges = set(pairs)
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b])
            for a, b in edges
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return {e: sup[e] for e in edges}
        edges -= drop


def test_ktruss_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.truss import ktruss

    for fixture, k in ((clique7, 4), (webmap20, 4), (two_components, 3)):
        src, dst, n = fixture()
        oa, ob = _oriented(src, dst)
        final, rounds = ktruss(as_dataset(oa, ob), n, k=k)
        got = {
            (int(r["a"]), int(r["b"])): int(r["support"])
            for _, r in final.to_pandas().iterrows()
        }
        want = _truss_ref(list(zip(oa.tolist(), ob.tolist())), k)
        assert got == want, (fixture.__name__, k)
        assert rounds < 20


def test_ktruss_clique_is_complete(ray_session):
    from asterixdb_analytics_ray.pipelines.truss import ktruss

    # K4 on {0,1,2,3}: its 6 edges each sit in 2 triangles => 4-truss
    src, dst, n = clique7()
    oa, ob = _oriented(src, dst)
    final, _ = ktruss(as_dataset(oa, ob), n, k=4)
    df = final.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert [tuple(x) for x in df[["a", "b"]].to_numpy()] == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    ]
    assert (df["support"] == 2).all()
    # k=5 demands support 3 per edge — K4 can't provide it
    empty, _ = ktruss(as_dataset(oa, ob), n, k=5)
    assert empty.count() == 0


# ----------------------------------------------- degree assortativity


def test_degree_assortativity_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.degrees import degree_assortativity

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    got = float(
        degree_assortativity(as_dataset(us, ud), n)["assortativity"][0].as_py()
    )
    deg = np.zeros(n, dtype=np.int64)
    for a in us:
        deg[a] += 1
    x = deg[us].astype(np.float64)
    y = deg[ud].astype(np.float64)
    want = float(np.corrcoef(x, y)[0, 1])
    assert abs(got - want) < 1e-9
    # a star is maximally disassortative
    s = np.repeat(0, 9)
    d = np.arange(1, 10)
    ss, sd = _sym_simple(s, d)
    star = float(
        degree_assortativity(as_dataset(ss, sd), 10)["assortativity"][0].as_py()
    )
    assert star == -1.0


# ----------------------------------------------- Jaccard link prediction


def test_jaccard_topk_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.linkpred import jaccard_topk

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    got = (
        jaccard_topk(as_dataset(us, ud), n, k=1000)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force: adjacency sets, all non-adjacent pairs with >=1 common
    adj = {v: set() for v in range(n)}
    for a, b in zip(us, ud):
        adj[int(a)].add(int(b))
    rows = []
    for a in range(n):
        for b in range(a + 1, n):
            if b in adj[a]:
                continue
            common = len(adj[a] & adj[b])
            if common == 0:
                continue
            union = len(adj[a] | adj[b])
            rows.append((a, b, common, union, common / union))
    want = pd.DataFrame(
        rows, columns=["a", "b", "common", "union_size", "score"]
    ).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["a"] == want["a"]).all() and (got["b"] == want["b"]).all()
    assert (got["common"] == want["common"]).all()
    assert (got["union_size"] == want["union_size"]).all()
    assert np.allclose(got["score"], want["score"], atol=1e-9)


def test_jaccard_topk_respects_center_cap(ray_session):
    """A star center above the degree cap contributes no wedges at all."""
    from asterixdb_analytics_ray.pipelines.linkpred import jaccard_topk

    s = np.repeat(0, 9)
    d = np.arange(1, 10)
    ss, sd = _sym_simple(s, d)
    assert jaccard_topk(as_dataset(ss, sd), 10, max_center_degree=4).count() == 0
    full = jaccard_topk(as_dataset(ss, sd), 10, max_center_degree=16).to_pandas()
    # all leaf pairs share exactly the hub: common=1, union=1 → score 1.0
    assert len(full) == 36 and (full["score"] == 1.0).all()


# ----------------------------------------------------- global transitivity


def test_transitivity_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.triangles import transitivity

    src, dst, n = webmap20()
    oa, ob = _oriented(src, dst)
    t = transitivity(as_dataset(oa, ob), n)
    adj = [set() for _ in range(n)]
    for a, b in zip(oa, ob):
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a in range(n)
        for b in adj[a]
        for c in adj[b]
        if a < b < c and c in adj[a]
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj)
    assert t["triangles"][0].as_py() == tri
    assert t["wedges"][0].as_py() == wedges
    assert abs(t["transitivity"][0].as_py() - 3.0 * tri / wedges) < 1e-9
    # a clique is perfectly transitive
    src, dst, n = clique7()
    oa, ob = _oriented(src, dst)
    # keep only the K4 {0,1,2,3}
    m = (oa < 4) & (ob < 4)
    t2 = transitivity(as_dataset(oa[m], ob[m]), 4)
    assert t2["transitivity"][0].as_py() == 1.0


# -------------------------------------------------- token entropy / TTR


def test_token_entropy_brute_force(ray_session):
    import math

    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import token_entropy

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b a b a",          # skewed bigram vocab
                "one",                 # single token → entropy 0, ttr 1
                "",                    # empty → all zeros
                "x y z",               # uniform → entropy log2(3)
                "  spaced   out  ",    # whitespace runs
            ],
        }
    )
    got = (
        token_entropy(ray.data.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        toks = docs.loc[docs["doc_id"] == row["doc_id"], "text"].iloc[0].split()
        n = len(toks)
        assert row["n_tokens"] == n
        assert row["distinct_tokens"] == len(set(toks))
        if n == 0:
            assert row["ttr"] == 0.0 and row["entropy"] == 0.0
            continue
        assert abs(row["ttr"] - len(set(toks)) / n) < 1e-9
        ent = -sum(
            (toks.count(t) / n) * math.log2(toks.count(t) / n)
            for t in set(toks)
        )
        assert abs(row["entropy"] - ent) < 1e-6
    # signs are clean: no -0.0 leaks from single-token docs
    one = got.loc[got["doc_id"] == 1, "entropy"].iloc[0]
    assert math.copysign(1.0, one) == 1.0
    assert abs(got.loc[got["doc_id"] == 3, "entropy"].iloc[0] - math.log2(3)) < 1e-6


# ------------------------------------------------------- betweenness


def _brandes_ref(src, dst, n, sources):
    """Sequential textbook Brandes (BFS + stack-ordered dependency
    accumulation) — structurally independent of the engine's
    level-synchronous formulation."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    bc = np.zeros(n)
    for s in sources:
        stack, preds = [], [[] for _ in range(n)]
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1)
        dist[s] = 0
        q = deque([s])
        while q:
            u = q.popleft()
            stack.append(u)
            for v in adj[u]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = np.zeros(n)
        while stack:
            w = stack.pop()
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_brute_force(ray_session):
    """Engine Brandes equals the sequential textbook algorithm on the
    webmap micrograph (and the path graph's interior-vertex closed form),
    and every BFS stays inside the oracle's 12-level unroll."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.betweenness import (
        brandes_betweenness,
    )

    src, dst, n = webmap20()
    us, ud = _sym_simple(src, dst)
    sources = (0, 1, 2, 3)
    got = (
        brandes_betweenness(as_dataset(us, ud), n, sources=sources)
        .to_pandas()
        .set_index("v")["bc"]
    )
    want = _brandes_ref(us, ud, n, sources)
    for v in range(n):
        if want[v] > 0:
            assert abs(got.get(v, 0.0) - round(want[v], 6)) < 2e-6, v
        else:
            assert v not in got.index

    # path 0-1-2-3-4, sources {0}: delta(3)=1, delta(2)=2, delta(1)=3
    ps, pd_ = _sym_simple(
        np.array([0, 1, 2, 3]), np.array([1, 2, 3, 4])
    )
    out = (
        brandes_betweenness(as_dataset(ps, pd_), 5, sources=(0,))
        .to_pandas()
        .set_index("v")["bc"]
    )
    assert out.to_dict() == {1: 3.0, 2: 2.0, 3: 1.0}


# ---------------------------------------------------------------------------
# round-5 fourth wave: scrub_terms / covariance_stats / tool_paths
# ---------------------------------------------------------------------------


def test_scrub_terms_counts_and_rewrite(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import scrub_terms

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["spark and slow spark", "sparkle dupe", ""],
            }
        )
    )
    out = scrub_terms(docs).to_pandas().set_index("doc_id").sort_index()
    assert out["n_hits"].tolist() == [3, 0, 0]
    assert out.loc[1, "clean_text"] == "<TERM> and <TERM> <TERM>"
    # substrings of blocked words survive (word-boundary semantics)
    assert out.loc[2, "clean_text"] == "sparkle dupe"
    assert out["clean_len"].tolist() == [24, 12, 0]


def test_covariance_stats_matches_numpy(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import covariance_stats

    rng = np.random.default_rng(7)
    m = rng.normal(size=(40, 5)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(40, dtype=np.int64),
                "embedding": pa.array(
                    [r for r in m.tolist()], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(4)
    out = covariance_stats(emb).to_pandas()
    want = np.cov(m.astype(np.float64), rowvar=False, bias=True)
    for _, r in out.iterrows():
        assert abs(r["cov"] - want[int(r["i"]), int(r["j"])]) < 1e-6
    assert len(out) == 5 * 6 // 2


def test_tool_paths_ordering_and_topk(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_paths

    t = pa.table(
        {
            "conv_id": ["a", "a", "a", "b", "b", "c", "d"],
            "turn_idx": [2, 0, 1, 1, 0, 0, 0],
            "tool": ["t3", "t1", None, "t3", "t1", "t1", "t9"],
        }
    )
    out = tool_paths(ray.data.from_arrow(t), k=2).to_pandas()
    # conv a: turns 0,2 with tools t1,t3 (turn 1 has no tool) → "t1>t3"
    # conv b: "t1>t3"; conv c: "t1"; conv d: "t9" → top-2 by count then path
    assert out["path"].tolist() == ["t1>t3", "t1"]
    assert out["n_convs"].tolist() == [2, 1]


def test_top_direction_matches_numpy_eig(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import top_direction

    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant axis along dim 0
    m = rng.normal(size=(200, 6)) * np.array([5.0, 1, 1, 0.5, 0.5, 0.1])
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(200, dtype=np.int64),
                "embedding": pa.array(
                    m.astype(np.float32).tolist(), pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(3)
    out = top_direction(emb, iters=50).to_pandas().sort_values("i")
    cov = np.cov(m.astype(np.float32).astype(np.float64), rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1] * np.sign(v[0, -1]) if v[0, -1] != 0 else v[:, -1]
    got = out["loading"].to_numpy()
    got = got * np.sign(got[0])
    assert np.allclose(got, top, atol=1e-4)
    assert abs(out["eigenvalue"].iloc[0] - w[-1]) < 1e-4


def test_tool_scc_handcrafted(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_scc

    # conv c1: a before b; conv c2: b before a  → {a,b} one SCC
    # conv c3: a before c (one-way)             → c a singleton
    # conv c4: d alone                          → d a singleton (no edges)
    t = pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2", "c3", "c3", "c4"],
            "turn_idx": [0, 1, 0, 1, 0, 1, 0],
            "role": ["u"] * 7,
            "text": [""] * 7,
            "tool": ["a", "b", "b", "a", "a", "c", "d"],
            "ts": pd.to_datetime([0, 1, 2, 3, 4, 5, 6], unit="s"),
        }
    )
    out = (
        tool_scc(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("tool")
        .sort_index()
    )
    assert out.loc["a", "scc_id"] == "a" and out.loc["b", "scc_id"] == "a"
    assert out.loc["a", "scc_size"] == 2
    assert out.loc["c", "scc_id"] == "c" and out.loc["c", "scc_size"] == 1
    assert out.loc["d", "scc_id"] == "d" and out.loc["d", "scc_size"] == 1


def test_conv_stats_two_level_combine(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import conv_stats

    t = pa.table(
        {
            "conv_id": ["x", "x", "x", "y"],
            "turn_idx": [0, 1, 2, 0],
            "role": ["u", "a", "u", "u"],
            "text": [""] * 4,
            "tool": [None, "t1", None, None],
            "ts": pd.to_datetime([10, 20, 35, 50], unit="s"),
        }
    )
    out = (
        conv_stats(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["x", "n_turns"] == 3
    assert out.loc["x", "n_tool_calls"] == 1
    assert out.loc["x", "duration_us"] == 25_000_000
    assert out.loc["y", "n_turns"] == 1 and out.loc["y", "duration_us"] == 0


# ---------------------------------------------------------------- modularity


def test_modularity_two_triangles_bridge(ray_session):
    """Two triangles joined by one bridge edge, labeled by component-of-the-
    triangle: m=7, each community has e_c=3, deg_c=7 ⇒
    Q = 2·(3/7 − (7/14)²) = 5/14."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.components import modularity

    src = np.array([0, 1, 2, 3, 4, 5, 2], dtype=np.int64)
    dst = np.array([1, 2, 0, 4, 5, 3, 3], dtype=np.int64)
    a, b = _oriented(src, dst)
    ds = ray.data.from_arrow(pa.table({"src": a, "dst": b}))
    labels = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    out = modularity(ds, labels).to_pandas()
    assert out["m_edges"][0] == 7
    assert out["n_communities"][0] == 2
    assert abs(out["modularity"][0] - 5.0 / 14.0) < 1e-6


def test_modularity_single_community_is_zero(ray_session):
    """All vertices in one community: Q = m/m − (2m/2m)² = 0."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.components import modularity

    src = np.array([0, 1, 2, 0], dtype=np.int64)
    dst = np.array([1, 2, 3, 2], dtype=np.int64)
    a, b = _oriented(src, dst)
    ds = ray.data.from_arrow(pa.table({"src": a, "dst": b}))
    out = modularity(ds, np.zeros(4, dtype=np.int64)).to_pandas()
    assert out["modularity"][0] == 0.0
    assert out["n_communities"][0] == 1


def test_modularity_empty_graph(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.components import modularity

    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    out = modularity(ds, np.array([0, 1], dtype=np.int64)).to_pandas()
    assert out["modularity"][0] == 0.0 and out["m_edges"][0] == 0


# ---------------------------------------------------------------- rich club


def test_rich_club_brute_force(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.degrees import rich_club

    rng = np.random.default_rng(5)
    n = 120
    src = rng.integers(0, n, 900).astype(np.int64)
    dst = rng.integers(0, n, 900).astype(np.int64)
    a, b = _oriented(src, dst)
    ds = ray.data.from_arrow(pa.table({"src": a, "dst": b})).repartition(5)
    ks = (2, 4, 8)
    got = rich_club(ds, n, thresholds=ks).to_pandas().set_index("k")

    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, a, 1)
    np.add.at(deg, b, 1)
    for k in ks:
        rich = deg > k
        nk = int(rich.sum())
        ek = int((rich[a] & rich[b]).sum())
        assert got.loc[k, "n_nodes"] == nk
        assert got.loc[k, "n_edges"] == ek
        want = 2.0 * ek / (nk * (nk - 1.0)) if nk > 1 else 0.0
        assert abs(got.loc[k, "phi"] - round(want, 9)) < 1e-9


def test_rich_club_clique_is_one(ray_session):
    """A 6-clique: every vertex has degree 5, so φ(4) must be exactly 1."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.degrees import rich_club

    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"src": a, "dst": b}))
    got = rich_club(ds, 6, thresholds=(4,)).to_pandas()
    assert got["n_nodes"][0] == 6 and got["n_edges"][0] == 15
    assert got["phi"][0] == 1.0


# ------------------------------------------------------------ PQ / zipf


def test_pq_codes_are_subspace_argmin(ray_session):
    """Every emitted code must be the euclidean argmin of its subspace
    against an independently recomputed codebook (reuses the engine's
    training but re-derives assignments brute-force)."""
    import ray.data

    from asterixdb_analytics_ray.imru import KMeansJob, run_imru
    from asterixdb_analytics_ray.pipelines.embeddings import pq_codes

    rng = np.random.default_rng(0)
    n, d = 300, 8
    M = rng.normal(size=(n, d))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(M.astype(np.float64))),
            }
        )
    ).repartition(4)
    got = (
        pq_codes(ds, m=2, n_clusters=4, iters=10, seed=3)
        .to_pandas()
        .sort_values(["vec_id", "sub"])
        .reset_index(drop=True)
    )
    assert len(got) == 2 * n
    assert set(got["sub"]) == {0, 1}
    assert got["code"].between(0, 3).all()

    pool = M[: max(4 * 8, 64)]
    for s in range(2):
        r2 = np.random.default_rng(3 + s)
        init = pool[r2.choice(len(pool), size=4, replace=False), s * 4:(s + 1) * 4]
        book = run_imru(
            KMeansJob(column="embedding", tol=1e-6, dim_lo=s * 4, dim_hi=(s + 1) * 4),
            ds, init, max_iters=10,
        )
        seg = M[:, s * 4:(s + 1) * 4]
        d2 = ((seg[:, None, :] - book[None, :, :]) ** 2).sum(axis=2)
        want = np.argmin(d2, axis=1)
        codes = got[got["sub"] == s].sort_values("vec_id")["code"].to_numpy()
        assert (codes == want).all()


def test_zipf_slope_synthetic_power_law(ray_session):
    """A corpus engineered as freq(rank r) = round(1000/r) must fit slope
    ≈ −1 (the exact Zipf exponent)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import zipf_slope

    toks = []
    for r in range(1, 41):
        toks.extend([f"w{r:03d}"] * round(1000 / r))
    rng = np.random.default_rng(1)
    rng.shuffle(toks)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            "text": [" ".join(toks[i::20]) for i in range(20)],
        }
    )
    out = zipf_slope(
        ray.data.from_pandas(docs).repartition(4), top_n=40
    ).to_pandas()
    assert out["n_ranks"][0] == 40
    assert abs(out["slope"][0] + 1.0) < 0.02
