import numpy as np
import pyarrow as pa
import ray.data

from asterixdb_analytics_ray.pipelines.sampling import graph_sample_dense
from asterixdb_analytics_ray.sources.micrographs import as_dataset, two_components, webmap20


def _sym(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    keep = s != d
    u = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    return u[:, 0], u[:, 1]


def test_graph_sample_respects_quota_and_connectivity(ray_session):
    src, dst, n = webmap20()
    s, d = _sym(src, dst)
    sel, rounds = graph_sample_dense(as_dataset(s, d), n, seeds=np.array([0]), target_fraction=0.5)
    assert sel.sum() == int(np.ceil(0.5 * n))
    assert sel[0]
    assert rounds >= 1


def test_graph_sample_stops_at_component_boundary(ray_session):
    src, dst, n = two_components()
    s, d = _sym(src, dst)
    # seed in the 6-vertex chain; quota larger than the component
    sel, _ = graph_sample_dense(as_dataset(s, d), n, seeds=np.array([0]), target_fraction=0.9)
    assert sel[:6].all() and not sel[6:].any()  # BFS can't cross components


def test_message_overflow_huge_fanout(ray_session):
    """MessageOverflow analog (reference MessageOverflowVertex.java:40-55):
    a complete bipartite blast produces |A|x|B| messages; Arrow batches and
    per-batch pre-combine must absorb it without frame-style overflow."""
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.oracle import pagerank_numpy

    a = np.repeat(np.arange(200, dtype=np.int64), 200)
    b = np.tile(np.arange(200, 400, dtype=np.int64), 200)  # 40k edges, dense fanout
    ds = ray.data.from_arrow(pa.table({"src": a, "dst": b}))
    n = 400
    outdeg = np.bincount(a, minlength=n)
    res = pagerank_dense(ds, n, outdeg, supersteps=5)
    want = pagerank_numpy(a, b, n, supersteps=5)
    np.testing.assert_allclose(res.state["rank"], want, atol=1e-12)
    # per-batch combine keeps message rows bounded by unique dsts x blocks
    assert all(r.msgs <= 400 * 8 for r in res.rounds)


def test_sharded_sample_matches_dense(ray_session):
    """ShardedSample reproduces graph_sample_dense bit-for-bit, including
    quota truncation by ascending global id, across several graphs/quotas."""
    import ray.data

    from asterixdb_analytics_ray.graph import undirected_from_oriented
    from asterixdb_analytics_ray.pipelines.sampling import graph_sample_dense
    from asterixdb_analytics_ray.sources.micrographs import (
        as_dataset,
        two_components,
        webmap20,
    )
    from asterixdb_analytics_ray.stages.sharded import ShardedSample

    rng = np.random.default_rng(11)
    n_r = 60
    m = rng.random((n_r, n_r)) < 0.08
    rs, rd = np.nonzero(np.triu(m, 1))

    cases = []
    for maker in (webmap20, two_components):
        src, dst, n = maker()
        cases.append((src, dst, n))
    cases.append((rs.astype(np.int64), rd.astype(np.int64), n_r))

    for src, dst, n in cases:
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        keep = a != b
        pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        oriented = as_dataset(pairs[:, 0], pairs[:, 1])
        und = undirected_from_oriented(oriented).materialize()
        for frac, seeds in [(0.3, [0]), (0.5, [0, 3]), (0.9, [1])]:
            dense_sel, dense_rounds = graph_sample_dense(
                und, n, seeds=np.array(seeds), target_fraction=frac
            )
            sh_sel, sh_rounds = ShardedSample(n=n, P=4).run(
                und, seeds=np.array(seeds), target_fraction=frac
            )
            np.testing.assert_array_equal(sh_sel, dense_sel)
            assert sh_rounds == dense_rounds
