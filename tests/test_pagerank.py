import numpy as np
import pytest

from asterixdb_analytics_ray.bsp import BSPConfig
from asterixdb_analytics_ray.oracle import pagerank_numpy
from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dataset, pagerank_dense
from asterixdb_analytics_ray.sources.micrographs import as_dataset, webmap20


def _dense_ranks(src, dst, n, supersteps=10):
    ds = as_dataset(src, dst)
    outdeg = np.bincount(src, minlength=n)
    res = pagerank_dense(ds, n, outdeg, supersteps=supersteps)
    return res


def test_pagerank_dense_matches_numpy_webmap20():
    src, dst, n = webmap20()
    res = _dense_ranks(src, dst, n)
    want = pagerank_numpy(src, dst, n, supersteps=10)
    np.testing.assert_allclose(res.state["rank"], want, atol=1e-12)
    assert res.supersteps == 10
    assert len(res.rounds) == 9


def test_pagerank_dense_on_transcript_graph(tiny_graph):
    g = tiny_graph
    edges = g.directed().materialize()
    e = edges.to_pandas()
    src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
    res = pagerank_dense(edges, g.n_nodes, g.out_degrees(), supersteps=10)
    want = pagerank_numpy(src, dst, g.n_nodes, supersteps=10)
    np.testing.assert_allclose(res.state["rank"], want, atol=1e-6)


def test_pagerank_tolerance_mode_converges():
    src, dst, n = webmap20()
    ds = as_dataset(src, dst)
    outdeg = np.bincount(src, minlength=n)
    res = pagerank_dense(
        ds, n, outdeg, supersteps=60, tol=1e-10, cfg=BSPConfig(max_supersteps=60)
    )
    assert res.rounds[-1].delta < 1e-8
    assert res.supersteps < 60  # converged early
    want = pagerank_numpy(src, dst, n, supersteps=res.supersteps)
    np.testing.assert_allclose(res.state["rank"], want, atol=1e-9)


def test_pagerank_dataset_mode_matches_dense(tiny_graph):
    g = tiny_graph
    edges = g.directed().materialize()
    dense = pagerank_dense(edges, g.n_nodes, g.out_degrees(), supersteps=5)
    ds_state = pagerank_dataset(edges, g.n_nodes, supersteps=5, num_partitions=8)
    pdf = ds_state.to_pandas().sort_values("v").reset_index(drop=True)
    assert len(pdf) == g.n_nodes
    np.testing.assert_allclose(
        pdf["rank"].to_numpy(), dense.state["rank"], atol=1e-9
    )


def test_pagerank_dst_partitioned_matches(tiny_graph):
    from asterixdb_analytics_ray.bsp import BSPConfig
    from asterixdb_analytics_ray.stages.partition import hash_partition_by

    g = tiny_graph
    edges = g.directed().materialize()
    plain = pagerank_dense(edges, g.n_nodes, g.out_degrees(), supersteps=10)
    parts = hash_partition_by(g.directed(), "dst", 4)
    fast = pagerank_dense(
        parts,
        g.n_nodes,
        g.out_degrees(),
        supersteps=10,
        cfg=BSPConfig(dst_partition_modulus=4),
    )
    np.testing.assert_allclose(fast.state["rank"], plain.state["rank"], atol=1e-13)


def test_pagerank_sharded_matches_dense(tiny_graph):
    from asterixdb_analytics_ray.stages.partition import hash_partition_by
    from asterixdb_analytics_ray.stages.sharded import pagerank_sharded

    g = tiny_graph
    edges = g.directed().materialize()
    dense = pagerank_dense(edges, g.n_nodes, g.out_degrees(), supersteps=10)
    parts = hash_partition_by(g.directed(), "dst", 4)
    sharded = pagerank_sharded(
        parts, g.n_nodes, g.out_degrees(), P=4, supersteps=10
    )
    np.testing.assert_allclose(
        sharded.state["rank"], dense.state["rank"], atol=1e-13
    )
    assert sharded.supersteps == dense.supersteps


def test_pagerank_sharded_barrierless_matches(tiny_graph):
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    g = tiny_graph
    runner = ShardedPageRank(n=g.n_nodes, P=4)
    runner.prepare(g.directed().materialize(), g.out_degrees())
    with_barrier = runner.run(supersteps=10)
    dag = runner.run(supersteps=10, barrier=False)
    np.testing.assert_allclose(
        dag.state["rank"], with_barrier.state["rank"], atol=0
    )
    assert [r.msgs for r in dag.rounds] == [r.msgs for r in with_barrier.rounds]


def test_pagerank_sharded_mixed_precision(tiny_graph):
    """Mixed-precision edge cache (float32 weights, narrow ids): per-vertex
    drift vs the float64 kernel stays ~1e-9 — three orders inside the 1e-6
    conformance gate the bench configuration must satisfy."""
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    g = tiny_graph
    ds = g.directed().materialize()
    double = ShardedPageRank(n=g.n_nodes, P=4).run(ds, g.out_degrees(), supersteps=10)
    mixed = ShardedPageRank(n=g.n_nodes, P=4, precision="mixed").run(
        ds, g.out_degrees(), supersteps=10
    )
    import numpy as np

    drift = np.abs(mixed.state["rank"] - double.state["rank"]).max()
    assert drift < 1e-8, drift
    assert drift > 0  # the narrow path actually ran
