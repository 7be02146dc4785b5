import numpy as np
import pytest

from asterixdb_analytics_ray.oracle import (
    connected_components_numpy,
    label_propagation_numpy,
    sssp_numpy,
    triangles_numpy,
)
from asterixdb_analytics_ray.pipelines.components import (
    connected_components_dataset,
    connected_components_dense,
)
from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
from asterixdb_analytics_ray.pipelines.reachability import reachability_dense
from asterixdb_analytics_ray.pipelines.sssp import sssp_dense
from asterixdb_analytics_ray.pipelines.triangles import triangle_count, triangles_table
from asterixdb_analytics_ray.sources.micrographs import (
    as_dataset,
    clique7,
    two_components,
    webmap20,
)


def _sym(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    keep = s != d
    pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _orient(src, dst):
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


@pytest.mark.parametrize("maker", [webmap20, clique7, two_components])
def test_cc_dense_exact(maker):
    src, dst, n = maker()
    s, d = _sym(src, dst)
    res = connected_components_dense(as_dataset(s, d), n)
    want = connected_components_numpy(src, dst, n)
    assert (res.state["label"] == want).all()


def test_cc_dense_on_transcript_graph(tiny_graph):
    g = tiny_graph
    und = g.undirected().materialize()
    e = und.to_pandas()
    res = connected_components_dense(und, g.n_nodes)
    want = connected_components_numpy(
        e["src"].to_numpy(), e["dst"].to_numpy(), g.n_nodes
    )
    assert (res.state["label"] == want).all()
    # sanity: more than one component (tool-less conv chains are isolated)
    assert len(np.unique(want)) > 1


def test_cc_dataset_matches_dense():
    src, dst, n = two_components()
    s, d = _sym(src, dst)
    ds = as_dataset(s, d)
    dense = connected_components_dense(ds, n)
    got = (
        connected_components_dataset(ds, n, num_partitions=4)
        .to_pandas()
        .sort_values("v")
    )
    assert (got["component"].to_numpy() == dense.state["label"]).all()


@pytest.mark.parametrize("maker", [webmap20, clique7])
def test_lp_dense_matches_numpy(maker):
    src, dst, n = maker()
    s, d = _sym(src, dst)
    got = label_propagation_dense(as_dataset(s, d), n, rounds=5)
    want = label_propagation_numpy(src, dst, n, rounds=5)
    assert (got == want).all()


def test_triangles_exact_clique7():
    src, dst, n = clique7()
    a, b = _orient(src, dst)
    per_vertex, total = triangle_count(as_dataset(a, b), n, num_partitions=4)
    want_counts, want_total = triangles_numpy(src, dst, n)
    assert total == want_total
    got = triangles_table(per_vertex, n)
    assert (got["triangles"].to_numpy() == want_counts).all()
    assert want_total > 0


def test_triangles_on_transcript_graph(tiny_graph):
    g = tiny_graph
    ori = g.oriented().materialize()
    e = ori.to_pandas()
    per_vertex, total = triangle_count(ori, g.n_nodes, num_partitions=4)
    _, want_total = triangles_numpy(
        e["src"].to_numpy(), e["dst"].to_numpy(), g.n_nodes
    )
    assert total == want_total


def test_sssp_dense_webmap():
    src, dst, n = webmap20()
    res = sssp_dense(as_dataset(src, dst), n, source=0)
    want = sssp_numpy(src, dst, n, source=0)
    got = res.state["dist"]
    assert np.array_equal(got, want)  # inf-safe exact compare


def test_reachability():
    src, dst, n = two_components()
    ds = as_dataset(src, dst)
    ok, _ = reachability_dense(ds, n, source=0, dest=5)
    assert ok
    no, _ = reachability_dense(ds, n, source=0, dest=7)
    assert not no
    same, _ = reachability_dense(ds, n, source=3, dest=3)
    assert same


@pytest.mark.parametrize("maker", [webmap20, clique7, two_components])
def test_cc_sharded_matches_dense(maker, ray_session):
    """Sharded min-label CC reaches the same fixpoint as the dense runner."""
    from asterixdb_analytics_ray.pipelines.components import (
        connected_components_dense,
    )
    from asterixdb_analytics_ray.stages.sharded import ShardedMinLabel

    src, dst, n = maker()
    s, d = _sym(src, dst)
    und = as_dataset(s, d)
    dense = connected_components_dense(und, n)
    sharded = ShardedMinLabel(n=n, P=4).run(und)
    np.testing.assert_array_equal(
        sharded.state["label"], dense.state["label"]
    )


@pytest.mark.parametrize("maker", [webmap20, clique7, two_components])
def test_lp_sharded_matches_dense(maker, ray_session):
    from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    src, dst, n = maker()
    s, d = _sym(src, dst)
    und = as_dataset(s, d)
    dense = label_propagation_dense(und, n, rounds=5)
    sharded = ShardedLabelProp(n=n, P=4).run(und, rounds=5)
    np.testing.assert_array_equal(sharded, dense)


def test_multi_job_chaining_shared_bulk_load(ray_session):
    """Multiple jobs over the SAME loaded graph (reference
    ``Driver.compatible:217-233``): CC and LP chained over one shared
    ``PartitionedEdges`` must equal their Dataset-input runs, and a
    mismatched layout must be rejected."""
    from asterixdb_analytics_ray.pipelines.components import (
        connected_components_dense,
    )
    from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
    from asterixdb_analytics_ray.stages.partition import partition_edges
    from asterixdb_analytics_ray.stages.sharded import (
        ShardedLabelProp,
        ShardedMinLabel,
    )

    src, dst, n = webmap20()
    s, d = _sym(src, dst)
    und = as_dataset(s, d)
    loaded = partition_edges(und, 4)  # ONE bulk-load exchange...
    cc = ShardedMinLabel(n=n, P=4).run(loaded)  # ...two jobs
    lp = ShardedLabelProp(n=n, P=4).run(loaded, rounds=5)
    np.testing.assert_array_equal(
        cc.state["label"], connected_components_dense(und, n).state["label"]
    )
    np.testing.assert_array_equal(lp, label_propagation_dense(und, n, rounds=5))
    # the new sampler chains over the same bulk load too
    from asterixdb_analytics_ray.pipelines.sampling import graph_sample_dense
    from asterixdb_analytics_ray.stages.sharded import ShardedSample

    sel, _ = ShardedSample(n=n, P=4).run(
        loaded, seeds=np.array([0]), target_fraction=0.5
    )
    dense_sel, _ = graph_sample_dense(
        und, n, seeds=np.array([0]), target_fraction=0.5
    )
    np.testing.assert_array_equal(sel, dense_sel)
    with pytest.raises(ValueError, match="incompatible"):
        ShardedMinLabel(n=n, P=8).run(loaded)  # wrong partition count


@pytest.mark.parametrize("maker", [webmap20, clique7, two_components])
def test_sssp_sharded_matches_numpy(maker, ray_session):
    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    src, dst, n = maker()
    ds = as_dataset(src, dst)
    res = ShardedSSSP(n=n, P=4, source=0).run(ds)
    want = sssp_numpy(src, dst, n, source=0)
    assert np.array_equal(res.state["dist"], want)  # inf-safe exact


def test_sssp_sharded_weighted_random(ray_session):
    """Weighted sharded SSSP == Bellman-Ford numpy oracle on a random graph
    with integer weights (exercises the frontier shard-skipping too)."""
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    rng = np.random.default_rng(11)
    n = 300
    E = 1500
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    w = rng.integers(1, 10, E).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst, "weight": w}))
    res = ShardedSSSP(n=n, P=5, source=0, weight_col="weight").run(ds)
    want = sssp_numpy(src, dst, n, source=0, weight=w)
    assert np.array_equal(res.state["dist"], want)


def test_sssp_sharded_matches_dense_weighted(ray_session):
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    rng = np.random.default_rng(3)
    n = 120
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    w = rng.integers(1, 5, 600).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst, "weight": w}))
    dense = sssp_dense(ds, n, source=0, weight_col="weight")
    sharded = ShardedSSSP(n=n, P=3, source=0, weight_col="weight").run(ds)
    assert np.array_equal(sharded.state["dist"], dense.state["dist"])


def test_reachability_sharded(ray_session):
    from asterixdb_analytics_ray.stages.sharded import ShardedReachability

    src, dst, n = two_components()
    ds = as_dataset(src, dst)
    ok, _ = ShardedReachability(n=n, P=3, source=0, dest=5).run(ds)
    assert ok
    no, _ = ShardedReachability(n=n, P=3, source=0, dest=7).run(ds)
    assert not no
    same, _ = ShardedReachability(n=n, P=3, source=3, dest=3).run(ds)
    assert same


def test_lp_sharded_random_graph_both_paths(ray_session):
    """The round-1 sort-free segmented-min path (assume_simple=True) and the
    generic packed-key sort path must agree with the dense kernel on a bigger
    random simple graph (exercises multi-partition seg boundaries)."""
    from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    rng = np.random.default_rng(7)
    n = 400
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)
    s, d = _sym(src, dst)
    und = as_dataset(s, d)
    dense = label_propagation_dense(und, n, rounds=4)
    fast = ShardedLabelProp(n=n, P=5).run(und, rounds=4)
    generic = ShardedLabelProp(n=n, P=5, assume_simple=False).run(und, rounds=4)
    np.testing.assert_array_equal(fast, dense)
    np.testing.assert_array_equal(generic, dense)


def test_lp_sharded_multigraph_needs_generic_path(ray_session):
    """Duplicate edges make round-1 label counts exceed 1: the generic path
    must count them (matching dense), and is the documented requirement for
    multigraph inputs."""
    from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    # vertex 0 hears label-from-2 twice and label-from-1 once: mode = 2,
    # but min-label (the distinct shortcut) would pick 1
    s = np.array([1, 2, 2, 0, 0, 0], dtype=np.int64)
    d = np.array([0, 0, 0, 1, 2, 2], dtype=np.int64)
    n = 3
    und = as_dataset(s, d)
    dense = label_propagation_dense(und, n, rounds=1)
    generic = ShardedLabelProp(n=n, P=2, assume_simple=False).run(und, rounds=1)
    np.testing.assert_array_equal(generic, dense)
    assert dense[0] == 2  # the multiset mode, not the min


def test_lp_arithmetic_packing_overflow_raises(ray_session):
    """The arithmetic-packing fallback must REFUSE (not silently wrap) when
    the packed or tie-break keys exceed int64 (advisor finding: numpy int64
    wraps without error exactly in the regime the fallback exists for)."""
    import ray

    from asterixdb_analytics_ray.stages import sharded as sh

    prep = {
        "bounds": np.array([0, 2], dtype=np.int64),
        "sdiv": np.array([0, 1], dtype=np.int64),
        "dst32": np.array([0, 1], dtype=np.int32),
        "seg_rel": np.array([], dtype=np.int32),
        "seg_dst": np.array([], dtype=np.uint16),
        "seg_bounds": np.array([0, 0], dtype=np.int64),
    }
    shards = (np.array([0, 1, 2, 3], dtype=np.int64),)
    # stride 2^62: pow2 packing needs 2 + 62 > 63 bits -> falls back to
    # arithmetic, where (shard_size+1)*stride >= 2^63 -> must raise
    with pytest.raises(ray.exceptions.RayTaskError, match="overflow int64"):
        ray.get(
            sh._labelprop_task.remote(prep, 0, 1, 2**62, False, *shards)[0]
        )


def test_dense_lp_driver_budget_enforced(ray_session):
    """Dense LP bounds its driver-side combine: a round whose (dst,label)
    partials exceed the budget raises (pointing at the scale paths) instead
    of ballooning the driver — round 1's all-distinct labels make partial
    rows O(E), the worst case."""
    from asterixdb_analytics_ray.sources.micrographs import as_dataset

    rng = np.random.default_rng(2)
    src = rng.integers(0, 200, 3000).astype(np.int64)
    dst = rng.integers(0, 200, 3000).astype(np.int64)
    ds = as_dataset(src, dst)
    with pytest.raises(ValueError, match="max_driver_rows"):
        label_propagation_dense(ds, 200, rounds=2, max_driver_rows=100)
    # generous budget: unchanged result
    a = label_propagation_dense(ds, 200, rounds=2)
    b = label_propagation_dense(ds, 200, rounds=2, max_driver_rows=10**7)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_lp_sharded_randomized_parity_sweep(seed, ray_session):
    """Randomized guard for the arena LP kernel: sharded LP vs the
    independent numpy oracle across random graph shapes, sizes, P values
    and both kernel paths (simple-graph sort-free round 1 vs generic)."""
    from asterixdb_analytics_ray.sources.micrographs import as_dataset
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 300))
    m = int(rng.integers(n, 6 * n))
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # simple undirected edge set (both directions, deduped)
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    s = np.concatenate([pairs[:, 0], pairs[:, 1]])
    d = np.concatenate([pairs[:, 1], pairs[:, 0]])
    rounds = int(rng.integers(1, 6))
    P = int(rng.choice([2, 3, 5, 8]))
    want = label_propagation_numpy(pairs[:, 0], pairs[:, 1], n, rounds=rounds)
    got = ShardedLabelProp(n=n, P=P).run(as_dataset(s, d), rounds=rounds)
    np.testing.assert_array_equal(got, want)
    got_gen = ShardedLabelProp(n=n, P=P, assume_simple=False).run(
        as_dataset(s, d), rounds=rounds
    )
    np.testing.assert_array_equal(got_gen, want)


def test_lp_sharded_actor_executor_parity(ray_session):
    """LP actor executor (worker-resident edge cache, multi-node path)
    equals the stateless-task executor bit-for-bit."""
    from asterixdb_analytics_ray.sources.micrographs import as_dataset
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    rng = np.random.default_rng(7)
    n = 150
    src = rng.integers(0, n, 800).astype(np.int64)
    dst = rng.integers(0, n, 800).astype(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    s = np.concatenate([pairs[:, 0], pairs[:, 1]])
    d = np.concatenate([pairs[:, 1], pairs[:, 0]])
    und = as_dataset(s, d)
    tasks = ShardedLabelProp(n=n, P=4).run(und, rounds=4)
    act_runner = ShardedLabelProp(n=n, P=4, executor="actors")
    actors = act_runner.run(und, rounds=4)
    act_runner.shutdown()
    np.testing.assert_array_equal(tasks, actors)


def test_dag_levels_dense():
    """Longest-path levels on a handcrafted DAG: diamond + a long chain.

    0→1→3, 0→2→3→4 and a chain 5→6→7→8: level = longest path ending at v.
    """
    from asterixdb_analytics_ray.pipelines.dagdepth import dag_levels_dense

    src = np.array([0, 1, 0, 2, 3, 5, 6, 7], dtype=np.int64)
    dst = np.array([1, 3, 2, 3, 4, 6, 7, 8], dtype=np.int64)
    res = dag_levels_dense(as_dataset(src, dst), 9)
    assert res.state["level"].astype(int).tolist() == [0, 1, 1, 2, 3, 0, 1, 2, 3]
    assert res.supersteps <= 5  # longest path 3 → 4 relax rounds + quiesce


def test_dag_levels_raises_on_cycle():
    """A cyclic input must trip the oracle-unroll guard, never mismatch."""
    import pytest as _pytest

    from asterixdb_analytics_ray.pipelines.dagdepth import dag_levels_dense

    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 0], dtype=np.int64)
    with _pytest.raises(RuntimeError, match="cyclic"):
        dag_levels_dense(as_dataset(src, dst), 3, max_unroll=8)
