"""Skew handling — the analog of the reference's SkewTest (4146-degree hub,
``pregelix-example/src/test/java/.../SkewTest.java:40-66``).

The dense scatter path is hub-proof by construction: edge blocks are split by
ROW COUNT (not by vertex), so a hub's out-edges span many blocks and each
block pre-combines messages per destination before the driver-side final
combine — a hot destination receives at most one partial per block, which is
exactly the salted/two-level combine the survey calls for (SURVEY.md §4).
"""

import numpy as np

from asterixdb_analytics_ray.bsp import BSPConfig
from asterixdb_analytics_ray.oracle import connected_components_numpy, pagerank_numpy
from asterixdb_analytics_ray.pipelines.components import connected_components_dense
from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
from asterixdb_analytics_ray.sources.micrographs import as_dataset, skew21


def test_pagerank_on_skewed_hub():
    src, dst, n = skew21(hub_degree=500)
    # force many small scatter batches so the hub's edges span blocks
    ds = as_dataset(src, dst)
    outdeg = np.bincount(src, minlength=n)
    cfg = BSPConfig(scatter_batch_size=64)
    res = pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg)
    want = pagerank_numpy(src, dst, n, supersteps=10)
    np.testing.assert_allclose(res.state["rank"], want, atol=1e-12)
    # per-batch pre-combine bounds message rows: ≤ unique dst per block summed
    assert all(r.msgs <= len(src) for r in res.rounds)


def test_cc_on_skewed_hub():
    src, dst, n = skew21(hub_degree=500)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ds = as_dataset(s, d)
    res = connected_components_dense(ds, n, cfg=BSPConfig(max_supersteps=300, scatter_batch_size=64))
    want = connected_components_numpy(src, dst, n)
    assert (res.state["label"] == want).all()
    assert (res.state["label"] == 0).all()  # hub connects everything


def test_pagerank_sharded_hub(ray_session):
    """Sharded scale path under a hot vertex: a 100k-degree hub (all spokes →
    hub, hub → all spokes) must match the numpy oracle exactly. Hub safety in
    the sharded layout is structural: in-messages are pre-combined by the
    owning partition's bincount (one partial per partition) and the hub's
    out-rank is a single gathered scalar per edge — no per-message
    materialization anywhere."""
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    n = 100_001
    hub = 0
    spokes = np.arange(1, n, dtype=np.int64)
    src = np.concatenate([np.full(n - 1, hub, dtype=np.int64), spokes])
    dst = np.concatenate([spokes, np.full(n - 1, hub, dtype=np.int64)])
    ds = as_dataset(src, dst)
    outdeg = np.bincount(src, minlength=n)
    for precision in ("double", "mixed"):
        res = ShardedPageRank(n=n, P=8, precision=precision).run(
            ds, outdeg, supersteps=10
        )
        want = pagerank_numpy(src, dst, n, supersteps=10)
        np.testing.assert_allclose(res.state["rank"], want, atol=1e-9)


def test_salted_aggregate_hot_key(ray_session):
    """Explicit salted two-stage combine equals the plain groupby sum on a
    messages table where 90% of rows hit ONE destination key."""
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.stages.partition import salted_aggregate_sum

    rng = np.random.default_rng(3)
    n = 200_000
    v = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 1000, n)).astype(np.int64)
    msg = rng.random(n)
    ds = ray.data.from_arrow(pa.table({"v": v, "msg": msg})).repartition(16)
    got = (
        salted_aggregate_sum(ds, salts=8)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.DataFrame({"v": v, "msg": msg})
        .groupby("v", as_index=False)["msg"]
        .sum()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert (got["v"].to_numpy() == want["v"].to_numpy()).all()
    np.testing.assert_allclose(got["msg"].to_numpy(), want["msg"].to_numpy(), rtol=1e-12)


def test_triangle_count_hub_skew(ray_session):
    """A 100k-degree hub with MINIMUM id — the id-orientation worst case
    (C(100k,2) ≈ 5·10⁹ wedges) — must complete fast under degree-rank
    orientation (the hub ranks LAST, its leaves have out-degree ≤ 1, wedge
    count collapses to the closing triangles only), with per-vertex counts
    still attributed at the min id (reference SkewTest analog: the 4146-
    degree hub in ``pregelix-example/.../SkewTest.java:40-66``)."""
    import time

    import ray.data

    from asterixdb_analytics_ray.pipelines.triangles import triangle_count
    from asterixdb_analytics_ray.sources.micrographs import as_dataset

    hub_deg = 100_000
    n = hub_deg + 1
    # star: hub 0 — leaves 1..100k; plus one leaf-leaf edge closing ONE
    # triangle (0, 1, 2)
    src = np.concatenate([np.zeros(hub_deg, dtype=np.int64), [1]])
    dst = np.concatenate([np.arange(1, n, dtype=np.int64), [2]])
    ds = as_dataset(src, dst)
    t0 = time.perf_counter()
    per_vertex, total = triangle_count(ds, n)
    wall = time.perf_counter() - t0
    assert total == 1
    pv = per_vertex.to_pandas()
    assert pv.set_index("v")["triangles"].to_dict() == {0: 1}  # min-id attribution
    assert wall < 60, f"hub wedge blowup: {wall:.1f}s"


def test_largest_cliques_hub_skew(ray_session):
    """largest_cliques under a min-id 20k-degree star hub: degree-rank
    decomposition keeps the hub's task-local induced subgraph tiny (its
    higher-rank neighborhood is empty) where the id-oriented decomposition
    would ship the full O(d²) neighborhood to one task."""
    import time

    from asterixdb_analytics_ray.pipelines.maxclique import largest_cliques
    from asterixdb_analytics_ray.sources.micrographs import as_dataset

    hub_deg = 20_000
    n = hub_deg + 1
    src = np.concatenate([np.zeros(hub_deg, dtype=np.int64), [1, 1, 2]])
    dst = np.concatenate([np.arange(1, n, dtype=np.int64), [2, 3, 3]])
    # unique oriented pairs
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    ds = as_dataset(pairs[:, 0], pairs[:, 1])
    t0 = time.perf_counter()
    out = largest_cliques(ds)
    wall = time.perf_counter() - t0
    # maximum clique: {0,1,2,3}? 0-1,0-2,0-3 (star), 1-2,1-3,2-3 -> 4-clique
    assert out["size"][0].as_py() == 4
    assert out["members"][0].as_py() == [0, 1, 2, 3]
    assert wall < 60, f"hub blowup: {wall:.1f}s"
