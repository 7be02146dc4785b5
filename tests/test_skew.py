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
