"""Borůvka minimum spanning forest vs brute-force Kruskal (the unique-MSF
total order (w, a, b) makes the comparison edge-exact)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _kruskal(n, edges):
    """Ground truth under the same (w, a, b) total order."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _ds(edges, reps=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "a": np.array([e[0] for e in edges], np.int64),
                "b": np.array([e[1] for e in edges], np.int64),
                "w": np.array([e[2] for e in edges], np.float64),
            }
        )
    ).repartition(reps)


def test_mst_random_graph_matches_kruskal(ray_session):
    from asterixdb_analytics_ray.pipelines.mst import minimum_spanning_forest

    rng = np.random.default_rng(17)
    n = 120
    pairs = sorted(
        {tuple(sorted(p)) for p in rng.integers(0, n, (600, 2)) if p[0] != p[1]}
    )
    edges = [(a, b, int(rng.integers(1, 50))) for a, b in pairs]
    out = minimum_spanning_forest(_ds(edges), n).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["w"]))
    assert got == _kruskal(n, edges)


def test_mst_chain_decreasing_weights(ray_session):
    """A path with monotone weights — the round-1 chosen graph is one long
    chain, exercising the merge closure's worst case."""
    from asterixdb_analytics_ray.pipelines.mst import minimum_spanning_forest

    n = 200
    edges = [(i, i + 1, i + 1) for i in range(n - 1)]
    out = minimum_spanning_forest(_ds(edges, reps=3), n).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["w"]))
    assert got == _kruskal(n, edges)
    assert len(got) == n - 1  # a path's MST is the path itself


def test_mst_forest_and_parallel_weights(ray_session):
    """Disconnected graph → spanning FOREST; heavy weight ties broken by
    (a, b) so the result is still unique."""
    from asterixdb_analytics_ray.pipelines.mst import minimum_spanning_forest

    edges = (
        [(0, 1, 5), (1, 2, 5), (0, 2, 5)]     # triangle, all ties
        + [(10, 11, 1), (11, 12, 9), (10, 12, 9)]  # separate triangle
    )
    out = minimum_spanning_forest(_ds(edges, reps=2), 13).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["w"]))
    assert got == _kruskal(13, edges)
    assert len(got) == 4  # two trees of 2 edges each
