"""Maximal clique vs brute-force oracle (reference: MaximalCliqueVertex +
MaximalCliqueAggregator — the aggregator keeps the largest cliques)."""

import itertools

import numpy as np
import pytest

from asterixdb_analytics_ray.pipelines.maxclique import (
    largest_cliques,
    maximal_cliques,
)
from asterixdb_analytics_ray.sources.micrographs import (
    as_dataset,
    clique7,
    two_components,
    webmap20,
)


def _orient(src, dst):
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _brute_maximal(nodes, adj):
    """All maximal cliques of the graph (nodes, adj) by subset enumeration."""
    nodes = sorted(nodes)
    cliques = []
    for r in range(1, len(nodes) + 1):
        for comb in itertools.combinations(nodes, r):
            if all(b in adj[a] for a, b in itertools.combinations(comb, 2)):
                cliques.append(set(comb))
    return [c for c in cliques if not any(c < o for o in cliques)]


def _adj(src, dst, n):
    adj = {v: set() for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].add(d)
        adj[d].add(s)
    return adj


def _random_graph(n=24, p=0.3, seed=7):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    s, d = np.nonzero(np.triu(m, 1))
    return s.astype(np.int64), d.astype(np.int64), n


@pytest.mark.parametrize(
    "maker", [clique7, webmap20, two_components, _random_graph]
)
def test_largest_cliques_exact(ray_session, maker):
    src, dst, n = maker()
    a, b = _orient(src, dst)
    got = largest_cliques(as_dataset(a, b))
    adj = _adj(a, b, n)
    nodes_with_edges = {v for v in range(n) if adj[v]}
    brute = _brute_maximal(nodes_with_edges, adj)
    max_size = max(len(c) for c in brute)
    want = sorted(sorted(c) for c in brute if len(c) == max_size)
    assert got["size"].to_pylist() == [max_size] * len(want)
    assert [list(m) for m in got["members"].to_pylist()] == want


def test_per_vertex_cliques_are_min_vertex_maximal(ray_session):
    """Every emitted row is a maximal clique of the induced subgraph over
    {v_min} ∪ {higher-id neighbors of v_min}, and every such clique appears."""
    src, dst, n = clique7()
    a, b = _orient(src, dst)
    rows = maximal_cliques(as_dataset(a, b)).take_all()
    adj = _adj(a, b, n)
    got = {}
    for r in rows:
        got.setdefault(int(r["v_min"]), []).append(sorted(map(int, r["members"])))
    for v in range(n):
        hi = {u for u in adj[v] if u > v}
        if not hi:
            assert v not in got
            continue
        sub_nodes = {v} | hi
        sub_adj = {u: adj[u] & sub_nodes for u in sub_nodes}
        want = sorted(
            sorted(c) for c in _brute_maximal(sub_nodes, sub_adj) if v in c
        )
        assert sorted(got.get(v, [])) == want, v
