"""Driver-side numpy reference implementations (test oracles).

These mirror the reference algorithms' exact semantics (float64 throughout,
same formulas / tie-breaks / iteration structure) on small graphs, computed
without any distribution. Used by the pytest golden tests; the DuckDB SQL
oracles in ``__ray_entry__.oracle_sql`` express the same math relationally.

Semantics sources:
- PageRank: ``pregelix-example/.../PageRankVertex.java:118-145`` —
  rank = 0.15/N + 0.85·Σ incoming, contributions rank/outdeg, dangling mass
  dropped, fixed superstep count (default 10 ⇒ 9 applies).
- Connected components (hash-min): ``ConnectedComponentsVertex.java:107-154``.
- SSSP: ``ShortestPathsVertex.java:124-145`` (missing weight → 1.0).
- Triangle counting: ``TriangleCountingVertex.java:51-97`` — each triangle
  (a<b<c) is counted at its minimum vertex a; global total = Σ per-vertex.
"""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    src: np.ndarray, dst: np.ndarray, n: int, supersteps: int = 10, damping: float = 0.85
) -> np.ndarray:
    """Power iteration matching the reference superstep structure exactly."""
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    safe = np.where(outdeg > 0, outdeg, 1.0)
    for _ in range(supersteps - 1):  # applies happen at supersteps 2..max
        contrib = np.where(outdeg > 0, rank / safe, 0.0)
        msg = np.zeros(n, dtype=np.float64)
        np.add.at(msg, dst, contrib[src])
        rank = (1.0 - damping) / n + damping * msg
    return rank


def connected_components_numpy(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Min-label propagation to convergence over the undirected edge set."""
    label = np.arange(n, dtype=np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    while True:
        msg = label.copy()
        np.minimum.at(msg, d, label[s])
        if (msg == label).all():
            return label
        label = msg


def label_propagation_numpy(
    src: np.ndarray, dst: np.ndarray, n: int, rounds: int = 5
) -> np.ndarray:
    """Synchronous LP over the undirected edge set, ``rounds`` fixed rounds.

    Per round every vertex with ≥1 neighbor adopts the most frequent neighbor
    label; ties break to the smallest label. Initial label = vertex id.
    (The reference ships no separate LP example — CC *is* min-label
    propagation; this is the engine's documented mode/argmax variant.)
    """
    label = np.arange(n, dtype=np.int64)
    # simple undirected graph: symmetrize then dedup (multi-edges collapse)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    keep = s != d
    uniq = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    s, d = uniq[:, 0], uniq[:, 1]
    for _ in range(rounds):
        pairs = d * np.int64(n) + label[s]  # pack (dst, label)
        uniq, counts = np.unique(pairs, return_counts=True)
        pv = (uniq // n).astype(np.int64)
        pl = (uniq % n).astype(np.int64)
        # argmax count per vertex, tie → min label: sort by (v, -count, label)
        order = np.lexsort((pl, -counts, pv))
        pv, pl = pv[order], pl[order]
        first = np.concatenate(([True], pv[1:] != pv[:-1]))
        new = label.copy()
        new[pv[first]] = pl[first]
        label = new
    return label


def triangles_numpy(
    src: np.ndarray, dst: np.ndarray, n: int
) -> tuple[np.ndarray, int]:
    """Per-vertex (at the minimum vertex) + global triangle counts.

    Input may be any directed edge list; triangles are counted on the
    symmetrized simple graph.
    """
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    edges = set(zip(a[keep].tolist(), b[keep].tolist()))
    adj: list[list[int]] = [[] for _ in range(n)]
    for x, y in edges:
        adj[x].append(y)  # oriented: only higher neighbors
    counts = np.zeros(n, dtype=np.int64)
    for v in range(n):
        nbrs = sorted(adj[v])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if (nbrs[i], nbrs[j]) in edges:
                    counts[v] += 1
    return counts, int(counts.sum())


def sssp_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    source: int,
    weight: np.ndarray | None = None,
) -> np.ndarray:
    """Single-source shortest paths (Bellman-Ford style relaxation)."""
    w = np.ones(len(src), dtype=np.float64) if weight is None else weight.astype(np.float64)
    dist = np.full(n, np.inf, dtype=np.float64)
    dist[source] = 0.0
    for _ in range(n):
        cand = dist.copy()
        np.minimum.at(cand, dst, dist[src] + w)
        if (cand == dist).all():
            break
        dist = cand
    return dist
