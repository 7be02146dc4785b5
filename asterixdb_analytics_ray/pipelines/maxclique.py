"""Maximal clique — the reference's ``MaximalCliqueVertex`` re-expressed.

Reference: ``pregelix-example/.../maximalclique/MaximalCliqueVertex.java``
(354 LoC) + ``MaximalCliqueAggregator.java:40-70`` — SS1: each vertex ships
its adjacency to lower-id neighbors; SS2: every vertex runs a local clique
merge over the received neighbor-adjacency and the global aggregator keeps
the LARGEST cliques found anywhere. Net deliverable: the maximum clique(s)
of the undirected graph.

Ray-Data formulation (min-vertex decomposition, no message explosion):

    oriented edges (src<dst)
      → closed wedges (a, b, c): edge pairs of a that are themselves edges
        (the triangle machinery — this IS "adjacency of my neighbors")
      → union with plain adjacency rows (a, b, −1)
      → groupby(a).map_groups: Bron–Kerbosch with pivoting on the induced
        subgraph over N⁺(a) → maximal cliques containing a as MIN vertex
      → global "largest cliques" aggregation (tiny result, driver-side)

Per-vertex rows are maximal within the ≥a induced subgraph (a clique could
be extendable by a lower-id vertex — exactly the reference's decomposition,
where each clique is discovered at one canonical vertex). The *largest*
cliques — the reference aggregator's output — are exact: a maximum clique is
found intact at its minimum member and nothing can extend it.

The per-group Bron–Kerbosch is deliberately plain Python: groups are one
vertex's higher-neighborhood (bounded by orientation, salted hubs upstream),
and clique enumeration is branch-heavy, not a vectorizable hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.blocks import safe_join


def _bron_kerbosch(nodes: set, adj: dict, out: list) -> None:
    """Iterative BK with pivoting; appends each maximal clique (a frozenset)."""
    stack = [(set(), set(nodes), set())]
    while stack:
        R, P, X = stack.pop()
        if not P and not X:
            out.append(R)
            continue
        pivot = max(P | X, key=lambda u: len(adj[u] & P))
        for v in list(P - adj[pivot]):
            stack.append((R | {v}, P & adj[v], X & adj[v]))
            P.remove(v)
            X.add(v)


def maximal_cliques(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """→ Dataset(v_min:int64, size:int64, members:list<int64>) — one row per
    clique that is maximal within the induced subgraph over {v ≥ v_min}.

    ``oriented_edges`` must be the canonical src<dst representation.
    """
    from .triangles import triangle_count  # noqa: F401  (shared shape docs)

    def wedges_vec(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        lens = np.diff(np.concatenate((starts, [len(s)])))
        cnt = lens * (lens - 1) // 2
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        rid = np.repeat(np.arange(len(lens)), cnt)
        p = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        j = ((1.0 + np.sqrt(1.0 + 8.0 * p)) / 2.0).astype(np.int64)
        j = np.where(j * (j - 1) // 2 > p, j - 1, j)
        j = np.where((j + 1) * j // 2 <= p, j + 1, j)
        i = p - j * (j - 1) // 2
        run0 = starts[rid]
        return pa.table({"a": s[run0], "b": d[run0 + i], "c": d[run0 + j]})

    from ..stages.blocks import effective_partitions

    P = effective_partitions(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(t["src"].to_numpy() % P, pa.int32())
        )

    wedge_ds = (
        oriented_edges.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges_vec, batch_format="pyarrow")
    )
    induced = safe_join(
        wedge_ds,
        oriented_edges,
        "left_semi",
        num_partitions,
        on=("b", "c"),
        right_on=("src", "dst"),
    )
    # plain adjacency rows carry neighbors with no induced edge (c = −1)
    adj_rows = oriented_edges.map_batches(
        lambda t: pa.table(
            {
                "a": t["src"],
                "b": t["dst"],
                "c": pa.array(np.full(len(t), -1, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def cliques_of_group(t: pa.Table) -> pa.Table:
        a = int(t["a"][0].as_py())
        b = t["b"].to_numpy()
        c = t["c"].to_numpy()
        nbrs = set(b[c < 0].tolist())
        adj: dict = {u: set() for u in nbrs}
        for u, w in zip(b[c >= 0].tolist(), c[c >= 0].tolist()):
            adj.setdefault(u, set()).add(w)
            adj.setdefault(w, set()).add(u)
            nbrs.add(u)
            nbrs.add(w)
        found: list = []
        _bron_kerbosch(nbrs, adj, found)
        members = [sorted([a] + list(cl)) for cl in found]
        return pa.table(
            {
                "v_min": pa.array([a] * len(members), pa.int64()),
                "size": pa.array([len(m) for m in members], pa.int64()),
                "members": pa.array(members, pa.list_(pa.int64())),
            }
        )

    return (
        induced.union(adj_rows)
        .groupby("a")
        .map_groups(cliques_of_group, batch_format="pyarrow")
    )


def largest_cliques(
    oriented_edges: ray.data.Dataset,
    num_partitions: int = 32,
) -> pa.Table:
    """The reference aggregator's deliverable: all maximum cliques, as a tiny
    sorted table (size, members). Exact (see module docstring).

    Runs the decomposition in DEGREE-RANK space (same mitigation as
    ``triangles.py``): edges are relabeled by ascending (degree, id), so a
    hub's higher-rank neighborhood — the induced subgraph one ``map_groups``
    task receives — is bounded by its higher-DEGREE neighbors (≤ O(√E))
    instead of its full O(d²) higher-id neighborhood.  Exact for MAXIMUM
    cliques: a maximum clique is maximal within every induced suffix
    subgraph and is discovered intact at its min-rank member; members map
    back to original ids before aggregation.  ``maximal_cliques`` itself
    keeps the reference's id-order per-vertex contract (cliques at their
    min-ID vertex) for callers that need it."""
    import ray

    # degree rank over the oriented edge set (streamed, O(V) driver state)
    from ray.data.aggregate import Sum

    def ends(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        v, c = np.unique(both, return_counts=True)
        return pa.table({"v": v, "cnt": c.astype(np.int64)})

    vs, cs = [], []
    for b in (
        oriented_edges.map_batches(ends, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .iter_batches(batch_format="pyarrow")
    ):
        vs.append(b["v"].to_numpy())
        cs.append(b["cnt"].to_numpy())
    if not vs:
        return pa.table(
            {
                "size": pa.array([], pa.int64()),
                "members": pa.array([], pa.list_(pa.int64())),
            }
        )
    v_all = np.concatenate(vs)
    d_all = np.concatenate(cs)
    n = int(v_all.max()) + 1
    deg = np.zeros(n, dtype=np.int64)
    deg[v_all] = d_all
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    rref, iref = ray.put(rank), ray.put(order)

    def relabel(t: pa.Table) -> pa.Table:
        r = ray.get(rref)
        s = r[t["src"].to_numpy()]
        d = r[t["dst"].to_numpy()]
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    redges = oriented_edges.map_batches(
        relabel, batch_format="pyarrow"
    ).materialize()
    inv = order

    cl = maximal_cliques(redges, num_partitions).materialize()
    max_size = cl.max("size")
    if max_size is None:
        return pa.table(
            {"size": pa.array([], pa.int64()), "members": pa.array([], pa.list_(pa.int64()))}
        )
    rows = cl.filter(expr=f"size == {int(max_size)}").take_all()
    members = sorted(
        sorted(int(inv[m]) for m in r["members"]) for r in rows
    )
    return pa.table(
        {
            "size": pa.array([int(max_size)] * len(members), pa.int64()),
            "members": pa.array(members, pa.list_(pa.int64())),
        }
    )
