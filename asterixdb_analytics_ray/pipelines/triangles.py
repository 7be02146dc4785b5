"""Triangle counting — the join formulation of the reference's 2-superstep BSP.

Reference: ``pregelix-example/.../TriangleCountingVertex.java:51-97`` — SS1:
each vertex b emits, for neighbor pairs a < b < c, a message (to a) naming c;
SS2: a counts messages whose named vertex is in a's adjacency; the global
``TriangleCountingAggregator`` sums per-vertex counts. Net semantics: each
triangle (a<b<c) counted once, at its minimum vertex a.

Message concat doesn't combine (DefaultMessageCombiner territory), so the BSP
message formulation explodes; per SURVEY.md §7.3 we use the equivalent
join shape:

    oriented edges (src<dst)
      → adjacency grouped by src  → wedge emission (a, b, c), b<c
      → LEFT SEMI hash join wedges ⨝ edges on (b, c)   (edge-existence test)
      → groupby(a).count()  =  per-vertex counts; global = sum

Skew note: a vertex emits out-degree²/2 wedges, so orientation choice decides
hub cost.  Edges are oriented by DEGREE rank, (degree, id) ascending — the
standard mitigation: every vertex's out-degree is bounded by its number of
HIGHER-degree neighbors (≤ O(√E)), so a d-degree hub whose neighbors are
leaves emits ZERO wedges instead of d²/2 (a 100k-degree hub: 5·10⁹ wedges
under id-orientation; see ``tests/test_skew.py``).  Each triangle is found
once, at its min-RANK vertex, then attributed back to its min-ID vertex —
so per-vertex counts and the global total are IDENTICAL to the reference's
id-oriented semantics (``TriangleCountingVertex.java:51-97``), verified by
the same SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.blocks import safe_join


def triangle_count(
    oriented_edges: ray.data.Dataset,
    n: int,
    num_partitions: int = 32,
) -> tuple[ray.data.Dataset, int]:
    """→ ((v, triangles) Dataset over vertices with ≥1 triangle, global total).

    ``oriented_edges`` must be the canonical src<dst undirected representation
    (``LinkGraph.oriented()`` / micrograph helper).
    """

    from ..stages.blocks import partitions_for

    # data-proportional partitioning (measured 9.3s → 4.1s at 153k edges);
    # ``num_partitions`` stays the large-graph ceiling — see blocks.py
    P = partitions_for(oriented_edges.count(), num_partitions)

    # ---- degree-rank orientation (see module docstring) ----
    # distributed degree count: per-block pre-combine, one small shuffle,
    # O(n) driver state (two int64 vectors — same class as the outdeg
    # arrays every PageRank run holds)
    from ray.data.aggregate import Sum

    def ends(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        v, c = np.unique(both, return_counts=True)
        return pa.table({"v": v, "cnt": c.astype(np.int64)})

    deg = np.zeros(n, dtype=np.int64)
    deg_ds = (
        oriented_edges.map_batches(ends, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    for b in deg_ds.iter_batches(batch_format="pyarrow"):
        deg[b["v"].to_numpy()] = b["cnt"].to_numpy()
    order = np.lexsort((np.arange(n), deg))  # ascending (degree, id)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    rank_ref = ray.put(rank)
    inv_ref = ray.put(order)  # rank → original id

    def relabel(t: pa.Table) -> pa.Table:
        r = ray.get(rank_ref)
        s = r[t["src"].to_numpy()]
        d = r[t["dst"].to_numpy()]
        return pa.table(
            {"src": np.minimum(s, d), "dst": np.maximum(s, d)}
        )

    redges = oriented_edges.map_batches(
        relabel, batch_format="pyarrow"
    ).materialize()

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(t["src"].to_numpy() % P, pa.int32())
        )

    def wedges_vec(t: pa.Table) -> pa.Table:
        """All neighbor pairs (b < c) per src, fully vectorized.

        Receives ONE hash partition of srcs (groupby("part")), sorts by
        (src, dst), finds src runs, and enumerates each run's triangular
        pairs with the closed-form (i, j) inversion of the pair index —
        no per-vertex Python loop.
        """
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
        j = np.where(j * (j - 1) // 2 > p, j - 1, j)  # float-rounding guards
        j = np.where((j + 1) * j // 2 <= p, j + 1, j)
        i = p - j * (j - 1) // 2
        run0 = starts[rid]
        return pa.table({"a": s[run0], "b": d[run0 + i], "c": d[run0 + j]})

    wedge_ds = (
        redges.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges_vec, batch_format="pyarrow")
    )
    closed = safe_join(
        wedge_ds,
        redges,
        "left_semi",
        P,
        on=("b", "c"),
        right_on=("src", "dst"),
    )

    def attribute(t: pa.Table) -> pa.Table:
        """Rank-space triple → the triangle's min ORIGINAL id (reference
        attribution: each triangle counted at its minimum vertex)."""
        inv = ray.get(inv_ref)
        a = inv[t["a"].to_numpy()]
        b = inv[t["b"].to_numpy()]
        c = inv[t["c"].to_numpy()]
        return pa.table({"a": np.minimum(np.minimum(a, b), c)})

    per_vertex = (
        closed.map_batches(attribute, batch_format="pyarrow")
        .groupby("a")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "v": t["a"],
                    "triangles": t["count()"],
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    total = int(per_vertex.sum("triangles") or 0)
    return per_vertex, total


def triangles_table(per_vertex: ray.data.Dataset, n: int) -> pa.Table:
    """Densify to all n vertices (zeros where no triangles), sorted by v."""
    counts = np.zeros(n, dtype=np.int64)
    for b in per_vertex.iter_batches(batch_format="pyarrow"):
        counts[b["v"].to_numpy()] = b["triangles"].to_numpy()
    return pa.table({"v": np.arange(n, dtype=np.int64), "triangles": counts})
