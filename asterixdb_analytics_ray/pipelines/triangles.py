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
      → wedges (keyed b%P) + edges (keyed src%P) co-partitioned into ONE
        groupby; edge-existence tested by sorted-key searchsorted inside
        the group (a wedge needs only edges rooted at its b)
      → per-group partial counts scatter-added on the driver
    = two all-to-all exchanges total (adjacency grouping + closing).

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
    # per-block SPARSE partials scatter-added into the dense vector on the
    # driver — the exact `LinkGraph._degrees` pattern (graph.py:332-351): no
    # groupby shuffle, O(n) driver state (two int64 vectors — the same class
    # as the outdeg arrays every PageRank run holds). This was a hash
    # shuffle in round 3 and the whole of the recorded 5.0→7.0 s triangle
    # bench regression; the partial-combine route restores it.

    def ends(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        v, c = np.unique(both, return_counts=True)
        return pa.table({"v": v, "cnt": c.astype(np.int64)})

    deg = np.zeros(n, dtype=np.int64)
    for b in oriented_edges.map_batches(
        ends, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        np.add.at(deg, b["v"].to_numpy(), b["cnt"].to_numpy())
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
        """All neighbor pairs (b < c) per src, fully vectorized, re-keyed for
        the closing shuffle (part = b % P).

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
                    "part": pa.array([], pa.int32()),
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
        b_col = d[run0 + i]
        return pa.table(
            {
                "part": pa.array((b_col % P).astype(np.int32)),
                "a": s[run0],
                "b": b_col,
                "c": d[run0 + j],
            }
        )

    wedge_ds = (
        redges.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges_vec, batch_format="pyarrow")
    )

    # ---- closing: edge-existence test WITHOUT a hash join ----
    # Co-partition wedges (by b % P) and edges (by src % P) into the SAME
    # groupby — a wedge (a, b, c) needs only edges whose src == b, so every
    # group is self-contained. Membership is a sorted-packed-key
    # searchsorted inside the group; partial triangle counts (at each
    # triangle's min ORIGINAL id) come back to the driver scatter-add style
    # (the `_degrees` pattern — the driver already holds two O(n) rank
    # vectors). Net exchange count: TWO groupby shuffles total, replacing
    # round 3's groupby + two-sided hash join + count-by-key (4 exchanges —
    # the recorded 5.0→7.0 s bench regression; this restores and beats it).
    def edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        return pa.table(
            {
                "part": pa.array((src % P).astype(np.int32)),
                "a": np.full(len(src), -1, dtype=np.int64),  # edge marker
                "b": src,
                "c": t["dst"].to_numpy(),
            }
        )

    tagged = wedge_ds.union(redges.map_batches(edge_rows, batch_format="pyarrow"))

    def close_count(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        c = g["c"].to_numpy()
        is_edge = a < 0
        if n <= (1 << 31):  # packed (b, c) fits int64: b*n + c < 2^62
            key = b * np.int64(n) + c
        else:  # structured two-field key — same sort/searchsorted contract
            key = np.empty(len(b), dtype=[("b", "<i8"), ("c", "<i8")])
            key["b"], key["c"] = b, c
        ek = np.sort(key[is_edge])
        wk = key[~is_edge]
        if len(ek) and len(wk):
            idx = np.searchsorted(ek, wk)
            idx[idx == len(ek)] = 0
            hit = ek[idx] == wk
        else:
            hit = np.zeros(len(wk), dtype=bool)
        inv = ray.get(inv_ref)
        aa = inv[a[~is_edge][hit]]
        bb = inv[b[~is_edge][hit]]
        cc = inv[c[~is_edge][hit]]
        v, cnt = np.unique(np.minimum(np.minimum(aa, bb), cc), return_counts=True)
        return pa.table({"v": v.astype(np.int64), "cnt": cnt.astype(np.int64)})

    counts = np.zeros(n, dtype=np.int64)
    for blk in (
        tagged.groupby("part")
        .map_groups(close_count, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        np.add.at(counts, blk["v"].to_numpy(), blk["cnt"].to_numpy())
    nz = np.flatnonzero(counts)
    per_vertex = ray.data.from_arrow(
        pa.table({"v": nz.astype(np.int64), "triangles": counts[nz]})
    )
    return per_vertex, int(counts.sum())


def triangles_table(per_vertex: ray.data.Dataset, n: int) -> pa.Table:
    """Densify to all n vertices (zeros where no triangles), sorted by v."""
    counts = np.zeros(n, dtype=np.int64)
    for b in per_vertex.iter_batches(batch_format="pyarrow"):
        counts[b["v"].to_numpy()] = b["triangles"].to_numpy()
    return pa.table({"v": np.arange(n, dtype=np.int64), "triangles": counts})
