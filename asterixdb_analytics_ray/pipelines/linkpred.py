"""Adamic–Adar link prediction over the simple undirected graph.

For every non-adjacent pair (a, b) with ≥1 common neighbor, score
AA(a,b) = Σ_z 1/ln(deg(z)) over common neighbors z (Adamic & Adar, "Friends
and neighbors on the Web", Social Networks 25(3), 2003 — public-knowledge
formula). Top-k pairs by (score desc, a, b).

Plan shape = the triangle-counting co-partition (``triangles.py``): und
edges grouped by center z emit neighbor pairs keyed by a % P; existing
edges are tagged into the SAME groupby so the non-adjacency filter is an
in-group sorted-key ``searchsorted`` — no hash join, two exchanges total.

Skew: a center z emits deg(z)²/2 wedges, so hubs explode quadratically.
``max_center_degree`` (default 256) excludes super-hub centers from the
score — standard Adamic–Adar practice (a 10⁶-degree hub contributes
1/ln(10⁶) ≈ 0.07 per pair anyway) and a DETERMINISTIC part of the query
semantics: the DuckDB oracle applies the identical cap, so results match
exactly while the worst-case wedge volume is bounded by cap²·|centers|.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

AA_MAX_CENTER_DEGREE = 256
AA_TOP_K = 50


def adamic_adar_topk(
    und_edges: ray.data.Dataset,
    n: int,
    k: int = AA_TOP_K,
    max_center_degree: int = AA_MAX_CENTER_DEGREE,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """→ (a, b, common, score) — top-k non-adjacent pairs by Adamic–Adar.

    ``und_edges``: the symmetric simple edge set (``LinkGraph`` und view —
    both directions present, self-loops dropped, deduplicated), so a
    center's group size IS its degree.
    """
    from ..stages.blocks import partitions_for

    P = partitions_for(und_edges.count(), num_partitions)

    def key_by_center(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(t["src"].to_numpy() % P, pa.int32())
        )

    def wedge_emit(t: pa.Table) -> pa.Table:
        """One src-hash partition: per center z (a run of its und edges),
        emit all neighbor pairs a<b weighted 1/ln(deg z), re-keyed a % P.
        Closed-form (i, j) pair-index inversion — no per-center loop."""
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        lens = np.diff(np.concatenate((starts, [len(s)])))
        keep = lens <= max_center_degree
        cnt = np.where(keep, lens * (lens - 1) // 2, 0)
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        rid = np.repeat(np.arange(len(lens)), cnt)
        p_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        j = ((1.0 + np.sqrt(1.0 + 8.0 * p_idx)) / 2.0).astype(np.int64)
        j = np.where(j * (j - 1) // 2 > p_idx, j - 1, j)
        j = np.where((j + 1) * j // 2 <= p_idx, j + 1, j)
        i = p_idx - j * (j - 1) // 2
        run0 = starts[rid]
        a = d[run0 + i]  # d ascending within a run ⇒ a < b
        b = d[run0 + j]
        # the exact double expression the oracle uses: 1.0/ln(CAST(deg))
        w = 1.0 / np.log(lens[rid].astype(np.float64))
        return pa.table(
            {
                "part": pa.array((a % P).astype(np.int32)),
                "a": a,
                "b": b,
                "w": w,
            }
        )

    wedges = (
        und_edges.map_batches(key_by_center, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedge_emit, batch_format="pyarrow")
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        """Existing edges as (a<b) marker rows (w = NaN), co-keyed a % P.
        Built from the und view itself: keep only the src<dst direction."""
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        m = src < dst
        a, b = src[m], dst[m]
        return pa.table(
            {
                "part": pa.array((a % P).astype(np.int32)),
                "a": a,
                "b": b,
                "w": np.full(len(a), np.nan),
            }
        )

    tagged = wedges.union(und_edges.map_batches(edge_rows, batch_format="pyarrow"))

    def close_group(g: pa.Table) -> pa.Table:
        """Aggregate pair scores and drop adjacent pairs — every pair (a,b)
        and the edge (a,b) share part = a % P, so the group is closed."""
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        w = g["w"].to_numpy()
        is_edge = np.isnan(w)
        if n <= (1 << 31):
            key = a * np.int64(n) + b
        else:
            key = np.empty(len(a), dtype=[("a", "<i8"), ("b", "<i8")])
            key["a"], key["b"] = a, b
        ek = np.sort(key[is_edge])
        wk, ww = key[~is_edge], w[~is_edge]
        if len(wk) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "common": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        order = np.argsort(wk, kind="stable")
        wk, ww = wk[order], ww[order]
        starts = np.flatnonzero(np.concatenate(([True], wk[1:] != wk[:-1])))
        sums = np.add.reduceat(ww, starts)
        counts = np.diff(np.concatenate((starts, [len(wk)])))
        uk = wk[starts]
        if len(ek):
            idx = np.searchsorted(ek, uk)
            idx[idx == len(ek)] = 0
            adj = ek[idx] == uk
        else:
            adj = np.zeros(len(uk), dtype=bool)
        uk, sums, counts = uk[~adj], sums[~adj], counts[~adj]
        if n <= (1 << 31):
            ua, ub = uk // np.int64(n), uk % np.int64(n)
        else:
            ua, ub = uk["a"], uk["b"]
        return pa.table(
            {
                "a": ua.astype(np.int64),
                "b": ub.astype(np.int64),
                "common": counts.astype(np.int64),
                "score": np.round(sums, 9),
            }
        )

    scored = tagged.groupby("part").map_groups(close_group, batch_format="pyarrow")
    return scored.sort(
        ["score", "a", "b"], descending=[True, False, False]
    ).limit(k)
