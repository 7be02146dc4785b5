"""Link prediction over the simple undirected graph: Adamic–Adar and
Jaccard-coefficient scores for non-adjacent pairs with ≥1 common neighbor.

AA(a,b) = Σ_z 1/ln(deg(z)) over common neighbors z (Adamic & Adar, "Friends
and neighbors on the Web", Social Networks 25(3), 2003); J(a,b) =
|Γa∩Γb| / |Γa∪Γb| (Liben-Nowell & Kleinberg, "The link-prediction problem
for social networks", JASIST 2007 — both public-knowledge formulas).
Top-k pairs by (score desc, a, b).

Plan shape = the triangle-counting co-partition (``triangles.py``): und
edges grouped by center z emit neighbor pairs keyed by a % P; existing
edges are tagged into the SAME groupby so the non-adjacency filter is an
in-group sorted-key ``searchsorted`` — no hash join, two exchanges total.
The Jaccard union |Γa∪Γb| = deg(a)+deg(b)−common gathers full (uncapped)
endpoint degrees from the P plasma degree shards inside the group task.

Skew: a center z emits deg(z)²/2 wedges, so hubs explode quadratically.
``max_center_degree`` (default 256) excludes super-hub centers from the
score — standard practice (a 10⁶-degree hub contributes 1/ln(10⁶) ≈ 0.07
per AA pair anyway) and a DETERMINISTIC part of the query semantics: the
DuckDB oracle applies the identical cap, so results match exactly while
the worst-case wedge volume is bounded by cap²·|centers|.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data

AA_MAX_CENTER_DEGREE = 256
AA_TOP_K = 50


def _tagged_candidates(
    und_edges: ray.data.Dataset,
    P: int,
    max_center_degree: int,
    weight: str,
) -> ray.data.Dataset:
    """Wedge pair rows {part, a, b, w} (w = 1/ln(deg z) for ``weight='aa'``,
    1/deg z for ``'ra'``, 1.0 for ``'none'``) unioned with existing-edge
    marker rows (w = NaN), all keyed by a % P so each group is closed for
    the non-adjacency anti-join."""

    def key_by_center(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(t["src"].to_numpy() % P, pa.int32())
        )

    def wedge_emit(t: pa.Table) -> pa.Table:
        """One src-hash partition: per center z (a run of its und edges),
        emit all neighbor pairs a<b, re-keyed a % P. Closed-form (i, j)
        pair-index inversion — no per-center loop."""
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
        if weight == "aa":
            # the exact double expression the oracle uses: 1.0/ln(CAST(deg))
            w = 1.0 / np.log(lens[rid].astype(np.float64))
        elif weight == "ra":
            # resource allocation: 1.0/CAST(deg AS DOUBLE), exact division
            w = 1.0 / lens[rid].astype(np.float64)
        else:
            w = np.ones(total, dtype=np.float64)
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

    return wedges.union(und_edges.map_batches(edge_rows, batch_format="pyarrow"))


def _make_close_group(
    n: int, finish: Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray], dict]
) -> Callable[[pa.Table], pa.Table]:
    """Per-group aggregator: sum pair weights, count common neighbors, drop
    adjacent pairs (in-group sorted anti-join), then hand (a, b, common,
    wsum) to ``finish`` for the metric-specific score columns."""
    empty_extra = finish(
        np.array([], np.int64),
        np.array([], np.int64),
        np.array([], np.int64),
        np.array([], np.float64),
    )

    def close_group(g: pa.Table) -> pa.Table:
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
                    **empty_extra,
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
        ua = ua.astype(np.int64)
        ub = ub.astype(np.int64)
        counts = counts.astype(np.int64)
        return pa.table(
            {"a": ua, "b": ub, "common": counts, **finish(ua, ub, counts, sums)}
        )

    return close_group


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
    tagged = _tagged_candidates(und_edges, P, max_center_degree, weight="aa")

    def finish(ua, ub, counts, sums):
        return {"score": np.round(sums, 9)}

    scored = tagged.groupby("part").map_groups(
        _make_close_group(n, finish), batch_format="pyarrow"
    )
    return scored.sort(
        ["score", "a", "b"], descending=[True, False, False]
    ).limit(k)


def resource_allocation_topk(
    und_edges: ray.data.Dataset,
    n: int,
    k: int = AA_TOP_K,
    max_center_degree: int = AA_MAX_CENTER_DEGREE,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """→ (a, b, common, score) — top-k non-adjacent pairs by the
    resource-allocation index RA(a,b) = Σ_z 1/deg(z) (Zhou, Lü & Zhang,
    "Predicting missing links via local information", EPJ B 71, 2009 —
    public-knowledge formula). Identical plan shape and deterministic
    degree cap as ``adamic_adar_topk``; only the center weight differs
    (1/deg instead of 1/ln deg)."""
    from ..functions.fasthash import round_like_sql
    from ..stages.blocks import partitions_for

    P = partitions_for(und_edges.count(), num_partitions)
    tagged = _tagged_candidates(und_edges, P, max_center_degree, weight="ra")

    def finish(ua, ub, counts, sums):
        return {"score": round_like_sql(sums, 9)}

    scored = tagged.groupby("part").map_groups(
        _make_close_group(n, finish), batch_format="pyarrow"
    )
    return scored.sort(
        ["score", "a", "b"], descending=[True, False, False]
    ).limit(k)


def jaccard_topk(
    und_edges: ray.data.Dataset,
    n: int,
    k: int = AA_TOP_K,
    max_center_degree: int = AA_MAX_CENTER_DEGREE,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """→ (a, b, common, union_size, score) — top-k non-adjacent pairs by
    Jaccard coefficient common/(deg(a)+deg(b)−common).

    ``common`` counts wedges through centers under the degree cap (the same
    deterministic semantics as Adamic–Adar, mirrored in the oracle); the
    union denominator uses FULL endpoint degrees from the plasma shards.
    Every quantity is an exact integer in double, so the single closing
    division is bit-identical to DuckDB's and rounding half-away matches
    SQL ``round`` even on exact decimal ties (e.g. common/2^10)."""
    import pyarrow.compute as pc

    from ..functions.fasthash import round_like_sql
    from ..pipelines.triangles import _degree_shards, _shard_lookup
    from ..stages.blocks import partitions_for

    P = partitions_for(und_edges.count(), num_partitions)
    # und has each edge twice — count each undirected edge once per endpoint
    half = und_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    deg_refs = _degree_shards(half, n, P)
    tagged = _tagged_candidates(und_edges, P, max_center_degree, weight="none")

    def finish(ua, ub, counts, sums):
        if len(ua) == 0:
            return {
                "union_size": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        shards = ray.get(deg_refs)  # zero-copy plasma reads, shared per node
        da = _shard_lookup(ua, shards, P)
        db = _shard_lookup(ub, shards, P)
        union = da + db - counts
        score = round_like_sql(
            counts.astype(np.float64) / union.astype(np.float64), 9
        )
        return {"union_size": union.astype(np.int64), "score": score}

    scored = tagged.groupby("part").map_groups(
        _make_close_group(n, finish), batch_format="pyarrow"
    )
    return scored.sort(
        ["score", "a", "b"], descending=[True, False, False]
    ).limit(k)
