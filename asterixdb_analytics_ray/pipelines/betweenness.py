"""Source-sampled betweenness centrality — Brandes' algorithm (Brandes,
"A faster algorithm for betweenness centrality", J. Math. Sociology 25(2),
2001 — public-knowledge formulation) from a fixed seed set S:

    bc(v) = Σ_{s∈S} δ_s(v),   δ_s(v) = Σ_{t} σ_st(v)/σ_st

computed per source as a level-synchronous forward BFS accumulating path
counts σ, then a backward sweep accumulating dependencies δ level by level
(δ_u = Σ_{v: d(v)=d(u)+1, (u,v)∈E} σ_u/σ_v · (1 + δ_v)).  Sampling sources
is the standard scale strategy (Brandes–Pich 2007): exact per-source
dependencies, unbiased under seed sampling.

Plan shape: every level is ONE vectorized ``map_batches`` scan over the
undirected edge set + a frontier-sized aggregate — the inner kernel is the
dense-BSP scatter (broadcast state refs via ``ray.put``, per-block
``reduceat`` pre-combine, small groupby-sum close), so work per level is
O(|E|/blocks) per task with no per-vertex Python.  Forward σ sums are
integer-exact in float64 (path counts); the backward per-edge expression
``σ_u/σ_v · (1+δ_v)`` is evaluated in the oracle's exact double-op order,
and the final bc rounds half-away (``round_like_sql``) because dependency
sums are frequently dyadic rationals that terminate ON the rounding grid.

O(n) driver state (dist/σ/δ per source) is the documented dense-path
pattern (same class as dense PageRank's rank vector); the sharded runners
in ``stages/sharded.py`` show the shard-resident alternative for 10⁹-vertex
graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.fasthash import round_like_sql

BETW_SOURCES = (0, 1, 2, 3)
BETW_MAX_DEPTH = 12
BETW_DECIMALS = 6


def _empty(col: str) -> pa.Table:
    return pa.table(
        {col: pa.array([], pa.int64()), "x": pa.array([], pa.float64())}
    )


def brandes_betweenness(
    und_edges: ray.data.Dataset,
    n: int,
    sources: tuple[int, ...] = BETW_SOURCES,
    max_depth: int = BETW_MAX_DEPTH,
    decimals: int = BETW_DECIMALS,
) -> pa.Table:
    """→ (v, bc) for every vertex with positive accumulated dependency
    (membership is structural — a positive sum of positive terms — so the
    row set is FP-robust).  Raises if any BFS exceeds ``max_depth``: the
    oracle unrolls exactly that many levels, and a silent overrun would
    desynchronize the two (the k-core/MIS fixed-unroll contract).
    """
    from ray.data.aggregate import Sum

    bc = np.zeros(n)
    for s in sources:
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        sigma = np.zeros(n)
        sigma[s] = 1.0

        # ---- forward: levels of the BFS DAG with path counts ----
        L = 0
        while True:
            dref, sref = ray.put(dist), ray.put(sigma)

            def fwd(t: pa.Table, dref=dref, sref=sref, lvl=L) -> pa.Table:
                u = t["src"].to_numpy()
                v = t["dst"].to_numpy()
                d = ray.get(dref)
                m = (d[u] == lvl) & (d[v] == -1)
                if not m.any():
                    return _empty("v")
                sg = ray.get(sref)
                vv = v[m]
                w = sg[u[m]]
                order = np.argsort(vv, kind="stable")
                vv, w = vv[order], w[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], vv[1:] != vv[:-1]))
                )
                return pa.table(
                    {
                        "v": vv[starts].astype(np.int64),
                        "x": np.add.reduceat(w, starts),
                    }
                )

            nxt = (
                und_edges.map_batches(fwd, batch_format="pyarrow")
                .groupby("v")
                .aggregate(Sum("x", alias_name="x"))
                .to_pandas()  # frontier-sized
            )
            if len(nxt) == 0:
                break
            if L + 1 > max_depth:
                raise RuntimeError(
                    f"BFS from {s} exceeds max_depth={max_depth}; raise the "
                    "bound (and the oracle unroll) together"
                )
            vv = nxt["v"].to_numpy(np.int64)
            dist[vv] = L + 1
            sigma[vv] = nxt["x"].to_numpy()  # integer-exact path counts
            L += 1

        # ---- backward: dependency accumulation, deepest level first ----
        delta = np.zeros(n)
        for lvl in range(L, 0, -1):
            dref, sref, eref = ray.put(dist), ray.put(sigma), ray.put(delta)

            def bwd(t: pa.Table, dref=dref, sref=sref, eref=eref, lvl=lvl) -> pa.Table:
                u = t["src"].to_numpy()
                v = t["dst"].to_numpy()
                d = ray.get(dref)
                m = (d[u] == lvl - 1) & (d[v] == lvl)
                if not m.any():
                    return _empty("u")
                sg = ray.get(sref)
                dl = ray.get(eref)
                uu = u[m]
                vv = v[m]
                # the oracle's exact double-op order: (σu/σv)·(1+δv)
                w = sg[uu] / sg[vv] * (1.0 + dl[vv])
                order = np.argsort(uu, kind="stable")
                uu, w = uu[order], w[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], uu[1:] != uu[:-1]))
                )
                return pa.table(
                    {
                        "u": uu[starts].astype(np.int64),
                        "x": np.add.reduceat(w, starts),
                    }
                )

            upd = (
                und_edges.map_batches(bwd, batch_format="pyarrow")
                .groupby("u")
                .aggregate(Sum("x", alias_name="x"))
                .to_pandas()
            )
            if len(upd):
                delta[upd["u"].to_numpy(np.int64)] += upd["x"].to_numpy()
        delta[s] = 0.0
        bc += delta

    nz = np.flatnonzero(bc > 0)
    return pa.table(
        {
            "v": nz.astype(np.int64),
            "bc": round_like_sql(bc[nz], decimals),
        }
    )
