"""PageRank as BSP supersteps, matching the reference formula exactly.

Reference: ``pregelix-example/.../PageRankVertex.java:118-145`` —
SS1: value ← 1/N, send value/outdeg to out-edges; SS2..max: value ←
0.15/N + 0.85·Σmsgs, send while superstep < max. Combiner = sum
(``SimpleSumCombiner``). Dangling mass is dropped (no redistribution);
default 10 supersteps ⇒ 9 applies.

Two modes:
- ``pagerank_dense``: rank vector broadcast per round (``ray.put`` → one
  shared-memory copy per node), scatter over edge batches with per-batch
  pre-combine, dense driver-side final combine. The fast path.
- ``pagerank_dataset``: state as a Dataset; scatter = ``edges ⨝ state`` hash
  join, combine = ``groupby("v").aggregate(Sum)`` — the reference plan's
  local-combine → M-to-N → global-combine, at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..stages.blocks import materialize_clean, safe_join
from ..functions.combiners import SUM

DAMPING = 0.85


@dataclass
class PageRankDense:
    outdeg_ref: "ray.ObjectRef"
    n: int
    supersteps: int = 10
    tol: float | None = None
    part_modulus: int | None = None  # set when edges are dst-hash-partitioned
    # actual vertex count for the teleport term; defaults to the id-space
    # size n (differs only under the structured-id layout, where some id
    # slots are unused — those slots have no edges and are masked on output)
    n_vertices: int | None = None
    # personalized PageRank: when set, the (1−d) teleport mass lands ONLY on
    # this source vertex instead of uniformly — everything else (init 1/n,
    # dangling mass dropped, fixed applies) is unchanged, so the oracle is
    # the same unrolled CTE with the teleport term made conditional
    teleport: int | None = None
    # weighted PageRank: edge column holding the weight; contributions become
    # rank[src]·w/Σ_out w (``outdeg_ref`` must then hold the per-src weight
    # sums). Classic strength-proportional surfer (public formulation)
    weight_col: str | None = None

    name: str = "pagerank"
    combiner = SUM
    msg_dtype = np.float64
    _converged: bool = False

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        nv = self.n_vertices or n
        return {"rank": np.full(n, 1.0 / nv, dtype=np.float64)}

    def scatter_factory(self, refs, superstep):
        if superstep >= self.supersteps or self._converged:
            return None
        rank_ref = refs["rank"]
        outdeg_ref = self.outdeg_ref
        n, P = self.n, self.part_modulus

        wc = self.weight_col

        def scatter(batch: pa.Table) -> pa.Table:
            rank = ray.get(rank_ref)
            outdeg = ray.get(outdeg_ref)  # weighted mode: per-src Σw instead
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            if wc is None:
                contrib = rank[src] / outdeg[src]  # src in edges ⇒ outdeg>0
            else:
                # the oracle's (rank·w)/Σw double-op order
                w = batch[wc].to_numpy().astype(np.float64)
                contrib = rank[src] * w / outdeg[src]
            v, m = SUM.segment_reduce(dst, contrib)
            return pa.table({"v": v, "msg": m})

        if P is None or wc is not None:
            return scatter

        def scatter_partitioned(batch: pa.Table) -> pa.Table:
            """dst-partitioned block: bincount over LOCAL ids (dst // P) —
            O(E/P + n/P) with no sort; emits the block's combined messages."""
            rank = ray.get(rank_ref)
            outdeg = ray.get(outdeg_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            if len(dst) == 0:
                return pa.table(
                    {"v": pa.array([], pa.int64()), "msg": pa.array([], pa.float64())}
                )
            contrib = rank[src] / outdeg[src]
            mod = dst % P
            if (mod != mod[0]).any():
                # Ray coalesced several small partition-groups into one block
                # (tiny-graph case) — fall back to the sort-based pre-combine;
                # the driver combine's overlap guard keeps correctness.
                v, m = SUM.segment_reduce(dst, contrib)
                return pa.table({"v": v, "msg": m})
            p = int(mod[0])
            lo = dst // P
            acc = np.bincount(lo, weights=contrib, minlength=(n + P - 1) // P)
            nz = np.flatnonzero(acc)
            return pa.table({"v": nz * P + p, "msg": acc[nz]})

        return scatter_partitioned

    def apply(self, state, msg, has_msg, superstep):
        if self.teleport is not None:
            new = DAMPING * msg
            # literal 0.15, not 1.0-DAMPING: the binary doubles differ by one
            # ulp and the SQL oracle's teleport term is the literal
            new[self.teleport] += 0.15
        else:
            new = (1.0 - DAMPING) / (self.n_vertices or self.n) + DAMPING * msg
        delta = float(np.abs(new - state["rank"]).max())
        if self.tol is not None and delta < self.tol:
            self._converged = True
        active = int((np.abs(new - state["rank"]) > 0).sum())
        return {"rank": new}, active, delta


def pagerank_dense(
    edges: ray.data.Dataset,
    n: int,
    outdeg: np.ndarray,
    supersteps: int = 10,
    tol: float | None = None,
    cfg: BSPConfig | None = None,
    n_vertices: int | None = None,
    teleport: int | None = None,
    weight_col: str | None = None,
) -> BSPResult:
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = supersteps if tol is None else max(supersteps, cfg.max_supersteps)
    algo = PageRankDense(
        outdeg_ref=ray.put(outdeg.astype(np.float64)),
        n=n,
        supersteps=supersteps if tol is None else cfg.max_supersteps,
        tol=tol,
        part_modulus=cfg.dst_partition_modulus,
        n_vertices=n_vertices,
        teleport=teleport,
        weight_col=weight_col,
    )
    return run_dense_bsp(edges, n, algo, cfg)


def pagerank_dataset(
    edges: ray.data.Dataset,
    n: int,
    supersteps: int = 10,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Dataset-mode PageRank → (v:int64, rank:float64) Dataset.

    Per superstep: inner-join edges with (v, w=rank/outdeg) on src (state is
    the small side of the hash join), emit (v=dst, contrib=w), combine with a
    groupby-Sum shuffle, then left-outer-join messages back onto the vertex
    set so message-less vertices still get the teleport base — the
    right-outer-join visit semantics of ``JobGenOuterJoin.java:299-305``.
    """
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    P = num_partitions

    # vertex set + out-degree (one groupby at setup, like the bulk load)
    deg = edges.groupby("src").count()

    def as_state(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": batch["src"],
                "outdeg": pc.cast(batch["count()"], pa.float64()),
            }
        )

    degrees = deg.map_batches(as_state, batch_format="pyarrow")
    vertices = ray.data.range(n).map_batches(
        lambda b: pa.table({"v": b["id"].astype(np.int64)}), batch_format="numpy"
    )
    state = safe_join(vertices, degrees, "left_outer", P, on=("v",)).map_batches(
        lambda t: pa.table(
            {
                "v": t["v"],
                "outdeg": pc.fill_null(t["outdeg"], 0.0),
                "rank": pa.array(np.full(len(t), 1.0 / n), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    base = (1.0 - DAMPING) / n
    for _ in range(supersteps - 1):
        contrib_side = state.map_batches(
            lambda t: pa.table(
                {
                    "src": t["v"],
                    "w": pc.divide(
                        t["rank"],
                        pc.if_else(pc.greater(t["outdeg"], 0.0), t["outdeg"], 1.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined = safe_join(
            edges.select_columns(["src", "dst"]), contrib_side, "inner", P, on=("src",)
        )

        def emit(t: pa.Table) -> pa.Table:
            dst = t["dst"].to_numpy()
            w = t["w"].to_numpy()
            v, m = SUM.segment_reduce(dst, w)  # local pre-combine
            return pa.table({"v": v, "contrib": m})

        msgs = joined.map_batches(emit, batch_format="pyarrow").groupby("v").aggregate(
            Sum("contrib", alias_name="msg")
        )

        def apply_rank(t: pa.Table) -> pa.Table:
            msg = pc.fill_null(t["msg"], 0.0)
            rank = pc.add(base, pc.multiply(DAMPING, msg))
            return pa.table({"v": t["v"], "outdeg": t["outdeg"], "rank": rank})

        state = safe_join(
            state.select_columns(["v", "outdeg"]), msgs, "left_outer", P, on=("v",)
        ).map_batches(apply_rank, batch_format="pyarrow")
        state = materialize_clean(state)
    return state.select_columns(["v", "rank"])
