"""Connected components — hash-min label propagation with an active frontier.

Reference: ``pregelix-example/.../ConnectedComponentsVertex.java:107-154`` —
label starts as own id; a vertex adopts any smaller incoming label and
broadcasts it, then votes to halt; halted vertices are reactivated by
messages (``ComputeUpdateFunctionFactory.java:221-226``). Combiner = min
(``SimpleMinCombiner``). Converged result = per-vertex minimum reachable id
over the undirected graph; we run plain frontier min-propagation (the
reference's round-1 "send to higher ids only" trick changes round counts,
not the fixpoint — SURVEY.md §7.3).

Run over the SYMMETRIZED edge set (``LinkGraph.undirected()``): Pregelix
inputs list both directions explicitly in the adjacency text.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..stages.blocks import materialize_clean, safe_join
from ..functions.combiners import MIN


@dataclass
class ConnectedComponentsDense:
    n: int
    name: str = "connected_components"
    combiner = MIN
    msg_dtype = np.float64  # labels travel as float64 (inf identity); cast on apply
    halt_when_inactive: bool = True

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "label": np.arange(n, dtype=np.int64),
            "active": np.ones(n, dtype=bool),
        }

    def scatter_factory(self, refs, superstep):
        label_ref, active_ref = refs["label"], refs["active"]

        def scatter(batch: pa.Table) -> pa.Table:
            label = ray.get(label_ref)
            active = ray.get(active_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            m = active[src]  # only frontier vertices broadcast
            v, msg = MIN.segment_reduce(dst[m], label[src[m]].astype(np.float64))
            return pa.table({"v": v, "msg": msg})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        label = state["label"]
        adopt = has_msg & (msg < label)  # ids < 2^53 ⇒ exact in float64
        new = label.copy()
        new[adopt] = msg[adopt].astype(np.int64)
        changed = adopt
        return (
            {"label": new, "active": changed},
            int(changed.sum()),
            float(changed.sum()),
        )


def connected_components_dense(
    undirected_edges: ray.data.Dataset,
    n: int,
    cfg: BSPConfig | None = None,
) -> BSPResult:
    cfg = cfg or BSPConfig(max_supersteps=200)
    return run_dense_bsp(undirected_edges, n, ConnectedComponentsDense(n=n), cfg)


def connected_components_dataset(
    undirected_edges: ray.data.Dataset,
    n: int,
    num_partitions: int = 32,
    max_rounds: int = 200,
) -> ray.data.Dataset:
    """Dataset-mode CC → (v:int64, component:int64).

    State is a Dataset; each round joins the frontier with the edge table,
    min-combines with a groupby shuffle and applies with a left-outer join —
    the reference's outer-join plan (``JobGenOuterJoin.java:299-305``).
    Terminates when a round changes no labels (driver reads a tiny count).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    P = num_partitions
    state = ray.data.range(n).map_batches(
        lambda b: pa.table(
            {
                "v": b["id"].astype(np.int64),
                "label": b["id"].astype(np.int64),
                "active": np.ones(len(b["id"]), dtype=bool),
            }
        ),
        batch_format="numpy",
    ).materialize()

    for _ in range(max_rounds):
        # terminate BEFORE building a round: an empty frontier would flow
        # schema-less empty blocks into groupby/join (Arrow can't infer keys)
        if not state.sum("active"):
            break
        frontier = state.map_batches(
            lambda t: t.filter(t["active"].combine_chunks()).select(["v", "label"]),
            batch_format="pyarrow",
        )
        joined = safe_join(
            undirected_edges, frontier, "inner", P, on=("src",), right_on=("v",)
        )

        def emit(t: pa.Table) -> pa.Table:
            dst = t["dst"].to_numpy()
            lab = t["label"].to_numpy()
            v, m = MIN.segment_reduce(dst, lab.astype(np.float64))
            return pa.table({"v": v, "m": m})

        msgs = (
            joined.map_batches(emit, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Min("m", alias_name="msg"))
        )

        def apply_min(t: pa.Table) -> pa.Table:
            msg = pc.fill_null(t["msg"], np.inf)
            smaller = pc.less(msg, pc.cast(t["label"], pa.float64()))
            new = pc.if_else(
                smaller, pc.cast(msg, pa.int64(), safe=False), t["label"]
            )
            return pa.table({"v": t["v"], "label": new, "active": smaller})

        state = safe_join(
            state.select_columns(["v", "label"]), msgs, "left_outer", P, on=("v",)
        ).map_batches(apply_min, batch_format="pyarrow")
        state = materialize_clean(state)
    return state.map_batches(
        lambda t: pa.table({"v": t["v"], "component": t["label"]}),
        batch_format="pyarrow",
    )
