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
import pandas as pd
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


def modularity(
    oriented_edges: ray.data.Dataset,
    labels: np.ndarray,
    round_digits: int = 6,
) -> pa.Table:
    """Newman modularity of a vertex partition (e.g. the CC or LP labels):
    Q = Σ_c [ e_c/m − (deg_c / 2m)² ] over communities c, where e_c is the
    number of within-community undirected edges, deg_c the community's
    degree sum, and m the total undirected edge count.

    → one row (modularity, n_communities: int64, m_edges: int64).

    Plan: the label array rides the object store once (``ray.put`` — same
    class as the dense PageRank outdeg vector; the sharded shard-gather
    relabel in ``stages/sharded.py`` is the 10⁹-vertex alternative), each
    edge block gathers its endpoints' labels and folds per-label partials
    (e_c, deg_c) — a communities-bounded shuffle — and the closing Q sum
    is a second constant-key fold of per-block partial sums, so no task
    ever sees more than its own block plus the per-label table.

    Reference analog: the GlobalAggregator close over a full-scan compute
    (``pregelix/.../GlobalAggregator``); modularity itself is public
    knowledge (Newman & Girvan 2004).
    """
    from ray.data.aggregate import Sum

    from ..functions.fasthash import round_like_sql

    labels = np.asarray(labels, dtype=np.int64)
    lref = ray.put(labels)
    m = oriented_edges.count()
    n_comm = int(np.unique(labels).size)
    if m == 0:
        return pa.table(
            {
                "modularity": pa.array([0.0], pa.float64()),
                "n_communities": pa.array([n_comm], pa.int64()),
                "m_edges": pa.array([0], pa.int64()),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)  # zero-copy plasma read, shared per node
        la = lab[t["src"].to_numpy()]
        lb = lab[t["dst"].to_numpy()]
        # degree partial: each oriented edge credits both endpoints' labels
        dl, dc = np.unique(np.concatenate([la, lb]), return_counts=True)
        # within-community edge partial
        same = la == lb
        el, ec = np.unique(la[same], return_counts=True)
        deg = pd.DataFrame({"label": dl, "deg": dc.astype(np.int64)})
        win = pd.DataFrame({"label": el, "ein": ec.astype(np.int64)})
        g = deg.merge(win, on="label", how="outer").fillna(0)
        return pa.table(
            {
                "label": g["label"].to_numpy(np.int64),
                "deg": g["deg"].to_numpy(np.int64),
                "ein": g["ein"].to_numpy(np.int64),
            }
        )

    per_label = (
        oriented_edges.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("deg", alias_name="deg"), Sum("ein", alias_name="ein"))
    )

    md = float(m)

    def q_partial(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy().astype(np.float64)
        ein = t["ein"].to_numpy().astype(np.float64)
        q = float(np.sum(ein / md - (deg / (2.0 * md)) ** 2))
        return pa.table(
            {"k": pa.array([0], pa.int64()), "q": pa.array([q], pa.float64())}
        )

    from ray.data.aggregate import Sum as _Sum

    total = (
        per_label.map_batches(q_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(_Sum("q", alias_name="q"))
        .take_all()
    )
    q = float(total[0]["q"]) if total else 0.0
    return pa.table(
        {
            "modularity": pa.array(
                [float(round_like_sql(np.array([q]), round_digits)[0])],
                pa.float64(),
            ),
            "n_communities": pa.array([n_comm], pa.int64()),
            "m_edges": pa.array([int(m)], pa.int64()),
        }
    )
