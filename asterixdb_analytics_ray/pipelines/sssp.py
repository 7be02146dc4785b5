"""Single-source shortest paths — min-dist relaxation with an active frontier.

Reference: ``pregelix-example/.../ShortestPathsVertex.java:124-145`` — value
starts ∞ (0 at the source); on a smaller incoming distance the vertex updates
and relaxes each out-edge with the edge weight (missing weight → 1.0);
combiner = min; vertices vote to halt and reactivate on message.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import MIN


@dataclass
class SSSPDense:
    source: int
    weight_col: str | None = None  # edge weight column; None → 1.0 per edge
    name: str = "sssp"
    combiner = MIN
    msg_dtype = np.float64
    halt_when_inactive: bool = True

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        dist = np.full(n, np.inf, dtype=np.float64)
        dist[self.source] = 0.0
        active = np.zeros(n, dtype=bool)
        active[self.source] = True
        return {"dist": dist, "active": active}

    def scatter_factory(self, refs, superstep):
        dist_ref, active_ref = refs["dist"], refs["active"]
        wcol = self.weight_col

        def scatter(batch: pa.Table) -> pa.Table:
            dist = ray.get(dist_ref)
            active = ray.get(active_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            w = (
                batch[wcol].to_numpy().astype(np.float64)
                if wcol is not None and wcol in batch.column_names
                else np.ones(len(src), dtype=np.float64)
            )
            m = active[src]
            v, msg = MIN.segment_reduce(dst[m], dist[src[m]] + w[m])
            return pa.table({"v": v, "msg": msg})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        dist = state["dist"]
        better = has_msg & (msg < dist)
        new = np.where(better, msg, dist)
        return (
            {"dist": new, "active": better},
            int(better.sum()),
            float(better.sum()),
        )


def sssp_dense(
    edges: ray.data.Dataset,
    n: int,
    source: int,
    weight_col: str | None = None,
    cfg: BSPConfig | None = None,
) -> BSPResult:
    cfg = cfg or BSPConfig(max_supersteps=10_000)
    return run_dense_bsp(edges, n, SSSPDense(source=source, weight_col=weight_col), cfg)
