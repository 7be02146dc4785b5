"""DAG topological levels — longest-path depth per vertex via max-propagation.

The directed transcript link graph is acyclic by construction (reply edges go
turn i → i+1 within a conversation, conv_tool crosses kinds one way, and
tool_cooc is oriented by ascending tool name — ``graph.py``), so the
longest-path level is well defined: ``level(v) = max over directed paths
ending at v of the path length`` (sources sit at level 0). This is the
critical-path / topological-stratum assignment used to stage DAG workloads.

BSP shape: identical to SSSP (``pregelix-example/.../ShortestPathsVertex.java``
semantics with the combiner flipped) — every vertex starts ACTIVE at level 0;
an active vertex relaxes each out-edge with ``level + 1``; combiner = MAX;
vertices re-activate on improvement and the job halts when no level rises.
Convergence takes exactly ``longest_path`` supersteps (turn chains are ≤ a
few dozen hops), and on a cyclic input the run would hit ``max_supersteps``
— ``dag_levels_dense`` raises if convergence exceeds the oracle's unroll
bound so a silent mismatch is impossible.

Scale note: the dense kernel mirrors ``sssp.SSSPDense`` (same scatter /
segment-reduce shape, ~O(E/P) per task per round); the sharded scale path is
the ``ShardedSSSP`` runner shape with (init=0 everywhere, w=-1, min) since
``longest = -min over paths of (-len)``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import MAX


@dataclass
class DAGLevelsDense:
    name: str = "dag_levels"
    combiner = MAX
    msg_dtype = np.float64
    halt_when_inactive: bool = True

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "level": np.zeros(n, dtype=np.float64),
            "active": np.ones(n, dtype=bool),
        }

    def scatter_factory(self, refs, superstep):
        level_ref, active_ref = refs["level"], refs["active"]

        def scatter(batch: pa.Table) -> pa.Table:
            level = ray.get(level_ref)
            active = ray.get(active_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            m = active[src]
            v, msg = MAX.segment_reduce(dst[m], level[src[m]] + 1.0)
            return pa.table({"v": v, "msg": msg})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        level = state["level"]
        better = has_msg & (msg > level)
        new = np.where(better, msg, level)
        return (
            {"level": new, "active": better},
            int(better.sum()),
            float(better.sum()),
        )


def dag_levels_dense(
    edges: ray.data.Dataset,
    n: int,
    cfg: BSPConfig | None = None,
    max_unroll: int | None = None,
) -> BSPResult:
    """Run to convergence; raise if the input needed more supersteps than the
    oracle's unrolled bound (cycle, or a deeper DAG than configured for)."""
    if cfg is None:
        # cap at the unroll bound: a cyclic input stops there instead of
        # spinning to some huge generic limit, and is then detected below
        cap = (max_unroll + 1) if max_unroll is not None else 10_000
        cfg = BSPConfig(max_supersteps=cap)
    res = run_dense_bsp(edges, n, DAGLevelsDense(), cfg)
    converged = not res.rounds or res.rounds[-1].active == 0
    if max_unroll is not None and (not converged or res.supersteps > max_unroll):
        raise RuntimeError(
            f"dag_levels needed >{max_unroll} supersteps (oracle unroll "
            f"bound): input graph is cyclic or deeper than assumed"
        )
    return res
