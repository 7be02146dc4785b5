"""k-core decomposition (membership for a fixed k) as BSP peeling rounds.

Jacobi-style peeling over the symmetrized simple edge set: every round each
alive vertex counts its alive neighbors; ALL vertices below ``k`` are removed
simultaneously; repeat until a fixpoint (no removals). This is exactly the
halt-on-quiescence pattern of the reference's vertex-centric jobs
(``voteToHalt`` + the active-set inner-join plan,
``pregelix-example/.../ConnectedComponentsVertex.java`` shape) and is
oracled by a programmatically unrolled CTE chain like CC/SSSP.

Scale shape: each round is one streaming pass over the edge Dataset with the
alive mask broadcast via ``ray.put`` (uint8: 1 GB at 10⁹ vertices,
broadcast once per round, read zero-copy per task; a packed bitmap would
cut it 8× further), per-batch bincount
partials, dense combine. State is the dense-engine layout (documented dense
path, like PageRank's rank vector).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import SUM

KCORE_K = 3
KCORE_MAX_ROUNDS = 40  # sf-graph fixpoint is ≤ ~10 rounds (pytest-asserted
# margin); the SQL oracle unrolls this many CTEs — keep the two in sync


@dataclass
class KCoreDense:
    """state = {alive: 0/1, core_deg: last alive-neighbor count}."""

    n: int
    k: int = KCORE_K

    name: str = "kcore"
    combiner = SUM
    msg_dtype = np.float64
    halt_when_inactive = True  # stop on the first no-removal round

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "alive": np.ones(n, dtype=np.uint8),
            "core_deg": np.zeros(n, dtype=np.float64),
        }

    def scatter_factory(self, refs, superstep):
        alive_ref = refs["alive"]

        def scatter(batch: pa.Table) -> pa.Table:
            """und edges (both directions present): each edge with both ends
            alive contributes 1 to its dst's alive-degree."""
            alive = ray.get(alive_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            m = (alive[src] > 0) & (alive[dst] > 0)
            if not m.any():
                return pa.table(
                    {"v": pa.array([], pa.int64()), "msg": pa.array([], pa.float64())}
                )
            v, cnt = SUM.segment_reduce(dst[m], np.ones(int(m.sum()), np.float64))
            return pa.table({"v": v, "msg": cnt})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        alive = state["alive"] > 0
        new_alive = alive & (msg >= self.k)
        removed = int((alive & ~new_alive).sum())
        return (
            {
                "alive": new_alive.astype(np.uint8),
                "core_deg": np.where(new_alive, msg, 0.0),
            },
            removed,
            float(removed),
        )


def kcore(
    und_edges: ray.data.Dataset,
    n: int,
    k: int = KCORE_K,
    cfg: BSPConfig | None = None,
) -> BSPResult:
    """Run peeling to fixpoint over the symmetric simple edge set
    (``LinkGraph`` ``und`` view: both directions, self-loops dropped)."""
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, KCORE_MAX_ROUNDS + 2)
    return run_dense_bsp(und_edges, n, KCoreDense(n=n, k=k), cfg)


def kcore_table(und_edges: ray.data.Dataset, n: int, k: int = KCORE_K) -> pa.Table:
    """(v, core_deg) for the members of the k-core, sorted by v."""
    res = kcore(und_edges, n, k=k)
    member = res.state["alive"] > 0
    v = np.flatnonzero(member).astype(np.int64)
    return pa.table(
        {"v": v, "core_deg": res.state["core_deg"][member].astype(np.int64)}
    )
