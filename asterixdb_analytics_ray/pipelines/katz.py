"""Katz centrality as BSP supersteps on the dense engine.

Third link-analysis kernel next to PageRank and HITS (Katz, "A new status
index derived from sociometric analysis", Psychometrika 18(1), 1953):
``x_{k+1} = beta + alpha * A^T x_k`` — every vertex accrues ``beta`` plus
``alpha`` times the sum of its in-neighbors' scores.  Plan shape per
superstep is identical to the reference's PageRank job
(``pregelix-example/.../PageRankVertex.java:118-145`` — scatter over
out-edges, sum-combine, apply); the only differences from PageRank are the
un-divided contribution (no outdeg normalization) and the additive base.

Numerical contract (SQL-reproducible, same pattern as ``hits.py``): the
iteration runs with the raw ``alpha``/``beta`` constants — no per-round
normalization threads a global FP reduction through the loop — and the
result is scaled ONCE at the end by its maximum (an order-independent
reduction), then rounded to ``KATZ_DECIMALS``.  With ``alpha * max_indeg``
possibly > 1 the un-scaled values may grow geometrically; growth over 10
fixed applies stays ≪ double range and RELATIVE summation-order noise stays
~1e-13, which the 1e-7 grain of the max-scaled output absorbs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import SUM

KATZ_ALPHA = 0.01
KATZ_BETA = 1.0
KATZ_ITERS = 10
KATZ_DECIMALS = 7  # one global max-scale division, as HITS_DECIMALS


@dataclass
class KatzDense:
    """Dense-engine kernel: state = {x}; ``iters`` gather-sum applies."""

    n: int
    alpha: float = KATZ_ALPHA
    beta: float = KATZ_BETA
    iters: int = KATZ_ITERS

    name: str = "katz"
    combiner = SUM
    msg_dtype = np.float64

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {"x": np.full(n, self.beta, dtype=np.float64)}

    def scatter_factory(self, refs, superstep):
        if superstep > self.iters:
            return None
        vec_ref = refs["x"]

        def scatter(batch: pa.Table) -> pa.Table:
            x = ray.get(vec_ref)
            contrib = x[batch["src"].to_numpy()]
            v, m = SUM.segment_reduce(batch["dst"].to_numpy(), contrib)
            return pa.table({"v": v, "msg": m})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        new = self.beta + self.alpha * msg
        delta = float(np.abs(new - state["x"]).max())
        return {"x": new}, self.n, delta


def katz(
    edges: ray.data.Dataset,
    n: int,
    alpha: float = KATZ_ALPHA,
    beta: float = KATZ_BETA,
    iters: int = KATZ_ITERS,
    cfg: BSPConfig | None = None,
) -> BSPResult:
    """Run Katz over a directed edge Dataset; state left UN-scaled."""
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, iters + 2)
    return run_dense_bsp(
        edges, n, KatzDense(n=n, alpha=alpha, beta=beta, iters=iters), cfg
    )


def katz_table(
    edges: ray.data.Dataset,
    n: int,
    alpha: float = KATZ_ALPHA,
    beta: float = KATZ_BETA,
    iters: int = KATZ_ITERS,
    decimals: int = KATZ_DECIMALS,
) -> pa.Table:
    """(v, katz) with the score max-scaled to 1 and rounded."""
    res = katz(edges, n, alpha=alpha, beta=beta, iters=iters)
    x = res.state["x"]
    xmax = float(x.max()) or 1.0
    return pa.table(
        {
            "v": np.arange(n, dtype=np.int64),
            "katz": np.round(x / xmax, decimals),
        }
    )
