"""HITS (hubs & authorities) as alternating BSP half-steps.

The reference ships no HITS example, but the operator is the canonical
second link-analysis kernel next to PageRank (Kleinberg, "Authoritative
sources in a hyperlinked environment", JACM 46(5), 1999) and exercises the
one message pattern PageRank doesn't: REVERSE-edge gather (hub update pulls
along dst→src).  Plan shape per half-step is identical to the reference's
PageRank job (``pregelix-example/.../PageRankVertex.java:118-145`` — scatter
over edges, sum-combine, apply): odd supersteps push ``hub[src]`` to ``dst``
(authority update), even supersteps push ``auth[dst]`` back to ``src`` (hub
update), both through the dense engine's combine tree.

Numerical contract (SQL-reproducible): the classic per-iteration L2
normalization would thread a global floating-point reduction through every
iteration — summation-order noise then compounds and the DuckDB oracle
can't reproduce it bit-stably.  Instead the power iteration runs
UN-normalized (growth ≤ (max_deg²)^iters ≈ 1e60 ≪ double range) and both
scores are scaled ONCE at the end by their maximum — an order-independent,
exactly-reproducible reduction — then rounded to ``HITS_DECIMALS``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import SUM

HITS_ITERS = 10
HITS_DECIMALS = 7  # one global max-scale division; 1e-7 grain absorbs
# the ~1e-13 relative summation-order noise of 10 unnormalized applies


@dataclass
class HITSDense:
    """Dense-engine kernel: state = {hub, auth}; 2·iters half-steps."""

    n: int
    iters: int = HITS_ITERS

    name: str = "hits"
    combiner = SUM
    msg_dtype = np.float64

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "hub": np.ones(n, dtype=np.float64),
            "auth": np.zeros(n, dtype=np.float64),
        }

    def scatter_factory(self, refs, superstep):
        if superstep > 2 * self.iters:
            return None
        if superstep % 2 == 1:  # authority half-step: hub flows src → dst
            vec_ref, take, emit = refs["hub"], "src", "dst"
        else:  # hub half-step: fresh auth flows dst → src
            vec_ref, take, emit = refs["auth"], "dst", "src"

        def scatter(batch: pa.Table) -> pa.Table:
            vec = ray.get(vec_ref)
            contrib = vec[batch[take].to_numpy()]
            v, m = SUM.segment_reduce(batch[emit].to_numpy(), contrib)
            return pa.table({"v": v, "msg": m})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        # messages sent at s arrive with superstep == s+1: even ⇒ the odd
        # scatter's authority sums, odd(≥3) ⇒ the even scatter's hub sums
        if superstep % 2 == 0:
            new = {"hub": state["hub"], "auth": msg}
            delta = float(np.abs(msg - state["auth"]).max())
        else:
            new = {"hub": msg, "auth": state["auth"]}
            delta = float(np.abs(msg - state["hub"]).max())
        return new, self.n, delta


def hits(
    edges: ray.data.Dataset,
    n: int,
    iters: int = HITS_ITERS,
    cfg: BSPConfig | None = None,
) -> BSPResult:
    """Run HITS over a directed edge Dataset; state left UN-scaled."""
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, 2 * iters + 2)
    return run_dense_bsp(edges, n, HITSDense(n=n, iters=iters), cfg)


def hits_table(
    edges: ray.data.Dataset,
    n: int,
    iters: int = HITS_ITERS,
    decimals: int = HITS_DECIMALS,
) -> pa.Table:
    """(v, hub, auth) with both scores max-scaled to 1 and rounded."""
    res = hits(edges, n, iters=iters)
    hub, auth = res.state["hub"], res.state["auth"]
    hmax = float(hub.max()) or 1.0
    amax = float(auth.max()) or 1.0
    return pa.table(
        {
            "v": np.arange(n, dtype=np.int64),
            "hub": np.round(hub / hmax, decimals),
            "auth": np.round(auth / amax, decimals),
        }
    )
