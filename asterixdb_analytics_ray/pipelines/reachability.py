"""Reachability — bidirectional bitmask search between two query vertices.

Reference: ``pregelix-example/.../ReachabilityVertex.java`` — bit 1 marks
"reached from source" (propagates along forward edges), bit 2 "reached from
destination" (propagates along reverse edges); combiner = bitwise OR; when
any vertex's state reaches 3 the job force-terminates (``signalTerminate``)
and the answer is "reachable".
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import BIT_OR


@dataclass
class ReachabilityDense:
    source: int
    dest: int
    name: str = "reachability"
    combiner = BIT_OR
    msg_dtype = np.int64
    halt_when_inactive: bool = True
    _terminate: bool = False

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        bits = np.zeros(n, dtype=np.int64)
        bits[self.source] |= 1
        bits[self.dest] |= 2
        active = np.zeros(n, dtype=bool)
        active[[self.source, self.dest]] = True
        if self.source == self.dest:
            self._terminate = True
        return {"bits": bits, "active": active}

    def scatter_factory(self, refs, superstep):
        if self._terminate:
            return None  # reference: signalTerminate ends the whole job
        bits_ref, active_ref = refs["bits"], refs["active"]

        def scatter(batch: pa.Table) -> pa.Table:
            bits = ray.get(bits_ref)
            active = ray.get(active_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            # bit 1 flows src→dst; bit 2 flows dst→src
            fwd = active[src] & ((bits[src] & 1) > 0)
            bwd = active[dst] & ((bits[dst] & 2) > 0)
            keys = np.concatenate([dst[fwd], src[bwd]])
            vals = np.concatenate(
                [bits[src[fwd]] & 1, bits[dst[bwd]] & 2]
            ).astype(np.int64)
            v, m = BIT_OR.segment_reduce(keys, vals)
            return pa.table({"v": v, "msg": m})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        bits = state["bits"]
        new = bits | np.where(has_msg, msg, 0)
        changed = new != bits
        if (new == 3).any():
            self._terminate = True
        return (
            {"bits": new, "active": changed},
            int(changed.sum()),
            float(changed.sum()),
        )


def reachability_dense(
    edges: ray.data.Dataset,
    n: int,
    source: int,
    dest: int,
    cfg: BSPConfig | None = None,
) -> tuple[bool, BSPResult]:
    """→ (reachable?, BSPResult). ``edges`` is the DIRECTED edge set."""
    cfg = cfg or BSPConfig(max_supersteps=10_000)
    algo = ReachabilityDense(source=source, dest=dest)
    res = run_dense_bsp(edges, n, algo, cfg)
    reachable = bool((res.state["bits"] == 3).any()) or source == dest
    return reachable, res
