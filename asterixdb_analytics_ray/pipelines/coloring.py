"""Distributed greedy graph coloring by iterated priority-maxima peeling.

Jones–Plassmann-family coloring (Jones & Plassmann, "A parallel graph
coloring heuristic", SIAM J. Sci. Comput. 14(3), 1993 — public knowledge)
with the color-equals-round simplification: in round r every UNCOLORED
vertex whose fixed hash priority beats all uncolored neighbors takes color
r.  Two candidates are never adjacent (strict priority order), and
vertices colored in different rounds differ by construction, so the
coloring is proper; colors used = rounds ≈ the priority-peeling depth
(O(log n) expected for a random permutation — same bound as the MIS
rounds it generalizes).

The min-free-color variant of Jones–Plassmann needs each candidate to see
its neighbors' full COLOR SET (not foldable through a combiner); the
color-equals-round rule needs only a MAX-combine of uncolored-neighbor
priorities — one half-step per round through the dense engine, the exact
message shape of ``mis.py`` round (a).

Determinism contract (shared with MIS): priority(v) = md5_u64(str(v)) >>
11 — 53 bits, exact in the engine's float64 MAX-combiner AND the oracle's
BIGINT; every comparison resolves identically on both sides, and the job
is restartable with no RNG state.  Vertices still uncolored after
``max_rounds`` keep color −1 on BOTH sides (the fixpoint margin is
pytest-asserted, as for MIS).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import MAX
from .mis import _priorities

COLOR_MAX_ROUNDS = 40


@dataclass
class ColoringDense:
    n: int
    max_rounds: int = COLOR_MAX_ROUNDS

    name: str = "coloring"
    combiner = MAX
    msg_dtype = np.float64
    halt_when_inactive = True

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "color": np.full(n, -1, dtype=np.int64),
            "prio": _priorities(n),
        }

    def scatter_factory(self, refs, superstep):
        if superstep > self.max_rounds:
            return None
        color_ref, prio_ref = refs["color"], refs["prio"]

        def scatter(batch: pa.Table) -> pa.Table:
            color = ray.get(color_ref)
            prio = ray.get(prio_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            m = (color[src] < 0) & (color[dst] < 0)
            if not m.any():
                return pa.table(
                    {
                        "v": pa.array([], pa.int64()),
                        "msg": pa.array([], pa.float64()),
                    }
                )
            v, mx = MAX.segment_reduce(dst[m], prio[src[m]])
            return pa.table({"v": v, "msg": mx})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        color, prio = state["color"], state["prio"]
        if superstep < 2:  # no round-1 messages have arrived yet
            return state, self.n, float(self.n)
        uncolored = color < 0
        # MAX identity −inf ⇒ isolated / all-neighbors-colored vertices win
        winner = uncolored & (prio > msg)
        # scatter at superstep s applies here at s+1 → 1-based color = s
        new_color = np.where(winner, np.int64(superstep - 1), color)
        active = int((new_color < 0).sum())
        return {"color": new_color, "prio": prio}, active, float(active)


def coloring_table(
    und_edges: ray.data.Dataset,
    n: int,
    max_rounds: int = COLOR_MAX_ROUNDS,
    cfg: BSPConfig | None = None,
) -> pa.Table:
    """(v, color) — proper coloring, color = 1-based round index, −1 if
    uncolored within ``max_rounds`` (never at the asserted margins)."""
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, max_rounds + 2)
    res: BSPResult = run_dense_bsp(
        und_edges, n, ColoringDense(n=n, max_rounds=max_rounds), cfg
    )
    return pa.table(
        {
            "v": np.arange(n, dtype=np.int64),
            "color": res.state["color"].astype(np.int64),
        }
    )
