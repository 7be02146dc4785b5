"""Maximal independent set via deterministic greedy-by-priority BSP rounds.

Luby-style distributed MIS (Luby, "A simple parallel algorithm for the
maximal independent set problem", SIAM J. Comput. 15(4), 1986 — public
knowledge) with ONE fixed hash-derived priority permutation instead of
per-round randomness: vertex v joins the MIS when its priority exceeds
every LIVE neighbor's; winners' neighbors are removed; repeat until no
live vertices (O(log n) rounds in expectation for a random permutation).

Determinism contract: priority(v) = md5_u64(str(v)) >> 11 — 53 bits, so
the value is exact in float64 (the dense engine's MAX-combiner dtype) AND
in the DuckDB oracle's BIGINT, and both sides resolve every comparison
identically (``sql_oracle.mis_sql`` replays the rounds as unrolled CTEs).
Hash-seeded priorities also make the job restartable with no RNG state.

Live/mis/win state is uint8 (1 GB each at 10⁹ vertices when broadcast).
Each round is two half-steps through the dense engine over the symmetric
simple edge set: (a) MAX-combine live-neighbor priorities → pick winners,
(b) MAX-combine winner flags → remove winners' neighbors.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions import fasthash
from ..functions.combiners import MAX

MIS_MAX_ROUNDS = 40  # the SQL oracle unrolls this many; fixpoint margin
# is pytest-asserted (expected rounds ~ O(log n))


def _priorities(n: int) -> np.ndarray:
    """h53(v) = md5_u64(str(v)) >> 11, exact in float64."""
    dec = pa.array(np.arange(n, dtype=np.int64)).cast(pa.string())
    return (fasthash.md5_prefix_u64(dec) >> np.uint64(11)).astype(np.float64)


@dataclass
class MISDense:
    n: int

    name: str = "mis"
    combiner = MAX
    msg_dtype = np.float64
    halt_when_inactive = True

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        return {
            "live": np.ones(n, dtype=np.uint8),
            "mis": np.zeros(n, dtype=np.uint8),
            "win": np.zeros(n, dtype=np.uint8),
            "prio": _priorities(n),
        }

    def scatter_factory(self, refs, superstep):
        if superstep % 2 == 1:  # (a) live-neighbor max priority
            live_ref, prio_ref = refs["live"], refs["prio"]

            def scatter(batch: pa.Table) -> pa.Table:
                live = ray.get(live_ref)
                prio = ray.get(prio_ref)
                src = batch["src"].to_numpy()
                dst = batch["dst"].to_numpy()
                m = (live[src] > 0) & (live[dst] > 0)
                if not m.any():
                    return pa.table(
                        {
                            "v": pa.array([], pa.int64()),
                            "msg": pa.array([], pa.float64()),
                        }
                    )
                v, mx = MAX.segment_reduce(dst[m], prio[src[m]])
                return pa.table({"v": v, "msg": mx})

        else:  # (b) winner flags to neighbors
            win_ref = refs["win"]

            def scatter(batch: pa.Table) -> pa.Table:
                win = ray.get(win_ref)
                src = batch["src"].to_numpy()
                dst = batch["dst"].to_numpy()
                m = win[src] > 0
                if not m.any():
                    return pa.table(
                        {
                            "v": pa.array([], pa.int64()),
                            "msg": pa.array([], pa.float64()),
                        }
                    )
                v, mx = MAX.segment_reduce(dst[m], np.ones(int(m.sum())))
                return pa.table({"v": v, "msg": mx})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        live, mis, win, prio = (
            state["live"] > 0,
            state["mis"] > 0,
            state["win"] > 0,
            state["prio"],
        )
        if superstep % 2 == 0:  # after (a): pick winners (no live nbr beats v)
            winner = live & (prio > msg)  # MAX identity −inf ⇒ isolated win
            new = {
                "live": (live & ~winner).astype(np.uint8),
                "mis": (mis | winner).astype(np.uint8),
                "win": winner.astype(np.uint8),
                "prio": prio,
            }
            active = int(new["live"].sum()) + int(winner.sum())
        else:  # after (b): drop winners' neighbors
            removed = live & (msg >= 1.0)
            new = {
                "live": (live & ~removed).astype(np.uint8),
                "mis": state["mis"],
                "win": np.zeros(self.n, dtype=np.uint8),
                "prio": prio,
            }
            active = int(new["live"].sum())
        return new, active, float(active)


def mis(
    und_edges: ray.data.Dataset, n: int, cfg: BSPConfig | None = None
) -> BSPResult:
    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, 2 * MIS_MAX_ROUNDS + 2)
    return run_dense_bsp(und_edges, n, MISDense(n=n), cfg)


def mis_table(und_edges: ray.data.Dataset, n: int) -> pa.Table:
    """(v) — the maximal independent set, sorted by vertex id."""
    res = mis(und_edges, n)
    return pa.table(
        {"v": np.flatnonzero(res.state["mis"] > 0).astype(np.int64)}
    )
