"""k-truss decomposition (membership for a fixed k): the edge-cohesion
analog of k-core (Cohen, "Trusses: cohesive subgraphs for social network
analysis", NSA tech report 2008 — public formulation). Iteratively delete
every edge contained in fewer than k−2 triangles until a fixpoint; the
surviving edge set is the k-truss.

Each round reuses the triangle machinery's per-EDGE support pass
(``triangle_count(attribute="edges")`` — degree-ordered wedges, co-
partitioned closing, per-edge credit), then filters the SUPPORT table
itself: for k ≥ 3 every surviving edge has support ≥ 1, so the survivor
set is exactly the filtered support rows — no join back to the edge
table. Jacobi-style simultaneous deletion each round, so the unrolled
DuckDB oracle (``sql_oracle.ktruss_sql``) replays it exactly.

Cost: one triangle enumeration per round over a shrinking edge set — the
standard truss-decomposition shape; round 1 dominates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .triangles import triangle_count

KTRUSS_K = 4
KTRUSS_MAX_ROUNDS = 20  # oracle unroll bound; fixpoint margin pytest-asserted


def ktruss(
    oriented_edges: ray.data.Dataset,
    n: int,
    k: int = KTRUSS_K,
    max_rounds: int = KTRUSS_MAX_ROUNDS,
    local_tail_threshold: int = 50_000,
) -> tuple[ray.data.Dataset, int]:
    """→ ((a, b, support) Dataset over the k-truss edges, rounds used).

    ``oriented_edges``: canonical src<dst simple representation
    (``LinkGraph.oriented()``). Support values are the triangle counts
    within the FINAL surviving set.
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k-2 >= 1)")
    edges = oriented_edges.materialize()
    n_edges = edges.count()
    rounds = 0
    supports = None
    while rounds < max_rounds:
        if 0 < n_edges <= local_tail_threshold:
            # LOCAL TAIL: the surviving set fits comfortably on the driver
            # and each further round would pay a full distributed triangle
            # pass (aggregator spin-up ≫ work) for a shrinking few-k-edge
            # set with no parallelism left to exploit. Same Jacobi
            # simultaneous-deletion semantics, so the result — and the
            # unrolled oracle — are unchanged. At 100 TB the distributed
            # rounds above do the heavy peeling; this bound is ~MBs.
            pairs = []
            for ref in edges.to_arrow_refs():
                tt = ray.get(ref)
                pairs.extend(
                    zip(
                        tt["src"].to_numpy().tolist(),
                        tt["dst"].to_numpy().tolist(),
                    )
                )
            sup, local_rounds = _local_peel(pairs, k)
            rounds += local_rounds
            a_arr = np.array([e[0] for e in sorted(sup)], dtype=np.int64)
            b_arr = np.array([e[1] for e in sorted(sup)], dtype=np.int64)
            s_arr = np.array([sup[e] for e in sorted(sup)], dtype=np.int64)
            return (
                ray.data.from_arrow(
                    pa.table({"a": a_arr, "b": b_arr, "support": s_arr})
                ),
                rounds,
            )
        rounds += 1
        supports, _ = triangle_count(edges, n, attribute="edges")
        survivors = supports.filter(expr=f"support >= {k - 2}").materialize()
        n_surv = survivors.count()
        if n_surv == n_edges:  # fixpoint: nothing deleted this round
            break
        n_edges = n_surv
        edges = survivors.map_batches(
            lambda t: pa.table(
                {
                    "src": t["ea"].to_numpy().astype(np.int64),
                    "dst": t["eb"].to_numpy().astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if n_surv == 0:
            break
    final = supports.filter(expr=f"support >= {k - 2}").map_batches(
        lambda t: pa.table(
            {
                "a": t["ea"].to_numpy().astype(np.int64),
                "b": t["eb"].to_numpy().astype(np.int64),
                "support": t["support"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )
    return final, rounds


def _local_peel(pairs: list, k: int) -> tuple[dict, int]:
    """Driver-side Jacobi peel to fixpoint over a small (a<b) edge list;
    returns ({edge: final support}, rounds). Identical semantics to the
    distributed rounds (simultaneous deletion of all under-supported)."""
    edges = set(pairs)
    rounds = 0
    while True:
        rounds += 1
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return sup, rounds
        edges -= drop
