"""Graph sampling — seeded BFS expansion until a global fill-rate is met.

Reference: ``pregelix-example/.../GraphSampleVertex.java`` (+ undirected
variant) — seed vertices mark themselves selected, broadcast to neighbors,
newly-reached vertices join the sample, and a global aggregator tracks the
selected count until the requested sample fraction is reached.

Dense-mode implementation: the frontier mask is the active set; the global
aggregator is the driver-side selected count (the reference reads it from
the per-iteration HDFS aggregate file). When a round would overshoot the
quota, the newly reached set is truncated deterministically by ascending
vertex id (stable across runs and parallelism levels).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .components import MIN  # reuse the min combiner's segment reduce


def graph_sample_dense(
    undirected_edges: ray.data.Dataset,
    n: int,
    seeds: np.ndarray,
    target_fraction: float = 0.5,
    max_rounds: int = 10_000,
    scatter_batch_size: int | None = 65536,
) -> tuple[np.ndarray, int]:
    """→ (selected mask, rounds used)."""
    quota = int(np.ceil(target_fraction * n))
    selected = np.zeros(n, dtype=bool)
    selected[seeds] = True
    frontier = selected.copy()
    rounds = 0
    while selected.sum() < quota and frontier.any() and rounds < max_rounds:
        rounds += 1
        fref = ray.put(frontier)

        def scatter(batch: pa.Table) -> pa.Table:
            f = ray.get(fref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            reached = np.unique(dst[f[src]])
            return pa.table({"v": reached})

        reached = np.zeros(n, dtype=bool)
        for b in undirected_edges.map_batches(
            scatter, batch_format="pyarrow", batch_size=scatter_batch_size
        ).iter_batches(batch_format="pyarrow"):
            reached[b["v"].to_numpy()] = True
        newly = reached & ~selected
        new_ids = np.flatnonzero(newly)
        remaining = quota - int(selected.sum())
        if len(new_ids) > remaining:
            new_ids = new_ids[:remaining]  # deterministic truncation by id
            newly = np.zeros(n, dtype=bool)
            newly[new_ids] = True
        selected |= newly
        frontier = newly
    return selected, rounds
