"""Block hygiene helpers for Dataset-mode iterative pipelines.

Ray 2.49's hash-shuffle join emits SCHEMA-LESS empty blocks for hash
partitions that received no rows. Empty blocks skip ``map_batches`` tasks
entirely, so they survive any downstream transform and crash the next
join/groupby with ``ArrowInvalid: No match ... for key field`` when Acero
can't find the key column in a 0-column table. This only manifests when a
join partition is completely empty — i.e. tiny graphs or pathological key
skew (num_partitions ≫ distinct keys) — but iterative BSP rounds join every
round, so we scrub at each round's materialization barrier.
"""

from __future__ import annotations

import ray
import ray.data


def materialize_clean(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize and drop empty blocks (schema-less or typed).

    The check reads ONLY the driver-side ``BlockMetadata`` of each
    materialized block (``iter_internal_ref_bundles`` carries (ref, metadata)
    pairs) — no block data is fetched, so on a multi-node cluster this costs
    O(num_blocks) driver metadata, not a network pull of both join sides per
    superstep. A block whose metadata lacks a row count is conservatively
    kept. If every block is empty the original materialized dataset is
    returned unchanged (callers terminate on their own row/convergence
    counts before joining again).
    """
    mat = ds.materialize()
    good, empties = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                empties += 1
            else:
                good.append(ref)
    if not good or empties == 0:
        return mat
    return ray.data.from_arrow_refs(good)


def effective_partitions(requested: int | None = None) -> int:
    """Clamp shuffle partition count to the cluster's CPU count.

    Ray's hash-shuffle join schedules one aggregator actor per partition
    concurrently; asking for more partitions than CPUs deadlocks a small
    local cluster (observed: P=32 on 4 CPUs hangs indefinitely). On a real
    multi-node cluster ``cluster_resources()`` reflects all nodes, so this
    still scales partitioning with the cluster.
    """
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    cap = max(2, cpus)
    return min(requested, cap) if requested else cap


def partitions_for(
    n_rows: int,
    requested: int | None = None,
    rows_per_partition: int = 50_000,
) -> int:
    """Data-proportional shuffle-partition count.

    Ray's hash-shuffle join/aggregate spins one aggregator actor per
    partition at a fixed ~0.2s each, which dominates small inputs at a
    CPU-count partitioning (measured: a 5k-row join 14.2s at P=32 vs 4.1s
    at P=2; 153k-edge triangle count 9.3s → 4.1s). Target
    ``rows_per_partition`` rows each, clamped to ``effective_partitions``
    as the large-data ceiling — at production scale this returns the
    cluster-wide CPU count unchanged.
    """
    return max(
        2, min(effective_partitions(requested), -(-n_rows // rows_per_partition))
    )


def safe_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    join_type: str,
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
) -> ray.data.Dataset:
    """``Dataset.join`` with empty blocks scrubbed from both inputs first.

    Note this materializes both sides (a barrier). For BSP rounds that is the
    semantics anyway — Pregelix materializes the grouped message stream at
    every superstep boundary (``MaterializingWriteOperatorDescriptor``,
    ``JobGenOuterJoin.java:143-145``) — and at production scale (keys ≫
    partitions) the scrub drops nothing.
    """
    return materialize_clean(left).join(
        materialize_clean(right),
        join_type,
        effective_partitions(num_partitions),
        on=on,
        right_on=right_on,
    )
