"""Explicit hash partitioning — the engine's VertexPartitioner analog.

Reference: ``VertexIdPartitionComputerFactory`` (hash of vertex id bytes mod
partitions) routes messages to their owner partition before the global
combine (``pregelix-runtime/.../touchpoint/VertexIdPartitionComputerFactory.java``);
``DefaultVertexPartitioner`` is ``hashCode % nPartitions``
(``pregelix-api/.../util/DefaultVertexPartitioner.java:29-34``).

``hash_partition_by(ds, col, P)`` redistributes an edge table so block p
holds exactly the rows with ``col % P == p``. The dense BSP scatter then
pre-combines messages per block with bincount over LOCAL ids (``col // P``)
and the per-block partial message tables have pairwise-DISJOINT destination
sets — the driver-side final combine degrades to a pure assignment, and a
hot destination never fans across partials (the salted/two-level-combine
guarantee from SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data


@dataclass
class PartitionedEdges:
    """The bulk-loaded graph: one Arrow table ref per partition of ``key``.

    The analog of the reference's loaded per-partition B-tree, shareable
    across type-compatible jobs (``Driver.compatible``,
    ``pregelix-core/.../driver/Driver.java:217-233`` — multi-job chaining
    over the same loaded graph): every sharded runner's ``prepare()``
    accepts one and skips its own shuffle, so e.g. connected components and
    label propagation over the same undirected edge set pay the bulk-load
    exchange once. Compatibility (same edge table semantics, same P, same
    partition key) is the caller's contract, as in the reference.
    """

    refs: dict[int, "ray.ObjectRef"]
    P: int
    key: str = "dst"


def partition_edges(
    edges: ray.data.Dataset, P: int, key: str = "dst"
) -> PartitionedEdges:
    """One explicit all-to-all → a shareable ``PartitionedEdges``."""
    return PartitionedEdges(partition_table_refs(edges, key, P), P, key)


def hash_partition_by(
    ds: ray.data.Dataset, col: str, num_partitions: int
) -> ray.data.Dataset:
    """One shuffle: redistribute rows so block i holds rows with col%P == i.

    Done once at graph build; every subsequent superstep reuses the layout
    (the reference equally pays one M-to-N partition + bulk load at setup,
    ``JobGen.loadHDFSData:531-604``).
    """
    P = num_partitions

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", pa.array((t[col].to_numpy() % P).astype(np.int32))
        )

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__part"])

    shuffled = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part", num_partitions=P)
        .map_groups(strip, batch_format="pyarrow")
        .materialize()
    )
    return _coalesce_single_part_blocks(shuffled, col, P)


@ray.remote(num_cpus=0)
def _probe_part(t: "pa.Table", col: str, P: int) -> int:
    """Partition class of one block (or -1 if empty) — runs next to the data
    so the driver never fetches block contents, only one int per block."""
    if t.num_rows == 0 or col not in t.schema.names:
        return -1
    return int(t[col][0].as_py()) % P


def _coalesce_single_part_blocks(
    mat_ds: ray.data.Dataset, col: str, P: int
) -> ray.data.Dataset:
    """Merge the shuffle's output fragments so each partition is ONE block.

    Ray's groupby/map_groups emits several blocks per group; the dense BSP
    scatter launches one task per block, so fragment counts translate
    directly into per-superstep task-dispatch overhead. Each fragment's
    partition class is probed by a zero-CPU task next to the data (block
    contents never reach the driver — single-node reads are plasma-local,
    but on a real cluster a driver-side peek would pull every block over
    the network); merging is then one zero-copy concat task per partition.
    (Very large partitions will be re-split by the object store's block
    sizing — the scatter's per-batch partition check handles that
    correctly.)
    """
    import ray as _ray

    refs = mat_ds.to_arrow_refs()
    if len(refs) <= P:
        return mat_ds
    parts = _ray.get([_probe_part.remote(r, col, P) for r in refs])
    groups: dict[int, list] = {}
    for r, p in zip(refs, parts):
        if p >= 0:
            groups.setdefault(p, []).append(r)

    @_ray.remote
    def concat(*tables):
        return pa.concat_tables(tables).combine_chunks()

    new_refs = [
        g[0] if len(g) == 1 else concat.remote(*g)
        for g in (groups[p] for p in sorted(groups))
    ]
    return ray.data.from_arrow_refs(new_refs)


def is_dst_partitioned(batch_dst: np.ndarray, P: int) -> bool:
    """Cheap per-batch check that all dsts fall in one partition class."""
    if len(batch_dst) == 0:
        return True
    m = batch_dst % P
    return bool((m == m[0]).all())


@ray.remote
def _split_block(t: "pa.Table", col: str, P: int) -> dict:
    """Split one Arrow block by col % P; returns {part: ObjectRef(sub-table)}.

    Sub-tables are ray.put inside the task so only tiny ref dicts reach the
    driver — block data never leaves the object store.
    """
    import ray as _ray

    # a shuffle can emit zero-row fragments whose schema lost its columns
    if t.num_rows == 0 or col not in t.schema.names:
        return {}
    mod = t[col].to_numpy() % P
    out = {}
    for p in np.unique(mod):
        out[int(p)] = _ray.put(t.filter(pa.array(mod == p)))
    return out


@ray.remote
def _concat_tables(*tables: "pa.Table") -> "pa.Table":
    return pa.concat_tables(tables).combine_chunks()


def partition_table_refs(
    mat_ds: ray.data.Dataset, col: str, P: int
) -> dict[int, "ray.ObjectRef"]:
    """Explicit all-to-all: {partition p: ObjectRef of its complete table}.

    B split tasks + ≤P concat tasks — a hash shuffle built from raw tasks,
    used by the sharded BSP runner where each partition must be ONE
    contiguous table owned by one ref (Ray Data's groupby emits blocks that
    may pack several partition-groups together). All row data stays in the
    object store end to end.
    """
    import ray as _ray

    block_refs = mat_ds.to_arrow_refs()
    split_maps = _ray.get([_split_block.remote(r, col, P) for r in block_refs])
    per_part: dict[int, list] = {}
    for d in split_maps:
        for p, tref in d.items():
            per_part.setdefault(p, []).append(tref)
    return {
        p: (refs[0] if len(refs) == 1 else _concat_tables.remote(*refs))
        for p, refs in per_part.items()
    }


def salted_aggregate_sum(
    msgs: ray.data.Dataset,
    key: str = "v",
    val: str = "msg",
    salts: int = 8,
) -> ray.data.Dataset:
    """Two-stage salted sum for hot combine keys (explicit skew mitigation).

    A plain ``groupby(key).sum()`` routes every message for a hot key to one
    reduce partition; salting splits each key into ``salts`` sub-keys for the
    first (wide) aggregation, then combines the ≤``salts`` partials per key in
    a second, tiny aggregation — the "high-degree vertex splitting" of
    SURVEY.md §4 (reference analog: frame-segmented MsgList spanning,
    ``MsgList.java:34-50``; our hot keys are popular tool vertices).

    Used when an algorithm runs in dataset mode over a graph with known hub
    destinations; the dense/sharded modes are hub-proof without it because
    per-block (resp. per-partition) pre-combines bound fan-in by block count.
    """

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic spread: row position within batch → salt class
        return t.append_column(
            "__salt", pa.array((np.arange(t.num_rows) % salts).astype(np.int8))
        )

    stage1 = (
        msgs.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "__salt"])
        .sum(val)
    )
    col = f"sum({val})"
    stage2 = stage1.groupby(key).sum(col)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], val: t[f"sum({col})"]})

    return stage2.map_batches(rename, batch_format="pyarrow")
