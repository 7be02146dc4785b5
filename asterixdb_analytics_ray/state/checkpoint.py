"""Per-superstep Parquet checkpoints with per-partition lineage + metrics.

Reference analog: Pregelix checkpoints the vertex relation as SequenceFiles via
``InternalVertexOutputFormat`` plus the materialized message stream
(``JobGen.generateCheckpointing``, ``pregelix-core/.../jobgen/JobGen.java:409-434``),
gated by ``ICheckpointHook`` (``ConservativeCheckpointHook.java:24-33`` = every
2 supersteps); recovery reloads the last checkpoint and replays from
superstep+1 (``Driver.runLoopBody:308-320``).

Layout here:

    <dir>/step=<K>/part-<p>.parquet     vertex-state rows for hash partition p
    <dir>/step=<K>/manifest.json        written LAST (atomic rename) →
                                        presence marks the checkpoint complete

The manifest records per-partition lineage (rows + content hash) and the
round metrics, so resume can verify integrity and skip finished partitions.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class PartitionInfo:
    part: int
    rows: int
    content_hash: str


@dataclass
class Manifest:
    superstep: int
    num_partitions: int
    algorithm: str
    metrics: dict[str, Any] = field(default_factory=dict)
    partitions: list[PartitionInfo] = field(default_factory=list)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, default=float)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        d["partitions"] = [PartitionInfo(**p) for p in d["partitions"]]
        return Manifest(**d)


def _step_dir(root: str, step: int) -> str:
    return os.path.join(root, f"step={step:05d}")


def _hash_table(t: pa.Table) -> str:
    h = hashlib.sha256()
    for col in t.column_names:
        arr = t[col].combine_chunks()
        for buf in arr.buffers():
            if buf is not None:
                h.update(buf)
    return h.hexdigest()[:16]


def write_dense_checkpoint(
    root: str,
    step: int,
    algorithm: str,
    state: dict[str, np.ndarray],
    metrics: dict[str, Any],
    num_partitions: int = 8,
) -> Manifest:
    """Write dense vertex-state vectors as a hash-partitioned parquet snapshot.

    Partition p holds vertices with ``v % num_partitions == p`` — the same
    hash-partitioning the per-superstep shuffles key on, so a multi-node
    resume reads each partition where it will be processed.
    """
    n = len(next(iter(state.values())))
    v = np.arange(n, dtype=np.int64)
    sd = _step_dir(root, step)
    tmp = sd + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    man = Manifest(
        superstep=step,
        num_partitions=num_partitions,
        algorithm=algorithm,
        metrics=metrics,
    )
    for p in range(num_partitions):
        mask = (v % num_partitions) == p
        cols = {"v": v[mask]}
        cols.update({k: arr[mask] for k, arr in state.items()})
        t = pa.table(cols)
        pq.write_table(t, os.path.join(tmp, f"part-{p:04d}.parquet"))
        man.partitions.append(PartitionInfo(p, t.num_rows, _hash_table(t)))
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        f.write(man.to_json())
    # remove any previous checkpoint at this step only once the replacement
    # is complete on disk — a crash mid-write never loses the old snapshot
    shutil.rmtree(sd, ignore_errors=True)
    os.replace(tmp, sd)
    return man


def list_checkpoints(root: str) -> list[int]:
    """Steps with a COMPLETE checkpoint (manifest present), ascending."""
    if not os.path.isdir(root):
        return []
    steps = []
    for name in os.listdir(root):
        if name.startswith("step=") and not name.endswith(".tmp"):
            if os.path.exists(os.path.join(root, name, "manifest.json")):
                steps.append(int(name.split("=")[1]))
    return sorted(steps)


def read_manifest(root: str, step: int) -> Manifest:
    with open(os.path.join(_step_dir(root, step), "manifest.json")) as f:
        return Manifest.from_json(f.read())


def read_dense_checkpoint(
    root: str, step: int, verify: bool = True
) -> tuple[dict[str, np.ndarray], Manifest]:
    """Load a dense snapshot back into per-column vectors (lineage-verified)."""
    man = read_manifest(root, step)
    sd = _step_dir(root, step)
    tables = []
    for pinfo in man.partitions:
        t = pq.read_table(os.path.join(sd, f"part-{pinfo.part:04d}.parquet"))
        if verify:
            if t.num_rows != pinfo.rows or _hash_table(t) != pinfo.content_hash:
                raise IOError(
                    f"checkpoint lineage mismatch at step {step} part {pinfo.part}"
                )
        tables.append(t)
    full = pa.concat_tables(tables)
    v = full["v"].to_numpy()
    n = int(v.max()) + 1 if len(v) else 0
    state: dict[str, np.ndarray] = {}
    for col in full.column_names:
        if col == "v":
            continue
        arr = full[col].to_numpy()
        out = np.empty(n, dtype=arr.dtype)
        out[v] = arr
        state[col] = out
    return state, man
