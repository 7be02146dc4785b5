"""Adjacency-text input / TSV vertex output — the reference's IO formats.

Reference: ``TextPageRankInputFormat.java:57-98`` parses whitespace-token
adjacency lines ``src d1 d2 d3 ...`` (first token = vertex id, rest = out
edges); ``TextVertexOutputFormat.java`` writes ``id \\t value`` lines into
one ``part-N`` file per partition — the conformance suite diffs those
(``RunJobTestCase.java:87-110``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data


def read_adjacency_text(path: str, weighted: bool = False) -> ray.data.Dataset:
    """Adjacency text file(s) → (src:int64, dst:int64[, weight:float64]).

    ``weighted=False``: ``src d1 d2 d3 ...`` (every token after the first is
    an out-edge — the reference's ``TextPageRankInputFormat.java:57-98``).
    ``weighted=True``: ``src d1 w1 d2 w2 ...`` alternating destination/weight
    tokens — the Edge<I,E> value channel of the reference's
    ``TextShortestPathsInputFormat.java`` (which carries a FloatWritable per
    edge; its own inputs default every weight to 1.0f, and
    ``ShortestPathsVertex.java:138-139`` treats a missing value as 1.0)."""
    lines = ray.data.read_text(path)

    def parse(t: pa.Table) -> pa.Table:
        srcs, dsts, ws = [], [], []
        for line in t["text"].to_pylist():
            toks = line.split()
            if not toks:
                continue
            s = int(toks[0])
            if weighted:
                if len(toks) % 2 != 1:
                    raise ValueError(
                        f"weighted adjacency line needs dst/weight pairs: {line!r}"
                    )
                for i in range(1, len(toks), 2):
                    srcs.append(s)
                    dsts.append(int(toks[i]))
                    ws.append(float(toks[i + 1]))
            else:
                for d in toks[1:]:
                    srcs.append(s)
                    dsts.append(int(d))
        cols = {
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(dsts, pa.int64()),
        }
        if weighted:
            cols["weight"] = pa.array(ws, pa.float64())
        return pa.table(cols)

    return lines.map_batches(parse, batch_format="pyarrow")


def write_vertex_tsv(
    values: pa.Table, out_dir: str, num_partitions: int = 4
) -> list[str]:
    """(v, <value>) table → ``part-N`` TSV files (``id \\t value`` lines),
    partitioned by ``v % num_partitions`` like the reference's per-partition
    writers; rows sorted by v within each part for stable diffing."""
    os.makedirs(out_dir, exist_ok=True)
    v = values["v"].to_numpy()
    cols = [values[c].to_numpy() for c in values.column_names if c != "v"]
    order = np.argsort(v)
    paths = []
    for p in range(num_partitions):
        path = os.path.join(out_dir, f"part-{p}")
        with open(path + ".tmp", "w") as f:
            for i in order:
                if v[i] % num_partitions == p:
                    vals = "\t".join(str(c[i]) for c in cols)
                    f.write(f"{v[i]}\t{vals}\n")
        os.replace(path + ".tmp", path)
        paths.append(path)
    return paths


def read_vertex_tsv(out_dir: str) -> pa.Table:
    """Read back part-N TSV files into a (v, value) table (diff helper)."""
    vs, vals = [], []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(out_dir, name)) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                vs.append(int(parts[0]))
                vals.append(parts[1])
    order = np.argsort(np.array(vs))
    return pa.table(
        {
            "v": pa.array(np.array(vs, dtype=np.int64)[order]),
            "value": pa.array(np.array(vals, dtype=object)[order].tolist(), pa.string()),
        }
    )
