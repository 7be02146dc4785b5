"""Conversation-sequence analytics over the transcript table itself.

Operators that read the raw ``(conv_id, turn_idx, role, text, tool, ts)``
transcripts rather than the derived link graph — the sequence-mining
counterpart to the graph module (reference analog: the MR-side utility jobs
over the raw dataverse, ``jobgen/JobGen.java`` scan→group plans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import fasthash


def tool_paths(
    transcripts: ray.data.Dataset, k: int = 20, n_buckets: int = 256
) -> ray.data.Dataset:
    """Top-k tool-invocation paths: for each conversation the ordered
    sequence of tool calls (by turn_idx) joined with ``>``, counted across
    conversations → ``(path, n_convs)``, top ``k`` by (count desc, path).

    The sequence-mining pass over agent transcripts (which tool chains
    dominate the corpus). Shape: project (conv_id, turn_idx, tool) at the
    read → hash-bucket by conversation (vectorized md5-prefix bucket, the
    fasthash kernel; each task assembles MANY conversations' paths from one
    lexsort — the sessionize bucket pattern) → per-bucket partial path
    counts → a distinct-paths-bounded ``groupby.sum`` → tiny top-k sort.
    The exchange after the bucket stage carries one row per DISTINCT
    (bucket, path), never one per turn.
    """
    nb = np.uint64(n_buckets)

    def project_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["tool"]))
        bucket = (fasthash.md5_prefix_u64(t["conv_id"]) % nb).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "tool": t["tool"],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def per_bucket_paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        paths = df.groupby("conv_id", sort=False)["tool"].agg(">".join)
        counts = paths.value_counts()
        return pd.DataFrame(
            {"path": counts.index, "n": counts.to_numpy(np.int64)}
        )

    from ray.data.aggregate import Sum

    agg = (
        transcripts.map_batches(project_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket_paths, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_convs"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"path": df["path"], "n_convs": df["n_convs"].astype(np.int64)}
        )

    return (
        agg.map_batches(finish, batch_format="pandas")
        .sort(["n_convs", "path"], descending=[True, False])
        .limit(k)
    )
