"""Degree / graph-stat pipelines — the reference's MR utility jobs as one-liners.

Reference: ``pregelix-example/.../utils/VertexAggregator.java`` (count
vertices/edges), ``FindLargest``, ``FilterCount`` — plain MapReduce jobs the
Dataset API gives for free (SURVEY.md §2.5). Also the default
``GlobalVertexCountAggregator`` / ``GlobalEdgeCountAggregator`` stats
(``pregelix-api/.../util/GlobalVertexCountAggregator.java``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def out_degrees_ds(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(v, out_degree) for vertices with ≥1 outgoing edge."""
    return (
        edges.groupby("src")
        .aggregate(Count(alias_name="out_degree"))
        .map_batches(
            lambda t: pa.table({"v": t["src"], "out_degree": t["out_degree"]}),
            batch_format="pyarrow",
        )
    )


def in_degrees_ds(edges: ray.data.Dataset) -> ray.data.Dataset:
    return (
        edges.groupby("dst")
        .aggregate(Count(alias_name="in_degree"))
        .map_batches(
            lambda t: pa.table({"v": t["dst"], "in_degree": t["in_degree"]}),
            batch_format="pyarrow",
        )
    )


def graph_stats(edges: ray.data.Dataset) -> dict:
    """num_edges + num_vertices (distinct endpoint ids), one pass each."""
    num_edges = edges.count()
    verts = edges.map_batches(
        lambda t: pa.table(
            {"v": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()]).unique()}
        ),
        batch_format="pyarrow",
    )
    num_vertices = verts.unique("v")
    return {"num_edges": num_edges, "num_vertices": len(num_vertices)}


def top_degree(edges: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k vertices by out-degree (reference FindLargest analog)."""
    return out_degrees_ds(edges).sort("out_degree", descending=True).limit(k)
