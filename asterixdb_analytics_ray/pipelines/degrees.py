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


def degree_histogram(edges: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """(out_degree, n_vertices) — the graph's out-degree distribution,
    INCLUDING the degree-0 row for vertices with no outgoing edges.

    Two bounded aggregates: (v → degree) then (degree → count); shuffle
    volume is vertices then distinct degrees (power-law graphs: a few
    hundred rows). The degree-0 count is n − |{v: outdeg > 0}| — derived
    from counts, no dense vector anywhere."""
    import numpy as np

    from ..stages.blocks import partitions_for

    deg = out_degrees_ds(edges).materialize()
    n_with_edges = deg.count()
    hist = (
        deg.groupby("out_degree", num_partitions=partitions_for(n_with_edges))
        .aggregate(Count(alias_name="n_vertices"))
        .map_batches(
            lambda t: pa.table(
                {
                    "out_degree": t["out_degree"].to_numpy().astype(np.int64),
                    "n_vertices": t["n_vertices"].to_numpy().astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
    )
    zeros = int(n) - int(n_with_edges)
    if zeros > 0:
        hist = hist.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "out_degree": pa.array([0], pa.int64()),
                        "n_vertices": pa.array([zeros], pa.int64()),
                    }
                )
            )
        )
    return hist


def avg_neighbor_degree(und_edges: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """(v, avg_nbr_deg) — mean undirected degree of each vertex's neighbors
    (the per-vertex form of the assortativity statistic; Barrat et al.,
    "The architecture of complex weighted networks", PNAS 101, 2004).

    Shape: degrees live in P plasma shards (``triangles._degree_shards`` —
    no O(n) driver array); one map over ``und`` gathers deg[dst] and
    segment-sums it per src IN INT64 (exact, order-independent), one
    bounded groupby-sum combines partials, and the finishing map divides by
    deg[v] — a single double op, so the oracle's
    ``sum(deg)::DOUBLE / count(*)::DOUBLE`` is bit-identical before the
    half-away round."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ..functions.combiners import SUM
    from ..functions.fasthash import round_like_sql
    from ..pipelines.triangles import _degree_shards, _shard_lookup
    from ..stages.blocks import partitions_for

    P = partitions_for(und_edges.count(), 32)
    half = und_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    deg_refs = _degree_shards(half, n, P)

    def partial(t: pa.Table) -> pa.Table:
        shards = ray.get(deg_refs)
        dd = _shard_lookup(t["dst"].to_numpy(), shards, P)
        v, s = SUM.segment_reduce(t["src"].to_numpy(), dd)
        return pa.table({"v": v, "s": s.astype(np.int64)})

    sums = (
        und_edges.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("s", alias_name="s"))
    )

    def finish(t: pa.Table) -> pa.Table:
        shards = ray.get(deg_refs)
        v = t["v"].to_numpy()
        dv = _shard_lookup(v, shards, P).astype(np.float64)
        s = t["s"].to_numpy().astype(np.float64)
        return pa.table(
            {"v": v, "avg_nbr_deg": round_like_sql(s / dv, 9)}
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(und_edges: ray.data.Dataset, n: int) -> "pa.Table":
    """One-row (assortativity) table: the Pearson correlation of endpoint
    degrees over the symmetric simple edge set (Newman, "Assortative mixing
    in networks", PRL 89, 2002 — public formula).

    Per-batch sufficient statistics (m, Σx, Σy, Σxy, Σx², Σy²) with
    endpoint degrees gathered from the P plasma degree shards — every sum
    is an integer below 2^53 at any graph this engine's dense paths hold,
    so both sides of the oracle compute EXACT sums and the closing formula
    (identical double-op order) is bit-identical before rounding."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..functions.fasthash import round_like_sql
    from ..pipelines.triangles import _degree_shards, _shard_lookup
    from ..stages.blocks import partitions_for

    P = partitions_for(und_edges.count(), 32)
    # und has each edge twice, so per-src counts ARE the simple degrees;
    # _degree_shards counts both ends of its input — feed it the src<dst
    # half to count each undirected edge once per endpoint
    half = und_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    deg_refs = _degree_shards(half, n, P)

    def stats(t: pa.Table) -> pa.Table:
        shards = ray.get(deg_refs)
        x = _shard_lookup(t["src"].to_numpy(), shards, P).astype(np.float64)
        y = _shard_lookup(t["dst"].to_numpy(), shards, P).astype(np.float64)
        return pa.table(
            {
                "m": np.array([float(len(x))]),
                "sx": np.array([x.sum()]),
                "sy": np.array([y.sum()]),
                "sxy": np.array([(x * y).sum()]),
                "sxx": np.array([(x * x).sum()]),
                "syy": np.array([(y * y).sum()]),
            }
        )

    parts = und_edges.map_batches(stats, batch_format="pyarrow").to_pandas()
    m, sx, sy = parts["m"].sum(), parts["sx"].sum(), parts["sy"].sum()
    sxy, sxx, syy = parts["sxy"].sum(), parts["sxx"].sum(), parts["syy"].sum()
    r = (m * sxy - sx * sy) / (
        np.sqrt(m * sxx - sx * sx) * np.sqrt(m * syy - sy * sy)
    )
    return pa.table({"assortativity": round_like_sql(np.array([r]), 9)})
