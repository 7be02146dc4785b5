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


def rich_club(
    oriented_edges: ray.data.Dataset,
    n: int,
    thresholds: tuple = (2, 4, 8, 16),
    num_partitions: int = 32,
) -> pa.Table:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for each degree
    threshold k: how densely the over-k-degree "rich" vertices connect to
    EACH OTHER (Zhou & Mondragón 2004; Colizza et al. 2006, uncorrected φ).

    → (k: int64, n_nodes: int64, n_edges: int64, phi) — phi rounded to 9
    decimals, 0.0 when N_k < 2.

    Plan: simple undirected degrees land in P plasma-resident dense shards
    (worker-built — the ``triangles._degree_shards`` layout, zero O(n)
    driver allocations); one edge pass gathers both endpoints' degrees
    from the shards and folds per-threshold edge counts (|thresholds|
    ints per block); node counts per threshold fold the same way over the
    sparse degree partials. Reference cost-shape analog: the FilterCount
    MR utility over a computed vertex property."""
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    from ..functions.fasthash import round_like_sql
    from ..stages.blocks import partitions_for
    from .triangles import _degree_shards, _shard_lookup

    ks = np.asarray(sorted(thresholds), dtype=np.int64)
    kref = ray.put(ks)
    P = partitions_for(oriented_edges.count(), num_partitions)
    deg_refs = _degree_shards(oriented_edges, n, P)

    # N_k per threshold: fold over the sparse per-shard degree vectors
    @ray.remote
    def shard_counts(shard: np.ndarray, ks: np.ndarray) -> np.ndarray:
        return (shard[None, :] > ks[:, None]).sum(axis=1).astype(np.int64)

    n_nodes = np.sum(
        ray.get([shard_counts.remote(r, kref) for r in deg_refs]), axis=0
    )

    def edge_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        shards = [ray.get(r) for r in deg_refs]  # zero-copy plasma reads
        da = _shard_lookup(t["src"].to_numpy(), shards, len(shards))
        db = _shard_lookup(t["dst"].to_numpy(), shards, len(shards))
        cnt = ((da[None, :] > ks[:, None]) & (db[None, :] > ks[:, None])).sum(
            axis=1
        )
        return pa.table(
            {"k": pa.array(ks, pa.int64()), "e": pa.array(cnt, pa.int64())}
        )

    agg = (
        oriented_edges.map_batches(edge_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("e", alias_name="e"))
        .to_pandas()
        .set_index("k")
    )
    e_k = agg["e"].reindex(ks, fill_value=0).to_numpy()
    nn = n_nodes.astype(np.float64)
    phi = np.where(n_nodes > 1, 2.0 * e_k / np.maximum(nn * (nn - 1.0), 1.0), 0.0)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_nodes": pa.array(n_nodes, pa.int64()),
            "n_edges": pa.array(e_k, pa.int64()),
            "phi": pa.array(round_like_sql(phi, 9), pa.float64()),
        }
    )
