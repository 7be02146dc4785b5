"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

The engine's input (per BASELINE.json ``input_hint``) is a transcript Parquet
table ``(conv_id, turn_idx, role, text, tool, ts)``. The driver's sf dirs
don't ship that table, so each query deterministically synthesises it for the
given sf (seeded, cached under /tmp — see
``asterixdb_analytics_ray/sources/transcripts.py``) and the oracle SQL reads
the SAME generated parquet via ``read_parquet('<path>')``. Iterative
algorithms are oracled as programmatically unrolled CTE chains
(``asterixdb_analytics_ray/sql_oracle.py``).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_GRAPH_CACHE: dict[str, Any] = {}
_SF_ORACLE = "/root/testdata/sf0.01"  # the driver's correctness scale


def _transcripts_path(sf_dir: str) -> str:
    from asterixdb_analytics_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(sf_dir)


def _graph(sf_dir: str):
    """Build (and cache per sf_dir) the LinkGraph + common edge views."""
    if sf_dir in _GRAPH_CACHE:
        return _GRAPH_CACHE[sf_dir]
    import ray.data

    from asterixdb_analytics_ray.graph import build_link_graph

    from asterixdb_analytics_ray.graph import undirected_from_oriented

    path = _transcripts_path(sf_dir)
    g = build_link_graph(ray.data.read_parquet(path))
    oriented = g.oriented().materialize()  # the one src<dst dedup shuffle
    views = {
        "graph": g,
        "directed": g.directed().materialize(),
        "undirected": undirected_from_oriented(oriented).materialize(),
        "oriented": oriented,
    }
    _GRAPH_CACHE[sf_dir] = views
    return views


def _sharded_p(n_nodes: int) -> int:
    return min(16, max(2, n_nodes // 2048))


def _und_partitioned(sf_dir: str):
    """Shared bulk load of the undirected edge set: CC and LP chain over the
    SAME PartitionedEdges (the reference's multi-job path,
    ``Driver.compatible`` — one exchange, two jobs)."""
    views = _graph(sf_dir)
    if "und_parts" not in views:
        from asterixdb_analytics_ray.stages.partition import partition_edges

        views["und_parts"] = partition_edges(
            views["undirected"], _sharded_p(views["graph"].n_nodes)
        )
    return views["und_parts"]


def _q_transcript_roundtrip(sf_dir: str):
    """Per-turn text equality invariant: engine read → select → return."""
    import ray.data

    return (
        ray.data.read_parquet(_transcripts_path(sf_dir))
        .select_columns(["conv_id", "turn_idx", "text"])
    )


def _q_nodes(sf_dir: str):
    return _graph(sf_dir)["graph"].node_table


def _q_edge_counts(sf_dir: str):
    import pyarrow as pa

    g = _graph(sf_dir)["graph"]
    return g.edges.groupby("kind").count().map_batches(
        lambda t: pa.table({"kind": t["kind"], "n_edges": t["count()"]}),
        batch_format="pyarrow",
    )


def _q_out_degrees(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.degrees import out_degrees_ds

    return out_degrees_ds(_graph(sf_dir)["directed"])


def _q_top_degree(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.degrees import out_degrees_ds

    return (
        out_degrees_ds(_graph(sf_dir)["directed"])
        .sort(["out_degree", "v"], descending=[True, False])
        .limit(10)
    )


def _q_pagerank(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.sql_oracle import PR_SUPERSTEPS, ROUND_DECIMALS

    views = _graph(sf_dir)
    g = views["graph"]
    res = pagerank_dense(
        views["directed"], g.n_nodes, g.out_degrees(), supersteps=PR_SUPERSTEPS
    )
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64),
            "rank": np.round(res.state["rank"], ROUND_DECIMALS),
        }
    )


def _q_pagerank_top_nodes(sf_dir: str):
    """Top-20 vertices by PageRank joined back to their node metadata
    (kind, key) — the rank→dimension join every report step needs.
    Deterministic: sorts the ROUNDED ranks with a v tiebreak, exactly as
    the oracle."""
    import numpy as np

    views = _graph(sf_dir)
    ranks = _q_pagerank(sf_dir)
    r = ranks["rank"].to_numpy()
    v = ranks["v"].to_numpy()
    order = np.lexsort((v, -r))[:20]
    nodes = views["graph"].node_table.take(order)  # node_id-ordered table
    import pyarrow as pa

    return pa.table(
        {
            "v": v[order],
            "kind": nodes["kind"],
            "key": nodes["key"],
            "rank": r[order],
        }
    )


def _q_connected_components(sf_dir: str):
    """Min-label CC via the sharded scale-path runner (fixpoint identical to
    the dense kernel — tests/test_algorithms.py)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.stages.sharded import ShardedMinLabel

    views = _graph(sf_dir)
    g = views["graph"]
    res = ShardedMinLabel(n=g.n_nodes, P=_sharded_p(g.n_nodes)).run(
        _und_partitioned(sf_dir)
    )
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64),
            "component": res.state["label"],
        }
    )


def _q_modularity(sf_dir: str):
    """Newman modularity of the connected-components partition: the
    GlobalAggregator close over a full-scan compute (broadcast labels,
    per-block per-label partials, communities-bounded shuffle)."""
    import numpy as np

    from asterixdb_analytics_ray.pipelines.components import modularity
    from asterixdb_analytics_ray.stages.sharded import ShardedMinLabel

    views = _graph(sf_dir)
    g = views["graph"]
    res = ShardedMinLabel(n=g.n_nodes, P=_sharded_p(g.n_nodes)).run(
        _und_partitioned(sf_dir)
    )
    return modularity(views["oriented"], res.state["label"])


def _q_label_propagation(sf_dir: str):
    """Histogram LP via the sharded scale-path runner (labels identical to
    the dense kernel — tests/test_algorithms.py)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.sql_oracle import LP_ROUNDS
    from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

    views = _graph(sf_dir)
    g = views["graph"]
    labels = ShardedLabelProp(n=g.n_nodes, P=_sharded_p(g.n_nodes)).run(
        _und_partitioned(sf_dir), rounds=LP_ROUNDS
    )
    return pa.table(
        {"v": np.arange(g.n_nodes, dtype=np.int64), "label": labels}
    )


def _q_triangle_count(sf_dir: str):
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.triangles import triangle_count

    views = _graph(sf_dir)
    per_vertex, _total = triangle_count(views["oriented"], views["graph"].n_nodes)
    return per_vertex


def _q_triangle_total(sf_dir: str):
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.triangles import triangle_count

    views = _graph(sf_dir)
    _per_vertex, total = triangle_count(views["oriented"], views["graph"].n_nodes)
    return pa.table({"total_triangles": [total]})


def _q_conv_tool_paths(sf_dir: str):
    """Top-20 tool-invocation sequences across conversations (sequence
    mining over the raw transcript table, conv-bucketed)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_paths

    return tool_paths(ray.data.read_parquet(_transcripts_path(sf_dir)))


def _q_tool_scc(sf_dir: str):
    """SCC of the directed tool-precedence graph (cyclic across convs)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_scc

    return tool_scc(ray.data.read_parquet(_transcripts_path(sf_dir)))


def _q_conv_stats(sf_dir: str):
    """Per-conversation rollup via two-level combine (turns never shuffle)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import conv_stats

    return conv_stats(ray.data.read_parquet(_transcripts_path(sf_dir)))


def _q_role_stats(sf_dir: str):
    """Per-role turn/tool/char rollup (roles-bounded two-level combine)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import role_stats

    return role_stats(ray.data.read_parquet(_transcripts_path(sf_dir)))


def _q_dag_levels(sf_dir: str):
    """Longest-path topological level per vertex over the directed DAG
    (max-propagation BSP; converges in longest-path supersteps, raises past
    the oracle unroll bound)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.dagdepth import dag_levels_dense
    from asterixdb_analytics_ray.sql_oracle import DAG_LEVEL_ITERS

    views = _graph(sf_dir)
    g = views["graph"]
    res = dag_levels_dense(
        views["directed"], g.n_nodes, max_unroll=DAG_LEVEL_ITERS
    )
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64),
            "level": res.state["level"].astype(np.int64),
        }
    )


def _q_sssp(sf_dir: str):
    """Unit-weight SSSP from vertex 0 — runs the sharded scale-path runner
    (``ShardedSSSP``), semantics identical to the dense kernel."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    views = _graph(sf_dir)
    g = views["graph"]
    P = min(16, max(2, g.n_nodes // 2048))
    res = ShardedSSSP(n=g.n_nodes, P=P, source=0).run(views["directed"])
    dist = res.state["dist"]
    finite = np.isfinite(dist)
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64)[finite],
            "dist": dist[finite].astype(np.int64),
        }
    )


def _bfs_dists(sf_dir: str, sources=(0, 1, 2, 3)):
    """Distance arrays from each seed: FOUR SSSP jobs chained over ONE
    shared PartitionedEdges bulk load of the directed edge set (the
    reference's Driver.compatible multi-job path) — the exchange is paid
    once, each job reuses the loaded partitions. Cached per sf_dir so the
    bfs/harmonic queries share the runs too."""
    from asterixdb_analytics_ray.stages.partition import partition_edges
    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    views = _graph(sf_dir)
    if "bfs_dists" in views:
        return views["bfs_dists"]
    g = views["graph"]
    P = _sharded_p(g.n_nodes)
    if "dir_parts" not in views:
        views["dir_parts"] = partition_edges(views["directed"], P)
    dists = {}
    for s in sources:
        res = ShardedSSSP(n=g.n_nodes, P=P, source=s).run(views["dir_parts"])
        dists[s] = res.state["dist"]
    views["bfs_dists"] = dists
    return dists


def _q_bfs_multi_source(sf_dir: str):
    """Multi-source BFS distance table from vertices 0-3 (see
    ``_bfs_dists`` for the shared-bulk-load plan)."""
    import numpy as np
    import pyarrow as pa

    n = _graph(sf_dir)["graph"].n_nodes
    tables = []
    for s, dist in _bfs_dists(sf_dir).items():
        finite = np.isfinite(dist)
        tables.append(
            pa.table(
                {
                    "source": np.full(int(finite.sum()), s, dtype=np.int64),
                    "v": np.arange(n, dtype=np.int64)[finite],
                    "dist": dist[finite].astype(np.int64),
                }
            )
        )
    return pa.concat_tables(tables)


def _q_harmonic_centrality(sf_dir: str):
    """Harmonic centrality of the BFS seeds: Σ 1/dist over reached
    vertices (directed distances; shares the cached multi-job BFS runs)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.functions.fasthash import round_like_sql

    rows_s, rows_h, rows_n = [], [], []
    for s, dist in _bfs_dists(sf_dir).items():
        m = np.isfinite(dist) & (dist > 0)
        rows_s.append(s)
        rows_h.append(float(round_like_sql(np.array([np.sum(1.0 / dist[m])]), 6)[0]))
        rows_n.append(int(m.sum()))
    return pa.table(
        {
            "source": np.array(rows_s, dtype=np.int64),
            "harmonic": np.array(rows_h, dtype=np.float64),
            "n_reached": np.array(rows_n, dtype=np.int64),
        }
    )


def _q_closeness_centrality(sf_dir: str):
    """Closeness centrality of the BFS seeds: n_reached / Σdist (directed
    distances; shares the cached multi-job BFS runs — zero extra
    supersteps)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.functions.fasthash import round_like_sql

    rows_s, rows_c, rows_t, rows_n = [], [], [], []
    for s, dist in _bfs_dists(sf_dir).items():
        m = np.isfinite(dist) & (dist > 0)
        tot = int(dist[m].sum())
        rows_s.append(s)
        rows_c.append(
            float(round_like_sql(np.array([m.sum() / tot]), 9)[0])
            if tot
            else 0.0
        )
        rows_t.append(tot)
        rows_n.append(int(m.sum()))
    return pa.table(
        {
            "source": np.array(rows_s, dtype=np.int64),
            "closeness": np.array(rows_c, dtype=np.float64),
            "total_dist": np.array(rows_t, dtype=np.int64),
            "n_reached": np.array(rows_n, dtype=np.int64),
        }
    )


def _q_rich_club(sf_dir: str):
    """Rich-club coefficient over degree thresholds (plasma degree shards +
    one edge pass; thresholds-bounded shuffle)."""
    from asterixdb_analytics_ray.pipelines.degrees import rich_club

    views = _graph(sf_dir)
    return rich_club(views["oriented"], views["graph"].n_nodes)


def _q_graph_eccentricity(sf_dir: str):
    """Seed eccentricities (max finite BFS distance) + reach counts —
    closes over the SAME cached multi-job BFS runs as harmonic centrality
    (one shared PartitionedEdges bulk load, zero extra supersteps)."""
    import numpy as np
    import pyarrow as pa

    rows_s, rows_e, rows_n = [], [], []
    for s, dist in _bfs_dists(sf_dir).items():
        m = np.isfinite(dist) & (dist > 0)
        rows_s.append(s)
        rows_e.append(int(dist[m].max()) if m.any() else 0)
        rows_n.append(int(m.sum()))
    return pa.table(
        {
            "source": np.array(rows_s, dtype=np.int64),
            "eccentricity": np.array(rows_e, dtype=np.int64),
            "n_reached": np.array(rows_n, dtype=np.int64),
        }
    )


def _q_sssp_weighted(sf_dir: str):
    """Weighted SSSP: per-edge weights carried through the graph build
    (conv_tool = usage count, reply = 1, tool_cooc = shared-conv count)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.graph import build_link_graph
    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    path = _transcripts_path(sf_dir)
    g = build_link_graph(ray.data.read_parquet(path), weighted=True)
    P = min(16, max(2, g.n_nodes // 2048))
    res = ShardedSSSP(n=g.n_nodes, P=P, source=0, weight_col="w").run(
        g.weighted_directed()
    )
    dist = res.state["dist"]
    finite = np.isfinite(dist)
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64)[finite],
            "dist": dist[finite],  # integral float64 (weights are counts)
        }
    )


def _q_reachability(sf_dir: str):
    """Bidirectional reachability 0 ↔ max-id (ReachabilityVertex semantics),
    via the sharded bit-OR runner with signalTerminate."""
    import pyarrow as pa

    from asterixdb_analytics_ray.stages.sharded import ShardedReachability

    views = _graph(sf_dir)
    g = views["graph"]
    dest = g.n_nodes - 1
    P = min(16, max(2, g.n_nodes // 2048))
    reachable, _res = ShardedReachability(
        n=g.n_nodes, P=P, source=0, dest=dest
    ).run(views["directed"])
    return pa.table(
        {
            "source": pa.array([0], pa.int64()),
            "dest": pa.array([dest], pa.int64()),
            "reachable": pa.array([1 if reachable else 0], pa.int64()),
        }
    )


def _q_max_clique(sf_dir: str):
    """Largest cliques of the undirected transcript graph (MaximalClique
    aggregator deliverable); members flattened to a csv string column."""
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.maxclique import largest_cliques

    views = _graph(sf_dir)
    t = largest_cliques(views["oriented"])
    return pa.table(
        {
            "size": t["size"],
            "members": pa.array(
                [",".join(map(str, m)) for m in t["members"].to_pylist()]
            ),
        }
    )


def _q_graph_sample(sf_dir: str):
    """Seeded BFS sampling to a 30% fill rate (GraphSampleVertex semantics),
    via the SHARDED runner (scale path; bit-identical to the dense mode —
    ``tests/test_sampling_stress.py::test_sharded_sample_matches_dense``)."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.stages.sharded import ShardedSample

    views = _graph(sf_dir)
    g = views["graph"]
    runner = ShardedSample(n=g.n_nodes, P=_sharded_p(g.n_nodes))
    selected, _rounds = runner.run(
        views["undirected"], seeds=np.array([0]), target_fraction=0.3
    )
    runner.shutdown()
    return pa.table({"v": np.flatnonzero(selected).astype(np.int64)})


def _q_doc_hll_registers(sf_dir: str):
    """HyperLogLog distinct-shingle sketch registers (mergeable sketch;
    ≤ 1024 rows shuffle regardless of corpus size)."""
    from asterixdb_analytics_ray.pipelines.textops import hll_registers

    return hll_registers(_docs_ds(sf_dir))


def _q_doc_ngram_jaccard(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs_ds(sf_dir), threshold=0.4)


def _q_events_windowed_counts(sf_dir: str):
    """Tumbling-window per-type aggregate (1h windows) over events."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import windowed_counts

    return windowed_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
    )


def _q_events_asof_click(sf_dir: str):
    """As-of join: each error event's most recent preceding click by the
    same user (the custom-operator example from the brief — hash-grouped
    per-key vectorized searchsorted; DuckDB native ASOF JOIN oracle)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import asof_last_event

    return asof_last_event(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def _q_events_range_join(sf_dir: str):
    """Banded range join: per error event, clicks by the same user within
    the preceding hour (inclusive)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import range_join_counts

    return range_join_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def _q_events_funnel(sf_dir: str):
    """Ordered conversion funnel (view → click → purchase): per user the
    furthest stage reached with first-touch strictly-after semantics —
    one `user_id % 256` bucket shuffle, vectorized groupby-min chains."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import funnel_stages

    return funnel_stages(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id", "event_type"],
        )
    )


def _q_events_retention(sf_dir: str):
    """Cohort retention matrix: distinct users per (first-activity day,
    day offset) — per-batch (user, day) dedup, bucketed exact partials,
    closing groupby bounded by days² cells."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import retention_counts

    return retention_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id"],
        )
    )


def _q_events_top_per_user(sf_dir: str):
    """Per-user top-3 events by value (distributed per-key top-k with a
    pre-shuffle combiner prune)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import top_events_per_user

    return top_events_per_user(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        ),
        k=3,
    )


def _q_events_value_quantiles(sf_dir: str):
    """Per-type exact value quantiles via the bounded-histogram plan (no
    sort; picks return stored doubles bit-identically)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import event_value_quantiles

    return event_value_quantiles(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
    )


def _q_events_sliding_counts(sf_dir: str):
    """Sliding-window (1h width, 15min hop) per-type aggregate — true
    overlapping windows via vectorized per-batch expansion + one shuffle."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import sliding_counts

    return sliding_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
    )


def _q_events_user_profiles(sf_dir: str):
    """Per-user activity profile (feature-table build): one bucket
    shuffle, vectorized per-bucket groupby."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import user_profiles

    return user_profiles(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type", "value"],
        )
    )


def _q_doc_source_stats(sf_dir: str):
    """Per-source corpus rollup (docs, distinct langs, mean chars)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import source_stats

    return source_stats(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "lang", "n_chars"],
        )
    )


def _q_events_anomalies(sf_dir: str):
    """Per-type window volume anomalies (|population z| ≥ 2 over the
    bounded windowed-counts table)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import window_anomalies

    return window_anomalies(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type"],
        )
    )


def _q_events_gap_stats(sf_dir: str):
    """Per-user inter-arrival gap stats (burstiness features); exact-int
    microsecond gaps inside one bucket shuffle."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import gap_stats

    return gap_stats(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )
    )


def _q_doc_vocab_stats(sf_dir: str):
    """Corpus vocabulary stats (total/distinct/hapax tokens, TTR)."""
    from asterixdb_analytics_ray.pipelines.corpus import vocab_stats

    return vocab_stats(_docs_ds(sf_dir))


def _q_events_transitions(sf_dir: str):
    """First-order Markov event-type transition counts per user."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import transition_counts

    return transition_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
    )


def _q_events_rolling_wau(sf_dir: str):
    """Rolling 7-day distinct active users per observed day."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import rolling_active_users

    return rolling_active_users(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )
    )


def _q_events_session_pairs(sf_dir: str):
    """Per-session event-type co-occurrence support counts (basket
    mining over the sessionize kernel)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import session_type_pairs

    return session_type_pairs(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
    )


def _q_tpch_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem (exact integer-unit
    partials; one groups-bounded shuffle)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import pricing_summary

    return pricing_summary(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
    )


def _q_tpch_inactive_customers(sf_dir: str):
    """Distributed ANTI JOIN: customers with no order above 400k (orders
    keys pre-deduped per batch; left-outer + null-marker filter)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import inactive_customers

    return inactive_customers(
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_acctbal"],
        ),
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        ),
    )


def _q_tpch_priority_returns(sf_dir: str):
    """Distributed SEMI JOIN (Q4 shape): orders with a returned lineitem,
    counted per priority."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        priority_return_counts,
    )

    return priority_return_counts(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        ),
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_returnflag"],
        ),
    )


def _q_tpch_nation_revenue(sf_dir: str):
    """Revenue per customer nation: distributed hash join (orders ⨝
    customer) + broadcast 25-row nation dictionary."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import nation_revenue

    return nation_revenue(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        ),
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        ),
        pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey", "n_name"],
        ),
    )


def _q_tpch_shipping_priority(sf_dir: str):
    """Q3-style top-10 unshipped BUILDING orders by discounted revenue
    (two distributed hash joins + exact-int revenue fold)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import shipping_priority

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    # num_partitions sized to the smallest supported session (two chained
    # hash-join aggregator pools must co-schedule even on a 4-CPU test
    # fixture; a production cluster raises this with the CPU count)
    return shipping_priority(
        rd(
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ),
        rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rd("customer", ["c_custkey", "c_mktsegment"]),
        num_partitions=4,
    )


def _q_tpch_brand_volume(sf_dir: str):
    """Per-brand volume: lineitem ⨝ part distributed hash join + brands-
    bounded aggregate."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import brand_volume

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return brand_volume(
        rd("lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]),
        rd("part", ["p_partkey", "p_brand"]),
    )


def _q_tpch_region_revenue(sf_dir: str):
    """Q5-lite: discounted revenue per supplier region (hash join +
    fixed-cardinality nation/region broadcast lookups)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import region_revenue

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return region_revenue(
        rd("lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]),
        rd("supplier", ["s_suppkey", "s_nationkey"]),
        pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey", "n_regionkey"],
        ),
        pq.read_table(
            os.path.join(sf_dir, "region.parquet"),
            columns=["r_regionkey", "r_name"],
        ),
    )


def _q_tpch_forecast_revenue(sf_dir: str):
    """Q6-style revenue forecast: pure map-side filter+exact-int fold
    (one 2-int row leaves each block)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import forecast_revenue

    return forecast_revenue(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=[
                "l_shipdate",
                "l_discount",
                "l_quantity",
                "l_extendedprice",
            ],
        )
    )


def _q_tpch_promo_share(sf_dir: str):
    """Q14-style promotion revenue share: lineitem ⨝ part hash join +
    constant-key exact-unit fold."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        promo_revenue_share,
    )

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return promo_revenue_share(
        rd("lineitem", ["l_partkey", "l_extendedprice", "l_discount"]),
        rd("part", ["p_partkey", "p_type"]),
    )


def _q_tpch_top_customers(sf_dir: str):
    """Q10-style returned-item report: top-20 customers by return-window
    revenue (hash join, exact-unit sort keys, broadcast nation)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        top_return_customers,
    )

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return top_return_customers(
        rd(
            "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        ),
        rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rd("customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
        pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey", "n_name"],
        ),
        num_partitions=4,
    )


def _q_tpch_order_counts(sf_dir: str):
    """Q13-style customer order-count distribution (left-outer join keeps
    the zero-order customers; both exchanges combiner-pruned)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        order_count_distribution,
    )

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return order_count_distribution(
        rd("customer", ["c_custkey"]), rd("orders", ["o_custkey"])
    )


def _q_tpch_large_orders(sf_dir: str):
    """Q18-style large-volume orders (GROUP BY + HAVING as combiner-pruned
    sum+filter, then two joins over the rare survivors)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import large_orders

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return large_orders(
        rd("lineitem", ["l_orderkey", "l_quantity"]),
        rd("orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        rd("customer", ["c_custkey", "c_name"]),
        num_partitions=4,
    )


def _q_tpch_discounted_revenue(sf_dir: str):
    """Q19-style OR-of-ANDs discounted revenue (vectorized disjunct
    lanes after the lineitem ⨝ part hash join)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        discounted_revenue,
    )

    rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )
    return discounted_revenue(
        rd(
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        rd("part", ["p_partkey", "p_brand", "p_size"]),
    )


def _rd(sf_dir: str, t: str, cols):
    import os

    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols
    )


def _pq(sf_dir: str, t: str, cols):
    import os

    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{t}.parquet"), columns=cols)


def _q_tpch_local_supplier_revenue(sf_dir: str):
    """Q5-style same-nation revenue per nation of one region (three hash
    joins over map-side-filtered inputs, broadcast nation dictionary)."""
    from asterixdb_analytics_ray.pipelines.relational import (
        local_supplier_revenue,
    )

    return local_supplier_revenue(
        _rd(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        _rd(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _rd(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
        _pq(sf_dir, "region", ["r_regionkey", "r_name"]),
        num_partitions=4,
    )


def _q_tpch_market_share(sf_dir: str):
    """Q8-style national market share per order year (four distributed
    hash joins over map-side-filtered inputs; exact-unit share fold)."""
    from asterixdb_analytics_ray.pipelines.relational import market_share

    return market_share(
        _rd(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
             "l_discount"]),
        _rd(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _rd(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _rd(sf_dir, "part", ["p_partkey", "p_type"]),
        _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
        _pq(sf_dir, "region", ["r_regionkey", "r_name"]),
        num_partitions=4,
    )


def _q_tpch_volume_shipping(sf_dir: str):
    """Q7-style cross-nation shipped revenue per (supp, cust, year)."""
    from asterixdb_analytics_ray.pipelines.relational import volume_shipping

    return volume_shipping(
        _rd(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"]),
        _rd(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _rd(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _pq(sf_dir, "nation", ["n_nationkey", "n_name"]),
        num_partitions=4,
    )


def _q_tpch_top_supplier(sf_dir: str):
    """Q15-style top supplier (combiner-pruned per-supplier revenue,
    constant-key max fold, broadcast-max filter)."""
    from asterixdb_analytics_ray.pipelines.relational import top_supplier

    return top_supplier(
        _rd(sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        num_partitions=2,
    )


def _q_tpch_small_qty_revenue(sf_dir: str):
    """Q17-style below-average-quantity revenue (brand-bounded join reused
    for both the correlated average and the filter; exact integer
    cross-multiply)."""
    from asterixdb_analytics_ray.pipelines.relational import (
        small_quantity_revenue,
    )

    return small_quantity_revenue(
        _rd(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"]),
        _rd(sf_dir, "part", ["p_partkey", "p_brand"]),
        num_partitions=2,
    )


def _q_tpch_supplier_part_counts(sf_dir: str):
    """Q16-style distinct-supplier counts per (brand, type, size) — the
    distributed COUNT(DISTINCT) via two dedup groupbys."""
    from asterixdb_analytics_ray.pipelines.relational import (
        supplier_part_counts,
    )

    return supplier_part_counts(
        _rd(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        _rd(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]),
        num_partitions=4,
    )


def _q_tpch_sales_opportunity(sf_dir: str):
    """Q22-style above-average-balance order-less customers per segment
    (constant-key average fold + distributed anti join)."""
    from asterixdb_analytics_ray.pipelines.relational import sales_opportunity

    return sales_opportunity(
        _rd(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]),
        _rd(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
        num_partitions=4,
    )


def _q_spectral_cut(sf_dir: str):
    """Normalized cut of the spectral sign partition (Shi–Malik ncut
    composed from spectral_scores + one integer edge pass)."""
    from asterixdb_analytics_ray.pipelines.spectral import (
        spectral_cut_quality,
    )

    views = _graph(sf_dir)
    return spectral_cut_quality(views["undirected"], views["graph"].n_nodes)


def _q_doc_source_dup_rates(sf_dir: str):
    """Duplication hotspots by source (full MinHash near-dup composition
    → involved-doc set → sources-bounded rollup)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import source_dup_rates

    return source_dup_rates(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "text"],
        )
    )


def _q_emb_silhouette(sf_dir: str):
    """Exact squared-euclidean silhouette per point from sufficient
    statistics (no pairwise pass; one stats shuffle + one broadcast map)."""
    from asterixdb_analytics_ray.pipelines.embeddings import silhouette_scores

    return silhouette_scores(_emb_ds(sf_dir))


def _q_mst(sf_dir: str):
    """Borůvka minimum spanning forest over the weighted link graph
    (unique under the (w, a, b) total order). No SQL oracle: the round
    count is data-dependent and the merge is iterate-to-fixpoint — the
    documented non-SQL-expressible category; uniqueness + the Kruskal
    ground-truth tests pin correctness instead."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.graph import build_link_graph
    from asterixdb_analytics_ray.pipelines.mst import minimum_spanning_forest

    g = build_link_graph(
        ray.data.read_parquet(_transcripts_path(sf_dir)), weighted=True
    )

    def orient(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        a = np.minimum(src, dst)[keep]
        b = np.maximum(src, dst)[keep]
        w = np.rint(
            t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)[keep]
        g_ = (
            pd.DataFrame({"a": a, "b": b, "w": w})
            .groupby(["a", "b"], sort=False)["w"]
            .min()
            .reset_index()
        )
        return pa.Table.from_pandas(g_, preserve_index=False)

    from ray.data.aggregate import Min

    wori = (
        g.weighted_directed()
        .map_batches(orient, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Min("w", alias_name="w"))
    )
    return minimum_spanning_forest(wori, g.n_nodes)


def _q_tpch_maintained_summary(sf_dir: str):
    """Incremental view maintenance of the Q1 summary under TPC-H-style
    refresh streams: deletes (orderkey%10==3) as NEGATIVE signed partials,
    an insert batch (orderkey%10==7 re-inserted) as positive — one merged
    groups-bounded groupby, no recompute of the combined table."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        maintained_pricing_summary,
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def ins_f(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ok % 10 == 7))

    return maintained_pricing_summary(
        li, li.map_batches(ins_f, batch_format="pyarrow")
    )


def _q_tool_pair_weights(sf_dir: str):
    """Weighted tool co-occurrence (conversations sharing each tool pair;
    the weighted form of the graph build's distinct-only tool_cooc)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_pair_weights

    return tool_pair_weights(
        ray.data.read_parquet(_transcripts_path(sf_dir))
    )


def _q_doc_chunks(sf_dir: str):
    """RAG-prep chunking: overlapping 16-token windows (stride 12) with
    provenance — pure map-side, no shuffle."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import chunk_documents

    return chunk_documents(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ),
        chunk_tokens=16,
        overlap=4,
    )


def _q_conv_turn_latency(sf_dir: str):
    """Reply-latency per role transition over the raw transcripts
    (conversation-bucket lexsort pairing; roles²-bounded rollup)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import turn_latency

    return turn_latency(ray.data.read_parquet(_transcripts_path(sf_dir)))


def _q_graph_coloring(sf_dir: str):
    """Greedy coloring by iterated priority-maxima peeling (color = round
    index; proper by construction, MAX-combine only)."""
    from asterixdb_analytics_ray.pipelines.coloring import coloring_table

    views = _graph(sf_dir)
    return coloring_table(views["undirected"], views["graph"].n_nodes)


def _q_emb_ivf_recall(sf_dir: str):
    """ANN quality gate: per-query recall@10 of the IVF path vs the exact
    brute-force ground truth (tune nprobe until this clears the bar)."""
    import numpy as np

    from asterixdb_analytics_ray.pipelines.embeddings import ivf_recall

    ds = _emb_ds(sf_dir)
    qt = ds.filter(
        expr=f"vec_id in {list(_KNN_QUERY_IDS)}"
    ).to_pandas().sort_values("vec_id")
    queries = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    return ivf_recall(ds, queries, qt["vec_id"].to_numpy())


def _q_spectral_scores(sf_dir: str):
    """Second eigen-direction of the normalized adjacency (deflated
    fixed-step power iteration on the dense BSP engine; Fiedler-style
    partitioning scores)."""
    from asterixdb_analytics_ray.pipelines.spectral import spectral_scores

    views = _graph(sf_dir)
    return spectral_scores(views["undirected"], views["graph"].n_nodes)


def _q_doc_oov_rate(sf_dir: str):
    """Vocabulary coverage per source: OOV share vs the broadcast top-20
    corpus vocabulary (integer-exact folds, one closing division)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.corpus import oov_rate

    return oov_rate(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "text"],
        )
    )


def _q_events_heavy_hitters(sf_dir: str):
    """Exact heavy hitters (> N/200 of events) via the two-pass candidate
    scheme — the shuffle never carries the full distinct-key set."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import heavy_hitters

    return heavy_hitters(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
    )


def _q_doc_source_overlap(sf_dir: str):
    """Cross-source shingle-overlap matrix (contamination forensics):
    bitmask-Sum source sets per shingle, ≤S²-row close."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import source_overlap

    return source_overlap(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "text"],
        )
    )


def _q_emb_stratified_sample(sf_dir: str):
    """Deterministic IVF-cell-stratified diversity sample (md5-ranked
    top-10 per k-means cell; two-level selection, cells-bounded close)."""
    from asterixdb_analytics_ray.pipelines.embeddings import (
        stratified_cell_sample,
    )

    return stratified_cell_sample(_emb_ds(sf_dir))


def _q_doc_segment_dedup(sf_dir: str):
    """Paragraph/segment-level exact dedup (C4/RefinedWeb line-dedup pass):
    first-occurrence-wins over 10-token windows, survivors reassembled per
    doc; digest-only shuffle + unique-int64 join-back (never h-keyed)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.textops import segment_dedup

    return segment_dedup(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
    )


def _q_tpch_best_supplier(sf_dir: str):
    """Q2-style best supplier per part (lineitem-derived supply relation,
    two-level combined-key argmax, equality join back, broadcast nation)."""
    from asterixdb_analytics_ray.pipelines.relational import min_cost_supplier

    return min_cost_supplier(
        _rd(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        _rd(sf_dir, "supplier",
            ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]),
        _rd(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]),
        _pq(sf_dir, "nation", ["n_nationkey", "n_name"]),
        num_partitions=4,
    )


def _q_tpch_product_profit(sf_dir: str):
    """Q9-style revenue per (supplier nation, order year) for name-filtered
    parts (three distributed hash joins + broadcast nation)."""
    from asterixdb_analytics_ray.pipelines.relational import (
        product_type_profit,
    )

    return product_type_profit(
        _rd(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
             "l_discount"]),
        _rd(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _rd(sf_dir, "part", ["p_partkey", "p_name"]),
        _pq(sf_dir, "nation", ["n_nationkey", "n_name"]),
        num_partitions=4,
    )


def _q_tpch_important_parts(sf_dir: str):
    """Q11-style HAVING-vs-global-scalar: parts above 5/4 of the mean
    per-part value (per-part sums reused for both scalars and filter)."""
    from asterixdb_analytics_ray.pipelines.relational import important_parts

    return important_parts(
        _rd(sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount"])
    )


def _q_tpch_late_shipments(sf_dir: str):
    """Q12-style dual conditional counts of late shipments per returnflag
    (one hash join + map-side CASE-WHEN partials)."""
    from asterixdb_analytics_ray.pipelines.relational import (
        late_shipment_counts,
    )

    return late_shipment_counts(
        _rd(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"]),
        _rd(sf_dir, "orders",
            ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        num_partitions=4,
    )


def _q_tpch_part_promotion(sf_dir: str):
    """Q20-style nested semi-join: suppliers shipping >1/5 of some
    name-filtered part's total quantity."""
    from asterixdb_analytics_ray.pipelines.relational import (
        part_promotion_suppliers,
    )

    return part_promotion_suppliers(
        _rd(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        _rd(sf_dir, "part", ["p_partkey", "p_name"]),
        num_partitions=4,
    )


def _q_tpch_waiting_suppliers(sf_dir: str):
    """Q21-style EXISTS/NOT-EXISTS pair as bounded groupbys: suppliers who
    were the only late shipper of finalized multi-supplier orders."""
    from asterixdb_analytics_ray.pipelines.relational import waiting_suppliers

    return waiting_suppliers(
        _rd(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]),
        _rd(sf_dir, "orders",
            ["o_orderkey", "o_orderdate", "o_orderstatus"]),
        _rd(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        num_partitions=4,
    )


def _q_events_props_rollup(sf_dir: str):
    """Semi-structured extraction: the props JSON field k rolled up per
    event type (vectorized regex extraction, integer-exact stats)."""
    import os

    import ray.data

    from asterixdb_analytics_ray.pipelines.events import props_rollup

    return props_rollup(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props"],
        )
    )


def _q_events_bipartite_degree(sf_dir: str):
    """Bipartite user→event_type degree over the driver's events table."""
    import os

    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def local_dedup(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    return (
        ds.map_batches(local_dedup, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .count()
        .groupby("user_id")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"user_id": t["user_id"], "n_event_types": t["count()"]}
            ),
            batch_format="pyarrow",
        )
    )


def _q_hits(sf_dir: str):
    """HITS hubs & authorities (10 un-normalized iterations, max-scaled)."""
    from asterixdb_analytics_ray.pipelines.hits import hits_table

    views = _graph(sf_dir)
    return hits_table(views["directed"], views["graph"].n_nodes)


def _q_katz(sf_dir: str):
    """Katz centrality (10 un-normalized iterations, max-scaled)."""
    from asterixdb_analytics_ray.pipelines.katz import katz_table

    views = _graph(sf_dir)
    return katz_table(views["directed"], views["graph"].n_nodes)


def _q_avg_neighbor_degree(sf_dir: str):
    """Per-vertex mean neighbor degree over the undirected simple graph."""
    from asterixdb_analytics_ray.pipelines.degrees import avg_neighbor_degree

    views = _graph(sf_dir)
    return avg_neighbor_degree(views["undirected"], views["graph"].n_nodes)


def _q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank: teleport mass lands only on vertex 0."""
    import numpy as np
    import pyarrow as pa

    from asterixdb_analytics_ray.functions.fasthash import round_like_sql
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.sql_oracle import PR_SUPERSTEPS, ROUND_DECIMALS

    views = _graph(sf_dir)
    g = views["graph"]
    res = pagerank_dense(
        views["directed"],
        g.n_nodes,
        g.out_degrees(),
        supersteps=PR_SUPERSTEPS,
        teleport=0,
    )
    # PPR values can terminate in decimal (0.15·0.85^k over 2^j degrees) and
    # land EXACTLY on a rounding boundary — np.round's half-to-even then
    # disagrees with DuckDB's half-away by one output ulp, so mimic SQL
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64),
            "rank": round_like_sql(res.state["rank"], ROUND_DECIMALS),
        }
    )


def _q_kcore(sf_dir: str):
    """3-core membership + within-core degree (Jacobi peeling to fixpoint)."""
    from asterixdb_analytics_ray.pipelines.kcore import kcore_table

    views = _graph(sf_dir)
    return kcore_table(views["undirected"], views["graph"].n_nodes, k=3)


def _q_clustering_coefficient(sf_dir: str):
    """Per-vertex local clustering coefficient over the simple graph."""
    from asterixdb_analytics_ray.pipelines.triangles import clustering_coefficient

    views = _graph(sf_dir)
    return clustering_coefficient(views["oriented"], views["graph"].n_nodes)


def _q_link_prediction(sf_dir: str):
    """Top-50 non-adjacent pairs by Adamic–Adar (center degree ≤ 256)."""
    from asterixdb_analytics_ray.pipelines.linkpred import adamic_adar_topk

    views = _graph(sf_dir)
    return adamic_adar_topk(views["undirected"], views["graph"].n_nodes)


def _q_degree_histogram(sf_dir: str):
    """Out-degree distribution including the degree-0 row."""
    from asterixdb_analytics_ray.pipelines.degrees import degree_histogram

    views = _graph(sf_dir)
    return degree_histogram(views["directed"], views["graph"].n_nodes)


def _q_doc_token_entropy(sf_dir: str):
    """Per-doc type–token ratio + Shannon token entropy (quality filters)."""
    from asterixdb_analytics_ray.pipelines.corpus import token_entropy

    return token_entropy(_docs_ds(sf_dir))


def _q_transitivity(sf_dir: str):
    """Global clustering coefficient: 3·triangles / wedges."""
    from asterixdb_analytics_ray.pipelines.triangles import transitivity

    views = _graph(sf_dir)
    return transitivity(views["oriented"], views["graph"].n_nodes)


def _q_link_prediction_jaccard(sf_dir: str):
    """Top-50 non-adjacent pairs by Jaccard coefficient (capped wedges)."""
    from asterixdb_analytics_ray.pipelines.linkpred import jaccard_topk

    views = _graph(sf_dir)
    return jaccard_topk(views["undirected"], views["graph"].n_nodes)


def _q_link_prediction_ra(sf_dir: str):
    """Top-50 non-adjacent pairs by resource-allocation index (1/deg z)."""
    from asterixdb_analytics_ray.pipelines.linkpred import (
        resource_allocation_topk,
    )

    views = _graph(sf_dir)
    return resource_allocation_topk(views["undirected"], views["graph"].n_nodes)


def _q_betweenness(sf_dir: str):
    """Source-sampled Brandes betweenness from seeds 0-3 (level-synchronous
    forward σ + backward δ sweeps, one edge scan per level)."""
    from asterixdb_analytics_ray.pipelines.betweenness import (
        brandes_betweenness,
    )

    views = _graph(sf_dir)
    return brandes_betweenness(views["undirected"], views["graph"].n_nodes)


def _q_degree_assortativity(sf_dir: str):
    """Pearson correlation of endpoint degrees (Newman assortativity)."""
    from asterixdb_analytics_ray.pipelines.degrees import degree_assortativity

    views = _graph(sf_dir)
    return degree_assortativity(views["undirected"], views["graph"].n_nodes)


def _q_ktruss(sf_dir: str):
    """4-truss edges + within-truss triangle support (edge peeling)."""
    from asterixdb_analytics_ray.pipelines.truss import ktruss

    views = _graph(sf_dir)
    final, _rounds = ktruss(views["oriented"], views["graph"].n_nodes, k=4)
    return final


def _q_mis(sf_dir: str):
    """Maximal independent set (greedy-by-hash-priority Luby rounds)."""
    from asterixdb_analytics_ray.pipelines.mis import mis_table

    views = _graph(sf_dir)
    return mis_table(views["undirected"], views["graph"].n_nodes)


def _q_pagerank_weighted(sf_dir: str):
    """Weighted PageRank: rank flows proportional to edge weight (conv_tool
    = usage count, reply = 1, tool_cooc = shared-conv count)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.functions.fasthash import round_like_sql
    from asterixdb_analytics_ray.graph import build_link_graph
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.sql_oracle import PR_SUPERSTEPS, ROUND_DECIMALS

    path = _transcripts_path(sf_dir)
    g = build_link_graph(ray.data.read_parquet(path), weighted=True)
    res = pagerank_dense(
        g.weighted_directed().materialize(),
        g.n_nodes,
        g.weighted_out_sums(),
        supersteps=PR_SUPERSTEPS,
        weight_col="w",
    )
    return pa.table(
        {
            "v": np.arange(g.n_nodes, dtype=np.int64),
            "rank": round_like_sql(res.state["rank"], ROUND_DECIMALS),
        }
    )


def _q_random_walks(sf_dir: str):
    """Deterministic uniform random walks (DeepWalk corpus stage): one
    4-step walk per vertex, hash-seeded so the oracle replays it."""
    from asterixdb_analytics_ray.pipelines.walks import random_walks

    views = _graph(sf_dir)
    return random_walks(views["undirected"], views["graph"].n_nodes)


def _q_doc_bigram_pmi(sf_dir: str):
    """Top-50 collocations by PMI (adjacent token pairs, count ≥ 5)."""
    from asterixdb_analytics_ray.pipelines.corpus import bigram_pmi

    return bigram_pmi(_docs_ds(sf_dir), k=50, min_count=5)


def _q_emb_quantize(sf_dir: str):
    """Symmetric per-dim int8 scalar quantization, exploded codes."""
    from asterixdb_analytics_ray.pipelines.embeddings import quantize_int8

    return quantize_int8(_emb_ds(sf_dir))


def _docs_ds(sf_dir: str):
    import os

    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb_ds(sf_dir: str):
    import os

    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _q_doc_token_counts(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import token_counts

    return token_counts(_docs_ds(sf_dir))


def _q_doc_scrub_terms(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import scrub_terms

    return scrub_terms(_docs_ds(sf_dir))


def _q_doc_fingerprints(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import fingerprints

    return fingerprints(_docs_ds(sf_dir))


def _q_doc_exact_dedup(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import exact_dedup

    return exact_dedup(_docs_ds(sf_dir))


def _q_doc_quality(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import quality_scores

    return quality_scores(_docs_ds(sf_dir))


def _q_doc_repetition(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import repetition_scores

    return repetition_scores(_docs_ds(sf_dir))


def _q_doc_language_id(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import language_id

    return language_id(_docs_ds(sf_dir))


def _q_doc_minhash_dups(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.textops import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_ds(sf_dir), threshold=0.4)


def _q_doc_dup_clusters(sf_dir: str):
    """Near-dup cluster canonicalization: CC over the MinHash dup-pair
    graph (sharded min-label runner), one canonical doc per cluster."""
    from asterixdb_analytics_ray.pipelines.textops import dup_clusters

    docs = _docs_ds(sf_dir)
    out, _rounds = dup_clusters(docs, n_docs=docs.count(), threshold=0.4)
    return out


def _q_doc_quality_by_lang(sf_dir: str):
    """Per-language corpus quality rollup (mean score / stopword ratio)."""
    from asterixdb_analytics_ray.pipelines.textops import quality_by_lang

    return quality_by_lang(_docs_ds(sf_dir))


def _q_doc_simhash(sf_dir: str):
    """(doc_id, simhash) with the 64-bit value as a 16-char hex string — hex
    because uint64 values above 2^63 don't survive the comparator's int64
    normalization, and the DuckDB oracle recomputes the identical hex."""
    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.textops import simhash_values

    def hexify(t: pa.Table) -> pa.Table:
        vals = t["simhash"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array([format(int(v), "016x") for v in vals]),
            }
        )

    return simhash_values(_docs_ds(sf_dir)).map_batches(
        hexify, batch_format="pyarrow"
    )


def _q_doc_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole-exact banding."""
    from asterixdb_analytics_ray.pipelines.textops import simhash_dup_pairs

    return simhash_dup_pairs(_docs_ds(sf_dir), max_dist=3)


def _q_doc_top_tokens(sf_dir: str):
    """Global token heavy hitters (top-20, integer-exact tie-break)."""
    from asterixdb_analytics_ray.pipelines.corpus import top_tokens

    return top_tokens(_docs_ds(sf_dir), k=20)


def _q_corpus_split_leakage(sf_dir: str):
    """Near-dup pairs straddling the deterministic train/val hash split
    (the post-split leakage QA gate)."""
    from asterixdb_analytics_ray.pipelines.corpus import split_leakage

    return split_leakage(_docs_ds(sf_dir), threshold=0.4, val_rate=0.2)


def _q_doc_containment_dups(sf_dir: str):
    """Asymmetric subset-duplicate pairs (overlap coefficient >= 0.8) —
    the containment dedup pass Jaccard misses."""
    from asterixdb_analytics_ray.pipelines.textops import containment_pairs

    return containment_pairs(_docs_ds(sf_dir), threshold=0.8)


def _q_doc_dup_shingles(sf_dir: str):
    """Corpus-wide duplicated-shingle fraction per doc (RefinedWeb-style
    duplicated n-gram quality signal; broadcast dup-set flagging)."""
    from asterixdb_analytics_ray.pipelines.textops import dup_shingle_stats

    return dup_shingle_stats(_docs_ds(sf_dir))


def _q_doc_zipf_slope(sf_dir: str):
    """Zipf OLS fit over the top-200 vocabulary (corpus-health statistic;
    two-level token-count combine, regression on the tiny ranked table)."""
    from asterixdb_analytics_ray.pipelines.corpus import zipf_slope

    return zipf_slope(_docs_ds(sf_dir), top_n=200)


def _q_doc_tfidf_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF terms (df via distributed token join; selection
    ranked by integer keys so float ulps can't change the row set)."""
    from asterixdb_analytics_ray.pipelines.corpus import tfidf_top_terms

    return tfidf_top_terms(_docs_ds(sf_dir), top=3)


_SAMPLE_RATES = {"en": 0.5}


def _q_doc_hash_sample(sf_dir: str):
    """Deterministic stratified hash sample (en at 0.5, others 0.2) —
    map-side only, reproducible at any parallelism."""
    from asterixdb_analytics_ray.pipelines.corpus import hash_sample

    return hash_sample(_docs_ds(sf_dir), rate=0.2, rates_by_lang=_SAMPLE_RATES)


def _q_doc_length_quantiles(sf_dir: str):
    """Per-language exact token-length quantiles via bounded histogram."""
    from asterixdb_analytics_ray.pipelines.corpus import length_quantiles

    return length_quantiles(_docs_ds(sf_dir))


def _q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap) over the events stream."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import sessionize

    return sessionize(
        ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    )


def _q_events_session_ids(sf_dir: str):
    """Per-event session assignment (event_id → session_id, 30-min gap)
    — the join-back map for session features, same bucket kernel as
    sessionize."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import session_ids

    return session_ids(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "ts"],
        )
    )


def _q_doc_decontaminate(sf_dir: str):
    """Eval-set n-gram contamination flags (broadcast shingle blocklist)."""
    from asterixdb_analytics_ray.pipelines.corpus import decontaminate

    return decontaminate(_docs_ds(sf_dir), eval_max_doc_id=5)


def _q_doc_best_per_source(sf_dir: str):
    """Group-wise argmax dedup: longest doc per source."""
    from asterixdb_analytics_ray.pipelines.corpus import best_per_source

    return best_per_source(_docs_ds(sf_dir))


def _q_doc_cms_registers(sf_dir: str):
    """Count-Min sketch registers over the corpus token stream."""
    from asterixdb_analytics_ray.pipelines.textops import cms_registers

    return cms_registers(_docs_ds(sf_dir))


def _q_doc_lm_score(sf_dir: str):
    """Unigram LM quality score (mean token log-prob, broadcast counts)."""
    from asterixdb_analytics_ray.pipelines.corpus import lm_score

    return lm_score(_docs_ds(sf_dir))


def _q_corpus_pipeline(sf_dir: str):
    """Composed end-to-end training-data pipeline: exact dedup → MinHash
    near-dup drop → eval decontamination → quality filter → hash sample."""
    from asterixdb_analytics_ray.pipelines.corpus import corpus_pipeline

    return corpus_pipeline(_docs_ds(sf_dir))


def _q_emb_covariance(sf_dir: str):
    """Corpus-wide embedding covariance (upper triangle) via per-batch
    Gram-matrix sufficient statistics — the distributed PCA primitive."""
    from asterixdb_analytics_ray.pipelines.embeddings import covariance_stats

    return covariance_stats(_emb_ds(sf_dir))


def _q_emb_top_direction(sf_dir: str):
    """Top principal direction via fixed-step power iteration on the
    distributed covariance sufficient stats (the first step of PCA)."""
    from asterixdb_analytics_ray.pipelines.embeddings import top_direction

    return top_direction(_emb_ds(sf_dir))


def _q_emb_label_centroids(sf_dir: str):
    """Per-label centroid norm + dispersion via mergeable sufficient stats."""
    from asterixdb_analytics_ray.pipelines.embeddings import label_centroids

    return label_centroids(_emb_ds(sf_dir))


_KNN_QUERY_IDS = (0, 1, 2)


def _q_emb_knn(sf_dir: str):
    import numpy as np
    import pyarrow.compute as pc

    from asterixdb_analytics_ray.pipelines.embeddings import (
        _batch_matrix,
        knn_brute_force,
    )

    ds = _emb_ds(sf_dir)
    qt = ds.filter(
        expr=f"vec_id in {list(_KNN_QUERY_IDS)}"
    ).to_pandas().sort_values("vec_id")
    queries = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    return knn_brute_force(ds, queries, qt["vec_id"].to_numpy(), k=10)


def _q_emb_ivf_knn(sf_dir: str):
    """IVF-flat ANN (the 100-TB scale path for similarity search): coarse
    k-means quantizer → probe the 3 nearest cells per query → within-cell
    cosine top-k. Deterministic quantization ⇒ exact oracle parity."""
    import numpy as np

    from asterixdb_analytics_ray.pipelines.embeddings import knn_ivf

    ds = _emb_ds(sf_dir)
    qt = ds.filter(
        expr=f"vec_id in {list(_KNN_QUERY_IDS)}"
    ).to_pandas().sort_values("vec_id")
    queries = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    return knn_ivf(
        ds, queries, qt["vec_id"].to_numpy(), k=10, n_clusters=8, nprobe=3
    )


def _q_emb_pq_codes(sf_dir: str):
    """Product-quantization codes (m=2 subspaces × 8 codes): independent
    IMRU k-means per subspace over ONE cached bulk load, one encode pass."""
    from asterixdb_analytics_ray.pipelines.embeddings import pq_codes

    return pq_codes(_emb_ds(sf_dir), m=2, n_clusters=8)


def _q_emb_centroid_exemplars(sf_dir: str):
    """Top-5 embeddings nearest each label's centroid (prototype mining):
    sufficient-stat centroid pass + broadcast brute-force kNN."""
    from asterixdb_analytics_ray.pipelines.embeddings import (
        nearest_to_centroids,
    )

    return nearest_to_centroids(_emb_ds(sf_dir), k=5)


def _q_emb_centroid_separation(sf_dir: str):
    """Pairwise cosine similarity between label centroids (cluster
    separation diagnostic; one sufficient-stat pass)."""
    from asterixdb_analytics_ray.pipelines.embeddings import (
        centroid_separation,
    )

    return centroid_separation(_emb_ds(sf_dir))


def _q_emb_random_projection(sf_dir: str):
    """md5-Rademacher JL projection to 8 dims (map-side matmul against a
    broadcast deterministic sign matrix)."""
    from asterixdb_analytics_ray.pipelines.embeddings import random_projection

    return random_projection(_emb_ds(sf_dir), k=8, dim=64)


def _q_emb_cluster_cohesion(sf_dir: str):
    """Per-label mean member-to-centroid cosine (cohesion side of the
    cohesion/separation clustering dashboard)."""
    from asterixdb_analytics_ray.pipelines.embeddings import cluster_cohesion

    return cluster_cohesion(_emb_ds(sf_dir))


def _q_emb_outliers(sf_dir: str):
    """Mislabeled-embedding candidates: members ≥2σ below their label's
    mean centroid similarity."""
    from asterixdb_analytics_ray.pipelines.embeddings import centroid_outliers

    return centroid_outliers(_emb_ds(sf_dir))


def _q_emb_cosine_dups(sf_dir: str):
    from asterixdb_analytics_ray.pipelines.embeddings import cosine_dup_pairs

    return cosine_dup_pairs(_emb_ds(sf_dir), threshold=0.4)


def _q_emb_lsh_dups(sf_dir: str):
    """Sign-LSH near-dup pairs with AXIS hyperplanes (identity rows), so the
    approximate candidate set is reproducible in SQL — see
    ``sql_oracle.lsh_dup_pairs_sql``."""
    import numpy as np

    from asterixdb_analytics_ray.pipelines.embeddings import cosine_dup_pairs_lsh

    return cosine_dup_pairs_lsh(
        _emb_ds(sf_dir),
        threshold=0.4,
        n_bands=8,
        band_bits=4,
        hyperplanes=np.eye(32, 64),
    )


def _q_emb_kmeans_cells(sf_dir: str):
    """IVF coarse assignment (vec_id, cell) — k-means via the IMRU loop."""
    import numpy as np
    import pyarrow as pa
    import ray

    from asterixdb_analytics_ray.pipelines.embeddings import (
        _batch_matrix,
        _normalize,
        train_kmeans_centroids,
    )

    ds = _emb_ds(sf_dir)
    cents = _normalize(train_kmeans_centroids(ds, n_clusters=8, iters=10))
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, m = _batch_matrix(t)
        cell = (
            np.argmax(_normalize(m) @ c.T, axis=1).astype(np.int64)
            if len(ids)
            else np.array([], dtype=np.int64)
        )
        return pa.table({"vec_id": ids, "cell": cell})

    return ds.map_batches(assign, batch_format="pyarrow")


def _media_path(sf_dir: str) -> str:
    """Persist the deterministic synthetic media table once per sf so BOTH
    the Ray pipeline and the DuckDB oracle read the SAME parquet (binary
    payload column included) — the oracle recomputes features from the
    stored payloads via the md5 chain (``sql_oracle.media_features_sql``)."""
    import pyarrow.parquet as pq

    from asterixdb_analytics_ray.pipelines.multimodal import synthetic_media
    from asterixdb_analytics_ray.sources.transcripts import sf_from_dir

    n = max(50, int(round(5_000 * sf_from_dir(sf_dir))))
    path = f"/tmp/aar_data/media_{n}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(synthetic_media(n), path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


def _q_media_features(sf_dir: str):
    """Multimodal plumbing demo: binary media parquet → actor-pool feature
    extraction (decode runs the deterministic md5 fake — no codec libs in
    this container; see ``multimodal._decode_payload`` for the PIL seam)."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.multimodal import extract_features

    import numpy as np
    import pyarrow as pa

    media = ray.data.read_parquet(_media_path(sf_dir))
    feats = extract_features(media, concurrency=2, batch_size=32)

    def summarize(t: pa.Table) -> pa.Table:
        # flatten the feature vector to scalar summaries: the driver's
        # compare sorts/hashes column values, which list columns break
        m = t["features"].combine_chunks().flatten().to_numpy().reshape(
            t.num_rows, -1
        )
        return pa.table(
            {
                "item_id": t["item_id"],
                "width": t["width"],
                "height": t["height"],
                "feat_mean": np.round(m.mean(axis=1), 9),
                "feat_norm": np.round(np.linalg.norm(m, axis=1), 9),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline at sf0.001: transcripts → link graph → PageRank,
    returned as (v, kind, key, rank) joined with the node dictionary."""
    views = _graph("/root/testdata/sf0.001")
    g = views["graph"]
    ranks = _q_pagerank("/root/testdata/sf0.001")
    nodes = g.node_table
    out = nodes.to_pandas()
    out["rank"] = ranks["rank"].to_numpy()
    out = out.rename(columns={"node_id": "v"})
    return out[["v", "kind", "key", "rank"]]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcript_roundtrip": _q_transcript_roundtrip,
        "nodes": _q_nodes,
        "edge_counts": _q_edge_counts,
        "out_degrees": _q_out_degrees,
        "top_degree": _q_top_degree,
        "pagerank": _q_pagerank,
        "pagerank_top_nodes": _q_pagerank_top_nodes,
        "connected_components": _q_connected_components,
        "modularity": _q_modularity,
        "label_propagation": _q_label_propagation,
        "triangle_count": _q_triangle_count,
        "triangle_total": _q_triangle_total,
        "sssp": _q_sssp,
        "dag_levels": _q_dag_levels,
        "conv_tool_paths": _q_conv_tool_paths,
        "tool_scc": _q_tool_scc,
        "conv_stats": _q_conv_stats,
        "role_stats": _q_role_stats,
        "sssp_weighted": _q_sssp_weighted,
        "bfs_multi_source": _q_bfs_multi_source,
        "harmonic_centrality": _q_harmonic_centrality,
        "closeness_centrality": _q_closeness_centrality,
        "rich_club": _q_rich_club,
        "graph_eccentricity": _q_graph_eccentricity,
        "emb_random_projection": _q_emb_random_projection,
        "reachability": _q_reachability,
        "max_clique": _q_max_clique,
        "graph_sample": _q_graph_sample,
        "events_bipartite_degree": _q_events_bipartite_degree,
        "events_windowed_counts": _q_events_windowed_counts,
        "events_asof_click": _q_events_asof_click,
        "events_range_join": _q_events_range_join,
        "doc_ngram_jaccard": _q_doc_ngram_jaccard,
        "doc_token_counts": _q_doc_token_counts,
        "doc_fingerprints": _q_doc_fingerprints,
        "doc_scrub_terms": _q_doc_scrub_terms,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_quality": _q_doc_quality,
        "doc_repetition": _q_doc_repetition,
        "doc_language_id": _q_doc_language_id,
        "doc_minhash_dups": _q_doc_minhash_dups,
        "doc_dup_clusters": _q_doc_dup_clusters,
        "doc_simhash": _q_doc_simhash,
        "doc_hll_registers": _q_doc_hll_registers,
        "events_sessionize": _q_events_sessionize,
        "events_session_ids": _q_events_session_ids,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "events_top_per_user": _q_events_top_per_user,
        "events_value_quantiles": _q_events_value_quantiles,
        "events_sliding_counts": _q_events_sliding_counts,
        "events_anomalies": _q_events_anomalies,
        "events_gap_stats": _q_events_gap_stats,
        "doc_vocab_stats": _q_doc_vocab_stats,
        "doc_quality_by_lang": _q_doc_quality_by_lang,
        "events_transitions": _q_events_transitions,
        "events_rolling_wau": _q_events_rolling_wau,
        "events_session_pairs": _q_events_session_pairs,
        "events_props_rollup": _q_events_props_rollup,
        "tpch_pricing_summary": _q_tpch_pricing_summary,
        "tpch_nation_revenue": _q_tpch_nation_revenue,
        "tpch_inactive_customers": _q_tpch_inactive_customers,
        "tpch_priority_returns": _q_tpch_priority_returns,
        "tpch_shipping_priority": _q_tpch_shipping_priority,
        "tpch_brand_volume": _q_tpch_brand_volume,
        "tpch_region_revenue": _q_tpch_region_revenue,
        "tpch_forecast_revenue": _q_tpch_forecast_revenue,
        "tpch_promo_share": _q_tpch_promo_share,
        "tpch_top_customers": _q_tpch_top_customers,
        "tpch_order_counts": _q_tpch_order_counts,
        "tpch_large_orders": _q_tpch_large_orders,
        "tpch_discounted_revenue": _q_tpch_discounted_revenue,
        "tpch_local_supplier_revenue": _q_tpch_local_supplier_revenue,
        "tpch_market_share": _q_tpch_market_share,
        "tpch_volume_shipping": _q_tpch_volume_shipping,
        "tpch_top_supplier": _q_tpch_top_supplier,
        "tpch_small_qty_revenue": _q_tpch_small_qty_revenue,
        "doc_segment_dedup": _q_doc_segment_dedup,
        "emb_stratified_sample": _q_emb_stratified_sample,
        "doc_source_overlap": _q_doc_source_overlap,
        "events_heavy_hitters": _q_events_heavy_hitters,
        "doc_oov_rate": _q_doc_oov_rate,
        "spectral_scores": _q_spectral_scores,
        "emb_ivf_recall": _q_emb_ivf_recall,
        "graph_coloring": _q_graph_coloring,
        "conv_turn_latency": _q_conv_turn_latency,
        "doc_chunks": _q_doc_chunks,
        "tool_pair_weights": _q_tool_pair_weights,
        "tpch_maintained_summary": _q_tpch_maintained_summary,
        "mst": _q_mst,
        "emb_silhouette": _q_emb_silhouette,
        "doc_source_dup_rates": _q_doc_source_dup_rates,
        "spectral_cut": _q_spectral_cut,
        "tpch_best_supplier": _q_tpch_best_supplier,
        "tpch_product_profit": _q_tpch_product_profit,
        "tpch_important_parts": _q_tpch_important_parts,
        "tpch_late_shipments": _q_tpch_late_shipments,
        "tpch_part_promotion": _q_tpch_part_promotion,
        "tpch_waiting_suppliers": _q_tpch_waiting_suppliers,
        "tpch_supplier_part_counts": _q_tpch_supplier_part_counts,
        "tpch_sales_opportunity": _q_tpch_sales_opportunity,
        "events_user_profiles": _q_events_user_profiles,
        "doc_source_stats": _q_doc_source_stats,
        "doc_decontaminate": _q_doc_decontaminate,
        "doc_best_per_source": _q_doc_best_per_source,
        "doc_cms_registers": _q_doc_cms_registers,
        "doc_top_tokens": _q_doc_top_tokens,
        "doc_zipf_slope": _q_doc_zipf_slope,
        "doc_containment_dups": _q_doc_containment_dups,
        "doc_dup_shingles": _q_doc_dup_shingles,
        "corpus_split_leakage": _q_corpus_split_leakage,
        "doc_tfidf_terms": _q_doc_tfidf_terms,
        "doc_hash_sample": _q_doc_hash_sample,
        "doc_length_quantiles": _q_doc_length_quantiles,
        "doc_simhash_dups": _q_doc_simhash_dups,
        "doc_lm_score": _q_doc_lm_score,
        "corpus_pipeline": _q_corpus_pipeline,
        "emb_label_centroids": _q_emb_label_centroids,
        "emb_covariance": _q_emb_covariance,
        "emb_top_direction": _q_emb_top_direction,
        "emb_knn": _q_emb_knn,
        "emb_cosine_dups": _q_emb_cosine_dups,
        "emb_lsh_dups": _q_emb_lsh_dups,
        "emb_kmeans_cells": _q_emb_kmeans_cells,
        "emb_ivf_knn": _q_emb_ivf_knn,
        "emb_pq_codes": _q_emb_pq_codes,
        "emb_centroid_exemplars": _q_emb_centroid_exemplars,
        "emb_centroid_separation": _q_emb_centroid_separation,
        "emb_cluster_cohesion": _q_emb_cluster_cohesion,
        "emb_outliers": _q_emb_outliers,
        "media_features": _q_media_features,
        "hits": _q_hits,
        "katz": _q_katz,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "pagerank_personalized": _q_pagerank_personalized,
        "kcore": _q_kcore,
        "clustering_coefficient": _q_clustering_coefficient,
        "link_prediction": _q_link_prediction,
        "degree_histogram": _q_degree_histogram,
        "doc_bigram_pmi": _q_doc_bigram_pmi,
        "emb_quantize": _q_emb_quantize,
        "random_walks": _q_random_walks,
        "pagerank_weighted": _q_pagerank_weighted,
        "mis": _q_mis,
        "ktruss": _q_ktruss,
        "degree_assortativity": _q_degree_assortativity,
        "link_prediction_jaccard": _q_link_prediction_jaccard,
        "link_prediction_ra": _q_link_prediction_ra,
        "betweenness": _q_betweenness,
        "transitivity": _q_transitivity,
        "doc_token_entropy": _q_doc_token_entropy,
    }


def oracle_sql() -> dict[str, str]:
    from asterixdb_analytics_ray import sql_oracle as so

    p = _transcripts_path(_SF_ORACLE)  # generate eagerly so SQL can read it
    return {
        "transcript_roundtrip": so.transcript_roundtrip_sql(p),
        "nodes": so.nodes_sql(p),
        "edge_counts": so.edge_counts_sql(p),
        "out_degrees": so.out_degrees_sql(p),
        "top_degree": so.top_degree_sql(p),
        "pagerank": so.pagerank_sql(p),
        "spectral_scores": so.spectral_scores_sql(p),
        "spectral_cut": so.spectral_cut_sql(p),
        "graph_coloring": so.coloring_sql(p),
        "conv_turn_latency": so.turn_latency_sql(p),
        "tool_pair_weights": so.tool_pair_weights_sql(p),
        "tpch_maintained_summary": so.maintained_pricing_summary_sql(),
        "emb_silhouette": so.silhouette_sql(),
        "doc_source_dup_rates": so.source_dup_rates_sql(),
        "pagerank_top_nodes": so.pagerank_top_nodes_sql(p),
        "connected_components": so.connected_components_sql(p),
        "modularity": so.modularity_sql(p),
        "label_propagation": so.label_propagation_sql(p),
        "triangle_count": so.triangles_sql(p),
        "triangle_total": so.triangle_total_sql(p),
        "sssp": so.sssp_sql(p),
        "dag_levels": so.dag_levels_sql(p),
        "conv_tool_paths": so.tool_paths_sql(p),
        "tool_scc": so.tool_scc_sql(p),
        "conv_stats": so.conv_stats_sql(p),
        "role_stats": so.role_stats_sql(p),
        "sssp_weighted": so.sssp_weighted_sql(p),
        "bfs_multi_source": so.bfs_multi_sql(p),
        "harmonic_centrality": so.bfs_harmonic_sql(p),
        "closeness_centrality": so.bfs_closeness_sql(p),
        "rich_club": so.rich_club_sql(p),
        "graph_eccentricity": so.bfs_eccentricity_sql(p),
        "emb_random_projection": so.random_projection_sql(8, 64),
        "reachability": so.reachability_sql(p),
        "events_bipartite_degree": so.events_bipartite_degree_sql(),
        "events_windowed_counts": so.windowed_counts_sql(),
        "events_asof_click": so.asof_last_event_sql(),
        "events_range_join": so.range_join_counts_sql(),
        "doc_ngram_jaccard": so.ngram_jaccard_sql(0.4),
        "doc_language_id": so.language_id_sql(),
        "doc_minhash_dups": so.minhash_lsh_sql(0.4),
        "doc_dup_clusters": so.dup_clusters_sql(0.4),
        "doc_simhash": so.simhash_sql(),
        "doc_hll_registers": so.hll_registers_sql(),
        "events_sessionize": so.sessionize_sql(),
        "events_session_ids": so.session_ids_sql(),
        "events_funnel": so.funnel_stages_sql(),
        "events_retention": so.retention_counts_sql(),
        "events_top_per_user": so.top_events_per_user_sql(3),
        "events_value_quantiles": so.event_value_quantiles_sql(),
        "events_sliding_counts": so.sliding_counts_sql(),
        "events_anomalies": so.window_anomalies_sql(),
        "events_gap_stats": so.gap_stats_sql(),
        "doc_vocab_stats": so.vocab_stats_sql(),
        "doc_quality_by_lang": so.quality_by_lang_sql(),
        "events_transitions": so.transition_counts_sql(),
        "events_rolling_wau": so.rolling_active_users_sql(7),
        "events_session_pairs": so.session_type_pairs_sql(),
        "events_props_rollup": so.props_rollup_sql(),
        "tpch_pricing_summary": so.pricing_summary_sql(),
        "tpch_nation_revenue": so.nation_revenue_sql(),
        "tpch_inactive_customers": so.inactive_customers_sql(),
        "tpch_priority_returns": so.priority_return_counts_sql(),
        "tpch_shipping_priority": so.shipping_priority_sql(),
        "tpch_brand_volume": so.brand_volume_sql(),
        "tpch_region_revenue": so.region_revenue_sql(),
        "tpch_forecast_revenue": so.forecast_revenue_sql(),
        "tpch_promo_share": so.promo_revenue_share_sql(),
        "tpch_top_customers": so.top_return_customers_sql(),
        "tpch_order_counts": so.order_count_distribution_sql(),
        "tpch_large_orders": so.large_orders_sql(),
        "tpch_discounted_revenue": so.discounted_revenue_sql(),
        "tpch_local_supplier_revenue": so.local_supplier_revenue_sql(),
        "tpch_market_share": so.market_share_sql(),
        "tpch_volume_shipping": so.volume_shipping_sql(),
        "tpch_top_supplier": so.top_supplier_sql(),
        "tpch_small_qty_revenue": so.small_quantity_revenue_sql(),
        "doc_segment_dedup": so.segment_dedup_sql(),
        "doc_source_overlap": so.source_overlap_sql(),
        "events_heavy_hitters": so.heavy_hitters_sql(),
        "doc_oov_rate": so.oov_rate_sql(),
        "doc_chunks": so.chunk_documents_sql(16, 4),
        "tpch_best_supplier": so.min_cost_supplier_sql(),
        "tpch_product_profit": so.product_type_profit_sql(),
        "tpch_important_parts": so.important_parts_sql(),
        "tpch_late_shipments": so.late_shipment_counts_sql(),
        "tpch_part_promotion": so.part_promotion_suppliers_sql(),
        "tpch_waiting_suppliers": so.waiting_suppliers_sql(),
        "tpch_supplier_part_counts": so.supplier_part_counts_sql(),
        "tpch_sales_opportunity": so.sales_opportunity_sql(),
        "events_user_profiles": so.user_profiles_sql(),
        "doc_source_stats": so.source_stats_sql(),
        "doc_decontaminate": so.decontaminate_sql(5),
        "doc_best_per_source": so.best_per_source_sql(),
        "doc_cms_registers": so.cms_registers_sql(),
        "doc_top_tokens": so.top_tokens_sql(20),
        "doc_zipf_slope": so.zipf_slope_sql(200),
        "doc_containment_dups": so.containment_sql(0.8),
        "doc_dup_shingles": so.dup_shingle_stats_sql(),
        "corpus_split_leakage": so.split_leakage_sql(0.4, 0.2),
        "doc_tfidf_terms": so.tfidf_top_terms_sql(3),
        "doc_hash_sample": so.hash_sample_sql(0.2, _SAMPLE_RATES),
        "doc_length_quantiles": so.length_quantiles_sql(),
        "doc_simhash_dups": so.simhash_pairs_sql(3),
        "doc_token_counts": so.token_counts_sql(),
        "doc_fingerprints": so.fingerprints_sql(),
        "doc_scrub_terms": so.scrub_terms_sql(),
        "doc_exact_dedup": so.exact_dedup_sql(),
        "doc_quality": so.quality_scores_sql(),
        "doc_repetition": so.repetition_scores_sql(),
        "doc_lm_score": so.lm_score_sql(),
        "corpus_pipeline": so.corpus_pipeline_sql(),
        "emb_label_centroids": so.label_centroids_sql(),
        "emb_covariance": so.covariance_sql(),
        "emb_top_direction": so.top_direction_sql(),
        "emb_knn": so.knn_sql(_KNN_QUERY_IDS, k=10),
        "emb_cosine_dups": so.cosine_dup_pairs_sql(0.4),
        "emb_lsh_dups": so.lsh_dup_pairs_sql(0.4, n_bands=8, band_bits=4),
        "emb_centroid_exemplars": so.nearest_to_centroids_sql(5),
        "emb_centroid_separation": so.centroid_separation_sql(),
        "emb_cluster_cohesion": so.cluster_cohesion_sql(),
        "emb_outliers": so.centroid_outliers_sql(),
        "media_features": so.media_features_sql(_media_path(_SF_ORACLE)),
        "graph_sample": so.graph_sample_sql(p),
        "max_clique": so.max_clique_sql(p),
        "emb_kmeans_cells": so.kmeans_cells_sql(
            os.path.join(_SF_ORACLE, "embeddings.parquet")
        ),
        "emb_stratified_sample": so.stratified_sample_sql(
            os.path.join(_SF_ORACLE, "embeddings.parquet")
        ),
        "emb_ivf_recall": so.ivf_recall_sql(
            os.path.join(_SF_ORACLE, "embeddings.parquet"),
            query_ids=_KNN_QUERY_IDS,
        ),
        "emb_ivf_knn": so.ivf_knn_sql(
            os.path.join(_SF_ORACLE, "embeddings.parquet"),
            query_ids=_KNN_QUERY_IDS,
        ),
        "emb_pq_codes": so.pq_codes_sql(
            os.path.join(_SF_ORACLE, "embeddings.parquet"), m=2, n_clusters=8
        ),
        "hits": so.hits_sql(p),
        "katz": so.katz_sql(p),
        "avg_neighbor_degree": so.avg_neighbor_degree_sql(p),
        "pagerank_personalized": so.ppr_sql(p, source=0),
        "kcore": so.kcore_sql(p, k=3),
        "clustering_coefficient": so.clustering_coefficient_sql(p),
        "link_prediction": so.adamic_adar_sql(p),
        "degree_histogram": so.degree_histogram_sql(p),
        "doc_bigram_pmi": so.bigram_pmi_sql(k=50, min_count=5),
        "emb_quantize": so.quantize_int8_sql(),
        "random_walks": so.random_walks_sql(p),
        "pagerank_weighted": so.pagerank_weighted_sql(p),
        "mis": so.mis_sql(p),
        "ktruss": so.ktruss_sql(p, k=4),
        "degree_assortativity": so.assortativity_sql(p),
        "link_prediction_jaccard": so.jaccard_linkpred_sql(p),
        "link_prediction_ra": so.resource_allocation_sql(p),
        "betweenness": so.betweenness_sql(p),
        "transitivity": so.transitivity_sql(p),
        "doc_token_entropy": so.token_entropy_sql(),
    }
