"""Cluster job entry point — the ``ray job submit`` analog of the reference's
``Client.run`` CLI (``pregelix-example/.../client/Client.java:37-83``: -plan
-num-iteration -ckp-interval -inputpaths -outputpath → here argparse flags).

On a real cluster:

    ray job submit --working-dir . -- python run_job.py \
        --algorithm pagerank --input /data/transcripts.parquet \
        --output /data/out/pagerank --partitions 256 \
        --checkpoint-dir /shared/ck/pagerank --checkpoint-every 2 --resume

The SAME submitted job runs unchanged on an N-node or 4N-node cluster: the
partition count (not the cluster size) fixes the hash space, and Ray spreads
the per-superstep partition tasks over whatever CPUs exist — this is the
configuration measured by ``bench.py --scaling`` for the N vs 4N gate.

Sandbox note: with no cluster, ``RAY_ADDRESS=local`` (preset) makes
``ray.init(address=...)`` start a local instance; the script is also directly
runnable as ``python run_job.py --sf-dir /root/testdata/sf0.001``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--algorithm",
        default="pagerank",
        choices=[
            "pagerank",
            "pagerank_sharded",
            "connected_components",
            "cc_sharded",
            "label_propagation",
            "lp_sharded",
            "triangle_count",
            "sssp",
            "sssp_sharded",
            "reachability",
            "graph_sample",
            "corpus_pipeline",
        ],
    )
    ap.add_argument("--input", help="transcript parquet path (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--sf-dir", help="driver sf dir — synthesises transcripts deterministically")
    ap.add_argument("--output", help="output parquet dir (omit = print summary only)")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--max-supersteps", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--checkpoint-every", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-retries", type=int, default=0,
                    help="automatic reload-from-checkpoint retries on failure")
    ap.add_argument("--rounds", type=int, default=5, help="LP rounds")
    ap.add_argument("--target-fraction", type=float, default=0.3,
                    help="graph_sample fill-rate quota")
    ap.add_argument("--source", type=int, default=0, help="SSSP/reachability source vertex")
    ap.add_argument("--target", type=int, default=None, help="reachability target vertex (default: max id)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # the job driver owns the session
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.algorithm == "corpus_pipeline":
        # document pipeline — runs over the documents table, no link graph
        from asterixdb_analytics_ray.pipelines.corpus import corpus_pipeline

        docs_path = args.input or os.path.join(
            args.sf_dir or "/root/testdata/sf0.001", "documents.parquet"
        )
        t0 = time.perf_counter()
        out = corpus_pipeline(ray.data.read_parquet(docs_path))
        if args.output:
            out.repartition(args.partitions).write_parquet(args.output)
            rows = ray.data.read_parquet(args.output).count()
        else:
            rows = out.count()
        print(
            json.dumps(
                {
                    "algorithm": "corpus_pipeline",
                    "input": docs_path,
                    "run_sec": round(time.perf_counter() - t0, 3),
                    "rows": rows,
                }
            )
        )
        return 0

    from asterixdb_analytics_ray.graph import build_link_graph

    if args.input:
        path = args.input
    else:
        from asterixdb_analytics_ray.sources.transcripts import ensure_transcripts

        path = ensure_transcripts(args.sf_dir or "/root/testdata/sf0.001")

    t0 = time.perf_counter()
    g = build_link_graph(ray.data.read_parquet(path))
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    summary: dict = {}
    result_table: pa.Table | None = None
    if args.algorithm in ("pagerank", "pagerank_sharded"):
        if args.algorithm == "pagerank_sharded":
            from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

            runner = ShardedPageRank(n=g.n_nodes, P=args.partitions)
            res = runner.run(
                g.directed().materialize(),
                g.out_degrees(),
                tol=args.tol,
                max_supersteps=args.max_supersteps,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=args.checkpoint_every if args.checkpoint_dir else None,
                resume=args.resume,
            )
        else:
            from asterixdb_analytics_ray.bsp import BSPConfig
            from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense

            cfg = BSPConfig(
                max_supersteps=args.max_supersteps,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=args.checkpoint_every,
                resume=args.resume,
            )
            res = pagerank_dense(
                g.directed().materialize(),
                g.n_nodes,
                g.out_degrees(),
                supersteps=args.max_supersteps,
                tol=args.tol,
                cfg=cfg,
            )
        result_table = pa.table(
            {"v": np.arange(g.n_nodes, dtype=np.int64), "rank": res.state["rank"]}
        )
        summary["supersteps"] = res.supersteps
    elif args.algorithm == "connected_components":
        from asterixdb_analytics_ray.pipelines.components import (
            connected_components_dense,
        )

        res = connected_components_dense(g.undirected().materialize(), g.n_nodes)
        result_table = pa.table(
            {
                "v": np.arange(g.n_nodes, dtype=np.int64),
                "component": res.state["label"],
            }
        )
        summary["rounds"] = len(res.rounds)
    elif args.algorithm == "label_propagation":
        from asterixdb_analytics_ray.pipelines.labelprop import (
            label_propagation_dense,
        )

        labels = label_propagation_dense(g.undirected().materialize(), g.n_nodes)
        result_table = pa.table(
            {"v": np.arange(g.n_nodes, dtype=np.int64), "label": labels}
        )
    elif args.algorithm == "cc_sharded":
        from asterixdb_analytics_ray.stages.sharded import ShardedMinLabel

        res = ShardedMinLabel(n=g.n_nodes, P=args.partitions).run(
            g.undirected().materialize(),
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else None,
            resume=args.resume,
            max_retries=args.max_retries,
        )
        result_table = pa.table(
            {
                "v": np.arange(g.n_nodes, dtype=np.int64),
                "component": res.state["label"],
            }
        )
        summary["rounds"] = len(res.rounds)
    elif args.algorithm == "lp_sharded":
        from asterixdb_analytics_ray.stages.sharded import ShardedLabelProp

        labels = ShardedLabelProp(n=g.n_nodes, P=args.partitions).run(
            g.undirected().materialize(),
            rounds=args.rounds,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else None,
            resume=args.resume,
            max_retries=args.max_retries,
        )
        result_table = pa.table(
            {"v": np.arange(g.n_nodes, dtype=np.int64), "label": labels}
        )
    elif args.algorithm == "sssp_sharded":
        from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

        res = ShardedSSSP(n=g.n_nodes, P=args.partitions, source=args.source).run(
            g.directed().materialize(),
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else None,
            resume=args.resume,
            max_retries=args.max_retries,
        )
        dist = res.state["dist"]
        finite = np.isfinite(dist)
        result_table = pa.table(
            {
                "v": np.arange(g.n_nodes, dtype=np.int64)[finite],
                "dist": dist[finite],
            }
        )
        summary["rounds"] = len(res.rounds)
    elif args.algorithm == "reachability":
        from asterixdb_analytics_ray.stages.sharded import ShardedReachability

        target = args.target if args.target is not None else g.n_nodes - 1
        found, res = ShardedReachability(
            n=g.n_nodes, P=args.partitions, source=args.source, dest=target
        ).run(g.directed().materialize())
        result_table = pa.table(
            {
                "source": pa.array([args.source], pa.int64()),
                "target": pa.array([target], pa.int64()),
                "reachable": pa.array([bool(found)], pa.bool_()),
            }
        )
        summary["rounds"] = len(res.rounds)
    elif args.algorithm == "triangle_count":
        from asterixdb_analytics_ray.pipelines.triangles import triangle_count

        per_vertex, total = triangle_count(g.oriented().materialize(), g.n_nodes)
        result_table = per_vertex.to_pandas().pipe(pa.Table.from_pandas)
        summary["total_triangles"] = total
    elif args.algorithm == "sssp":
        from asterixdb_analytics_ray.pipelines.sssp import sssp_dense

        res = sssp_dense(g.directed().materialize(), g.n_nodes, source=0)
        dist = res.state["dist"]
        finite = np.isfinite(dist)
        result_table = pa.table(
            {
                "v": np.arange(g.n_nodes, dtype=np.int64)[finite],
                "dist": dist[finite],
            }
        )
        summary["rounds"] = len(res.rounds)
    elif args.algorithm == "graph_sample":
        from asterixdb_analytics_ray.graph import undirected_from_oriented
        from asterixdb_analytics_ray.stages.sharded import ShardedSample

        und = undirected_from_oriented(g.oriented().materialize()).materialize()
        selected, sample_rounds = ShardedSample(
            n=g.n_nodes, P=args.partitions
        ).run(
            und,
            seeds=np.array([args.source]),
            target_fraction=args.target_fraction,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else None,
            resume=args.resume,
            max_retries=args.max_retries,
        )
        result_table = pa.table(
            {"v": np.flatnonzero(selected).astype(np.int64)}
        )
        summary["rounds"] = sample_rounds
        summary["fill_rate"] = round(float(selected.sum()) / g.n_nodes, 6)
    run_sec = time.perf_counter() - t0

    if args.output and result_table is not None:
        # partitioned output dir (resumable consumers skip finished parts)
        ray.data.from_arrow(result_table).repartition(
            args.partitions
        ).write_parquet(args.output)

    print(
        json.dumps(
            {
                "algorithm": args.algorithm,
                "n_nodes": g.n_nodes,
                "edge_build_sec": round(build_sec, 3),
                "run_sec": round(run_sec, 3),
                "rows": result_table.num_rows if result_table is not None else 0,
                **summary,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
