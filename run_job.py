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
            "spectral",
            "coloring",
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
    # corpus_pipeline stage flags (defaults = the oracle-checked driver config)
    ap.add_argument("--near-threshold", type=float, default=0.5,
                    help="corpus: MinHash near-dup jaccard threshold")
    ap.add_argument("--eval-max-doc-id", type=int, default=5,
                    help="corpus: doc_id < N forms the eval/decontamination set")
    ap.add_argument("--contam-threshold", type=float, default=0.5,
                    help="corpus: eval-shingle overlap fraction that drops a doc")
    ap.add_argument("--min-quality", type=float, default=12.0,
                    help="corpus: heuristic quality-score floor")
    ap.add_argument("--sample-rate", type=float, default=0.5,
                    help="corpus: deterministic doc_id-hash sample rate")
    ap.add_argument("--min-lm-score", type=float, default=None,
                    help="corpus: optional unigram-LM score floor "
                    "(corpus-wide token stats; adds an lm_score column)")
    ap.add_argument("--max-dup-fraction", type=float, default=None,
                    help="corpus: optional within-doc repetition ceiling "
                    "(Gopher-style dup_fraction; docs with zero k-grams pass)")
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
        # document pipeline — runs over the documents table, no link graph.
        # Kill/resume: the pipeline has exactly two materialization barriers
        # (the exact-dedup survivor set and the near-dup drop table, see
        # corpus_pipeline's docstring); a killed run restarts from the
        # source parquet — both barriers are deterministic pure functions of
        # the input, so a re-run reproduces them bit-identically, and the
        # partitioned Parquet sink below lets resumable CONSUMERS skip
        # finished output parts.
        from asterixdb_analytics_ray.pipelines.corpus import (
            corpus_pipeline,
            lm_score,
        )

        docs_path = args.input or os.path.join(
            args.sf_dir or "/root/testdata/sf0.001", "documents.parquet"
        )
        t0 = time.perf_counter()
        docs = ray.data.read_parquet(docs_path)
        out = corpus_pipeline(
            docs,
            near_threshold=args.near_threshold,
            eval_max_doc_id=args.eval_max_doc_id,
            contam_threshold=args.contam_threshold,
            min_quality=args.min_quality,
            sample_rate=args.sample_rate,
        )
        summary: dict = {}
        if args.min_lm_score is not None or args.max_dup_fraction is not None:
            from asterixdb_analytics_ray.stages.blocks import (
                partitions_for,
                safe_join,
            )

            out = out.materialize()
            P_g = partitions_for(out.count())
            if args.min_lm_score is not None:
                # unigram-LM stats are corpus-wide by definition; the gate
                # joins only the PASSING ids to the survivors (inner join)
                lm = (
                    lm_score(docs)
                    .filter(expr=f"lm_score >= {args.min_lm_score}")
                    .select_columns(["doc_id", "lm_score"])
                )
                out = safe_join(out, lm, "inner", P_g, on=("doc_id",))
                summary["min_lm_score"] = args.min_lm_score
            if args.max_dup_fraction is not None:
                from asterixdb_analytics_ray.pipelines.textops import (
                    repetition_scores,
                )

                # anti-join on FAILURES: docs with zero k-grams are absent
                # from repetition_scores and must pass the gate
                import pandas as pd

                fails = (
                    repetition_scores(docs)
                    .filter(expr=f"dup_fraction > {args.max_dup_fraction}")
                    .map_batches(
                        lambda df: pd.DataFrame(
                            {
                                "doc_id": df["doc_id"].to_numpy(np.int64),
                                "_rep": np.ones(len(df), dtype=np.int8),
                            }
                        ),
                        batch_format="pandas",
                    )
                    .materialize()
                )
                if fails.count() > 0:
                    out = safe_join(
                        out, fails, "left_outer", P_g, on=("doc_id",)
                    ).map_batches(
                        lambda df: df[df["_rep"].isna()].drop(columns=["_rep"]),
                        batch_format="pandas",
                    )
                summary["max_dup_fraction"] = args.max_dup_fraction
        if args.output:
            # partitioned output dir (resumable consumers skip finished parts)
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
                    **summary,
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
    elif args.algorithm == "spectral":
        from asterixdb_analytics_ray.graph import undirected_from_oriented
        from asterixdb_analytics_ray.pipelines.spectral import spectral_scores

        und = undirected_from_oriented(g.oriented().materialize()).materialize()
        result_table = spectral_scores(und, g.n_nodes)
    elif args.algorithm == "coloring":
        from asterixdb_analytics_ray.graph import undirected_from_oriented
        from asterixdb_analytics_ray.pipelines.coloring import coloring_table

        und = undirected_from_oriented(g.oriented().materialize()).materialize()
        result_table = coloring_table(und, g.n_nodes)
        colors = result_table["color"].to_numpy()
        summary["n_colors"] = int(colors.max())
        summary["uncolored"] = int((colors < 0).sum())
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
