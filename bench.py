"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline = PageRank to convergence (tol 1e-6, reference formula) on the
transcript-derived link graph, reported with supersteps/sec and edges/sec.

``--scaling`` runs the same bench in two FRESH processes at num_cpus=8 and
num_cpus=32 on identical input (the sandbox evidence protocol for the
N vs 4N cluster-size gate) and prints throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data

    from asterixdb_analytics_ray.graph import build_link_graph
    from asterixdb_analytics_ray.pipelines.components import (
        connected_components_dense,
    )
    from asterixdb_analytics_ray.pipelines.labelprop import label_propagation_dense
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.pipelines.triangles import triangle_count
    from asterixdb_analytics_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts(SF_DIR)  # untimed: generator, cached
    # warm the page cache so we measure compute + shuffle, not first disk read
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass

    q: dict[str, float] = {}
    t0 = time.perf_counter()
    g = build_link_graph(ray.data.read_parquet(path))
    directed = g.directed().materialize()
    undirected = g.undirected().materialize()
    oriented = g.oriented().materialize()
    outdeg = g.out_degrees()
    q["edge_build"] = time.perf_counter() - t0

    n_edges = directed.count()

    t0 = time.perf_counter()
    pr = pagerank_dense(directed, g.n_nodes, outdeg, supersteps=50, tol=1e-6)
    q["pagerank"] = time.perf_counter() - t0
    pr_steps = len(pr.rounds)

    t0 = time.perf_counter()
    cc = connected_components_dense(undirected, g.n_nodes)
    q["connected_components"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    label_propagation_dense(undirected, g.n_nodes, rounds=5)
    q["label_propagation"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, total_tri = triangle_count(oriented, g.n_nodes)
    q["triangle_count"] = time.perf_counter() - t0

    value = q["pagerank"]
    return {
        "metric": "pagerank_convergence_sec",
        "value": round(value, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_nodes": g.n_nodes,
        "n_edges": n_edges,
        "pr_supersteps": pr_steps,
        "supersteps_per_sec": round(pr_steps / value, 3),
        "edges_per_sec": round(pr_steps * n_edges / value, 1),
        "cc_rounds": len(cc.rounds),
        "triangles": total_tri,
    }


def run_scaling() -> dict:
    """Same input, fresh processes at 8 and 32 CPUs → scaling efficiency."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    thr_lo = r_lo["edges_per_sec"]
    thr_hi = r_hi["edges_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "edges_per_sec_lo": thr_lo,
        "edges_per_sec_hi": thr_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
