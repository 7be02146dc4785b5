"""Round-4 corpus/events operator scale audit (the BASELINE.md table).

Replicates the sf0.1 tables deterministically to production-ish row counts
(events 20× with user_id offsets → 2M events / 30k users; add --users-500k
to also spread user ids to ~500k so the as-of/range join hits the
many-small-groups regime the round-3 verdict flagged; documents 20× with
doc_id offsets and per-replica token mutation → 100k docs), then times each
operator once (untimed warmup pass first). Usage:

    RAY_GRAFT_CPUS=32 python tools/corpus_events_audit.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("GRAFT_AUDIT_REPS", "20"))
    only = set(sys.argv[1:])

    # --- replicated events: 20× rows, user ids spread ~500k ----------------
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    n_u = int(ev["user_id"].max()) + 1
    evs = []
    for r in range(reps):
        e = ev.copy()
        e["event_id"] = e["event_id"] + r * len(ev)
        # spread: each replica maps user u -> u*reps + r  (~500k distinct)
        e["user_id"] = e["user_id"] * reps + r
        e["ts"] = e["ts"] + pd.to_timedelta(r * 17, unit="s")
        evs.append(e)
    ev_big = pd.concat(evs, ignore_index=True)
    # split each user's stream into K interleaved sub-users so the audit hits
    # the many-small-groups regime (~500k distinct users, ~4 events each —
    # the shape that killed per-user map_groups in round 3)
    K = int(os.environ.get("GRAFT_AUDIT_USER_SPLIT", "17"))
    sub = ev_big.groupby("user_id").cumcount().to_numpy() % K
    ev_big["user_id"] = ev_big["user_id"].to_numpy() * K + sub
    n_events = len(ev_big)
    n_users = ev_big["user_id"].nunique()
    events = ray.data.from_pandas(ev_big).repartition(32).materialize()

    # --- replicated documents: 20× with token mutation ---------------------
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ds_ = []
    for r in range(reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * len(docs)
        if r:
            d["text"] = d["text"] + f" replica{r} marker{r}"
        ds_.append(d)
    docs_big = pd.concat(ds_, ignore_index=True)
    n_docs = len(docs_big)
    docs_ds = ray.data.from_pandas(docs_big).repartition(32).materialize()

    from asterixdb_analytics_ray.pipelines import corpus as C
    from asterixdb_analytics_ray.pipelines import events as EV
    from asterixdb_analytics_ray.pipelines import textops as T

    ops = {
        "asof_last_event": lambda: EV.asof_last_event(events),
        "range_join_counts": lambda: EV.range_join_counts(events),
        "sessionize": lambda: EV.sessionize(events),
        "session_ids": lambda: EV.session_ids(events),
        "language_id": lambda: T.language_id(docs_ds),
        "quality_scores": lambda: T.quality_scores(docs_ds),
        "lm_score": lambda: C.lm_score(docs_ds),
        "minhash_lsh_pairs": lambda: T.minhash_lsh_pairs(docs_ds, threshold=0.5),
        "exact_dedup": lambda: T.exact_dedup(docs_ds),
        "corpus_pipeline": lambda: C.corpus_pipeline(docs_ds),
    }

    warmup = os.environ.get("GRAFT_AUDIT_WARMUP", "1") != "0"
    out: dict[str, float] = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        if warmup:
            fn().materialize()  # untimed warmup (worker/import setup)
        t0 = time.perf_counter()
        res = fn().materialize()
        out[name] = round(time.perf_counter() - t0, 2)
        print(
            json.dumps({"op": name, "sec": out[name], "rows": res.count()}),
            flush=True,
        )

    print(
        json.dumps(
            {
                "audit": out,
                "n_events": n_events,
                "n_users": int(n_users),
                "n_docs": n_docs,
                "reps": reps,
                "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
