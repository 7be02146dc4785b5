"""Event-stream operators — windowed aggregates and as-of joins.

Two operators a training-data / telemetry pipeline needs that Ray Data has
no built-in for, expressed Ray-Data-first:

* ``windowed_counts`` — tumbling-window aggregate: the window id is a pure
  per-row function of the timestamp (``epoch_us // width``), so the whole
  operator is one ``map_batches`` projection + one hash-shuffle aggregate —
  no sessionization state, no ordering requirement, arbitrarily parallel.

* ``asof_last_event`` / ``range_join_counts`` — per-key as-of / banded
  range joins.  Partitioning assumption (documented per the
  custom-operator contract): rows are hash-grouped by ``user_id %
  n_buckets`` — one task handles MANY keys, and the per-key lookup is a
  single global ``searchsorted`` over a dense-rank composite key
  ``user_idx · M + ts_rank`` (M = distinct timestamps in the bucket + 1),
  so there is exactly ONE Python UDF call per bucket, never per key (the
  many-small-groups cost the reference avoids with sorted streaming
  group-bys, ``jobgen/JobGen.java:1124-1215``; the same bucket transform
  took this repo's sessionize from 12.5 s to 2.3 s).  Composite keys stay
  int64-exact while a bucket holds < ~3e9 rows (keys are bounded by
  bucket_users · (bucket_distinct_ts + 1) ≤ rows²) — at 100 TB, raise
  ``n_buckets`` so buckets stay under that.  Ties (equal timestamps)
  resolve identically to DuckDB's ``ASOF JOIN`` (``>=`` match, then max
  event id among equal-ts candidates, via the (key, event_id) lexsort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def windowed_counts(
    events: ray.data.Dataset, window_us: int = 3_600_000_000
) -> ray.data.Dataset:
    """Tumbling-window per-type aggregate over the events stream.

    → (window_us: int64 epoch-µs window start, event_type, n: int64,
    sum_value: float64 rounded to 6).  The window id is computed per batch
    (zero-copy Arrow), the aggregate is the one wide shuffle.
    """
    from ray.data.aggregate import Count, Sum

    w = np.int64(window_us)

    def bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()  # timestamp[us] → epoch µs
        return pa.table(
            {
                "window_us": (ts // w) * w,
                "event_type": t["event_type"],
                "value": t["value"],
            }
        )

    agg = (
        events.map_batches(bucket, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": t["window_us"],
                "event_type": t["event_type"],
                "n": t["n"],
                "sum_value": np.round(t["sum_value"].to_numpy(), 6),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_N_BUCKETS = np.int64(256)


def _tag_and_bucket(left_type: str, right_type: str):
    """Batch projector: keep the two event types, epoch-µs timestamps,
    left/right flag, and the ``user_id % _N_BUCKETS`` shuffle key."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(keep)
        uid = t["user_id"].cast(pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "event_id": t["event_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "is_left": pc.equal(t["event_type"], left_type),
                "bucket": pc.bit_wise_and(uid, np.int64(_N_BUCKETS - 1)),
            }
        )

    return tag


def _composite_keys(
    uid: np.ndarray, tsu: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.int64]:
    """Dense-rank composite key machinery for one bucket: returns
    (sorted unique users, sorted unique timestamps, M) such that
    ``user_idx · M + ts_rank`` orders rows lexicographically by
    (user, ts) with keys strictly stratified per user (ts_rank < M)."""
    users = np.unique(uid)
    uniq_ts = np.unique(tsu)
    return users, uniq_ts, np.int64(len(uniq_ts) + 1)


def asof_last_event(
    events: ray.data.Dataset,
    left_type: str = "error",
    right_type: str = "click",
) -> ray.data.Dataset:
    """For each ``left_type`` event, the most recent ``right_type`` event by
    the same user at or before its timestamp (−1 when none).

    → (event_id, prev_event_id: int64, lag_sec: float64 rounded to 6;
    lag −1.0 when unmatched).  One hash shuffle on ``user_id % 256``; each
    bucket resolves ALL of its users in one vectorized pass — rights
    lexsorted by (composite key, event_id), lefts answered by a single
    ``searchsorted`` (see module docstring for the composite-key contract).
    """

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["is_left"].to_numpy(dtype=bool)
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        tsu = g["ts_us"].to_numpy(np.int64)
        lid, lts, lu = eid[is_l], tsu[is_l], uid[is_l]
        if len(lid) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "prev_event_id": pd.Series([], dtype=np.int64),
                    "lag_sec": pd.Series([], dtype=np.float64),
                }
            )
        prev = np.full(len(lid), -1, dtype=np.int64)
        lag = np.full(len(lid), -1.0)
        rid, rts, ru = eid[~is_l], tsu[~is_l], uid[~is_l]
        if len(rid):
            users, uniq_ts, M = _composite_keys(uid, tsu)
            r_key = (
                np.searchsorted(users, ru).astype(np.int64) * M
                + np.searchsorted(uniq_ts, rts)
            )
            # (key, event_id) lexsort: equal-ts candidates resolve to the
            # max event id, matching the SQL oracle's ASOF tie-break
            order = np.lexsort((rid, r_key))
            r_key, rid, rts = r_key[order], rid[order], rts[order]
            l_uidx = np.searchsorted(users, lu).astype(np.int64)
            l_key = l_uidx * M + np.searchsorted(uniq_ts, lts)
            pos = np.searchsorted(r_key, l_key, side="right") - 1
            safe = np.maximum(pos, 0)
            hit = (pos >= 0) & (r_key[safe] // M == l_uidx)
            prev[hit] = rid[pos[hit]]
            lag[hit] = np.round((lts[hit] - rts[pos[hit]]) / 1e6, 6)
        return pd.DataFrame(
            {"event_id": lid, "prev_event_id": prev, "lag_sec": lag}
        )

    return (
        events.map_batches(
            _tag_and_bucket(left_type, right_type), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


def range_join_counts(
    events: ray.data.Dataset,
    left_type: str = "error",
    right_type: str = "click",
    window_us: int = 3_600_000_000,
) -> ray.data.Dataset:
    """Banded range join: for each ``left_type`` event, the COUNT of
    ``right_type`` events by the same user within ``[ts − window, ts]``
    (inclusive).  Same bucketed composite-key contract as
    ``asof_last_event`` (one vectorized UDF call per user-bucket, never per
    key); the per-key band count is the difference of two global
    ``searchsorted`` calls — the upper bound at rank(ts) side-right counts
    same-user rights with ts ≤ left.ts, the lower at rank(ts − w)
    side-left counts those with ts < left.ts − w, and every other user's
    keys cancel because both bounds sit in the same ``user_idx · M``
    stratum.  The equivalent SQL is the inequality join the oracle runs.
    → (event_id, n_prior: int64)."""
    w = np.int64(window_us)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["is_left"].to_numpy(dtype=bool)
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        tsu = g["ts_us"].to_numpy(np.int64)
        lid, lts, lu = eid[is_l], tsu[is_l], uid[is_l]
        if len(lid) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "n_prior": pd.Series([], dtype=np.int64),
                }
            )
        n = np.zeros(len(lid), dtype=np.int64)
        rts, ru = tsu[~is_l], uid[~is_l]
        if len(rts):
            users, uniq_ts, M = _composite_keys(uid, tsu)
            r_key = np.sort(
                np.searchsorted(users, ru).astype(np.int64) * M
                + np.searchsorted(uniq_ts, rts)
            )
            l_base = np.searchsorted(users, lu).astype(np.int64) * M
            hi = l_base + np.searchsorted(uniq_ts, lts, side="left")
            lo = l_base + np.searchsorted(uniq_ts, lts - w, side="left")
            n = np.searchsorted(r_key, hi, side="right") - np.searchsorted(
                r_key, lo, side="left"
            )
        return pd.DataFrame({"event_id": lid, "n_prior": n})

    return (
        events.map_batches(
            _tag_and_bucket(left_type, right_type), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
    )


def funnel_stages(
    events: ray.data.Dataset,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> ray.data.Dataset:
    """Ordered-funnel analysis: per user, the furthest stage reached with
    first-touch semantics — t1 = first ``stages[0]`` event, t2 = first
    ``stages[1]`` STRICTLY after t1, t3 = first ``stages[2]`` strictly
    after t2 (the standard conversion-funnel definition).

    → (user_id: int64, funnel_stage: int64 in 1..3) for every user with at
    least one ``stages[0]`` event.

    Same bucket contract as ``sessionize``: one hash shuffle on
    ``user_id % 256``; a user's events land wholly in one bucket, and each
    bucket resolves ALL of its users with three vectorized
    groupby-min/map passes — no per-user Python."""
    n_buckets = np.int64(256)
    s_idx = {s: i for i, s in enumerate(stages)}

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["event_type"].isin(list(stages))
        df = df[keep]
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "tsu": df["ts"].astype("int64").to_numpy(),
                "stage": df["event_type"].map(s_idx).to_numpy(np.int64),
            }
        )
        out["bucket"] = out["user_id"] % n_buckets
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t1 = df[df["stage"] == 0].groupby("user_id")["tsu"].min()
        s2 = df[df["stage"] == 1].copy()
        s2["t_prev"] = s2["user_id"].map(t1)
        t2 = (
            s2[s2["tsu"] > s2["t_prev"]].groupby("user_id")["tsu"].min()
        )
        s3 = df[df["stage"] == 2].copy()
        s3["t_prev"] = s3["user_id"].map(t2)
        t3 = (
            s3[s3["tsu"] > s3["t_prev"]].groupby("user_id")["tsu"].min()
        )
        users = t1.index.to_numpy(np.int64)
        stage = (
            1
            + np.isin(users, t2.index.to_numpy(np.int64)).astype(np.int64)
            + np.isin(users, t3.index.to_numpy(np.int64)).astype(np.int64)
        )
        return pd.DataFrame({"user_id": users, "funnel_stage": stage})

    return (
        events.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def top_events_per_user(
    events: ray.data.Dataset, k: int = 3
) -> ray.data.Dataset:
    """Distributed per-key top-k: each user's ``k`` highest-value events,
    ranked 1..k (ties broken by smaller event_id — fully deterministic).

    → (user_id: int64, event_id: int64, value: float64, rn: int64).

    Scale shape: each input batch is pruned to ≤k rows per user BEFORE the
    shuffle (the standard top-k combiner), so the ``user_id % 256`` bucket
    exchange carries at most k·|users| rows regardless of event volume;
    each bucket then re-ranks its survivors with one lexsort."""
    n_buckets = np.int64(256)

    def _topk(df: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
        """Rows sorted (user asc, value desc, event_id asc) + within-user
        rank, truncated to rank < k. Pure numpy, no per-user loop."""
        u = df["user_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        e = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, -v, u))
        u, v, e = u[order], v[order], e[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        rank = np.arange(len(u), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(u)])))
        )
        keep = rank < k
        out = pd.DataFrame(
            {"user_id": u[keep], "event_id": e[keep], "value": v[keep]}
        )
        return out, rank[keep]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        out, _ = _topk(df)
        out["bucket"] = out["user_id"] % n_buckets
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out, rank = _topk(df)
        out["rn"] = rank + 1
        return out

    return (
        events.map_batches(prune, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


_DAY_US = np.int64(86_400_000_000)


def retention_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """Cohort retention: cohort = a user's first-activity day (epoch days),
    and for each (cohort_day, day_offset) the number of DISTINCT users from
    that cohort active ``offset`` days after their first day.

    → (cohort_day: int64, day_offset: int64 ≥ 0, n_users: int64).

    Per-batch (user, day) dedup shrinks the shuffle to active-user-days;
    the ``user_id % 256`` bucket groupby sees each user whole, so bucket
    counts are exact partials and the closing (cohort, offset) groupby-sum
    touches only cohort-cells — bounded by days², independent of events."""
    from ray.data.aggregate import Sum

    n_buckets = np.int64(256)

    def days(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64())
        day = pa.compute.divide(t["ts"].cast(pa.int64()), _DAY_US)
        out = pa.table({"user_id": uid, "day": day}).group_by(
            ["user_id", "day"]
        ).aggregate([])
        bucket = pa.compute.bit_wise_and(
            out["user_id"], np.int64(n_buckets - 1)
        )
        return out.append_column("bucket", bucket)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"])
        first = df.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": first.to_numpy(np.int64),
                "day_offset": (df["day"] - first).to_numpy(np.int64),
            }
        )
        cells = out.groupby(["cohort_day", "day_offset"]).size()
        res = cells.reset_index(name="n")
        res["n"] = res["n"].astype(np.int64)
        return res

    return (
        events.map_batches(days, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


def sessionize(
    events: ray.data.Dataset, gap_us: int = 1_800_000_000
) -> ray.data.Dataset:
    """Gap-based sessionization: split each user's event stream into
    sessions wherever consecutive events are more than ``gap_us`` apart.

    → (user_id, session_id: int64 0-based per user, n_events: int64,
    start_us, end_us: int64 epoch-µs).

    Partitioning assumption (same contract as ``asof_last_event``): rows
    hash-group by user — bucketed so one task handles MANY users
    vectorized (one UDF call per user-bucket, not per user; session breaks
    fall out of one sorted diff over the whole bucket with user-change
    flags). Correct for any data, efficient while a bucket's events fit a
    task. Ordering inside a user is (ts, event_id) so equal timestamps
    break ties identically to the SQL oracle's window ORDER BY.
    """
    g = np.int64(gap_us)
    n_buckets = np.int64(256)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "tsu": df["ts"].astype("int64").to_numpy(),
            }
        )
        out["bucket"] = out["user_id"] % n_buckets
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tsu", "event_id"])
        uid = df["user_id"].to_numpy()
        ts = df["tsu"].to_numpy()
        new = np.ones(len(ts), dtype=np.int64)
        new[1:] = ((uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > g)).astype(np.int64)
        run = np.cumsum(new) - 1  # global session run id within the bucket
        out = pd.DataFrame({"user_id": uid, "run": run, "ts": ts})
        agg = out.groupby("run", sort=False).agg(
            user_id=("user_id", "first"),
            n_events=("ts", "size"),
            start_us=("ts", "min"),
            end_us=("ts", "max"),
        )
        # renumber runs 0-based per user (runs are already in user order)
        sid = agg.groupby("user_id").cumcount()
        agg = agg.reset_index(drop=True)
        agg["session_id"] = sid.to_numpy()
        cols = ["user_id", "session_id", "n_events", "start_us", "end_us"]
        agg = agg[cols]
        for c in cols:
            agg[c] = agg[c].astype(np.int64)
        return agg

    return (
        events.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def session_ids(
    events: ray.data.Dataset, gap_us: int = 1_800_000_000
) -> ray.data.Dataset:
    """Per-event session ASSIGNMENT — the (event_id → session_id) map a
    training pipeline joins features back through, from the same bucket
    kernel as ``sessionize`` (one vectorized UDF call per user-bucket).

    → (user_id, event_id: int64, session_id: int64 0-based per user,
    ordered by (ts, event_id) within the user — ties break identically to
    the SQL oracle's window ORDER BY).
    """
    g = np.int64(gap_us)
    n_buckets = np.int64(256)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "tsu": df["ts"].astype("int64").to_numpy(),
            }
        )
        out["bucket"] = out["user_id"] % n_buckets
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tsu", "event_id"])
        uid = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        ts = df["tsu"].to_numpy()
        n = len(ts)
        new = np.ones(n, dtype=np.int64)
        new[1:] = ((uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > g)).astype(
            np.int64
        )
        run = np.cumsum(new) - 1  # global session run id within the bucket
        # session_id = run − (run at the user's first row): rows are sorted
        # by user, so the index of each row's user-start is the running max
        # of user-change positions
        user_start = np.zeros(n, dtype=np.int64)
        user_start[1:] = np.where(uid[1:] != uid[:-1], np.arange(1, n), 0)
        user_start = np.maximum.accumulate(user_start)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": eid,
                "session_id": run - run[user_start],
            }
        )

    return (
        events.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_value_quantiles(
    events: ray.data.Dataset, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> pd.DataFrame:
    """Exact per-type value quantiles (discrete lower-quantile: smallest
    value whose cumulative count reaches ceil(q·n)) — the
    ``corpus.length_quantiles`` bounded-histogram shape over events.

    → (event_type, p25, p50, p75, p95). Exactness without a sort: the
    stream reduces to an (event_type, value) histogram (per-batch partial
    counts → one small groupby — the generator's 2-decimal values keep
    distinct keys bounded), and the quantile picks return the stored
    doubles bit-identically (no arithmetic on the values at all)."""
    import math

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = (
            df.groupby(["event_type", "value"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        counts["n"] = counts["n"].astype(np.int64)
        return counts

    hist = (
        events.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "value"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["value"].to_numpy(np.float64)
        row = {"event_type": etype}
        for q in qs:
            target = math.ceil(q * total)
            row[f"p{int(round(q * 100))}"] = float(
                vals[int(np.searchsorted(cum, target))]
            )
        rows.append(row)
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


def sliding_counts(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
) -> ray.data.Dataset:
    """SLIDING-window per-type aggregate (window width > hop ⇒ overlapping
    windows — the streaming-window shape ``windowed_counts`` can't express).

    → (window_us: int64 window START in epoch-µs, event_type, n: int64,
    sum_value: float64 rounded to 6) for every window [start, start+width)
    with start on the hop grid that contains ≥1 event.

    Each event lands in exactly ``ceil(width/hop)`` windows: the per-batch
    projection np.repeats rows onto their window starts (vectorized — the
    expansion factor is the overlap ratio, a constant), then ONE shuffle
    aggregates; no ordering requirement, arbitrarily parallel."""
    from ray.data.aggregate import Count, Sum

    w = np.int64(window_us)
    h = np.int64(hop_us)
    k = int((window_us + hop_us - 1) // hop_us)  # windows per event

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        n = len(ts)
        if n == 0:
            return pa.table(
                {
                    "window_us": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        # last grid start covering ts is (ts // h) * h; walk k hops back
        last = (ts // h) * h
        starts = np.repeat(last, k) - np.tile(
            np.arange(k, dtype=np.int64) * h, n
        )
        rows = np.repeat(np.arange(n), k)
        keep = np.repeat(ts, k) < starts + w  # start ≤ ts always holds
        keep &= starts >= 0
        return pa.table(
            {
                "window_us": starts[keep],
                "event_type": t["event_type"].take(pa.array(rows[keep])),
                "value": t["value"].take(pa.array(rows[keep])),
            }
        )

    agg = (
        events.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": t["window_us"],
                "event_type": t["event_type"],
                "n": t["n"],
                "sum_value": np.round(t["sum_value"].to_numpy(), 6),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def user_profiles(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user activity profile — the feature-table build step:
    → (user_id, n_events, n_types, sum_value rounded 6, first_us, last_us).

    Same bucket contract as ``sessionize``: one ``user_id % 256`` hash
    shuffle; each bucket resolves ALL of its users with one vectorized
    pandas groupby (count / nunique / sum / min / max). sum_value rounds
    at 6 decimals (block-order summation tolerance, the windowed_counts
    precedent)."""
    n_buckets = np.int64(256)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "ts_us": t["ts"].cast(pa.int64()),
                "event_type": t["event_type"],
                "value": t["value"],
                "bucket": pa.compute.bit_wise_and(uid, np.int64(n_buckets - 1)),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")
        out = pd.DataFrame(
            {
                "n_events": g.size().astype(np.int64),
                "n_types": g["event_type"].nunique().astype(np.int64),
                "sum_value": g["value"].sum().round(6),
                "first_us": g["ts_us"].min().astype(np.int64),
                "last_us": g["ts_us"].max().astype(np.int64),
            }
        ).reset_index()
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    return (
        events.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def window_anomalies(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
    z_threshold: float = 2.0,
) -> ray.data.Dataset:
    """Volume-anomaly detection: tumbling windows whose per-type event
    count deviates ≥ ``z_threshold`` population z-scores from that type's
    mean across OBSERVED windows (empty windows don't exist in the stream
    and are excluded on both sides by construction).

    → (window_us, event_type, n, z rounded 1e-6).

    The stream reduces to the ``windowed_counts`` table (windows × types
    rows); each type's two-pass mean/σ close runs inside one
    ``map_groups`` over that bounded table. μ and every per-window
    deviation are exact-integer-derived doubles; only the Σ(n−μ)²
    accumulation order differs from SQL, absorbed by the 1e-6 grid."""
    from ray.data.aggregate import Count

    w = np.int64(window_us)

    def bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {"window_us": (ts // w) * w, "event_type": t["event_type"]}
        )

    wc = (
        events.map_batches(bucket, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Count(alias_name="n"))
    )

    from ..functions.fasthash import round_like_sql

    def close(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        cnt = len(n)
        mu = float(n.sum()) / cnt  # exact int in double / count
        sd = np.sqrt(((n - mu) ** 2).sum() / cnt)
        if sd == 0.0:
            # constant series: no deviation ⇒ no anomaly (and the SQL
            # side's x/0.0 is NULL, which its >= filter likewise drops)
            return pd.DataFrame(
                {
                    "window_us": pd.Series([], dtype=np.int64),
                    "event_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                    "z": pd.Series([], dtype=np.float64),
                }
            )
        z = (n - mu) / sd
        keep = np.abs(z) >= z_threshold
        return pd.DataFrame(
            {
                "window_us": g["window_us"].to_numpy(np.int64)[keep],
                "event_type": g["event_type"].to_numpy()[keep],
                "n": n[keep],
                "z": round_like_sql(z[keep], 6),
            }
        )

    return wc.groupby("event_type").map_groups(close, batch_format="pandas")


def gap_stats(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user inter-arrival statistics — the burstiness/engagement
    feature: → (user_id, n_gaps, mean_gap_us rounded 6, max_gap_us) for
    users with ≥2 events.

    Same bucket contract as ``sessionize``; each bucket sorts its users'
    timestamps once and the gap aggregation is one vectorized pandas
    groupby. Σgap and every gap are exact int64 microseconds, so the one
    closing mean division matches the oracle bit-for-bit before the
    half-away round."""
    from ..functions.fasthash import round_like_sql

    n_buckets = np.int64(256)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "tsu": t["ts"].cast(pa.int64()),
                "bucket": pa.compute.bit_wise_and(uid, np.int64(n_buckets - 1)),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "tsu"])
        gap = s.groupby("user_id")["tsu"].diff()
        s = s.assign(gap=gap).dropna(subset=["gap"])
        if not len(s):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "mean_gap_us": pd.Series([], dtype=np.float64),
                    "max_gap_us": pd.Series([], dtype=np.int64),
                }
            )
        g = s.groupby("user_id")["gap"]
        cnt = g.size().to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "user_id": g.size().index.to_numpy(np.int64),
                "n_gaps": cnt,
                "mean_gap_us": round_like_sql(
                    g.sum().to_numpy(np.float64) / cnt.astype(np.float64), 6
                ),
                "max_gap_us": g.max().to_numpy(np.int64),
            }
        )
        return out

    return (
        events.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def transition_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """First-order Markov transition counts over each user's event-type
    sequence: → (from_type, to_type, n) for consecutive events ordered by
    (ts, event_id) within a user.

    One ``user_id % 256`` bucket shuffle; each bucket lexsorts once,
    pairs adjacent rows within user runs, and pre-aggregates its
    (from, to) counts, so the closing groupby touches ≤ types² rows per
    bucket — integer-exact everywhere."""
    from ray.data.aggregate import Sum

    n_buckets = np.int64(256)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "tsu": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "bucket": pa.compute.bit_wise_and(uid, np.int64(n_buckets - 1)),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                df["event_id"].to_numpy(np.int64),
                df["tsu"].to_numpy(np.int64),
                df["user_id"].to_numpy(np.int64),
            )
        )
        u = df["user_id"].to_numpy(np.int64)[order]
        et = df["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        out = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        g = out.groupby(["from_type", "to_type"], sort=False).size()
        res = g.reset_index(name="n")
        res["n"] = res["n"].astype(np.int64)
        return res

    return (
        events.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def rolling_active_users(
    events: ray.data.Dataset, window_days: int = 7
) -> ray.data.Dataset:
    """Rolling WAU: for every epoch day with ≥1 event, the number of
    DISTINCT users active in the ``window_days``-day window ending that
    day — the growth-dashboard metric.

    Per-batch (user, day) dedup → vectorized expansion onto the ≤W
    covering window-end days → global (day, user) distinct via the
    ``user_id % 256`` bucket groupby (exact partials: a user's rows land
    whole) → one days-bounded count close. Window-end days with no event
    ON them are excluded on both sides (observed-day semantics)."""
    from ray.data.aggregate import Sum

    n_buckets = np.int64(256)
    W = int(window_days)

    def expand(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64())
        day = pa.compute.divide(t["ts"].cast(pa.int64()), _DAY_US)
        ud = (
            pa.table({"user_id": uid, "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        u = ud["user_id"].to_numpy()
        d = ud["day"].to_numpy()
        n = len(u)
        ends = np.repeat(d, W) + np.tile(np.arange(W, dtype=np.int64), n)
        uu = np.repeat(u, W)
        out = pa.table({"user_id": uu, "end_day": ends})
        out = out.group_by(["user_id", "end_day"]).aggregate([])
        bucket = pa.compute.bit_wise_and(
            out["user_id"], np.int64(n_buckets - 1)
        )
        return out.append_column("bucket", bucket)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["user_id", "end_day"]).groupby("end_day")
        res = g.size().reset_index(name="n")
        res["n"] = res["n"].astype(np.int64)
        res["end_day"] = res["end_day"].astype(np.int64)
        return res

    counts = (
        events.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("end_day")
        .aggregate(Sum("n", alias_name="wau"))
    )

    # keep only OBSERVED days (an event on that very day), exactly as the
    # oracle's day list — a small distinct-day broadcast
    def obs_days(t: pa.Table) -> pa.Table:
        day = pa.compute.divide(t["ts"].cast(pa.int64()), _DAY_US)
        return pa.table({"day": day}).group_by(["day"]).aggregate([])

    days = (
        events.map_batches(obs_days, batch_format="pyarrow")
        .groupby("day")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .to_pandas()["day"]
        .to_numpy(np.int64)
    )
    dref = ray.put(np.sort(days))

    def keep_observed(t: pa.Table) -> pa.Table:
        obs = ray.get(dref)
        ends = t["end_day"].to_numpy()
        idx = np.searchsorted(obs, ends)
        idx[idx == len(obs)] = 0
        m = obs[idx] == ends
        return pa.table(
            {
                "day": ends[m].astype(np.int64),
                "wau": t["wau"].to_numpy()[m].astype(np.int64),
            }
        )

    return counts.map_batches(keep_observed, batch_format="pyarrow")


def session_type_pairs(
    events: ray.data.Dataset, gap_us: int = 1_800_000_000
) -> ray.data.Dataset:
    """Market-basket co-occurrence over sessions: for every unordered
    event-type pair (a < b), the number of sessions containing BOTH —
    the association-mining primitive (support counts).

    → (type_a, type_b, n). Same session-break kernel and bucket contract
    as ``sessionize``; each bucket dedups (session, type) and self-joins
    per session (sessions hold ≤ |types| distinct types, so the join is
    tiny), emitting per-bucket partial counts — the closing groupby
    touches ≤ types² rows per bucket. Integer-exact."""
    from ray.data.aggregate import Sum

    g = np.int64(gap_us)
    n_buckets = np.int64(256)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "tsu": df["ts"].astype("int64").to_numpy(),
                "event_type": df["event_type"].to_numpy(),
            }
        )
        out["bucket"] = out["user_id"] % n_buckets
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tsu", "event_id"])
        uid = df["user_id"].to_numpy()
        ts = df["tsu"].to_numpy()
        new = np.ones(len(ts), dtype=np.int64)
        new[1:] = ((uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > g)).astype(
            np.int64
        )
        run = np.cumsum(new) - 1
        st = pd.DataFrame(
            {"run": run, "t": df["event_type"].to_numpy()}
        ).drop_duplicates()
        pairs = st.merge(st, on="run")
        pairs = pairs[pairs["t_x"] < pairs["t_y"]]
        res = (
            pairs.groupby(["t_x", "t_y"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"t_x": "type_a", "t_y": "type_b"})
        )
        res["n"] = res["n"].astype(np.int64)
        return res

    return (
        events.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n"))
    )


def props_rollup(events: ray.data.Dataset) -> ray.data.Dataset:
    """Semi-structured extraction — the AsterixDB-flavored operator: parse
    the ``props`` JSON column, extract the integer field ``k``, and roll
    it up per event type.

    → (event_type, n: int64 rows with a k field, sum_k, min_k, max_k:
    int64). Extraction is one vectorized regex over the whole batch
    (``Series.str.extract`` — no per-row json.loads in the hot path; the
    pattern accepts arbitrary whitespace and key order around the field,
    which is all the JSON variation the column carries). Rows without a
    parseable ``k`` are dropped on both sides (SQL json_extract NULL).
    Integer-exact everywhere."""
    from ray.data.aggregate import Max, Min, Sum

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        ok = k.notna()
        out = pd.DataFrame(
            {
                "event_type": df["event_type"][ok],
                "k": k[ok].astype(np.int64),
            }
        )
        # per-batch partial: one row per (type) with local sufficient stats
        g = (
            out.groupby("event_type", sort=False)["k"]
            .agg(n="size", sum_k="sum", min_k="min", max_k="max")
            .reset_index()
        )
        for c in ["n", "sum_k", "min_k", "max_k"]:
            g[c] = g[c].astype(np.int64)
        return g

    return (
        events.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def heavy_hitters(
    events: ray.data.Dataset,
    col: str = "user_id",
    k: int = 200,
) -> ray.data.Dataset:
    """EXACT φ-heavy hitters: the keys whose frequency strictly exceeds
    N/k, with their exact counts — found WITHOUT a full-corpus groupby via
    the classic two-pass candidate scheme (Misra–Gries / SpaceSaving
    family; the candidate rule below is its block-local specialization).

    → (``col``, n: int64), the true heavy hitters only.

    1. candidate pass — each block emits the keys whose LOCAL count
       exceeds n_block/k (< k keys per block). Superset guarantee is the
       pigeonhole argument: c(x) > N/k with c_b(x) ≤ N_b/k for every
       block would sum to c(x) ≤ N/k — so every global heavy hitter is a
       local one somewhere. Candidates are ≤ k·n_blocks total (vs the
       corpus's unbounded distinct keys), collected and broadcast once.
    2. exact pass — per-batch counts restricted to the broadcast
       candidate set (an ``isin`` mask, never a full value_counts) →
       candidates-bounded groupby → strict ``n·k > N`` filter drops the
       false positives.

    The full-groupby alternative ships every distinct key through the
    shuffle; here the exchange carries ≤ candidates per block. Ties at
    exactly N/k are excluded (strict >), mirroring the SQL HAVING."""
    from ray.data.aggregate import Sum

    total = int(events.count())

    def local_hh(t: pa.Table) -> pa.Table:
        v = t[col].to_pandas()
        vc = v.value_counts()
        keep = vc[vc * k > len(v)]
        return pa.table({col: pa.array(keep.index.to_numpy())})

    cand = (
        events.select_columns([col])
        .map_batches(local_hh, batch_format="pyarrow")
        .groupby(col)
        .count()
        .select_columns([col])
        .take_all()
    )
    cand_arr = np.sort(np.array([r[col] for r in cand]))
    cref = ray.put(cand_arr)

    def count_cands(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        v = t[col].to_numpy(zero_copy_only=False)
        m = np.isin(v, cs)
        vc = pd.Series(v[m]).value_counts()
        return pa.table(
            {
                col: pa.array(vc.index.to_numpy()),
                "n": vc.to_numpy().astype(np.int64),
            }
        )

    agg = (
        events.select_columns([col])
        .map_batches(count_cands, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("n", alias_name="n"))
    )

    def close(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.int64)
        keep = pa.array(n * k > total)
        kept = t.filter(keep)
        return pa.table(
            {col: kept[col], "n": kept["n"].to_numpy().astype(np.int64)}
        )

    return agg.map_batches(close, batch_format="pyarrow")
