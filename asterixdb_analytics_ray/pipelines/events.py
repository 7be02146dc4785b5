"""Event-stream operators — windowed aggregates and as-of joins.

Two operators a training-data / telemetry pipeline needs that Ray Data has
no built-in for, expressed Ray-Data-first:

* ``windowed_counts`` — tumbling-window aggregate: the window id is a pure
  per-row function of the timestamp (``epoch_us // width``), so the whole
  operator is one ``map_batches`` projection + one hash-shuffle aggregate —
  no sessionization state, no ordering requirement, arbitrarily parallel.

* ``asof_last_event`` — per-key as-of join (for each left event, the most
  recent right event with ``right.ts <= left.ts`` for the same key).
  Partitioning assumption (documented per the custom-operator contract):
  rows are hash-grouped by the join key, and each group is one task's
  vectorized ``searchsorted`` over that key's time-sorted right side —
  correct for any data, efficient while a single key's history fits a task
  (keys are users/conversations here; a million-event key is ~16 MB).
  Ties (equal timestamps) resolve identically to DuckDB's ``ASOF JOIN``
  (``>=`` match, then max event id among equal-ts candidates).
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


def asof_last_event(
    events: ray.data.Dataset,
    left_type: str = "error",
    right_type: str = "click",
) -> ray.data.Dataset:
    """For each ``left_type`` event, the most recent ``right_type`` event by
    the same user at or before its timestamp (−1 when none).

    → (event_id, prev_event_id: int64, lag_sec: float64 rounded to 6;
    lag −1.0 when unmatched).  One hash shuffle on the join key; each
    user's group is a vectorized two-sided merge (sort right by ts,
    ``searchsorted`` the left timestamps into it).
    """
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"]]
        if len(left) == 0:
            return pd.DataFrame(
                {"event_id": [], "prev_event_id": [], "lag_sec": []}
            )
        right = g[~g["is_left"]]
        lid = left["event_id"].to_numpy()
        lts = left["ts_us"].to_numpy()
        prev = np.full(len(lid), -1, dtype=np.int64)
        lag = np.full(len(lid), -1.0)
        if len(right):
            # sort by (ts, event_id): equal-ts candidates resolve to the
            # max event id, matching the SQL oracle's tie-break
            order = np.lexsort((right["event_id"].to_numpy(), right["ts_us"].to_numpy()))
            rts = right["ts_us"].to_numpy()[order]
            rid = right["event_id"].to_numpy()[order]
            pos = np.searchsorted(rts, lts, side="right") - 1
            hit = pos >= 0
            prev[hit] = rid[pos[hit]]
            lag[hit] = np.round((lts[hit] - rts[pos[hit]]) / 1e6, 6)
        return pd.DataFrame(
            {"event_id": lid, "prev_event_id": prev, "lag_sec": lag}
        )

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(asof_group, batch_format="pandas")
    )


def range_join_counts(
    events: ray.data.Dataset,
    left_type: str = "error",
    right_type: str = "click",
    window_us: int = 3_600_000_000,
) -> ray.data.Dataset:
    """Banded range join: for each ``left_type`` event, the COUNT of
    ``right_type`` events by the same user within ``[ts − window, ts]``
    (inclusive).  Same partitioning contract as ``asof_last_event`` (hash
    group by key, vectorized two-sided ``searchsorted`` per group); the
    equivalent SQL is the inequality join the oracle runs.
    → (event_id, n_prior: int64)."""
    import pyarrow.compute as pc

    w = np.int64(window_us)

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"]]
        if len(left) == 0:
            return pd.DataFrame({"event_id": [], "n_prior": []})
        right = g[~g["is_left"]]
        lts = left["ts_us"].to_numpy()
        n = np.zeros(len(lts), dtype=np.int64)
        if len(right):
            rts = np.sort(right["ts_us"].to_numpy())
            n = np.searchsorted(rts, lts, side="right") - np.searchsorted(
                rts, lts - w, side="left"
            )
        return pd.DataFrame(
            {"event_id": left["event_id"].to_numpy(), "n_prior": n}
        )

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(count_group, batch_format="pandas")
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
