"""Windowed aggregate + as-of join operators (pipelines/events.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from asterixdb_analytics_ray.pipelines.events import (
    asof_last_event,
    windowed_counts,
)


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "value"]
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ts_us"], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
                "value": pa.array(df["value"], pa.float64()),
            }
        )
    )


def test_windowed_counts_tumbling(ray_session):
    H = 3_600_000_000
    ds = _events(
        [
            (0, 10, 1, "view", 1.0),
            (1, H - 1, 1, "view", 2.0),
            (2, H, 1, "view", 4.0),      # next window
            (3, H + 5, 2, "click", 8.0),
        ]
    )
    got = (
        windowed_counts(ds, window_us=H)
        .to_pandas()
        .sort_values(["window_us", "event_type"])
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == [2, 1, 1]
    assert got["sum_value"].tolist() == [3.0, 8.0, 4.0]
    assert got["window_us"].tolist() == [0, H, H]


def test_asof_join_semantics(ray_session):
    ds = _events(
        [
            (0, 100, 1, "click", 0.0),
            (1, 200, 1, "click", 0.0),
            (2, 200, 1, "error", 0.0),   # equal ts -> >= matches click 1
            (3, 150, 1, "error", 0.0),   # between clicks -> click 0
            (4, 50, 1, "error", 0.0),    # before any click -> unmatched
            (5, 300, 2, "error", 0.0),   # other user, no clicks -> unmatched
        ]
    )
    got = (
        asof_last_event(ds)
        .to_pandas()
        .set_index("event_id")["prev_event_id"]
        .to_dict()
    )
    assert got == {2: 1, 3: 0, 4: -1, 5: -1}


def test_asof_lag_seconds(ray_session):
    ds = _events(
        [
            (0, 1_000_000, 7, "click", 0.0),
            (1, 3_500_000, 7, "error", 0.0),
        ]
    )
    got = asof_last_event(ds).to_pandas()
    assert got["lag_sec"].tolist() == [2.5]


def test_range_join_counts(ray_session):
    from asterixdb_analytics_ray.pipelines.events import range_join_counts

    H = 3_600_000_000
    ds = _events(
        [
            (0, 0, 1, "click", 0.0),
            (1, H // 2, 1, "click", 0.0),
            (2, H, 1, "error", 0.0),       # both clicks inside [0, H]
            (3, H + 1, 1, "error", 0.0),   # click at 0 falls out (exclusive lo)
            (4, 10, 2, "error", 0.0),      # no clicks for user 2
        ]
    )
    got = (
        range_join_counts(ds, window_us=H)
        .to_pandas()
        .set_index("event_id")["n_prior"]
        .to_dict()
    )
    assert got == {2: 2, 3: 1, 4: 0}


def test_sessionize_gap_breaks(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import sessionize

    base = pd.Timestamp("2026-01-01")
    rows = []
    # user 1: three events close together, then a 2-hour gap, then one more
    for i, off in enumerate([0, 60, 120, 7320]):
        rows.append((i, base + pd.Timedelta(seconds=off), 1, "click", 1.0))
    # user 2: single event
    rows.append((10, base, 2, "view", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (
        sessionize(ray.data.from_pandas(df), gap_us=1_800_000_000)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1]
    assert list(u1["session_id"]) == [0, 1]
    assert list(u1["n_events"]) == [3, 1]
    assert u1.iloc[0]["end_us"] - u1.iloc[0]["start_us"] == 120_000_000
    u2 = got[got["user_id"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 1


def test_sessionize_randomized_parity(ray_session):
    """Randomized brute-force parity for the bucket-vectorized kernel:
    per-user sorted gap-split in plain pandas vs the distributed operator,
    including equal-timestamp ties and single-event users."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import sessionize

    rng = np.random.default_rng(7)
    n = 5000
    gap = 1_000_000  # 1s
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 400, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 20_000_000, n), unit="us"
            ).astype("datetime64[us]"),
            "event_type": "e",
            "value": 1.0,
        }
    )
    got = (
        sessionize(ray.data.from_pandas(df), gap_us=gap)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        sid, start = 0, 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > gap:
                rows.append((uid, sid, i - start, ts[start], ts[i - 1]))
                sid += 1
                start = i
    want = (
        pd.DataFrame(
            rows,
            columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
        )
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

def test_asof_range_randomized_parity(ray_session):
    """Randomized brute-force parity for the bucket-vectorized composite-key
    as-of / range-join kernels: many users per bucket, equal-timestamp ties
    (max-event-id tie-break), users with no rights, users with no lefts."""
    import numpy as np
    import pandas as pd

    from asterixdb_analytics_ray.pipelines.events import (
        asof_last_event,
        range_join_counts,
    )

    rng = np.random.default_rng(11)
    n = 6000
    w = 2_000_000  # 2s band
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                int(rng.integers(0, 30_000_000)),
                int(rng.integers(0, 700)),
                "error" if rng.random() < 0.4 else "click",
                0.0,
            )
        )
    ds = _events(rows)
    df = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "value"]
    )

    # brute force per left event
    want_prev, want_lag, want_n = {}, {}, {}
    for _, r in df[df["event_type"] == "error"].iterrows():
        cand = df[
            (df["event_type"] == "click")
            & (df["user_id"] == r["user_id"])
            & (df["ts_us"] <= r["ts_us"])
        ]
        if len(cand):
            best = cand.sort_values(["ts_us", "event_id"]).iloc[-1]
            want_prev[r["event_id"]] = int(best["event_id"])
            want_lag[r["event_id"]] = round(
                (r["ts_us"] - best["ts_us"]) / 1e6, 6
            )
        else:
            want_prev[r["event_id"]] = -1
            want_lag[r["event_id"]] = -1.0
        want_n[r["event_id"]] = int(
            (
                (df["event_type"] == "click")
                & (df["user_id"] == r["user_id"])
                & (df["ts_us"] <= r["ts_us"])
                & (df["ts_us"] >= r["ts_us"] - w)
            ).sum()
        )

    got = asof_last_event(ds).to_pandas().set_index("event_id")
    assert got["prev_event_id"].to_dict() == want_prev
    assert got["lag_sec"].to_dict() == want_lag
    gotn = (
        range_join_counts(ds, window_us=w)
        .to_pandas()
        .set_index("event_id")["n_prior"]
        .to_dict()
    )
    assert gotn == want_n


def test_session_ids_parity_with_sessionize(ray_session):
    """session_ids assigns every event; aggregating the assignment
    reproduces sessionize exactly (same randomized corpus incl. ties)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import (
        session_ids,
        sessionize,
    )

    rng = np.random.default_rng(13)
    n = 5000
    gap = 1_000_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 400, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 20_000_000, n), unit="us"
            ).astype("datetime64[us]"),
            "event_type": "e",
            "value": 1.0,
        }
    )
    ds = ray.data.from_pandas(df)
    assign = session_ids(ds, gap_us=gap).to_pandas()
    assert len(assign) == n and assign["event_id"].is_unique

    joined = assign.merge(
        df[["event_id", "ts"]].assign(tsu=df["ts"].astype("int64")),
        on="event_id",
    )
    agg = (
        joined.groupby(["user_id", "session_id"])
        .agg(n_events=("tsu", "size"), start_us=("tsu", "min"), end_us=("tsu", "max"))
        .reset_index()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    want = (
        sessionize(ds, gap_us=gap)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(agg, want, check_dtype=False)


def test_topk_merge_empty_embeddings(ray_session):
    """Empty embeddings input returns an empty typed kNN table (regression:
    map_groups over an empty Dataset yields a column-less frame)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.pipelines.embeddings import knn_brute_force

    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    out = knn_brute_force(
        empty, np.zeros((2, 4)), np.array([0, 1], dtype=np.int64), k=5
    )
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "vec_id", "sim"]


def test_window_anomalies_constant_series_drops_type(ray_session):
    """A type whose every window has the same count has σ=0: the engine
    emits nothing for it (matching the oracle, whose x/0.0 is NULL and is
    dropped by the >= filter)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import window_anomalies

    hour = 3_600_000_000
    ts, types = [], []
    for wdx in range(6):
        ts += [wdx * hour + 1]  # one 'flat' event per window
        types += ["flat"]
    # 'spiky': 1,1,1,1,1,20 → last window is a >2σ anomaly
    for wdx in range(6):
        k = 20 if wdx == 5 else 1
        ts += [wdx * hour + 2] * k
        types += ["spiky"] * k
    df = pd.DataFrame(
        {"ts": pd.to_datetime(np.array(ts, dtype="int64"), unit="us"),
         "event_type": types}
    )
    out = window_anomalies(ray.data.from_pandas(df)).to_pandas()
    assert set(out["event_type"]) == {"spiky"}
    assert (out["n"] == 20).any()


def test_heavy_hitters_exact_and_superset(ray_session):
    """Skewed stream: the two-pass result equals the exact HAVING even
    when a hitter is locally light in most blocks, and false-positive
    candidates are dropped."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.events import heavy_hitters

    rng = np.random.default_rng(13)
    # 3000 background events over 500 users + two true heavy hitters
    users = np.concatenate(
        [
            rng.integers(1000, 1500, 3000),
            np.full(60, 7),          # 60/3105 > 3105/200
            np.full(45, 9),          # 45/3105 > 3105/200
        ]
    ).astype(np.int64)
    rng.shuffle(users)
    ds = ray.data.from_pandas(pd.DataFrame({"user_id": users})).repartition(8)
    out = (
        heavy_hitters(ds, col="user_id", k=200)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    vc = pd.Series(users).value_counts()
    want = vc[vc * 200 > len(users)]
    assert sorted(out.index) == sorted(want.index)
    for u, n in want.items():
        assert out.loc[u, "n"] == n
