"""Conversation-sequence analytics over the transcript table itself.

Operators that read the raw ``(conv_id, turn_idx, role, text, tool, ts)``
transcripts rather than the derived link graph — the sequence-mining
counterpart to the graph module (reference analog: the MR-side utility jobs
over the raw dataverse, ``jobgen/JobGen.java`` scan→group plans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import fasthash


def tool_paths(
    transcripts: ray.data.Dataset, k: int = 20, n_buckets: int = 256
) -> ray.data.Dataset:
    """Top-k tool-invocation paths: for each conversation the ordered
    sequence of tool calls (by turn_idx) joined with ``>``, counted across
    conversations → ``(path, n_convs)``, top ``k`` by (count desc, path).

    The sequence-mining pass over agent transcripts (which tool chains
    dominate the corpus). Shape: project (conv_id, turn_idx, tool) at the
    read → hash-bucket by conversation (vectorized md5-prefix bucket, the
    fasthash kernel; each task assembles MANY conversations' paths from one
    lexsort — the sessionize bucket pattern) → per-bucket partial path
    counts → a distinct-paths-bounded ``groupby.sum`` → tiny top-k sort.
    The exchange after the bucket stage carries one row per DISTINCT
    (bucket, path), never one per turn.
    """
    nb = np.uint64(n_buckets)

    def project_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["tool"]))
        bucket = (fasthash.md5_prefix_u64(t["conv_id"]) % nb).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "tool": t["tool"],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def per_bucket_paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        paths = df.groupby("conv_id", sort=False)["tool"].agg(">".join)
        counts = paths.value_counts()
        return pd.DataFrame(
            {"path": counts.index, "n": counts.to_numpy(np.int64)}
        )

    from ray.data.aggregate import Sum

    agg = (
        transcripts.map_batches(project_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket_paths, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_convs"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"path": df["path"], "n_convs": df["n_convs"].astype(np.int64)}
        )

    return (
        agg.map_batches(finish, batch_format="pandas")
        .sort(["n_convs", "path"], descending=[True, False])
        .limit(k)
    )


def tool_precedence_edges(
    transcripts: ray.data.Dataset, n_buckets: int = 256
) -> ray.data.Dataset:
    """Directed tool-precedence edges: ``src → dst`` when some turn using
    ``src`` precedes (by turn_idx) some turn using ``dst`` within one
    conversation — the ORDERED counterpart of the undirected ``tool_cooc``
    projection (graph.py), and cyclic across conversations (A before B in
    one conv, B before A in another).

    Distributed shape: conv-bucket shuffle (vectorized md5 bucket), then one
    self-merge per BUCKET (not per conversation) with turn_a < turn_b and a
    per-bucket distinct — the exchange after the bucket stage is bounded by
    tools² rows per bucket. A global distinct closes it.
    """
    nb = np.uint64(n_buckets)

    def project_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["tool"]))
        bucket = (fasthash.md5_prefix_u64(t["conv_id"]) % nb).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "tool": t["tool"],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def per_bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df[["conv_id", "turn_idx", "tool"]].merge(
            df[["conv_id", "turn_idx", "tool"]], on="conv_id", suffixes=("_a", "_b")
        )
        m = m[(m["turn_idx_a"] < m["turn_idx_b"]) & (m["tool_a"] != m["tool_b"])]
        out = m[["tool_a", "tool_b"]].drop_duplicates()
        return pd.DataFrame({"src": out["tool_a"], "dst": out["tool_b"]})

    return (
        transcripts.map_batches(project_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket_pairs, batch_format="pandas")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


def tool_scc(transcripts: ray.data.Dataset) -> pa.Table:
    """Strongly connected components of the directed tool-precedence graph
    → ``(tool, scc_id, scc_size)`` with ``scc_id`` = lexicographically
    smallest member tool.

    The data-parallel work is the precedence-edge derivation over every
    turn (``tool_precedence_edges``); the closure then runs on the ≤
    tools² edge table — the tool vocabulary is bounded (same class as the
    langs/labels/types dimension tables elsewhere in this repo), so the
    driver holds a tools×tools boolean matrix, never row data. Reachability
    by repeated squaring (log₂ depth), mutual-reach intersection, min-name
    labeling — replayed exactly by the oracle's unrolled DISTINCT-join CTEs
    (``sql_oracle.tool_scc_sql``).
    """
    import pyarrow.compute as pc

    e = tool_precedence_edges(transcripts).to_pandas()
    # tool universe from the data, not the edge list: a tool that never
    # shares a conversation with another tool is its own singleton SCC
    tools_ds = (
        transcripts.map_batches(
            lambda t: pa.table({"tool": t.filter(pc.is_valid(t["tool"]))["tool"]}),
            batch_format="pyarrow",
        )
        .groupby("tool")
        .count()
        .to_pandas()
    )
    tools = np.sort(tools_ds["tool"].to_numpy())
    idx = {t: i for i, t in enumerate(tools)}
    n = len(tools)
    reach = np.eye(n, dtype=bool)
    if len(e):
        reach[
            e["src"].map(idx).to_numpy(), e["dst"].map(idx).to_numpy()
        ] = True
    # repeated squaring: closure in ceil(log2(n)) boolean matmuls
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))))):
        nxt = reach | (reach @ reach)
        if (nxt == reach).all():
            break
        reach = nxt
    mutual = reach & reach.T
    scc_id = np.array([tools[np.flatnonzero(row)[0]] for row in mutual])
    # sizes per component
    import pandas as pd

    sizes = pd.Series(scc_id).value_counts()
    return pa.table(
        {
            "tool": pa.array(tools),
            "scc_id": pa.array(scc_id),
            "scc_size": pa.array(
                sizes[scc_id].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def conv_stats(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation rollup → ``(conv_id, n_turns, n_tool_calls,
    start_us, end_us, duration_us)``.

    The transcript-native dimension table a training pipeline filters and
    samples conversations by. Two-level combine: each batch pre-aggregates
    its turns to one row per (conv × batch) — a vectorized pandas groupby —
    then Ray-native Sum/Min/Max close per conv, so the exchange carries
    conversation partials, never turns (the MessageCombiner stepPartial /
    stepFinal shape).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "one": np.ones(len(df), dtype=np.int64),
                "toolcall": df["tool"].notna().to_numpy().astype(np.int64),
                # normalize to µs explicitly: pandas preserves the parquet
                # resolution (us here, ns for from-python frames), so a bare
                # astype(int64) would be resolution-dependent
                "tsu": df["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            }
        ).groupby("conv_id", sort=False)
        out = g.agg(
            n_turns=("one", "sum"),
            n_tool_calls=("toolcall", "sum"),
            start_us=("tsu", "min"),
            end_us=("tsu", "max"),
        ).reset_index()
        return out

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        transcripts.map_batches(partial, batch_format="pandas")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_tool_calls", alias_name="n_tool_calls"),
            Min("start_us", alias_name="start_us"),
            Max("end_us", alias_name="end_us"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["start_us"].to_numpy(np.int64)
        e = df["end_us"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "n_turns": df["n_turns"].astype(np.int64),
                "n_tool_calls": df["n_tool_calls"].astype(np.int64),
                "start_us": s,
                "end_us": e,
                "duration_us": e - s,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def role_stats(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-role rollup over every turn → ``(role, n_turns, n_tool_calls,
    total_chars, mean_chars)``.

    The roles vocabulary is tiny and fixed, so this is the cheapest shape
    in the repo: per-batch vectorized partials (one row per role per
    batch) → a roles-bounded ``groupby.sum`` → exact closing division
    (half-away rounding, DuckDB parity via ``round_like_sql``).
    """
    from ..functions.fasthash import round_like_sql

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "role": df["role"],
                "one": np.ones(len(df), dtype=np.int64),
                "toolcall": df["tool"].notna().to_numpy().astype(np.int64),
                "chars": df["text"].str.len().fillna(0).to_numpy(np.int64),
            }
        ).groupby("role", sort=False)
        return g.agg(
            n_turns=("one", "sum"),
            n_tool_calls=("toolcall", "sum"),
            total_chars=("chars", "sum"),
        ).reset_index()

    from ray.data.aggregate import Sum

    agg = (
        transcripts.map_batches(partial, batch_format="pandas")
        .groupby("role")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_tool_calls", alias_name="n_tool_calls"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_turns"].to_numpy(np.int64)
        tc = df["total_chars"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "role": df["role"],
                "n_turns": n,
                "n_tool_calls": df["n_tool_calls"].astype(np.int64),
                "total_chars": tc,
                "mean_chars": round_like_sql(
                    tc.astype(np.float64) / n.astype(np.float64), 6
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def turn_latency(
    transcripts: ray.data.Dataset, n_buckets: int = 256
) -> ray.data.Dataset:
    """Reply-latency stats per role transition: for every pair of
    CONSECUTIVE turns in a conversation (by turn_idx), the gap between
    their timestamps, rolled up per (role_from, role_to) → how long each
    speaker takes to respond to each other speaker.

    → (role_from, role_to, n: int64, total_gap_us: int64, mean_gap_us)
    — integer-exact folds, one closing division.

    Consecutive turns can span block boundaries, so the pairing uses the
    sessionize/tool_paths bucket pattern: hash-bucket by conversation
    (md5-prefix, vectorized), ONE lexsort per bucket pairs every
    conversation's turns at once (never a per-conversation UDF), per-bucket
    partial (role_from, role_to, n, gap) sums → a roles²-bounded groupby.
    Timestamps normalize to µs explicitly (parquet-resolution-independent,
    the conv_stats lesson)."""
    nb = np.uint64(n_buckets)

    def project_bucket(t: pa.Table) -> pa.Table:
        bucket = (fasthash.md5_prefix_u64(t["conv_id"]) % nb).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                # normalize to µs BEFORE the int cast (resolution-proof)
                "tsu": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def per_bucket_gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        same = df["conv_id"].to_numpy()[1:] == df["conv_id"].to_numpy()[:-1]
        if not same.any():
            return pd.DataFrame(
                {
                    "role_from": pd.Series([], dtype=object),
                    "role_to": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                    "gap": pd.Series([], dtype=np.int64),
                }
            )
        ts = df["tsu"].to_numpy()
        role = df["role"].to_numpy()
        g = (
            pd.DataFrame(
                {
                    "role_from": role[:-1][same],
                    "role_to": role[1:][same],
                    "gap": (ts[1:] - ts[:-1])[same],
                }
            )
            .groupby(["role_from", "role_to"], sort=False)
            .agg(n=("gap", "size"), gap=("gap", "sum"))
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["gap"] = g["gap"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        transcripts.select_columns(["conv_id", "turn_idx", "role", "ts"])
        .map_batches(project_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket_gaps, batch_format="pandas")
        .groupby(["role_from", "role_to"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("gap", alias_name="total_gap_us"),
        )
    )

    def close(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.int64)
        g = t["total_gap_us"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "role_from": t["role_from"],
                "role_to": t["role_to"],
                "n": n,
                "total_gap_us": g,
                "mean_gap_us": g.astype(np.float64) / n.astype(np.float64),
            }
        )

    return agg.map_batches(close, batch_format="pyarrow")


def tool_pair_weights(
    transcripts: ray.data.Dataset, n_buckets: int = 256
) -> ray.data.Dataset:
    """WEIGHTED tool co-occurrence: for every unordered tool pair, the
    number of conversations invoking BOTH — the weighted form of the
    ``tool_cooc`` edge kind the link-graph build derives distinct-only
    (``graph.py``), and the edge-weight table a weighted projection /
    association analysis runs on.

    → (tool_a, tool_b, n_convs: int64), tool_a < tool_b.

    Same plan as ``events.session_type_pairs`` with the conversation as
    the natural session: hash-bucket by conv, per-bucket (conv, tool)
    dedup + tiny per-conv self-join (conversations hold ≤ |tools|
    distinct tools), partial counts → a tools²-bounded closing groupby."""
    from ray.data.aggregate import Sum

    nb = np.uint64(n_buckets)

    def project_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["tool"]))
        bucket = (fasthash.md5_prefix_u64(t["conv_id"]) % nb).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "tool": t["tool"],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        st = df[["conv_id", "tool"]].drop_duplicates()
        pairs = st.merge(st, on="conv_id")
        pairs = pairs[pairs["tool_x"] < pairs["tool_y"]]
        res = (
            pairs.groupby(["tool_x", "tool_y"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"tool_x": "tool_a", "tool_y": "tool_b"})
        )
        res["n"] = res["n"].astype(np.int64)
        return res

    agg = (
        transcripts.select_columns(["conv_id", "tool"])
        .map_batches(project_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["tool_a", "tool_b"])
        .aggregate(Sum("n", alias_name="n_convs"))
    )

    return agg.map_batches(
        lambda t: pa.table(
            {
                "tool_a": t["tool_a"],
                "tool_b": t["tool_b"],
                "n_convs": t["n_convs"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )
