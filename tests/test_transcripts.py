import numpy as np
import pyarrow.compute as pc

from asterixdb_analytics_ray.sources.transcripts import (
    SCHEMA,
    TranscriptSpec,
    transcripts_chunk,
    turns_per_conv,
)


def test_schema_matches_input_hint():
    t = transcripts_chunk(42, 0, 10, 8)
    assert t.schema.equals(SCHEMA)


def test_deterministic_and_chunk_independent():
    full = transcripts_chunk(42, 0, 30, 8)
    a = transcripts_chunk(42, 0, 17, 8)
    b = transcripts_chunk(42, 17, 30, 8)
    import pyarrow as pa

    assert pa.concat_tables([a, b]).equals(full)
    assert transcripts_chunk(42, 0, 30, 8).equals(full)


def test_turn_idx_dense_and_ts_increasing():
    t = transcripts_chunk(42, 0, 40, 8).to_pandas()
    for conv, g in t.groupby("conv_id"):
        idx = g["turn_idx"].to_numpy()
        assert (idx == np.arange(len(idx))).all()
        ts = g["ts"].to_numpy()
        assert (np.diff(ts).astype("int64") > 0).all()


def test_turn_counts_in_range():
    nt = turns_per_conv(42, np.arange(1000))
    assert nt.min() >= 4 and nt.max() <= 16


def test_tool_turns_have_tools():
    t = transcripts_chunk(42, 0, 200, 12)
    is_tool_role = pc.equal(t["role"], "tool")
    assert pc.all(pc.equal(is_tool_role, pc.is_valid(t["tool"]))).as_py()
    # Zipf skew: the most popular tool dominates
    vc = pc.value_counts(t["tool"]).to_pylist()
    counts = sorted((v["counts"] for v in vc), reverse=True)
    assert counts[0] >= 3 * counts[-1]


def test_distributed_generation_matches_local(ray_session):
    from asterixdb_analytics_ray.sources.transcripts import transcripts_dataset

    spec = TranscriptSpec(n_convs=25, seed=42)
    ds = transcripts_dataset(spec, convs_per_block=7)
    got = (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts_chunk(spec.seed, 0, spec.n_convs, spec.n_tools)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_turn_latency_brute_force_cross_block(ray_session):
    """Consecutive-turn pairing survives conversations split across
    blocks; gaps and role transitions match a pandas lag computation."""
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import turn_latency

    rng = np.random.default_rng(23)
    rows = []
    for c in range(12):
        n = rng.integers(2, 8)
        ts = np.cumsum(rng.integers(1, 500, n)) * 1_000_000
        for i in range(n):
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": np.int32(i),
                    "role": ["user", "assistant", "tool"][
                        int(rng.integers(0, 3))
                    ],
                    "text": "x",
                    "tool": None,
                    "ts": pd.Timestamp(ts[i], unit="us"),
                }
            )
    df = pd.DataFrame(rows).sample(frac=1, random_state=4).reset_index(drop=True)
    out = (
        turn_latency(ray.data.from_pandas(df).repartition(6))
        .to_pandas()
        .set_index(["role_from", "role_to"])
        .sort_index()
    )

    sdf = df.sort_values(["conv_id", "turn_idx"])
    sdf["tsu"] = sdf["ts"].astype("datetime64[us]").astype("int64")
    sdf["pf"] = sdf.groupby("conv_id")["role"].shift()
    sdf["pt"] = sdf.groupby("conv_id")["tsu"].shift()
    pairs = sdf[sdf.pf.notna()]
    want = (
        pairs.assign(gap=(pairs.tsu - pairs.pt).astype(np.int64))
        .groupby(["pf", "role"])
        .agg(n=("gap", "size"), total=("gap", "sum"))
    )
    assert len(out) == len(want)
    for (rf, rt), r in want.iterrows():
        assert out.loc[(rf, rt), "n"] == r["n"]
        assert out.loc[(rf, rt), "total_gap_us"] == r["total"]


def test_tool_pair_weights_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from asterixdb_analytics_ray.pipelines.convs import tool_pair_weights

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b", "b", "c", "c", "c"],
            "turn_idx": np.arange(8, dtype=np.int32),
            "role": ["user"] * 8,
            "text": ["x"] * 8,
            "tool": ["grep", "sed", "grep", "sed", "awk", "grep", "awk", None],
            "ts": pd.to_datetime(np.arange(8), unit="s"),
        }
    )
    out = (
        tool_pair_weights(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index(["tool_a", "tool_b"])
        .sort_index()
    )
    # a: {grep, sed}; b: {sed, awk}; c: {grep, awk}
    assert out.loc[("grep", "sed"), "n_convs"] == 1
    assert out.loc[("awk", "sed"), "n_convs"] == 1
    assert out.loc[("awk", "grep"), "n_convs"] == 1
    assert len(out) == 3
