"""Deterministic synthetic conversation-transcript source.

The engine's primary input (per BASELINE.json ``input_hint``) is a Parquet
table of multi-turn conversation / agent transcripts:

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string [nullable], ts: timestamp[us])

The sandbox testdata dirs don't ship this table, so we synthesise it
deterministically: every field is a pure function of ``(seed, conv_index,
turn_idx)`` via a splitmix64-style integer mix. Generation is therefore
order-independent and embarrassingly parallel — the same rows come out
whether generated driver-side in chunks or distributed via
``ray.data.range(n_convs).map_batches`` (the 10^12-turn path).

Reference analog: ``GeneratedVertexInputFormat`` (synthetic inputs for the
conformance suite, ``pregelix-api/.../io/generated/GeneratedVertexReader.java``)
and the text input corpus ``pregelix-example/data/webmap/webmap_link.txt``.

Tool names are drawn from a Zipf(s=1.2) distribution so popular tools become
natural high-degree hubs — the skew case the reference exercises with
``data/skew/data.txt`` (one 4146-degree vertex; ``SkewTest.java:40-66``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

DEFAULT_SEED = 42
# base epoch: 2025-01-01T00:00:00 UTC in microseconds
_EPOCH_US = 1_735_689_600_000_000
_ZIPF_S = 1.2
MIN_TURNS, MAX_TURNS = 4, 16  # turns per conversation in [4, 16]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _mix(seed: int, a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uint64 hash of (seed, a, b, salt)."""
    x = (
        np.uint64(seed) * np.uint64(0x100000001B3)
        ^ a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        ^ np.uint64(salt) * np.uint64(0x165667B19E3779F9)
    )
    return _splitmix64(x)


def num_tools(n_convs: int) -> int:
    return int(min(256, max(8, n_convs // 16)))


def _zipf_cdf(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** _ZIPF_S
    return np.cumsum(w) / w.sum()


def turns_per_conv(seed: int, conv_idx: np.ndarray) -> np.ndarray:
    span = MAX_TURNS - MIN_TURNS + 1
    return (
        MIN_TURNS + (_mix(seed, conv_idx, np.zeros_like(conv_idx), 0) % np.uint64(span))
    ).astype(np.int64)


def transcripts_chunk(seed: int, conv_lo: int, conv_hi: int, n_tools: int) -> pa.Table:
    """Generate all turns for conversations with index in [conv_lo, conv_hi)."""
    convs = np.arange(conv_lo, conv_hi, dtype=np.int64)
    nt = turns_per_conv(seed, convs)
    conv_rep = np.repeat(convs, nt)
    # dense 0-based turn_idx within each conversation
    offsets = np.concatenate([[0], np.cumsum(nt)])
    idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], nt)

    h = _mix(seed, conv_rep, idx, 1)

    # roles: turn 0 is "system" for ~1/8 of convs else "user"; afterwards a
    # deterministic user/assistant alternation with ~30% of assistant slots
    # replaced by "tool" turns (the tool-calling result turn).
    first_sys = (_mix(seed, conv_rep, idx, 2) % np.uint64(8)) == 0
    is_assistant_slot = (idx % 2) == 1
    is_tool = is_assistant_slot & ((h % np.uint64(10)) < 3) & (idx >= 2)
    role = np.where(is_assistant_slot, "assistant", "user").astype(object)
    role[is_tool] = "tool"
    role[(idx == 0) & first_sys] = "system"

    # tool names: Zipf-ranked over n_tools, only on tool turns
    cdf = _zipf_cdf(n_tools)
    u = (_mix(seed, conv_rep, idx, 3) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )
    tool_rank = np.searchsorted(cdf, u, side="right").astype(np.int64)
    tool_rank = np.minimum(tool_rank, n_tools - 1)

    conv_str = np.char.add("c", np.char.zfill(convs.astype("U9"), 7))
    conv_id = np.repeat(conv_str, nt)
    tok = _mix(seed, conv_rep, idx, 4).astype("U20")
    text = np.char.add(
        np.char.add(np.char.add(conv_id, ":"), idx.astype("U6")),
        np.char.add(":", tok),
    )
    tool_names = np.char.add("tool_", np.char.zfill(tool_rank.astype("U4"), 3))

    ts = (
        _EPOCH_US
        + conv_rep * 86_400_000_000 // 16
        + idx * 60_000_000
        + (h % np.uint64(50_000_000)).astype(np.int64)
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(idx.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(
                np.where(is_tool, tool_names, None), pa.string(), from_pandas=True
            ),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


@dataclass(frozen=True)
class TranscriptSpec:
    n_convs: int
    seed: int = DEFAULT_SEED

    @property
    def n_tools(self) -> int:
        return num_tools(self.n_convs)


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a testdata dir name like .../sf0.01."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    raise ValueError(f"cannot parse scale factor from {sf_dir!r}")


def spec_for_sf(sf: float, seed: int = DEFAULT_SEED) -> TranscriptSpec:
    """Scale mapping: sf0.001→200 convs, sf0.01→2k, sf0.1→20k (~10 turns each)."""
    return TranscriptSpec(n_convs=max(50, int(round(200_000 * sf))), seed=seed)


def write_transcripts(
    path: str, spec: TranscriptSpec, chunk_convs: int = 20_000
) -> None:
    """Driver-side chunked writer (single parquet file, row-grouped per chunk).

    For 10^12-turn scale the same ``transcripts_chunk`` kernel runs inside
    ``ray.data.range(n_convs).map_batches`` and writes a partitioned directory;
    this local writer exists for tests/bench fixtures.
    """
    tmp = path + ".tmp"
    writer = pq.ParquetWriter(tmp, SCHEMA)
    try:
        for lo in range(0, spec.n_convs, chunk_convs):
            hi = min(spec.n_convs, lo + chunk_convs)
            writer.write_table(transcripts_chunk(spec.seed, lo, hi, spec.n_tools))
    finally:
        writer.close()
    os.replace(tmp, path)


def transcripts_dataset(spec: TranscriptSpec, convs_per_block: int = 4_000):
    """Distributed generation as a Ray Dataset (the at-scale path)."""
    import ray.data

    n_blocks = max(1, -(-spec.n_convs // convs_per_block))

    def gen(batch: dict) -> pa.Table:
        out = []
        for b in batch["id"]:
            lo = int(b) * convs_per_block
            hi = min(spec.n_convs, lo + convs_per_block)
            out.append(transcripts_chunk(spec.seed, lo, hi, spec.n_tools))
        return pa.concat_tables(out)

    return ray.data.range(n_blocks, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="numpy", batch_size=1
    )


_CACHE_ROOT = "/tmp/aar_data"


def ensure_transcripts(
    sf_dir: str, seed: int = DEFAULT_SEED, scale: float = 1.0
) -> str:
    """Idempotently materialize the transcript parquet for a testdata sf dir.

    Cached under /tmp keyed by (sf, scale, seed, generator version); both the
    Ray pipelines and the DuckDB oracle SQL read this same file. ``scale``
    multiplies the conversation count (bench-only knob for making the
    workload compute-bound at fixed sf).
    """
    sf = sf_from_dir(sf_dir)
    spec = spec_for_sf(sf * scale, seed)
    out_dir = os.path.join(
        _CACHE_ROOT, f"sf{sf}" if scale == 1.0 else f"sf{sf}x{scale:g}"
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "transcripts.parquet")
    meta_path = os.path.join(out_dir, "meta.json")
    meta = {"n_convs": spec.n_convs, "seed": spec.seed, "version": 3}
    if os.path.exists(path) and os.path.exists(meta_path):
        try:
            if json.load(open(meta_path)) == meta:
                return path
        except Exception:
            pass
    write_transcripts(path, spec)
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return path
