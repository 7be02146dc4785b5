"""Deterministic random walks over the simple undirected graph — the
corpus-generation stage of DeepWalk / node2vec-style graph embedding
(Perozzi et al., "DeepWalk: Online Learning of Social Representations",
KDD 2014 — public knowledge; p=q=1 uniform walks).

Determinism contract (SQL-reproducible "randomness"): one walk starts at
every vertex with ≥1 neighbor; at step t from node v the walk moves to

    neighbors_sorted_asc(v)[ H(f"{walk_id}:{t}:{v}") mod deg(v) ]

with H = the repo's shared md5-prefix uint64 hash
(``functions.fasthash.md5_prefix_u64`` — bit-identical to DuckDB
``('0x'||substr(md5(s),1,16))::UBIGINT``), so the full walk corpus is a
pure function of the graph and the DuckDB oracle replays it exactly
(``sql_oracle.random_walks_sql``). Hash-seeded pseudo-walks are the
standard trick for restartable distributed walk generation: a failed run
regenerates identical walks with no RNG state to checkpoint.

Scale shape: adjacency lives in P src-hash CSR shards built by worker
tasks (plasma-resident, driver holds refs — the ``stages/sharded.py``
layout). Each of the L steps co-partitions the frontier (walk_id, v) by
v % P with ONE small shuffle (frontier is exactly n_walks rows, never
edges), and the in-group step is a vectorized searchsorted gather into
the shard's CSR — no per-walk Python, no edge-table scan per step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions import fasthash

WALK_LEN = 4  # steps; a walk emits WALK_LEN + 1 (walk_id, step, v) rows


@ray.remote
def _csr_shard(t: "pa.Table | None") -> dict:
    """CSR over this shard's sources: unique srcs (sorted), offsets, and
    dsts sorted ascending within each src (the oracle's rnk order)."""
    if t is None or t.num_rows == 0:
        return {
            "srcs": np.empty(0, np.int64),
            "offs": np.zeros(1, np.int64),
            "dsts": np.empty(0, np.int64),
        }
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
    return {
        "srcs": s[starts],
        "offs": np.concatenate((starts, [len(s)])).astype(np.int64),
        "dsts": d,
    }


def random_walks(
    und_edges: ray.data.Dataset,
    n: int,
    walk_len: int = WALK_LEN,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """→ (walk_id, step, v) — one deterministic uniform walk of
    ``walk_len`` steps per start vertex (walk_id = start vertex id).

    ``und_edges``: symmetric simple edge set (``LinkGraph`` und view), so
    every frontier node has ≥1 neighbor and walks never terminate early.
    """
    import pandas as pd

    from ..stages.blocks import partitions_for
    from ..stages.partition import partition_table_refs

    P = partitions_for(und_edges.count(), num_partitions)
    part_refs = partition_table_refs(
        und_edges.map_batches(
            lambda t: t.append_column(
                "part", pa.array(t["src"].to_numpy() % P, pa.int32())
            ),
            batch_format="pyarrow",
        ).materialize(),
        "part",
        P,
    )
    adj_refs = [_csr_shard.remote(part_refs.get(p)) for p in range(P)]

    # step-0 frontier = the distinct sources (vertices with ≥1 neighbor),
    # derived per shard so the driver never holds an O(n) vertex list
    @ray.remote
    def _starts(shard: dict) -> pa.Table:
        v = shard["srcs"]
        return pa.table(
            {"walk_id": v, "v": v, "step": np.zeros(len(v), np.int64)}
        )

    frontier = ray.data.from_arrow_refs(
        [_starts.remote(adj_refs[p]) for p in range(P)]
    )
    out = [frontier]

    for t_step in range(1, walk_len + 1):

        def advance(g: pd.DataFrame, _t=t_step) -> pd.DataFrame:
            """One co-partitioned step: all rows share v % P == part, so one
            shard gather answers every lookup in the group."""
            p = int(g["v"].iloc[0]) % P
            shard = ray.get(adj_refs[p])
            v = g["v"].to_numpy(np.int64)
            wid = g["walk_id"].to_numpy(np.int64)
            idx = np.searchsorted(shard["srcs"], v)
            off0 = shard["offs"][idx]
            deg = shard["offs"][idx + 1] - off0
            # the oracle's exact hash input: '{walk_id}:{t}:{v}'
            keys = (
                pd.Series(wid).astype(str)
                + f":{_t}:"
                + pd.Series(v).astype(str)
            )
            h = fasthash.md5_prefix_u64(keys.to_numpy(dtype=object))
            nxt = shard["dsts"][off0 + (h % deg.astype(np.uint64)).astype(np.int64)]
            return pd.DataFrame(
                {
                    "walk_id": wid,
                    "v": nxt,
                    "step": np.full(len(wid), _t, dtype=np.int64),
                }
            )

        frontier = (
            frontier.map_batches(
                lambda df: df.assign(part=(df["v"].to_numpy(np.int64) % P)),
                batch_format="pandas",
            )
            .groupby("part")
            .map_groups(
                lambda g, _t=t_step: advance(g.drop(columns=["part"]), _t),
                batch_format="pandas",
            )
            .materialize()
        )
        out.append(frontier)

    full = out[0]
    for ds in out[1:]:
        full = full.union(ds)
    return full.map_batches(
        lambda t: pa.table(
            {
                "walk_id": t["walk_id"].to_numpy().astype(np.int64),
                "step": t["step"].to_numpy().astype(np.int64),
                "v": t["v"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )
