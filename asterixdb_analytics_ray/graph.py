"""Edge-table derivation + node-id encoding: transcripts → LinkGraph.

The reference's input layer parses adjacency text into vertices
(``pregelix-example/.../inputformat/TextPageRankInputFormat.java:57-98``); our
input layer derives a normalized edge table from the transcript Parquet.

Edge kinds (all deduplicated):
- ``conv_tool``: conv node → tool node, one edge per distinct (conv_id, tool)
  on tool-calling turns. Popular tools are natural high-degree hubs (skew).
- ``reply``:     turn node (c, i) → turn node (c, i+1) for consecutive turns
  of a conversation — long path components.
- ``tool_cooc``: tool_a → tool_b (a < b lexicographically) for distinct tool
  pairs co-occurring inside one conversation — this projection has triangles.

Node ids are dense int64, assigned by sorted order of ``(kind, key)`` —
equivalent to SQL ``dense_rank() OVER (ORDER BY kind, key) - 1`` so the
DuckDB oracle can reproduce the exact encoding. Keys:
  conv → conv_id;  tool → tool name;  turn → f"{conv_id}:{turn_idx:04d}".

Scale notes (10^12 turns): the node dictionary for conv/tool kinds stays
small enough to broadcast (``ray.put`` once, zero-copy numpy per node);
turn-node ids at full scale would instead use the structured encoding
``turn_id = conv_index * MAX_TURNS + turn_idx`` (no dictionary, no shuffle).
The dictionary path here is the oracle-comparable one; both produce dense ids.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

EDGE_KINDS = ("conv_tool", "reply", "tool_cooc")


def _turn_key(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    return conv_id + ":" + turn_idx.astype(int).astype(str).str.zfill(4)


def conv_tool_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (conv_id, tool) pairs on tool turns. One groupby-dedup shuffle."""
    import pyarrow.compute as pc

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "tool"]).filter(pc.is_valid(batch["tool"]))
        return t.group_by(["conv_id", "tool"]).aggregate([])  # local pre-dedup

    pairs = ds.map_batches(local, batch_format="pyarrow")
    return pairs.groupby(["conv_id", "tool"]).count().drop_columns(["count()"])


def reply_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(conv_id, turn_idx) → (conv_id, turn_idx + 1) for consecutive turns.

    turn_idx is dense per conversation, so consecutive pairs need only a
    per-conversation sort — a groupby(conv_id) shuffle with tiny groups.
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        idx = np.sort(g["turn_idx"].to_numpy())
        if len(idx) < 2:
            return pd.DataFrame({"conv_id": [], "src_idx": [], "dst_idx": []})
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].iloc[0],
                "src_idx": idx[:-1],
                "dst_idx": idx[1:],
            }
        )

    return (
        ds.select_columns(["conv_id", "turn_idx"])
        .groupby("conv_id")
        .map_groups(pairs, batch_format="pandas")
    )


def tool_cooc_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct ordered tool pairs (a < b) co-occurring within a conversation."""
    import pyarrow.compute as pc

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "tool"]).filter(pc.is_valid(batch["tool"]))
        return t.group_by(["conv_id", "tool"]).aggregate([])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        tools = np.sort(g["tool"].unique())
        if len(tools) < 2:
            return pd.DataFrame({"tool_a": [], "tool_b": []})
        ia, ib = np.triu_indices(len(tools), k=1)
        return pd.DataFrame({"tool_a": tools[ia], "tool_b": tools[ib]})

    per_conv = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("conv_id")
        .map_groups(pairs, batch_format="pandas")
    )
    return per_conv.groupby(["tool_a", "tool_b"]).count().drop_columns(["count()"])


@dataclass
class NodeDict:
    """Sorted (kind, key) → dense id dictionary, broadcast-friendly."""

    kinds: np.ndarray  # sorted composite "kind:key" keys (numpy unicode)
    kind_col: pa.Array
    key_col: pa.Array

    @property
    def n(self) -> int:
        return len(self.kinds)

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(np.arange(self.n, dtype=np.int64)),
                "kind": self.kind_col,
                "key": self.key_col,
            }
        )


def build_node_dict(kind_keys: dict[str, np.ndarray]) -> NodeDict:
    """Build the dense-id dictionary from per-kind key arrays (already distinct)."""
    comp_parts, kinds_parts, keys_parts = [], [], []
    for kind in sorted(kind_keys):
        keys = np.asarray(kind_keys[kind], dtype="U")
        keys = np.unique(keys)
        comp_parts.append(np.char.add(kind + ":", keys))
        kinds_parts.append(np.full(len(keys), kind, dtype="U16"))
        keys_parts.append(keys)
    comp = np.concatenate(comp_parts) if comp_parts else np.array([], dtype="U1")
    order = np.argsort(comp, kind="stable")
    kinds_all = np.concatenate(kinds_parts)[order]
    keys_all = np.concatenate(keys_parts)[order]
    return NodeDict(
        kinds=comp[order],
        kind_col=pa.array(kinds_all, pa.string()),
        key_col=pa.array(keys_all, pa.string()),
    )


@dataclass
class LinkGraph:
    """A materialized edge table + node dictionary, the engine's graph handle.

    ``edges`` is a (src:int64, dst:int64, kind:string) Ray Dataset,
    materialized once (the per-superstep loop re-reads it every round).
    """

    edges: ray.data.Dataset
    n_nodes: int
    node_dict_ref: "ray.ObjectRef" = field(repr=False)
    node_table: pa.Table = field(repr=False)

    def edge_subset(self, kinds: tuple[str, ...] | None) -> ray.data.Dataset:
        if not kinds:
            return self.edges
        import pyarrow.compute as pc

        ks = list(kinds)
        return self.edges.map_batches(
            lambda t: t.filter(pc.is_in(t["kind"], value_set=pa.array(ks))),
            batch_format="pyarrow",
        )

    def directed(self, kinds: tuple[str, ...] | None = None) -> ray.data.Dataset:
        return self.edge_subset(kinds).select_columns(["src", "dst"])

    def undirected(self, kinds: tuple[str, ...] | None = None) -> ray.data.Dataset:
        """Symmetrized edge set (both directions, self-loops dropped, deduped)."""
        import pyarrow.compute as pc

        def sym(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["src"], t["dst"]))
            fwd = pa.table({"src": t["src"], "dst": t["dst"]})
            rev = pa.table({"src": t["dst"], "dst": t["src"]})
            both = pa.concat_tables([fwd, rev])
            return both.group_by(["src", "dst"]).aggregate([])

        ds = self.edge_subset(kinds).map_batches(sym, batch_format="pyarrow")
        return ds.groupby(["src", "dst"]).count().drop_columns(["count()"])

    def oriented(self, kinds: tuple[str, ...] | None = None) -> ray.data.Dataset:
        """Canonical undirected representation: one row per edge with src < dst."""
        import pyarrow.compute as pc

        def orient(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["src"], t["dst"]))
            lo = pc.min_element_wise(t["src"], t["dst"])
            hi = pc.max_element_wise(t["src"], t["dst"])
            return (
                pa.table({"src": lo, "dst": hi}).group_by(["src", "dst"]).aggregate([])
            )

        ds = self.edge_subset(kinds).map_batches(orient, batch_format="pyarrow")
        return ds.groupby(["src", "dst"]).count().drop_columns(["count()"])

    def out_degrees(self, kinds: tuple[str, ...] | None = None) -> np.ndarray:
        """Dense out-degree vector (len n_nodes), small enough to broadcast."""
        deg = np.zeros(self.n_nodes, dtype=np.int64)
        for batch in (
            self.directed(kinds)
            .groupby("src")
            .count()
            .iter_batches(batch_format="pyarrow")
        ):
            deg[batch["src"].to_numpy()] = batch["count()"].to_numpy()
        return deg


def _lookup_series(nd: NodeDict, kinds: pd.Series, keys: pd.Series) -> np.ndarray:
    """Vectorized (kind, key) → dense id via searchsorted on the sorted dict."""
    comp = (kinds + ":" + keys).to_numpy(dtype="U")
    ids = np.searchsorted(nd.kinds, comp)
    bad = (ids >= nd.n) | (nd.kinds[np.minimum(ids, nd.n - 1)] != comp)
    if bad.any():
        raise KeyError(f"unknown node keys, e.g. {comp[bad][:3]}")
    return ids.astype(np.int64)


def build_link_graph(
    transcripts: ray.data.Dataset,
    kinds: tuple[str, ...] = EDGE_KINDS,
) -> LinkGraph:
    """transcripts Dataset → LinkGraph (edges materialized, ids dense).

    Pipeline: derive the three string-keyed pair tables (each ends in a
    dedup groupby — the only wide steps), collect the distinct node keys,
    build + broadcast the sorted dictionary, then encode endpoints to int64
    in a stateless ``map_batches`` pass and materialize the edge table.
    """
    key_tables: list[tuple[str, ray.data.Dataset, str, str, str, str]] = []
    # (kind, pairs_ds, src_kind, src_col, dst_kind, dst_col)
    if "conv_tool" in kinds:
        key_tables.append(("conv_tool", conv_tool_pairs(transcripts), "conv", "conv_id", "tool", "tool"))
    if "reply" in kinds:
        key_tables.append(("reply", reply_pairs(transcripts), "turn", "src_idx", "turn", "dst_idx"))
    if "tool_cooc" in kinds:
        key_tables.append(("tool_cooc", tool_cooc_pairs(transcripts), "tool", "tool_a", "tool", "tool_b"))

    # normalize each pair table to (src_kind, src_key, dst_kind, dst_key, kind)
    def normalizer(kind: str, sk: str, sc: str, dk: str, dc: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if kind == "reply":
                src_key = _turn_key(df["conv_id"], df["src_idx"])
                dst_key = _turn_key(df["conv_id"], df["dst_idx"])
            else:
                src_key = df[sc].astype(str)
                dst_key = df[dc].astype(str)
            return pd.DataFrame(
                {
                    "src_kind": sk,
                    "src_key": src_key,
                    "dst_kind": dk,
                    "dst_key": dst_key,
                    "kind": kind,
                }
            )

        return fn

    normalized = [
        ds.map_batches(normalizer(kind, sk, sc, dk, dc), batch_format="pandas")
        for kind, ds, sk, sc, dk, dc in key_tables
    ]
    pairs = normalized[0]
    for other in normalized[1:]:
        pairs = pairs.union(other)
    pairs = pairs.materialize()

    # distinct node keys per kind — small relative to input; collected to the
    # driver to build the id dictionary (10^12-scale note in module docstring).
    kind_keys: dict[str, list[np.ndarray]] = {}
    for batch in pairs.iter_batches(batch_format="pandas"):
        for kcol, keycol in (("src_kind", "src_key"), ("dst_kind", "dst_key")):
            for kind, sub in batch.groupby(kcol):
                kind_keys.setdefault(kind, []).append(
                    sub[keycol].to_numpy(dtype="U")
                )
    nd = build_node_dict(
        {k: np.unique(np.concatenate(v)) for k, v in kind_keys.items()}
    )
    ref = ray.put(nd)

    # plain tasks, not an actor pool: the broadcast dictionary is a zero-copy
    # shared-memory read per task, and a pool pinning `concurrency` CPUs can
    # starve concurrent stages on small clusters
    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        nd_local: NodeDict = ray.get(ref)
        return pd.DataFrame(
            {
                "src": _lookup_series(nd_local, batch["src_kind"], batch["src_key"]),
                "dst": _lookup_series(nd_local, batch["dst_kind"], batch["dst_key"]),
                "kind": batch["kind"].to_numpy(),
            }
        )

    edges = pairs.map_batches(encode, batch_format="pandas").materialize()
    return LinkGraph(
        edges=edges, n_nodes=nd.n, node_dict_ref=ref, node_table=nd.to_table()
    )
