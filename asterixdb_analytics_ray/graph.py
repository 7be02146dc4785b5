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


def conv_tool_pairs(
    ds: ray.data.Dataset, weighted: bool = False
) -> ray.data.Dataset:
    """Distinct (conv_id, tool) pairs on tool turns. One groupby-dedup shuffle.

    ``weighted=True`` adds ``w`` = number of turns in the conversation that
    used the tool (the usage-count edge weight): per-batch partial counts,
    then one sum-groupby — same shuffle, combiner-reduced rows."""
    import pyarrow.compute as pc

    if weighted:
        from ray.data.aggregate import Sum

        def local_w(batch: pa.Table) -> pa.Table:
            t = batch.select(["conv_id", "tool"]).filter(
                pc.is_valid(batch["tool"])
            )
            g = t.group_by(["conv_id", "tool"]).aggregate([([], "count_all")])
            return g.rename_columns(["conv_id", "tool", "w"])

        partial = ds.select_columns(["conv_id", "tool"]).map_batches(
            local_w, batch_format="pyarrow"
        )
        summed = partial.groupby(["conv_id", "tool"]).aggregate(
            Sum("w", alias_name="w")
        )
        return summed

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "tool"]).filter(pc.is_valid(batch["tool"]))
        return t.group_by(["conv_id", "tool"]).aggregate([])  # local pre-dedup

    pairs = ds.select_columns(["conv_id", "tool"]).map_batches(
        local, batch_format="pyarrow"
    )
    return pairs.groupby(["conv_id", "tool"]).count().drop_columns(["count()"])


def reply_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(conv_id, turn_idx - 1) → (conv_id, turn_idx) for consecutive turns.

    ``turn_idx`` is 0-based and DENSE per conversation (the input-hint
    contract), so every turn with idx > 0 has a predecessor — the edge list
    falls out of a stateless vectorized ``map_batches`` with NO shuffle.
    (A sort-based per-conversation variant would be needed only for sparse
    turn indices; the reference's text inputs are likewise dense.)
    """
    import pyarrow.compute as pc

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["turn_idx"], 0))
        idx = t["turn_idx"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "src_idx": idx - 1,
                "dst_idx": idx,
            }
        )

    return ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        pairs, batch_format="pyarrow"
    )


def tool_cooc_pairs(
    ds: ray.data.Dataset,
    conv_tool: ray.data.Dataset | None = None,
    weighted: bool = False,
) -> ray.data.Dataset:
    """Distinct ordered tool pairs (a < b) co-occurring within a conversation.

    Expressed as a self-join of the distinct (conv_id, tool) table on conv_id
    (vectorized hash join) followed by a dedup groupby — no per-conversation
    Python. Join fan-out per conversation is bounded by tools-per-conv².
    ``weighted=True`` adds ``w`` = number of conversations sharing the pair.
    """
    import pyarrow.compute as pc

    from .stages.blocks import effective_partitions, safe_join

    ct = conv_tool if conv_tool is not None else conv_tool_pairs(ds).materialize()
    if "w" in ct.schema().names:
        ct = ct.select_columns(["conv_id", "tool"])
    right = ct.map_batches(
        lambda t: pa.table({"conv_id": t["conv_id"], "tool_b": t["tool"]}),
        batch_format="pyarrow",
    )
    # data-proportional join partitions (see blocks.partitions_for)
    from .stages.blocks import partitions_for

    joined = safe_join(ct, right, "inner", partitions_for(ct.count()), on=("conv_id",))

    if weighted:
        from ray.data.aggregate import Sum

        def ordered_w(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["tool"], t["tool_b"]))
            # (conv_id, a, b) rows are distinct (ct is deduped), so the
            # per-batch count is a partial per-pair conversation count
            g = (
                pa.table({"tool_a": t["tool"], "tool_b": t["tool_b"]})
                .group_by(["tool_a", "tool_b"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["tool_a", "tool_b", "w"])

        return (
            joined.map_batches(ordered_w, batch_format="pyarrow")
            .groupby(["tool_a", "tool_b"])
            .aggregate(Sum("w", alias_name="w"))
        )

    def keep_ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["tool"], t["tool_b"]))
        return pa.table({"tool_a": t["tool"], "tool_b": t["tool_b"]}).group_by(
            ["tool_a", "tool_b"]
        ).aggregate([])

    pairs = joined.map_batches(keep_ordered, batch_format="pyarrow")
    return pairs.groupby(["tool_a", "tool_b"]).count().drop_columns(["count()"])


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


def undirected_from_oriented(oriented: ray.data.Dataset) -> ray.data.Dataset:
    """(src<dst distinct pairs) → both-direction edge set; stateless, no shuffle."""

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        )

    return oriented.map_batches(both, batch_format="pyarrow")


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

    def weighted_directed(
        self, kinds: tuple[str, ...] | None = None
    ) -> ray.data.Dataset:
        """(src, dst, w) — requires ``build_link_graph(..., weighted=True)``."""
        if "w" not in self.edges.schema().names:
            raise ValueError(
                "graph built without weights; pass weighted=True to "
                "build_link_graph"
            )
        return self.edge_subset(kinds).select_columns(["src", "dst", "w"])

    def weighted_out_sums(
        self, kinds: tuple[str, ...] | None = None
    ) -> np.ndarray:
        """Dense per-src Σw vector (float64; weights are integral counts so
        the sums are exact) — the weighted analog of ``out_degrees``, same
        sparse-partial pattern, feeds the dense BSP state."""

        def partial(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy()
            w = t["w"].to_numpy().astype(np.float64)
            ids, inv = np.unique(src, return_inverse=True)
            return pa.table({"v": ids, "s": np.bincount(inv, weights=w)})

        out = np.zeros(self.n_nodes, dtype=np.float64)
        for b in (
            self.weighted_directed(kinds)
            .map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            np.add.at(out, b["v"].to_numpy(), b["s"].to_numpy())
        return out

    def undirected(self, kinds: tuple[str, ...] | None = None) -> ray.data.Dataset:
        """Symmetrized edge set (both directions, self-loops dropped, deduped).

        Derived from the oriented view: the src<dst dedup is the ONE wide
        shuffle, after which emitting both directions is stateless. Pass an
        already-materialized oriented dataset to ``undirected_from_oriented``
        to share that shuffle when both views are needed."""
        return undirected_from_oriented(self.oriented(kinds))

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
        return self._degrees("src", kinds)

    def in_degrees(self, kinds: tuple[str, ...] | None = None) -> np.ndarray:
        return self._degrees("dst", kinds)

    def degrees_both(
        self, kinds: tuple[str, ...] | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(out_degrees, in_degrees) in ONE pass over the edge table — the
        same sparse-partial pattern as ``_degrees`` with a side flag."""

        def partial(t: pa.Table) -> pa.Table:
            s_ids, s_cnt = np.unique(t["src"].to_numpy(), return_counts=True)
            d_ids, d_cnt = np.unique(t["dst"].to_numpy(), return_counts=True)
            return pa.table(
                {
                    "v": np.concatenate([s_ids, d_ids]),
                    "c": np.concatenate([s_cnt, d_cnt]),
                    "is_dst": np.concatenate(
                        [
                            np.zeros(len(s_ids), dtype=bool),
                            np.ones(len(d_ids), dtype=bool),
                        ]
                    ),
                }
            )

        out = np.zeros(self.n_nodes, dtype=np.int64)
        ind = np.zeros(self.n_nodes, dtype=np.int64)
        for b in (
            self.directed(kinds)
            .map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            v = b["v"].to_numpy()
            c = b["c"].to_numpy()
            m = b["is_dst"].to_numpy(zero_copy_only=False)
            np.add.at(out, v[~m], c[~m])
            np.add.at(ind, v[m], c[m])
        return out, ind

    def _degrees(self, col: str, kinds: tuple[str, ...] | None) -> np.ndarray:
        """Per-block SPARSE partial counts (unique ids + counts, tiny) summed
        into the dense vector on the driver — degrees feed the dense BSP
        state, so n_nodes×8B fits by construction, and the partial pattern
        (combine inside map_batches, scatter-add final reduce) avoids the
        groupby shuffle a count-by-key would pay."""

        def partial(t: pa.Table) -> pa.Table:
            ids, cnt = np.unique(t[col].to_numpy(), return_counts=True)
            return pa.table({"v": ids, "c": cnt})

        deg = np.zeros(self.n_nodes, dtype=np.int64)
        for batch in (
            self.directed(kinds)
            .map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            np.add.at(deg, batch["v"].to_numpy(), batch["c"].to_numpy())
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
    weighted: bool = False,
) -> LinkGraph:
    """transcripts Dataset → LinkGraph (edges materialized, ids dense).

    Pipeline: derive the three string-keyed pair tables (each ends in a
    dedup groupby — the only wide steps), collect the distinct node keys,
    build + broadcast the sorted dictionary, then encode endpoints to int64
    in a stateless ``map_batches`` pass and materialize the edge table.

    ``weighted=True`` carries a ``w:float64`` edge-weight column end-to-end
    (the reference's Edge<I,E> value channel — ``Edge.java``; its SSSP relaxes
    with it, ``ShortestPathsVertex.java:138-139``): conv_tool w = tool-usage
    count within the conversation, reply w = 1, tool_cooc w = number of
    conversations sharing the pair.
    """
    key_tables: list[tuple[str, ray.data.Dataset, str, str, str, str]] = []
    # (kind, pairs_ds, src_kind, src_col, dst_kind, dst_col)
    ct = (
        conv_tool_pairs(transcripts, weighted=weighted).materialize()
        if ("conv_tool" in kinds or "tool_cooc" in kinds)
        else None
    )
    if "conv_tool" in kinds:
        key_tables.append(("conv_tool", ct, "conv", "conv_id", "tool", "tool"))
    if "reply" in kinds:
        key_tables.append(("reply", reply_pairs(transcripts), "turn", "src_idx", "turn", "dst_idx"))
    if "tool_cooc" in kinds:
        key_tables.append(("tool_cooc", tool_cooc_pairs(transcripts, conv_tool=ct, weighted=weighted), "tool", "tool_a", "tool", "tool_b"))

    # normalize each pair table to (src_kind, src_key, dst_kind, dst_key, kind)
    def normalizer(kind: str, sk: str, sc: str, dk: str, dc: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if kind == "reply":
                src_key = _turn_key(df["conv_id"], df["src_idx"])
                dst_key = _turn_key(df["conv_id"], df["dst_idx"])
            else:
                src_key = df[sc].astype(str)
                dst_key = df[dc].astype(str)
            out = {
                "src_kind": sk,
                "src_key": src_key,
                "dst_kind": dk,
                "dst_key": dst_key,
                "kind": kind,
            }
            if weighted:
                out["w"] = (
                    df["w"].to_numpy().astype(np.float64)
                    if "w" in df.columns
                    else np.ones(len(df), dtype=np.float64)
                )
            return pd.DataFrame(out)

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
        out = {
            "src": _lookup_series(nd_local, batch["src_kind"], batch["src_key"]),
            "dst": _lookup_series(nd_local, batch["dst_kind"], batch["dst_key"]),
            "kind": batch["kind"].to_numpy(),
        }
        if "w" in batch.columns:
            out["w"] = batch["w"].to_numpy()
        return pd.DataFrame(out)

    edges = pairs.map_batches(encode, batch_format="pandas").materialize()
    return LinkGraph(
        edges=edges, n_nodes=nd.n, node_dict_ref=ref, node_table=nd.to_table()
    )


# ---------------------------------------------------------------------------
# structured-id build (the 10^12-turn path: no string dictionary)
# ---------------------------------------------------------------------------

MAX_TURNS_SLOT = 32  # id-space slot width per conversation (turns ≤ 16 here)


@dataclass
class StructuredIds:
    """Arithmetic id layout: no dictionary, no shuffle, no driver state.

    turn(c, i) = c·MAX_TURNS_SLOT + i          ∈ [0, C·S)
    conv(c)    = C·S + c                       ∈ [C·S, C·(S+1))
    tool(t)    = C·(S+1) + t                   ∈ [C·(S+1), C·(S+1)+T)

    Ids are dense enough for dense-mode state vectors (≤ (S+1)/avg_turns ≈ 3×
    overhead); slots for absent vertices have no edges and are masked out of
    reported results. The dictionary path stays the oracle-comparable mode.
    """

    n_convs: int
    n_tools: int
    slot: int = MAX_TURNS_SLOT

    @property
    def n_space(self) -> int:
        return self.n_convs * (self.slot + 1) + self.n_tools

    def turn_id(self, conv_idx, turn_idx):
        return conv_idx * np.int64(self.slot) + turn_idx

    def conv_id(self, conv_idx):
        return np.int64(self.n_convs) * self.slot + conv_idx

    def tool_id(self, tool_rank):
        return np.int64(self.n_convs) * (self.slot + 1) + tool_rank


def _parse_suffix_int(col: pa.ChunkedArray | pa.Array, prefix_len: int) -> pa.Array:
    import pyarrow.compute as pc

    return pc.cast(pc.utf8_slice_codeunits(col, prefix_len), pa.int64())


def build_link_graph_structured(
    transcripts: ray.data.Dataset,
    kinds: tuple[str, ...] = EDGE_KINDS,
    n_convs: int | None = None,
    n_tools: int | None = None,
) -> tuple[LinkGraph, StructuredIds]:
    """Structured-id edge build: vectorized int parsing, zero driver state.

    Requires the generator's key formats (``c%07d`` conv ids, ``tool_%03d``
    tool names) — i.e. integer-convertible keys, the standard situation at
    10^12 scale where keys are already numeric. Node ids come from arithmetic
    (``StructuredIds``), so the only shuffles left are the dedup groupbys for
    conv_tool / tool_cooc; reply edges need no shuffle at all.
    """
    import pyarrow.compute as pc

    from .stages.blocks import effective_partitions, safe_join

    if n_convs is None or n_tools is None:

        def maxes(t: pa.Table) -> pa.Table:
            c = _parse_suffix_int(t["conv_id"], 1)
            tools = t.filter(pc.is_valid(t["tool"]))
            tr = _parse_suffix_int(tools["tool"], 5)
            return pa.table(
                {
                    "max_conv": [pc.max(c).as_py()],
                    "max_tool": [pc.max(tr).as_py() if tools.num_rows else -1],
                }
            )

        mm = (
            transcripts.select_columns(["conv_id", "tool"])
            .map_batches(maxes, batch_format="pyarrow")
            .to_pandas()
        )
        n_convs = int(mm["max_conv"].max()) + 1
        n_tools = int(mm["max_tool"].max()) + 1
    ids = StructuredIds(n_convs=n_convs, n_tools=n_tools)

    parts: list[ray.data.Dataset] = []

    def ct_ints(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["tool"]))
        return pa.table(
            {
                "c": _parse_suffix_int(t["conv_id"], 1),
                "t": _parse_suffix_int(t["tool"], 5),
            }
        ).group_by(["c", "t"]).aggregate([])

    ct = None
    if "conv_tool" in kinds or "tool_cooc" in kinds:
        ct = (
            transcripts.select_columns(["conv_id", "tool"])
            .map_batches(ct_ints, batch_format="pyarrow")
            .groupby(["c", "t"])
            .count()
            .drop_columns(["count()"])
            .materialize()
        )
    if "conv_tool" in kinds:
        parts.append(
            ct.map_batches(
                lambda t: pa.table(
                    {
                        "src": ids.conv_id(t["c"].to_numpy()),
                        "dst": ids.tool_id(t["t"].to_numpy()),
                        "kind": np.full(t.num_rows, "conv_tool", dtype=object),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    if "reply" in kinds:

        def reply_edges(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t["turn_idx"], 0))
            c = _parse_suffix_int(t["conv_id"], 1).to_numpy()
            i = t["turn_idx"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "src": ids.turn_id(c, i - 1),
                    "dst": ids.turn_id(c, i),
                    "kind": np.full(len(i), "reply", dtype=object),
                }
            )

        parts.append(
            transcripts.select_columns(["conv_id", "turn_idx"]).map_batches(
                reply_edges, batch_format="pyarrow"
            )
        )
    if "tool_cooc" in kinds:
        right = ct.map_batches(
            lambda t: pa.table({"c": t["c"], "t2": t["t"]}), batch_format="pyarrow"
        )
        from .stages.blocks import partitions_for

        joined = safe_join(
            ct, right, "inner", partitions_for(ct.count()), on=("c",)
        )

        def ordered(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["t"], t["t2"]))
            return pa.table({"a": t["t"], "b": t["t2"]}).group_by(["a", "b"]).aggregate([])

        cooc = (
            joined.map_batches(ordered, batch_format="pyarrow")
            .groupby(["a", "b"])
            .count()
            .drop_columns(["count()"])
        )
        parts.append(
            cooc.map_batches(
                lambda t: pa.table(
                    {
                        "src": ids.tool_id(t["a"].to_numpy()),
                        "dst": ids.tool_id(t["b"].to_numpy()),
                        "kind": np.full(t.num_rows, "tool_cooc", dtype=object),
                    }
                ),
                batch_format="pyarrow",
            )
        )

    edges = parts[0]
    for other in parts[1:]:
        edges = edges.union(other)
    edges = edges.materialize()
    graph = LinkGraph(
        edges=edges,
        n_nodes=ids.n_space,
        node_dict_ref=None,
        node_table=None,
    )
    return graph, ids


def conv_share_graph(
    transcripts: ray.data.Dataset, window: int = 32
) -> tuple[ray.data.Dataset, int]:
    """Conv co-usage projection: windowed conv→conv edges per shared tool.

    For every tool, its (sorted) conversations are linked to the next
    ``window`` conversations — a bounded-degree projection of the bipartite
    conv–tool graph (the full projection through Zipf hub tools would be
    quadratic; the window keeps |E| = window·|conv_tool| while preserving the
    hub-induced connectivity). Multi-edges across tools are kept (multigraph
    semantics — PageRank treats them as weights), so no dedup shuffle.

    Node ids are the raw conv indices (dense [0, C)); returns (edges, C).
    This is the EDGE-HEAVY workload used for the cluster-size scaling
    evidence: state per vertex is small relative to per-round edge compute,
    which is what a billion-edge production graph looks like (avg degree
    ≫ 1), unlike the turn-chain graph whose degree is ~1.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def ct_ints(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["tool"]))
        return pa.table(
            {
                "c": _parse_suffix_int(t["conv_id"], 1),
                "t": _parse_suffix_int(t["tool"], 5),
            }
        ).group_by(["c", "t"]).aggregate([])

    ct = (
        transcripts.select_columns(["conv_id", "tool"])
        .map_batches(ct_ints, batch_format="pyarrow")
        .groupby(["c", "t"])
        .count()
        .drop_columns(["count()"])
    )

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(g["c"].to_numpy())
        if len(c) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        srcs, dsts = [], []
        for w in range(1, min(window, len(c) - 1) + 1):
            srcs.append(c[:-w])
            dsts.append(c[w:])
        return pd.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )

    edges = ct.groupby("t").map_groups(windows, batch_format="pandas")
    mm = transcripts.map_batches(
        lambda t: pa.table({"m": [pc.max(_parse_suffix_int(t["conv_id"], 1)).as_py()]}),
        batch_format="pyarrow",
    ).to_pandas()
    return edges, int(mm["m"].max()) + 1
