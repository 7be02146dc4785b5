"""Label propagation — synchronous mode/argmax variant of min-label CC.

The reference ships no standalone LP example (its ConnectedComponentsVertex
IS min-label propagation — SURVEY.md §2.4); this is the engine's documented
histogram variant: each round every vertex adopts the most frequent label
among its neighbors, ties broken to the smallest label, for a fixed number of
synchronous rounds. Initial label = vertex id. Runs over the symmetrized
edge set.

The combine step is a two-key aggregation (count per (vertex, label) then
argmax per vertex) — the reference's DefaultMessageCombiner/"no combining"
case (``api/util/DefaultMessageCombiner.java``) where messages can't fold
into a single scalar. Per-batch pre-combine still applies: (dst, label)
pairs are packed into one int64 key (label-count partials), bounding shuffle
rows by unique pairs per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.blocks import materialize_clean, safe_join
from ..functions.combiners import SUM


def _argmax_labels(
    pv: np.ndarray, pl: np.ndarray, counts: np.ndarray, label: np.ndarray
) -> np.ndarray:
    """Per-vertex argmax(count) with min-label tie-break, vectorized."""
    order = np.lexsort((pl, -counts, pv))
    pv, pl = pv[order], pl[order]
    first = np.concatenate(([True], pv[1:] != pv[:-1])) if len(pv) else np.array([], bool)
    new = label.copy()
    new[pv[first]] = pl[first]
    return new


def label_propagation_dense(
    undirected_edges: ray.data.Dataset,
    n: int,
    rounds: int = 5,
    scatter_batch_size: int | None = 65536,
    max_driver_rows: int = 50_000_000,
) -> np.ndarray:
    """Dense-mode LP → label vector after ``rounds`` synchronous rounds.

    The driver-side combine holds O(unique (dst, label) pairs) rows per
    round — O(E) when labels are near-distinct (round 1 always is).  Dense
    mode is the documented small-graph path, so that budget is ENFORCED:
    a round whose partials exceed ``max_driver_rows`` (~16 B/row) raises
    instead of silently ballooning the driver; use ``ShardedLabelProp``
    (the scale path, identical semantics) or ``label_propagation_dataset``
    (all-shuffle combine) beyond it."""
    label = np.arange(n, dtype=np.int64)
    nn = np.int64(n)
    for _ in range(rounds):
        label_ref = ray.put(label)

        def scatter(batch: pa.Table) -> pa.Table:
            lab = ray.get(label_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            packed = dst * nn + lab[src]  # (dst, label) → one int64 key
            k, c = SUM.segment_reduce(packed, np.ones(len(packed), dtype=np.int64))
            return pa.table({"key": k, "cnt": c})

        # combine partial (dst,label) counts driver-side: rows ≤ unique pairs
        parts_k, parts_c = [], []
        seen = 0
        for b in undirected_edges.map_batches(
            scatter, batch_format="pyarrow", batch_size=scatter_batch_size
        ).iter_batches(batch_format="pyarrow"):
            seen += b.num_rows
            if seen > max_driver_rows:
                raise ValueError(
                    f"dense LP driver combine exceeded max_driver_rows="
                    f"{max_driver_rows} (unique (dst,label) partials); use "
                    "ShardedLabelProp or label_propagation_dataset at this "
                    "scale"
                )
            parts_k.append(b["key"].to_numpy())
            parts_c.append(b["cnt"].to_numpy())
        if not parts_k:
            break
        k, c = SUM.segment_reduce(np.concatenate(parts_k), np.concatenate(parts_c))
        label = _argmax_labels((k // nn), (k % nn), c, label)
    return label


def label_propagation_dataset(
    undirected_edges: ray.data.Dataset,
    n: int,
    rounds: int = 5,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Dataset-mode LP → (v:int64, label:int64).

    Combine = ``groupby(["v","label"]).Sum`` then per-vertex argmax via a
    SECOND vectorized aggregate: (count, inverted label) packed into one
    int64 comparison key so ``groupby("v").max`` IS argmax-count with
    min-label tie-break — no per-vertex Python (the packing requires
    count·n + n ≤ 2^63, i.e. n ≲ 3·10^9 vertices; beyond that widen to a
    two-column max). Both aggregates are true shuffles keyed on the vertex.
    """
    from ray.data.aggregate import Max, Sum

    P = num_partitions
    state = ray.data.range(n).map_batches(
        lambda b: pa.table(
            {"v": b["id"].astype(np.int64), "label": b["id"].astype(np.int64)}
        ),
        batch_format="numpy",
    ).materialize()

    for _ in range(rounds):
        joined = safe_join(undirected_edges, state, "inner", P, on=("src",), right_on=("v",))

        def emit(t: pa.Table) -> pa.Table:
            dst = t["dst"].to_numpy()
            lab = t["label"].to_numpy()
            packed = dst * np.int64(n) + lab
            k, c = SUM.segment_reduce(packed, np.ones(len(packed), dtype=np.int64))
            return pa.table({"v": k // n, "nbr_label": k % n, "cnt": c})

        counts = (
            joined.map_batches(emit, batch_format="pyarrow")
            .groupby(["v", "nbr_label"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )

        def pack(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy()
            lab = t["nbr_label"].to_numpy()
            return pa.table(
                {"v": t["v"], "cmp": cnt * np.int64(n) + (np.int64(n) - 1 - lab)}
            )

        def decode(t: pa.Table) -> pa.Table:
            cmp = t["cmp"].to_numpy()
            return pa.table(
                {"v": t["v"], "new_label": np.int64(n) - 1 - (cmp % np.int64(n))}
            )

        winners = (
            counts.map_batches(pack, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Max("cmp", alias_name="cmp"))
            .map_batches(decode, batch_format="pyarrow")
        )

        def apply_lbl(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            new = pc.if_else(
                pc.is_valid(t["new_label"]), t["new_label"], t["label"]
            )
            return pa.table({"v": t["v"], "label": new})

        state = safe_join(state, winners, "left_outer", P, on=("v",)).map_batches(
            apply_lbl, batch_format="pyarrow"
        )
        state = materialize_clean(state)
    return state
