"""Minimum spanning forest via Borůvka rounds (Borůvka 1926; the classic
data-parallel MST — each round every component picks its lightest outgoing
edge, chosen edges merge components, O(log n) rounds).

Determinism/uniqueness contract: edges are totally ordered by the encoded
key ``(w, a, b)`` (integer weight, then endpoint ids), which makes the
minimum spanning forest UNIQUE — independent of algorithm and schedule —
so the result is a pure function of the graph and the brute-force Kruskal
ground truth in the tests must match edge-for-edge.  Key encoding bounds
(asserted): w < 2^19, ids < 2^22 — at larger scales widen the key to two
int64 lanes.

Plan shape per round (the dense-driver path, same class as the dense
PageRank driver loop and ``tool_scc``'s bounded closure — documented):

* the edge-heavy work is DISTRIBUTED: one ``map_batches`` pass over the
  weighted oriented edge Dataset computes per-component partial min-keys
  (two-sided, ``np.minimum.at`` per block), merged on the driver into the
  O(n_comp) choice vector;
* the merge closure runs on the driver over O(n) numpy arrays: hook every
  component to ``min(self, partner)``, then min-pointer-jumping
  (``label ← min(label, label[label])``) — distances halve per step, so
  the loop is ≤ ~log₂(n) numpy passes, no Python row loops;
* rounds stop when no cross-component edge remains (spanning forest
  complete).

There is NO SQL oracle for this operator: the round count is
data-dependent and the within-round merge is an iterate-to-fixpoint —
the documented non-SQL-expressible category (the driver records the
rows-only check).  Correctness is pinned by the unique-MSF Kruskal
ground-truth tests instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_W_BITS = 19
_ID_BITS = 22


def _encode(w: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    assert w.max(initial=0) < (1 << _W_BITS), "weight exceeds key bound"
    return (
        (w.astype(np.int64) << (2 * _ID_BITS))
        | (a.astype(np.int64) << _ID_BITS)
        | b.astype(np.int64)
    )


def minimum_spanning_forest(
    weighted_oriented: ray.data.Dataset,
    n: int,
    max_rounds: int = 40,
) -> pa.Table:
    """(a, b, w: int64) — the unique minimum spanning forest under the
    (w, a, b) total order, sorted by (a, b).

    ``weighted_oriented``: (a, b, w) with a < b, one row per undirected
    edge, integral weights."""
    assert n < (1 << _ID_BITS), "vertex ids exceed key bound"
    edges = weighted_oriented.materialize()
    comp = np.arange(n, dtype=np.int64)
    chosen_keys: set[int] = set()

    for _ in range(max_rounds):
        cref = ray.put(comp)

        def per_block(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = np.rint(
                t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
            ).astype(np.int64)
            ca, cb = c[a], c[b]
            m = ca != cb
            if not m.any():
                return pa.table(
                    {
                        "comp": pa.array([], pa.int64()),
                        "key": pa.array([], pa.int64()),
                    }
                )
            key = _encode(w[m], a[m], b[m])
            comps = np.concatenate([ca[m], cb[m]])
            keys = np.concatenate([key, key])
            uc, inv = np.unique(comps, return_inverse=True)
            best = np.full(len(uc), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(best, inv, keys)
            return pa.table({"comp": uc, "key": best})

        parts = edges.map_batches(per_block, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(
            best,
            parts["comp"].to_numpy(np.int64),
            parts["key"].to_numpy(np.int64),
        )
        has = best < np.iinfo(np.int64).max
        if not has.any():
            break
        keys = best[has]
        ea = (keys >> _ID_BITS) & ((1 << _ID_BITS) - 1)
        eb = keys & ((1 << _ID_BITS) - 1)
        chosen_keys.update(keys.tolist())

        # merge: min-label closure over the chosen comp-graph —
        # Shiloach–Vishkin-style alternating GOSSIP (edge min exchange)
        # and POINTER JUMPING (label ← min(label, label[label])), every
        # step a vectorized numpy pass, run to fixpoint (monotone
        # decreasing ⇒ guaranteed; jumping keeps the pass count ~log)
        ca, cb = comp[ea], comp[eb]
        label = np.arange(n, dtype=np.int64)
        while True:
            prev = label
            nxt = label.copy()
            np.minimum.at(nxt, ca, label[cb])
            np.minimum.at(nxt, cb, label[ca])
            nxt = np.minimum(nxt, nxt[nxt])
            nxt = np.minimum(nxt, nxt[nxt])
            if (nxt == prev).all():
                break
            label = nxt
        comp = label[comp]

    if chosen_keys:
        ks = np.fromiter(chosen_keys, dtype=np.int64, count=len(chosen_keys))
        ks.sort()
        a = (ks >> _ID_BITS) & ((1 << _ID_BITS) - 1)
        b = ks & ((1 << _ID_BITS) - 1)
        w = ks >> (2 * _ID_BITS)
        order = np.lexsort((b, a))
        return pa.table(
            {"a": a[order], "b": b[order], "w": w[order]}
        )
    return pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }
    )
