"""Message combiners — the engine's analog of Pregelix's MessageCombiner.

Reference: ``pregelix-api/.../api/graph/MessageCombiner.java:39-113`` defines a
two-phase combine (stepPartial before the shuffle, stepFinal after); concrete
combiners ``SimpleSumCombiner`` (PageRank, ``PageRankVertex.java:64-116``) and
``SimpleMinCombiner`` (CC/SSSP, ``ConnectedComponentsVertex.java:47-103``).

Here a combiner is one algebraic reduction used in three places:
1. per-batch pre-combine inside the scatter ``map_batches`` (sort +
   ``np.add.reduceat``-style segment reduce) — Pregelix's local combine;
2. the ``groupby("v").aggregate(...)`` shuffle combine (dataset mode) —
   Ray Data aggregates already do per-block partial + final merge, matching
   stepPartial/stepFinal exactly;
3. the driver-side dense-vector assembly (dense mode) via ``np.<op>.at``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np


@dataclass(frozen=True)
class Combiner:
    name: str
    identity: float | int
    ufunc: np.ufunc  # must be a reducing ufunc: add / minimum / maximum / bitwise_or

    def segment_reduce(
        self, keys: np.ndarray, vals: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Pre-combine (key, val) pairs within one batch: unique keys + reduced vals."""
        if len(keys) == 0:
            return keys, vals
        order = np.argsort(keys, kind="stable")
        k, v = keys[order], vals[order]
        cuts = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate(([0], cuts))
        return k[starts], self.ufunc.reduceat(v, starts)

    def scatter_dense(
        self, target: np.ndarray, keys: np.ndarray, vals: np.ndarray
    ) -> None:
        """Accumulate (key, val) pairs into a dense vector in place."""
        self.ufunc.at(target, keys, vals)

    def ray_aggregate(self, on: str, alias: str):
        """The Ray Data AggregateFn for the post-shuffle combine (dataset mode)."""
        from ray.data.aggregate import Max, Min, Sum

        if self.ufunc is np.add:
            return Sum(on, alias_name=alias)
        if self.ufunc is np.minimum:
            return Min(on, alias_name=alias)
        if self.ufunc is np.maximum or self.ufunc is np.bitwise_or:
            # bitwise-or over non-negative ints == max only for single bits;
            # OR needs a custom fold — handled via max on promoted masks or a
            # custom AggregateFn by the caller. Default to Max for max.
            if self.ufunc is np.maximum:
                return Max(on, alias_name=alias)
        raise NotImplementedError(f"no Ray aggregate for combiner {self.name}")


SUM = Combiner("sum", 0.0, np.add)
MIN = Combiner("min", np.inf, np.minimum)
MAX = Combiner("max", -np.inf, np.maximum)
BIT_OR = Combiner("bit_or", 0, np.bitwise_or)
