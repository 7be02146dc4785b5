"""IMRU — Iterative Map-Reduce-Update, the reference's second framework.

Reference: ``imru/imru-core/.../api/IIMRUJob.java:36-68`` — user supplies
``map(dataIter, model) → R``, ``reduce(Iterator<R>) → R`` (commutative +
associative, aggregation-tree capable via ``ReduceAggregationTreeFactory``),
``update(RIter, model) → model``, ``shouldTerminate(model)``; the driver loop
is ``imru-core/.../runtime/IMRUDriver.java``. Examples shipped: k-means
(``imru/imru-example/.../kmeans/KMeans.java``) and batch gradient descent
(``bgd/BGD.java``).

Ray mapping (SURVEY.md §2.6): the training data is a materialized Dataset
(cached blocks = the reference's cached per-partition data), the model is
broadcast per iteration with ``ray.put`` (zero-copy per node), ``map`` runs
as ``map_batches`` producing one partial-result row per block, and ``reduce``
folds the partials on the driver (tree order — associativity required, as in
the reference).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Any, Generic, Protocol, TypeVar

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

Model = TypeVar("Model")
R = TypeVar("R")


class IMRUJob(Protocol, Generic[Model, R]):
    def map(self, batch: pd.DataFrame, model: Model) -> R: ...

    def reduce(self, a: R, b: R) -> R: ...

    def update(self, reduced: R, model: Model) -> Model: ...

    def should_terminate(self, old: Model, new: Model, iteration: int) -> bool: ...


def run_imru(
    job: IMRUJob,
    data: ray.data.Dataset,
    model: Any,
    max_iters: int = 20,
) -> Any:
    """The map → reduce → update loop; ``data`` is materialized once."""
    cached = data.materialize()
    for it in range(max_iters):
        mref = ray.put(model)

        def mapper(df: pd.DataFrame) -> pa.Table:
            r = job.map(df, ray.get(mref))
            return pa.table({"partial": [pickle.dumps(r)]})

        parts = cached.map_batches(mapper, batch_format="pandas")
        reduced = None
        for b in parts.iter_batches(batch_format="pyarrow"):
            for blob in b["partial"].to_pylist():
                r = pickle.loads(blob)
                reduced = r if reduced is None else job.reduce(reduced, r)
        if reduced is None:
            break
        new_model = job.update(reduced, model)
        if job.should_terminate(model, new_model, it):
            return new_model
        model = new_model
    return model


# ---------------------------------------------------------------------------
# shipped example jobs (k-means, batch gradient descent)
# ---------------------------------------------------------------------------


@dataclass
class KMeansJob:
    """k-means: map = assign points + per-cluster (sum, count) partials."""

    column: str = "embedding"
    tol: float = 1e-6

    def map(self, df: pd.DataFrame, model: np.ndarray):
        pts = np.stack(df[self.column].to_numpy()).astype(np.float64)
        d2 = ((pts[:, None, :] - model[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        k, dim = model.shape
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for c in range(k):
            mask = assign == c
            counts[c] = mask.sum()
            if counts[c]:
                sums[c] = pts[mask].sum(axis=0)
        return sums, counts

    def reduce(self, a, b):
        return a[0] + b[0], a[1] + b[1]

    def update(self, reduced, model: np.ndarray) -> np.ndarray:
        sums, counts = reduced
        out = model.copy()
        nz = counts > 0
        out[nz] = sums[nz] / counts[nz, None]
        return out

    def should_terminate(self, old, new, iteration) -> bool:
        return bool(np.abs(new - old).max() < self.tol)


@dataclass
class BGDLinearJob:
    """Batch gradient descent for least-squares linear regression.

    map = per-block (Xᵀ(Xw − y), n) partials; update = w − lr·∇/n.
    Reference example: ``imru/imru-example/.../bgd/BGD.java``.
    """

    feature_cols: tuple
    target_col: str
    lr: float = 0.1
    tol: float = 1e-9

    def map(self, df: pd.DataFrame, model: np.ndarray):
        X = df[list(self.feature_cols)].to_numpy(dtype=np.float64)
        y = df[self.target_col].to_numpy(dtype=np.float64)
        X1 = np.concatenate([X, np.ones((len(X), 1))], axis=1)  # bias term
        resid = X1 @ model - y
        return X1.T @ resid, len(y)

    def reduce(self, a, b):
        return a[0] + b[0], a[1] + b[1]

    def update(self, reduced, model: np.ndarray) -> np.ndarray:
        grad, n = reduced
        return model - self.lr * grad / max(n, 1)

    def should_terminate(self, old, new, iteration) -> bool:
        return bool(np.abs(new - old).max() < self.tol)
