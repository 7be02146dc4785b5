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
runs as an AGGREGATION TREE of Ray tasks (the reference's
``ReduceAggregationTreeFactory``): level 0 folds each output block where it
sits, then levels of ``arity``-way fold tasks combine refs until one partial
remains — the driver only ever touches object refs and the final result, so
reduce cost scales with cluster size instead of serializing on the driver.
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


@ray.remote(num_cpus=0)
def _tree_reduce_task(job: "IMRUJob", *parts) -> bytes:
    """One node of the reduce aggregation tree. Accepts output blocks from
    the map stage (Arrow tables of pickled partials) at level 0 and pickled
    partials (bytes) at upper levels; folds left-to-right with ``job.reduce``
    (commutative + associative per the IIMRUJob contract, so tree order is
    free to differ from the data order). num_cpus=0: folds are tiny relative
    to map tasks and must not queue behind them."""
    acc = None
    for part in parts:
        if isinstance(part, pa.Table):
            rs = [pickle.loads(b) for b in part["partial"].to_pylist()]
        else:
            one = pickle.loads(part)
            rs = [] if one is None else [one]  # None = empty subtree
        for r in rs:
            acc = r if acc is None else job.reduce(acc, r)
    return pickle.dumps(acc)


def tree_reduce(job: "IMRUJob", block_refs: list, arity: int = 8):
    """Fold the map stage's output block refs down to one partial via levels
    of ``arity``-way tasks (reference ``ReduceAggregationTreeFactory``).
    → the reduced value, or None if there were no blocks/partials."""
    if not block_refs:
        return None
    jref = ray.put(job)
    level = [
        _tree_reduce_task.remote(jref, *block_refs[i : i + arity])
        for i in range(0, len(block_refs), arity)
    ]
    while len(level) > 1:
        level = [
            _tree_reduce_task.remote(jref, *level[i : i + arity])
            for i in range(0, len(level), arity)
        ]
    blob = ray.get(level[0])
    return pickle.loads(blob)


def run_imru(
    job: IMRUJob,
    data: ray.data.Dataset,
    model: Any,
    max_iters: int = 20,
    reduce_arity: int = 8,
) -> Any:
    """The map → tree-reduce → update loop; ``data`` is materialized once."""
    cached = data.materialize()
    for it in range(max_iters):
        mref = ray.put(model)

        def mapper(df: pd.DataFrame) -> pa.Table:
            r = job.map(df, ray.get(mref))
            return pa.table({"partial": [pickle.dumps(r)]})

        parts = cached.map_batches(mapper, batch_format="pandas")
        # block refs only — partials never stream through the driver
        block_refs = parts.materialize().to_arrow_refs()
        reduced = tree_reduce(job, list(block_refs), arity=reduce_arity)
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
    # optional contiguous dim slice — lets product-quantization train one
    # sub-quantizer per subspace over the same cached dataset
    dim_lo: int | None = None
    dim_hi: int | None = None

    def map(self, df: pd.DataFrame, model: np.ndarray):
        pts = np.stack(df[self.column].to_numpy()).astype(np.float64)
        if self.dim_lo is not None:
            pts = pts[:, self.dim_lo : self.dim_hi]
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
