"""The BSP superstep loop — Ray-Data-native re-expression of Pregelix's driver.

Reference: one Hyracks job per superstep (``Driver.runLoopBody``,
``pregelix-core/.../driver/Driver.java:305-353``) with the plan
scan/join → compute → local-combine → M-to-N hash shuffle → global-combine →
materialize (``JobGenOuterJoin.java:76-233``). Here a superstep is:

    scatter   = ``edges.map_batches(fn, batch_format="pyarrow")``
                (fn reads the broadcast vertex-state vectors zero-copy from the
                object store and pre-combines messages per batch — the local
                combine step),
    combine   = dense-vector assembly on the driver (dense mode — the analog
                of Pregelix's single-site FinalAggregate for small state) or
                ``groupby("v").aggregate(...)`` (dataset mode, a true hash
                shuffle — implemented in the pipelines),
    apply     = vectorized numpy update of the state vectors + metrics,
    barrier   = the driver loop itself; optional Parquet checkpoint.

Two execution modes (pipelines choose per graph size):
- **dense**: vertex state lives in numpy vectors broadcast via ``ray.put``
  (one shared-memory copy per node, zero-copy reads in every scatter task).
  Scales to O(100M) vertices per the 8-byte/vertex budget; at 10^12-turn
  scale the turn-chain algorithms switch to dataset mode.
- **dataset**: vertex state is a ``ray.data.Dataset``; scatter joins edges
  with state (``Dataset.join``), combine is a groupby-aggregate shuffle —
  the exact shape of the reference plan, scales to any N.

Termination mirrors the reference's TerminationStateWriter semantics
(``ComputeUpdateFunctionFactory.java:252-254``): stop when no vertex is live
and no messages were produced, or at ``max_supersteps``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .functions.combiners import Combiner
from .state import checkpoint as ckpt


@dataclass
class BSPConfig:
    max_supersteps: int = 30
    tol: float | None = None  # algorithm-interpreted convergence tolerance
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # 0 = never (reference ConservativeCheckpointHook = 2)
    checkpoint_partitions: int = 8
    resume: bool = False
    scatter_batch_size: int | None = 65536
    num_partitions: int = 32  # shuffle partitions (dataset mode)
    # When the edge Dataset was laid out with stages.partition.hash_partition_by
    # (block i holds dst % P == i), set this to P: scatter runs one task per
    # block (batch_size=None) and the per-block partial messages have disjoint
    # destination sets, so the final combine is a pure assignment.
    dst_partition_modulus: int | None = None
    # user hooks (reference: PreSuperStepRuntimeHookFactory /
    # PostSuperStepRuntimeHookFactory + IIterationCompleteReporterHook —
    # the latter is how FailureRecoveryTest injects mid-run faults):
    # pre_superstep(superstep, state) runs before each round's scatter;
    # post_superstep(metrics, state) runs after the round completes (an
    # exception here aborts the job exactly like the reference's injected
    # node kill — resume then restarts from the last checkpoint)
    pre_superstep: Any = None
    post_superstep: Any = None
    # automatic failure recovery (reference ``Driver.runJobs:137-195``: catch
    # recoverable failure, reload last checkpoint, retry ≤3 without user
    # action). Takes effect only with checkpoint_dir set; a failure before
    # the first checkpoint replays from superstep 1, like the reference.
    max_retries: int = 0


@dataclass
class RoundMetrics:
    superstep: int
    msgs: int  # combined message count (post per-batch combine)
    active: int  # vertices changed / still live after apply
    delta: float  # algorithm-defined change magnitude (e.g. max |Δrank|)
    seconds: float
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class BSPResult:
    state: dict[str, np.ndarray]
    rounds: list[RoundMetrics]
    n: int

    @property
    def supersteps(self) -> int:
        return self.rounds[-1].superstep if self.rounds else 1


class DenseAlgorithm(Protocol):
    """Per-algorithm kernel for the dense engine.

    The reference's per-vertex ``Vertex.compute(msgIterator)`` callback
    (``pregelix-api/.../graph/Vertex.java:119``) becomes two vectorized hooks:
    ``scatter_factory`` (build the per-edge-batch message kernel for a
    superstep — sendMsgToAllEdges) and ``apply`` (the value update + vote).
    """

    name: str
    combiner: Combiner
    msg_dtype: np.dtype

    def init_state(self, n: int) -> dict[str, np.ndarray]: ...

    def scatter_factory(
        self, state_refs: dict[str, "ray.ObjectRef"], superstep: int
    ) -> Callable[[pa.Table], pa.Table] | None:
        """Return the scatter kernel for messages sent AT ``superstep``, or
        None when this superstep sends nothing (job terminates)."""
        ...

    def apply(
        self,
        state: dict[str, np.ndarray],
        msg: np.ndarray,
        has_msg: np.ndarray,
        superstep: int,
    ) -> tuple[dict[str, np.ndarray], int, float]:
        """→ (new_state, active_count, delta)."""
        ...


def dense_combine(
    msgs_ds: ray.data.Dataset,
    n: int,
    combiner: Combiner,
    dtype,
    assume_disjoint: bool = False,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Assemble combined messages into a dense vector, streaming batch-wise.

    The scatter stage already pre-combined per batch, so the rows pulled here
    are bounded by (unique dst per block × blocks) — the same reduction
    Pregelix gets from its local SortGroupBy before the M-to-N exchange.
    With dst-partitioned edge blocks (``assume_disjoint``) the partials have
    pairwise-disjoint keys and the fold is a straight assignment; otherwise
    sums use ``bincount`` (fast) and other combiners ``ufunc.at``.
    """
    vec = np.full(n, combiner.identity, dtype=dtype)
    has = np.zeros(n, dtype=bool)
    total = 0
    for b in msgs_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        v = b["v"].to_numpy()
        m = b["msg"].to_numpy()
        if assume_disjoint and not has[v].any():  # guard: verify disjointness
            vec[v] = m
        elif combiner.ufunc is np.add and len(v) > 4096:
            vec += np.bincount(v, weights=m, minlength=n).astype(dtype, copy=False)
        else:
            combiner.scatter_dense(vec, v, m)
        has[v] = True
        total += len(v)
    return vec, has, total


def run_dense_bsp(
    edges: ray.data.Dataset,
    n: int,
    algo: DenseAlgorithm,
    cfg: BSPConfig | None = None,
    aggregators: dict[str, Callable[[dict[str, np.ndarray]], float]] | None = None,
) -> BSPResult:
    """Run the superstep loop in dense mode over a materialized edge Dataset.

    ``aggregators`` are the GlobalAggregator analog (reference:
    ``api/graph/GlobalAggregator.java:42-78`` — per-partition partials merged
    at a single site): vectorized reductions over the state vectors, recorded
    into each round's ``metrics.extra`` (the reference writes them to
    per-iteration HDFS value files via ``FinalAggregateOperatorDescriptor``).

    With ``cfg.max_retries > 0`` and a checkpoint dir, a failed run reloads
    the newest checkpoint and resumes automatically (the reference driver's
    recoverable-failure retry loop, ``Driver.runJobs:137-195``).
    """
    from dataclasses import replace

    cfg = cfg or BSPConfig()
    attempts = 0
    while True:
        try:
            return _run_dense_bsp_once(edges, n, algo, cfg, aggregators)
        except Exception:
            if attempts >= cfg.max_retries or not cfg.checkpoint_dir:
                raise
            attempts += 1
            cfg = replace(cfg, resume=True)


def _run_dense_bsp_once(
    edges: ray.data.Dataset,
    n: int,
    algo: DenseAlgorithm,
    cfg: BSPConfig,
    aggregators: dict[str, Callable[[dict[str, np.ndarray]], float]] | None = None,
) -> BSPResult:
    rounds: list[RoundMetrics] = []
    superstep = 1
    state = None

    if cfg.resume and cfg.checkpoint_dir:
        done = ckpt.list_checkpoints(cfg.checkpoint_dir)
        if done:
            state, man = ckpt.read_dense_checkpoint(cfg.checkpoint_dir, done[-1])
            if man.algorithm != algo.name:
                raise ValueError(
                    f"checkpoint is for algorithm {man.algorithm!r}, refusing "
                    f"to resume {algo.name!r} from it"
                )
            superstep = man.superstep
    if state is None:
        state = algo.init_state(n)  # superstep 1: init + first sends

    while superstep < cfg.max_supersteps:
        t0 = time.perf_counter()
        if cfg.pre_superstep is not None:
            cfg.pre_superstep(superstep, state)
        refs = {k: ray.put(v) for k, v in state.items()}
        fn = algo.scatter_factory(refs, superstep)
        if fn is None:
            break
        batch_size = None if cfg.dst_partition_modulus else cfg.scatter_batch_size
        msgs = edges.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
        vec, has, total = dense_combine(
            msgs,
            n,
            algo.combiner,
            algo.msg_dtype,
            assume_disjoint=cfg.dst_partition_modulus is not None,
        )
        superstep += 1
        state, active, delta = algo.apply(state, vec, has, superstep)
        dt = time.perf_counter() - t0
        extra = (
            {name: float(fn(state)) for name, fn in aggregators.items()}
            if aggregators
            else {}
        )
        rounds.append(RoundMetrics(superstep, total, active, delta, dt, extra))
        if (
            cfg.checkpoint_dir
            and cfg.checkpoint_every
            and (superstep % cfg.checkpoint_every == 0)
        ):
            ckpt.write_dense_checkpoint(
                cfg.checkpoint_dir,
                superstep,
                algo.name,
                state,
                {"msgs": total, "active": active, "delta": delta},
                cfg.checkpoint_partitions,
            )
        if cfg.post_superstep is not None:
            cfg.post_superstep(rounds[-1], state)
        if active == 0 and total == 0:
            break
        if active == 0 and getattr(algo, "halt_when_inactive", False):
            break
    return BSPResult(state=state, rounds=rounds, n=n)


def state_to_table(result: BSPResult, value_col: str = "val") -> pa.Table:
    """(v, <state columns>) as an Arrow table sorted by vertex id."""
    cols: dict[str, Any] = {"v": np.arange(result.n, dtype=np.int64)}
    cols.update(result.state)
    return pa.table(cols)
