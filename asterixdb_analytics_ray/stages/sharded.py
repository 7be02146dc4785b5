"""Sharded dense BSP — partition-owned vertex state, driver touches only refs.

This is the closest analog of the reference's physical layout: Pregelix keeps
vertex state in per-partition B-trees on the workers and only messages cross
partitions (``JobGen.generateCreatingJob``, one index partition per worker
core); the driver merely submits per-superstep jobs. Here:

- the edge table is hash-partitioned by ``dst % P`` once
  (``stages.partition.hash_partition_by`` — the bulk-load M-to-N exchange);
- vertex state is P dense numpy SHARDS in the object store
  (shard p owns vertices with ``v % P == p``);
- one Ray task per partition per superstep gathers the ranks of its sources
  from the (zero-copy) shard refs, pre-combines messages with a local-id
  bincount, applies the update for its own vertex range, and returns the new
  shard ref + a tiny metrics tuple;
- the driver never materializes the state: it shuffles P object refs per
  round. The serial fraction per superstep is task scheduling only, which is
  what lets throughput scale with cluster size (BASELINE.md).

Raw ``@ray.remote`` is justified here by the iterative barrier: the Dataset
API has no loop construct, and a per-round Dataset execution pays ~100ms+
fixed overhead that dominates sub-second supersteps.

Five runners share the layout: ``ShardedPageRank`` (sum combine, bincount
kernel, checkpoint/resume, tasks or stateful-actor executor),
``ShardedMinLabel`` (connected components; segment-min reduceat combine),
``ShardedLabelProp`` (histogram-argmax), ``ShardedSSSP`` (weighted min-dist
relaxation + checkpoint/resume), ``ShardedReachability`` (bidirectional
bit-OR with signalTerminate). The monotone runners (CC/SSSP/reachability)
skip source shards that didn't change last round — the reference's
live-vertex inner-join frontier at shard granularity. Triangle count is
join-shaped, not iterative — see ``pipelines/triangles.py`` (SURVEY §7.3).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..bsp import BSPResult, RoundMetrics
from ..state.checkpoint import (
    Manifest,
    PartitionInfo,
    _hash_table,
    _step_dir,
    list_checkpoints,
    read_manifest,
)

DAMPING = 0.85


def _resolve_partitioned(edges, key: str, P: int) -> dict:
    """Dataset → fresh partition shuffle; PartitionedEdges → reuse its refs
    (the multi-job chaining path: one bulk load, many jobs — reference
    ``Driver.compatible:217-233``). Rejects mismatched layout."""
    from .partition import PartitionedEdges, partition_table_refs

    if isinstance(edges, PartitionedEdges):
        if edges.P != P or edges.key != key:
            raise ValueError(
                f"PartitionedEdges(P={edges.P}, key={edges.key!r}) is "
                f"incompatible with this runner (P={P}, key={key!r})"
            )
        return edges.refs
    return partition_table_refs(edges, key, P)


def _write_shard(tmpdir: str, p: int, shard: np.ndarray) -> tuple:
    t = pa.table({"value": pa.array(shard)})
    pq.write_table(t, os.path.join(tmpdir, f"part-{p:04d}.parquet"))
    return t.num_rows, _hash_table(t)


# num_cpus=0: short IO next to a fleet of num_cpus=1 partition workers that
# may hold every CPU slot — a CPU-costed task would deadlock behind them
_checkpoint_shard_task = ray.remote(num_cpus=0)(_write_shard)


@ray.remote(num_cpus=0)
def _load_shard_task(stepdir: str, p: int, rows: int, content_hash: str) -> np.ndarray:
    """Load + lineage-verify one shard (hash recorded in the manifest)."""
    t = pq.read_table(os.path.join(stepdir, f"part-{p:04d}.parquet"))
    if t.num_rows != rows or _hash_table(t) != content_hash:
        raise IOError(f"checkpoint lineage mismatch: part {p} of {stepdir}")
    return t["value"].to_numpy()


@ray.remote(num_cpus=0)
def _touch_shard(shard: np.ndarray) -> int:
    """Dependency probe: consuming the ref here makes a failed load task's
    exception surface at resume time with correct attribution (``ray.wait``
    never raises task errors), without pulling shard data to the driver."""
    return len(shard)


def _build_prep(
    block: pa.Table,
    p: int,
    P: int,
    outdeg: np.ndarray,
    shard_size: int,
    precision: str,
) -> dict:
    """Per-partition static cache: decomposed src/dst ids (+ weight gather).

    Built once (the CSR-analog); every superstep reuses it zero-copy. ALL
    arrays are stored sorted by owning src shard, so the per-round kernel is
    pure contiguous passes (slice-gather → combine) with no permutation
    scatter: bincount doesn't care about edge order, and the dst column was
    permuted here, once, at load time.

    ``precision="mixed"`` is the PRE-DIVIDED kernel: instead of a per-edge
    float32 ``1/outdeg`` weight column, each superstep task publishes its
    shard's ranks already divided by outdeg (float32, the "dived" shard) and
    consumers gather those directly — the static edge columns shrink to
    4 B/edge (two uint16 local ids) and the per-edge multiply disappears,
    nearly halving per-edge DRAM traffic, which is what the kernel is bound
    by at full-machine concurrency (BASELINE.md scaling notes). Rank state,
    accumulation and convergence deltas stay float64; the only rounding is
    one float32 quantization of rank/outdeg per edge contribution (relative
    ~6e-8, per-vertex rank error ~1e-9 — three orders inside the 1e-6
    conformance gate, tested). ``inv_shard`` is this partition's own
    1/outdeg vector used to produce the next dived shard.
    """
    src = block["src"].to_numpy()
    dst = block["dst"].to_numpy()
    smod = (src % P).astype(np.int64)
    # group edges by owning src shard so the per-round gather is a P-sliced
    # pass over L2-resident shard vectors (O(E/P) per task, not O(E) per
    # shard) — measurably faster than a packed-global-vector gather, whose
    # random reads span n/P×P×8B instead of n/P×8B
    order = np.argsort(smod, kind="stable")
    src_sorted = src[order]
    if precision == "mixed":
        id_dtype = np.uint16 if shard_size <= np.iinfo(np.uint16).max else np.uint32
        inv_shard = np.ones(shard_size, dtype=np.float32)
        own = outdeg[p::P]
        inv_shard[: len(own)] = (1.0 / own).astype(np.float32)
        return {
            "bounds": np.searchsorted(smod[order], np.arange(P + 1)),
            "sdiv_sorted": (src_sorted // P).astype(id_dtype),
            "dst_div": (dst[order] // P).astype(id_dtype),
            "inv_shard": inv_shard,
        }
    return {
        "bounds": np.searchsorted(smod[order], np.arange(P + 1)),
        "sdiv_sorted": (src_sorted // P).astype(np.int32),
        "dst_div": (dst[order] // P).astype(np.int32),
        "inv_out": 1.0 / outdeg[src_sorted],
    }


_prep_block = ray.remote(_build_prep)


def _superstep_kernel(
    prep: dict,
    p: int,
    P: int,
    shard_size: int,
    base: float,
    damping: float,
    shards: tuple,
):
    """One partition's scatter + combine + apply for one superstep.

    The gather→weight→combine is fused per src-shard slice: no O(E/P)
    contrib intermediate round-trips through DRAM, which matters because the
    kernel is memory-bandwidth-bound at full-machine concurrency
    (BASELINE.md scaling notes). A packed-single-vector variant (one dep per
    task) was tried and is ~35% slower end to end: its gather spans the full
    n×8B vector instead of L2-resident n/P shards.
    """
    bounds = prep["bounds"]
    sdiv = prep["sdiv_sorted"]
    inv = prep["inv_out"]
    dst = prep["dst_div"]
    acc = np.zeros(shard_size, dtype=np.float64)
    for q in range(P):  # contiguous slice per owning shard, fused
        s, e = bounds[q], bounds[q + 1]
        if s < e:
            acc += np.bincount(
                dst[s:e],
                weights=shards[q][sdiv[s:e]] * inv[s:e],
                minlength=shard_size,
            )
    new_shard = base + damping * acc
    delta = float(np.abs(new_shard - shards[p][: len(new_shard)]).max())
    return new_shard, (delta, int(len(dst)))


@ray.remote(num_returns=2)
def _superstep_task(
    prep: dict,
    p: int,
    P: int,
    shard_size: int,
    base: float,
    damping: float,
    *shards: np.ndarray,
):
    """Stateless-task executor: prep arrives as a zero-copy plasma ref.

    Shards arrive as TOP-LEVEL var-args so Ray resolves them as plain plasma
    dependencies — refs nested inside a list would go through the borrowed-
    reference protocol, whose per-(task × ref) bookkeeping collapses the
    scheduler at P² fan-in (measured: P=32 barrierless DAG 0.2s/round with
    top-level deps vs minutes with borrowed refs).
    """
    return _superstep_kernel(prep, p, P, shard_size, base, damping, shards)


def _superstep_kernel_mixed(
    prep: dict,
    p: int,
    P: int,
    shard_size: int,
    base: float,
    damping: float,
    prev_plain: np.ndarray,
    dived: tuple,
):
    """Pre-divided variant: gathers float32 rank/outdeg shards directly (no
    per-edge weight column, no per-edge multiply — see ``_build_prep``) and
    emits BOTH the float64 rank shard and the next float32 dived shard."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv_sorted"]
    dst = prep["dst_div"]
    acc = np.zeros(shard_size, dtype=np.float64)
    for q in range(P):  # contiguous slice per owning shard, fused
        s, e = bounds[q], bounds[q + 1]
        if s < e:
            acc += np.bincount(
                dst[s:e], weights=dived[q][sdiv[s:e]], minlength=shard_size
            )
    new_shard = base + damping * acc
    delta = float(np.abs(new_shard - prev_plain[: len(new_shard)]).max())
    new_dived = (new_shard * prep["inv_shard"]).astype(np.float32)
    return new_shard, new_dived, (delta, int(len(dst)))


@ray.remote(num_returns=3)
def _superstep_task_mixed(
    prep: dict,
    p: int,
    P: int,
    shard_size: int,
    base: float,
    damping: float,
    prev_plain: np.ndarray,
    *dived: np.ndarray,
):
    return _superstep_kernel_mixed(
        prep, p, P, shard_size, base, damping, prev_plain, dived
    )


@ray.remote
def _to_dived(plain: np.ndarray, inv_shard: np.ndarray) -> np.ndarray:
    """plain float64 rank shard → float32 rank/outdeg shard (resume path)."""
    out = np.empty(len(inv_shard), dtype=np.float32)
    out[: len(plain)] = plain * inv_shard[: len(plain)]
    out[len(plain):] = 0.0
    return out


@ray.remote(num_cpus=0, max_restarts=-1)
class _ShardWorker:
    """Stateful partition worker: holds its CSR-analog edge cache in process
    memory (the north-star layout — per-partition adjacency blocks live in
    actor-pool workers, like Pregelix's per-partition B-trees). Actor calls
    dispatch straight to the worker's queue instead of through raylet task
    scheduling, which removes most of the per-wave dispatch cost the
    stateless-task executor pays at full-machine partition counts.

    Scheduled with num_cpus=0: the fleet size equals the job's partition
    count (a deliberate sizing choice, one busy worker per core during a
    wave), and zero-CPU scheduling lets fleets from successive runners
    coexist instead of deadlocking each other's startup on a full machine.
    Call ``ShardedPageRank.shutdown()`` to release a fleet eagerly; dropping
    the runner releases it via GC."""

    def __init__(self, prep: dict, p: int, P: int, shard_size: int):
        self.p = p
        self.P = P
        self.shard_size = shard_size
        # zero-copy numpy views backed by the plasma store: all P workers on
        # a node map the SAME pages (no per-worker copy of the edge cache)
        self.prep = prep

    def ready(self) -> int:
        return self.p

    @ray.method(num_returns=2)
    def step(self, base: float, damping: float, *shards: np.ndarray):
        return _superstep_kernel(
            self.prep, self.p, self.P, self.shard_size, base, damping, shards
        )

    @ray.method(num_returns=3)
    def step_mixed(
        self,
        base: float,
        damping: float,
        prev_plain: np.ndarray,
        *dived: np.ndarray,
    ):
        return _superstep_kernel_mixed(
            self.prep,
            self.p,
            self.P,
            self.shard_size,
            base,
            damping,
            prev_plain,
            dived,
        )


@dataclass
class ShardedPageRank:
    """PageRank over dst-partitioned edge blocks with sharded state."""

    n: int
    P: int
    n_vertices: int | None = None
    precision: str = "double"  # "double" | "mixed" (see _build_prep)
    executor: str = "actors"  # "actors" (stateful workers) | "tasks"
    algorithm: str = "pagerank_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)
    _workers: dict | None = field(default=None, repr=False)
    _inv_shards: list | None = field(default=None, repr=False)

    def prepare(self, edges: ray.data.Dataset, outdeg: np.ndarray) -> None:
        """One-time per-partition prep (the bulk-load / B-tree-build analog):
        explicit split+concat shuffle so each partition is one table ref,
        then decomposed-id caches built per partition — inside the partition
        worker's own memory (actor executor) or as plasma refs (tasks).
        ``edges`` may be a shared ``PartitionedEdges`` (multi-job chaining —
        see ``_resolve_partitioned``)."""
        shard_size = (self.n + self.P - 1) // self.P
        outdeg_safe = np.where(outdeg > 0, outdeg, 1).astype(np.float64)
        od_ref = ray.put(outdeg_safe)
        if self.precision == "mixed":
            # per-partition 1/outdeg (float32): used to seed the initial
            # dived shards, to keep constant dived shards for partitions
            # with no in-edges, and to rebuild dived shards on resume
            self._inv_shards = [
                np.pad(
                    (1.0 / outdeg_safe[p :: self.P]).astype(np.float32),
                    (0, shard_size - len(outdeg_safe[p :: self.P])),
                    constant_values=1.0,
                )
                for p in range(self.P)
            ]
        part_refs = _resolve_partitioned(edges, "dst", self.P)
        self._preps = {
            p: _prep_block.remote(
                block, p, self.P, od_ref, shard_size, self.precision
            )
            for p, block in part_refs.items()
        }
        if self.executor == "actors":
            self._workers = {
                p: _ShardWorker.remote(prep_ref, p, self.P, shard_size)
                for p, prep_ref in self._preps.items()
            }
            ray.get([w.ready.remote() for w in self._workers.values()])
        elif self._preps:
            # block until the edge caches exist: attributes build cost to
            # prepare() and lets the shuffle's intermediate objects release
            # before supersteps start competing for object-store space
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        """Eagerly release the partition-worker fleet and edge caches — the
        ``ClearStateOperatorDescriptor`` analog (drop node-local iteration
        state for the job; reference
        ``pregelix-dataflow/.../ClearStateOperatorDescriptor.java``).
        Otherwise GC releases them when the runner is dropped."""
        if self._workers:
            for w in self._workers.values():
                ray.kill(w)
        self._workers = None
        self._preps = None

    def checkpoint(
        self, root: str, step: int, shard_refs: list, metrics: dict
    ) -> Manifest:
        """Per-superstep snapshot: P parallel shard writes (tasks read the
        shard refs straight from the object store), manifest written last,
        atomic directory rename. Shard p holds vertices ``v % P == p`` in
        local order — the same layout the superstep tasks consume, so a
        multi-node resume re-reads each part where it is processed."""
        sd = _step_dir(root, step)
        tmp = sd + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        infos = ray.get(
            [
                _checkpoint_shard_task.remote(tmp, p, ref)
                for p, ref in enumerate(shard_refs)
            ]
        )
        man = Manifest(
            superstep=step,
            num_partitions=self.P,
            algorithm=self.algorithm,
            metrics=metrics,
            partitions=[
                PartitionInfo(p, r, h) for p, (r, h) in enumerate(infos)
            ],
        )
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            f.write(man.to_json())
        # the pre-existing step dir (an earlier run's checkpoint at the same
        # step) is removed only now that the replacement is COMPLETE on disk:
        # a crash mid-write leaves the old checkpoint intact, so resume never
        # has to fall back to an older step
        shutil.rmtree(sd, ignore_errors=True)
        os.replace(tmp, sd)
        return man

    def resume_refs(self, root: str) -> tuple[int, list] | None:
        """→ (superstep, shard refs) from the newest complete checkpoint, or
        None. Loads are partition-parallel and lineage-verified."""
        steps = list_checkpoints(root)
        if not steps:
            return None
        step = steps[-1]
        man = read_manifest(root, step)
        if man.num_partitions != self.P:
            raise ValueError(
                f"checkpoint has P={man.num_partitions}, runner has P={self.P}"
            )
        if man.algorithm != self.algorithm:
            raise ValueError(
                f"checkpoint is for algorithm {man.algorithm!r}, refusing to "
                f"resume {self.algorithm!r} from it"
            )
        sd = _step_dir(root, step)
        refs = [
            _load_shard_task.remote(sd, pi.part, pi.rows, pi.content_hash)
            for pi in man.partitions
        ]
        # consume each ref through a zero-CPU probe so a lineage-verification
        # failure raises HERE (attributed to the resume), not in whichever
        # superstep task first touches the bad shard
        ray.get([_touch_shard.remote(r) for r in refs])
        return step, refs

    def run(
        self,
        edges: ray.data.Dataset | None = None,
        outdeg: np.ndarray | None = None,
        supersteps: int = 10,
        tol: float | None = None,
        max_supersteps: int = 50,
        barrier: bool = True,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
        post_superstep=None,
    ) -> BSPResult:
        """``barrier=True``: driver syncs per round (needed for tol-based
        convergence checks). ``barrier=False``: submit ALL supersteps as one
        task DAG chained by shard refs — Ray schedules rounds back-to-back
        with zero driver round-trips (fixed-step mode; this is how a
        fixed-iteration production job runs, and the configuration used for
        the throughput/scaling measurements).

        ``max_retries > 0`` (with a checkpoint dir): a failed attempt reloads
        the newest checkpoint and resumes automatically — the reference
        driver's recoverable-failure retry (``Driver.runJobs:137-195``).
        ``post_superstep(metrics)`` is the IIterationCompleteReporterHook
        analog (barrier mode only; how the reference's recovery tests inject
        mid-run faults)."""
        attempts = 0
        while True:
            try:
                return self._run_once(
                    edges, outdeg, supersteps, tol, max_supersteps, barrier,
                    checkpoint_dir, checkpoint_every,
                    resume or attempts > 0, post_superstep,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1
                # A lost worker/node (the fault class this retry targets —
                # reference Driver.runJobs' recoverable failure) may have
                # taken the cached actor fleet with it.  _ShardWorker has
                # max_restarts, but an actor killed beyond restart (or a
                # fleet whose prep refs died with their node) would make
                # every retry fail identically — so when the inputs are at
                # hand, rebuild the fleet/caches from scratch before
                # resuming from the checkpoint.
                if edges is not None and outdeg is not None:
                    self.shutdown()

    def _run_once(
        self,
        edges,
        outdeg,
        supersteps,
        tol,
        max_supersteps,
        barrier,
        checkpoint_dir,
        checkpoint_every,
        resume,
        post_superstep,
    ) -> BSPResult:
        if checkpoint_dir and not barrier:
            raise ValueError(
                "checkpointing requires barrier=True (the barrierless DAG has "
                "no per-superstep sync point to snapshot at)"
            )
        P = self.P
        nv = self.n_vertices or self.n
        shard_size = (self.n + P - 1) // P
        if self._preps is None:
            self.prepare(edges, outdeg)
        preps = self._preps

        # initial shards (or resume from the newest complete checkpoint)
        rounds: list[RoundMetrics] = []
        base = (1.0 - DAMPING) / nv
        base_ref = ray.put(np.full(shard_size, base))
        limit = supersteps if tol is None else max_supersteps
        superstep = 1
        mixed = self.precision == "mixed"
        shard_refs: list | None = None
        if resume and checkpoint_dir:
            resumed = self.resume_refs(checkpoint_dir)
            if resumed is not None:
                superstep, shard_refs = resumed
        dived_refs: list | None = None
        if shard_refs is None:
            init = np.full(shard_size, 1.0 / nv, dtype=np.float64)
            shard_refs = [ray.put(init.copy()) for _ in range(P)]
            if mixed:
                dived_refs = [
                    ray.put((init * self._inv_shards[p]).astype(np.float32))
                    for p in range(P)
                ]
        elif mixed:  # resumed from float64 checkpoint shards
            dived_refs = [
                _to_dived.remote(shard_refs[p], self._inv_shards[p])
                for p in range(P)
            ]
        if mixed:
            # partitions with no in-edges have CONSTANT rank = base after
            # the first superstep, so their dived shard is a constant too
            base_dived = {
                p: ray.put((base * self._inv_shards[p]).astype(np.float32))
                for p in range(P)
                if p not in preps
            }
        deferred: list[tuple[int, list, float]] = []
        while superstep < limit:
            t0 = time.perf_counter()
            new_refs = [base_ref] * P  # no in-edges ⇒ every vertex = base
            metric_refs = {}
            if mixed:
                new_dived = [base_dived.get(p) for p in range(P)]
                for p, prep in preps.items():
                    if self._workers is not None:
                        sref, dref, mref = self._workers[p].step_mixed.remote(
                            base, DAMPING, shard_refs[p], *dived_refs
                        )
                    else:
                        sref, dref, mref = _superstep_task_mixed.remote(
                            prep, p, P, shard_size, base, DAMPING,
                            shard_refs[p], *dived_refs,
                        )
                    new_refs[p] = sref
                    new_dived[p] = dref
                    metric_refs[p] = mref
                dived_refs = new_dived
            else:
                for p, prep in preps.items():
                    if self._workers is not None:
                        sref, mref = self._workers[p].step.remote(
                            base, DAMPING, *shard_refs
                        )
                    else:
                        sref, mref = _superstep_task.remote(
                            prep, p, P, shard_size, base, DAMPING, *shard_refs
                        )
                    new_refs[p] = sref
                    metric_refs[p] = mref
            shard_refs = new_refs
            superstep += 1
            if barrier:
                metrics = ray.get(list(metric_refs.values()))
                delta = max((m[0] for m in metrics), default=0.0)
                msgs = sum(m[1] for m in metrics)
                rounds.append(
                    RoundMetrics(
                        superstep, msgs, 0, delta, time.perf_counter() - t0
                    )
                )
                if (
                    checkpoint_dir
                    and checkpoint_every
                    and superstep % checkpoint_every == 0
                ):
                    self.checkpoint(
                        checkpoint_dir,
                        superstep,
                        shard_refs,
                        {"delta": delta, "msgs": msgs},
                    )
                if post_superstep is not None:
                    post_superstep(rounds[-1])
                if tol is not None and delta < tol:
                    break
            else:
                deferred.append(
                    (superstep, list(metric_refs.values()), t0)
                )
        if not barrier:
            for ss, mrefs, t0 in deferred:
                metrics = ray.get(mrefs)
                rounds.append(
                    RoundMetrics(
                        ss,
                        sum(m[1] for m in metrics),
                        0,
                        max((m[0] for m in metrics), default=0.0),
                        0.0,  # per-round walls are meaningless without barriers
                    )
                )

        rank = np.empty(shard_size * P, dtype=np.float64)
        for p in range(P):
            sh = ray.get(shard_refs[p])
            rank[p::P][: len(sh)] = sh
        return BSPResult(state={"rank": rank[: self.n]}, rounds=rounds, n=self.n)


def pagerank_sharded(
    edges: ray.data.Dataset,
    n: int,
    outdeg: np.ndarray,
    P: int,
    supersteps: int = 10,
    tol: float | None = None,
    n_vertices: int | None = None,
) -> BSPResult:
    return ShardedPageRank(n=n, P=P, n_vertices=n_vertices).run(
        edges, outdeg, supersteps=supersteps, tol=tol
    )


# ---------------------------------------------------------------------------
# Sharded connected components — min-label propagation over the same layout
# ---------------------------------------------------------------------------


def _dst_grouped_layout(
    src: np.ndarray, dst: np.ndarray, P: int, shard_size: int
) -> tuple[dict, np.ndarray]:
    """Shared static edge cache for the segment-combine kernels: edges sorted
    by (owning src shard, local dst) with precomputed per-run segment starts,
    so a per-round combine is one ``ufunc.reduceat`` over contiguous runs —
    the segment grouping IS the reference's sort-group-by combiner
    (``JobGen.generateGroupingOperators``), done once at load.

    → (layout dict, permutation) — callers append algorithm-specific static
    columns (edge weights, direction masks, packed dst keys) permuted by the
    returned order so every per-round pass is contiguous."""
    smod = (src % P).astype(np.int64)
    dst_div = (dst // P).astype(np.int64)
    order = np.lexsort((dst_div, smod))
    smod_s = smod[order]
    dst_s = dst_div[order]
    bounds = np.searchsorted(smod_s, np.arange(P + 1))
    id_dtype = np.uint16 if shard_size <= np.iinfo(np.uint16).max else np.uint32
    seg_rel = []   # slice-relative segment starts (int32: slices < 2^31)
    seg_dst = []   # the segment's local dst id
    seg_bounds = [0]
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s < e:
            d = dst_s[s:e]
            rel = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
            seg_rel.append(rel.astype(np.int32))
            seg_dst.append(d[rel].astype(id_dtype))
        seg_bounds.append(seg_bounds[-1] + (len(seg_rel[-1]) if s < e else 0))
    layout = {
        "bounds": bounds,
        "sdiv": ((src // P)[order]).astype(id_dtype),
        "seg_rel": (
            np.concatenate(seg_rel) if seg_rel else np.array([], np.int32)
        ),
        "seg_dst": (
            np.concatenate(seg_dst) if seg_dst else np.array([], id_dtype)
        ),
        "seg_bounds": np.asarray(seg_bounds, dtype=np.int64),
        "n_edges": len(dst_s),
        "_dst_s": dst_s,  # callers that need local dst ids pop this
    }
    return layout, order


@ray.remote
def _prep_block_min(block: pa.Table, P: int, shard_size: int) -> dict:
    """Edge cache for the min-combine kernel (see ``_dst_grouped_layout``)."""
    layout, _order = _dst_grouped_layout(
        block["src"].to_numpy(), block["dst"].to_numpy(), P, shard_size
    )
    del layout["_dst_s"]
    return layout


@ray.remote(num_returns=2)
def _minlabel_task(
    prep: dict, p: int, P: int, live: tuple, *shards: np.ndarray
):
    """One partition's min-combine + apply for one superstep.

    ``live[q]`` marks source shards that changed last round; an unchanged
    shard re-sends exactly the messages whose min is already folded into
    ``own`` (min-propagation is monotone), so its slice is skipped — the
    reference's live-vertex inner-join plan (``JobGenInnerJoin``) at shard
    granularity, with no index rebuild."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv"]
    seg_rel = prep["seg_rel"]
    seg_dst = prep["seg_dst"]
    seg_bounds = prep["seg_bounds"]
    own = shards[p]
    acc = own.copy()  # min over (current label, incoming neighbor labels)
    scanned = 0
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s >= e or not live[q]:
            continue
        scanned += e - s
        b0, b1 = seg_bounds[q], seg_bounds[q + 1]
        cand = shards[q][sdiv[s:e]]
        segmin = np.minimum.reduceat(cand, seg_rel[b0:b1])
        uniq = seg_dst[b0:b1]
        acc[uniq] = np.minimum(acc[uniq], segmin)
    changed = int((acc != own).sum())
    return acc, (changed, scanned)


@dataclass
class ShardedMinLabel:
    """Connected components (hash-min label propagation) over the sharded
    layout — the scale path for CC, sharing partitioning/checkpoints with
    ``ShardedPageRank``. Reference semantics: min over neighbor labels until
    no label changes (``ConnectedComponentsVertex.java:107-154`` — identical
    fixpoint; superstep counts may differ, SURVEY §7.3)."""

    n: int
    P: int
    algorithm: str = "cc_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)

    def prepare(self, edges: ray.data.Dataset) -> None:
        """``edges`` must be the UNDIRECTED (symmetrized) edge set, or a
        shared ``PartitionedEdges`` of it (one bulk load, many jobs)."""
        shard_size = (self.n + self.P - 1) // self.P
        part_refs = _resolve_partitioned(edges, "dst", self.P)
        self._preps = {
            p: _prep_block_min.remote(block, self.P, shard_size)
            for p, block in part_refs.items()
        }
        if self._preps:
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        """Release the per-partition edge caches (ClearState analog)."""
        self._preps = None

    def run(
        self,
        edges: ray.data.Dataset | None = None,
        max_supersteps: int = 10_000,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
        post_superstep=None,
    ) -> BSPResult:
        attempts = 0
        while True:
            try:
                return self._run_once(
                    edges, max_supersteps, checkpoint_dir, checkpoint_every,
                    resume or attempts > 0, post_superstep,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1

    def _run_once(
        self,
        edges,
        max_supersteps,
        checkpoint_dir,
        checkpoint_every,
        resume,
        post_superstep,
    ) -> BSPResult:
        P = self.P
        shard_size = (self.n + P - 1) // P
        if self._preps is None:
            self.prepare(edges)
        preps = self._preps
        rounds: list[RoundMetrics] = []
        superstep = 1
        shard_refs: list | None = None
        if resume and checkpoint_dir:
            resumed = ShardedPageRank.resume_refs(self, checkpoint_dir)
            if resumed is not None:
                superstep, shard_refs = resumed
        if shard_refs is None:
            # labels are vertex ids: uint32 shards when they fit halve the
            # kernel's per-edge gather DRAM traffic (exact — integer math).
            # Cutoff is n + P (not n): PADDING slots are labeled up to
            # shard_size·P − 1 ≤ n + P − 2, and the LP distinct-path
            # sentinel (uint32 max) requires every slot's label — padding
            # included — to stay strictly below dtype max.
            ldt = (
                np.uint32
                if self.n + self.P < np.iinfo(np.uint32).max
                else np.int64
            )
            shard_refs = [
                ray.put((np.arange(shard_size, dtype=np.int64) * P + p).astype(ldt))
                for p in range(P)
            ]
        # per-shard frontier: skip source shards with no change last round
        # (resume restarts with all-live — one full-relaxation round, exact)
        live = tuple(True for _ in range(P))
        while superstep <= max_supersteps:
            t0 = time.perf_counter()
            new_refs = list(shard_refs)
            metric_refs = {}
            for p, prep in preps.items():
                sref, mref = _minlabel_task.remote(
                    prep, p, P, live, *shard_refs
                )
                new_refs[p] = sref
                metric_refs[p] = mref
            shard_refs = new_refs
            superstep += 1
            metrics = ray.get(list(metric_refs.values()))
            live_map = dict.fromkeys(range(P), False)
            for p, m in zip(metric_refs.keys(), metrics):
                live_map[p] = m[0] > 0
            live = tuple(live_map[q] for q in range(P))
            changed = sum(m[0] for m in metrics)
            msgs = sum(m[1] for m in metrics)
            rounds.append(
                RoundMetrics(
                    superstep, msgs, changed, float(changed),
                    time.perf_counter() - t0,
                )
            )
            if (
                checkpoint_dir
                and checkpoint_every
                and superstep % checkpoint_every == 0
            ):
                # reuse the PageRank checkpoint plumbing (column is generic)
                ShardedPageRank.checkpoint(
                    self, checkpoint_dir, superstep, shard_refs,
                    {"changed": changed, "msgs": msgs},
                )
            if post_superstep is not None:
                post_superstep(rounds[-1])
            if changed == 0:
                break
        label = np.empty(shard_size * P, dtype=np.int64)
        for p in range(P):
            sh = ray.get(shard_refs[p])
            label[p::P][: len(sh)] = sh
        return BSPResult(state={"label": label[: self.n]}, rounds=rounds, n=self.n)


# ---------------------------------------------------------------------------
# Sharded label propagation — histogram/argmax over the same layout
# ---------------------------------------------------------------------------


_LP_ARENA: dict = {}


def _malloc_recycle() -> None:
    """Raise glibc's mmap/trim thresholds in THIS worker process (once) so
    the LP round's large same-size temporaries are recycled from malloc's
    free list instead of being munmap'd on free and re-faulted as zeroed
    pages next round.  BASELINE.md's round-2 instrumentation measured that
    churn — 32 workers faulting ~20 GB of fresh pages per round — as the
    entire gap between 0.7-2.8 s single-core compute and 5-10 s round
    walls.  No-op off glibc."""
    if _LP_ARENA.get("_mallopt"):
        return
    _LP_ARENA["_mallopt"] = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 29)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 29)
    except Exception:
        pass


def _lp_arena(n_edges: int, gather_dtype) -> dict:
    """Per-worker-process reusable scratch for the generic LP round — the
    fixed-size heavy temporaries (packed key, label gather buffer, run
    mask).  Ray reuses worker processes across tasks and rounds, so these
    pages are faulted once per worker (≤ one arena per CPU), not once per
    task per round; which partition's task lands here doesn't matter, the
    buffers are content-free scratch sized grow-only.

    Memory bound: ~13 B × (edges of the largest partition) per worker
    process.  At cluster scale, size P so E/P stays within the per-worker
    heap budget (the same constraint that already bounds the kernel's
    per-task temporaries — P grows with the cluster, E/P stays put)."""
    _malloc_recycle()
    a = _LP_ARENA
    if a.get("cap", -1) < n_edges:
        a["cap"] = n_edges
        a["key"] = np.empty(n_edges, np.int64)
        a["neq"] = np.empty(n_edges, np.bool_)
    gdt = np.dtype(gather_dtype)
    if a.get("gdt") != gdt or len(a["g"]) < n_edges:
        a["gdt"] = gdt
        a["g"] = np.empty(a["cap"], gdt)
    return a


@ray.remote
def _prep_block_lp(block: pa.Table, P: int, shard_size: int) -> dict:
    """Edge cache for the histogram kernel: the CC-style dst-grouped static
    layout (edges sorted by (owning src shard, local dst), per-run segment
    starts) PLUS the local dst ids needed to pack per-round (dst, label)
    sort keys. dst order never changes — only labels do — so rounds whose
    per-dst label multiset is known-distinct (round 1 on a simple graph) run
    as a pure gather + ``minimum.reduceat`` with no sort at all, and generic
    rounds rebuild only the (dst, label) grouping (the reference's
    DefaultMessageCombiner / non-foldable-message case)."""
    layout, _order = _dst_grouped_layout(
        block["src"].to_numpy(), block["dst"].to_numpy(), P, shard_size
    )
    dst_s = layout.pop("_dst_s")
    layout["dst32"] = dst_s.astype(
        np.int32 if shard_size <= np.iinfo(np.int32).max else np.int64
    )
    return layout


@ray.remote(num_returns=2)
def _labelprop_task(
    prep: dict, p: int, P: int, stride: int, distinct: bool, *shards
):
    """Stateless-task executor wrapper over ``_labelprop_kernel``."""
    return _labelprop_kernel(prep, p, P, stride, distinct, shards)


@ray.remote(num_cpus=0, max_restarts=-1)
class _LPShardWorker:
    """Stateful LP partition worker: the edge cache (and, transparently,
    the per-process scratch arena) lives in worker memory across rounds —
    on a multi-node cluster this avoids re-fetching the ~12 B/edge cache to
    whichever node a stateless task lands on each round (same rationale as
    ``_ShardWorker`` for PageRank; both executors ship)."""

    def __init__(self, prep: dict, p: int, P: int):
        self.prep = prep
        self.p = p
        self.P = P

    def ready(self) -> int:
        return self.p

    @ray.method(num_returns=2)
    def step(self, stride: int, distinct: bool, *shards):
        return _labelprop_kernel(
            self.prep, self.p, self.P, stride, distinct, shards
        )


def _labelprop_kernel(
    prep: dict, p: int, P: int, stride: int, distinct: bool, shards: tuple
):
    """One partition's histogram-argmax round: gather neighbor labels, count
    per (local dst, label), adopt the most frequent (min label on ties).

    ``distinct=True`` asserts every dst's incoming label multiset has all
    counts == 1 (round 1 on a simple graph: initial labels are the globally
    distinct vertex ids and the edge set is deduped), so the mode with
    min-label tie-break IS the segment minimum — computed by
    ``minimum.reduceat`` over the static dst-grouped layout with no sort.
    This removes the most expensive round: with all-distinct labels the
    sort path degenerates to ~E runs and its run-length decode dominates.

    Generic rounds build the (dst, label) histogram by sorting ONE packed
    int64 key ``dst_local·2^shift | label`` (2^shift > max label): a value
    sort needs no permutation array, so it is several times cheaper per
    round than the lexsort formulation, and run-length decoding recovers
    both fields with shifts/masks — int64 divide/modulo by a general stride
    measured ~3× the ENTIRE rest of the round on all-distinct rounds, so
    the power-of-two packing is what keeps the decode proportional-cheap.
    Falls back to arithmetic packing when the id widths don't fit 63 bits
    (n·shard_size ≳ 2^63 — beyond any single-job vertex space here)."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv"]
    own = shards[p]
    if len(prep["dst32"]) == 0:
        return own, 0
    if distinct:
        seg_rel = prep["seg_rel"]
        seg_dst = prep["seg_dst"]
        seg_bounds = prep["seg_bounds"]
        # sentinel/acc follow the shard dtype (uint32 when ids fit) so the
        # narrow representation survives the round; labels < n < dtype max
        sentinel = np.iinfo(own.dtype).max
        acc = np.full(len(own), sentinel, dtype=own.dtype)
        for q in range(P):
            s, e = bounds[q], bounds[q + 1]
            if s >= e:
                continue
            b0, b1 = seg_bounds[q], seg_bounds[q + 1]
            cand = shards[q][sdiv[s:e]]
            segmin = np.minimum.reduceat(cand, seg_rel[b0:b1])
            uniq = seg_dst[b0:b1]
            acc[uniq] = np.minimum(acc[uniq], segmin)
        new = np.where(acc != sentinel, acc, own)
        return new, int((new != own).sum())
    shift = int(stride - 1).bit_length()  # 2^shift ≥ stride > max label
    n_edges = len(prep["dst32"])
    pow2 = (
        int(shards[p].shape[0] - 1).bit_length() + shift <= 63
        and int(n_edges).bit_length() + shift <= 63
    )
    # all heavy fixed-size temporaries live in the per-worker arena: the
    # packed key is REBUILT in place each round (copy + shift, two streaming
    # passes) instead of freshly allocated, the label gather lands in a
    # reused buffer, and the run mask is reused — so a steady-state round
    # faults no new pages for these (see _lp_arena / _malloc_recycle)
    ar = _lp_arena(n_edges, own.dtype)
    key = ar["key"][:n_edges]
    np.copyto(key, prep["dst32"], casting="safe")
    if pow2:
        np.left_shift(key, shift, out=key)
    else:
        # arithmetic packing must fit int64 EXACTLY or labels silently wrap:
        # pack key max ≈ shard_size·stride, tie-break key max ≈
        # (n_edges + shard_size + 1)·stride.  The regime where arithmetic
        # fits but pow2 doesn't is at most ~4×; beyond both, refuse.
        shard_size = int(shards[p].shape[0])
        if (shard_size + 1) * stride >= 2**63 or (
            n_edges + shard_size + 1
        ) * stride >= 2**63:
            raise ValueError(
                f"label-propagation packed keys overflow int64: "
                f"shard_size={shard_size}, n_edges={n_edges}, stride={stride}"
            )
        np.multiply(key, stride, out=key)
    g = ar["g"]
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s < e:
            np.take(shards[q], sdiv[s:e], out=g[s:e])
            np.add(key[s:e], g[s:e], out=key[s:e])
    key.sort()
    neq = ar["neq"][:n_edges]
    neq[0] = True
    np.not_equal(key[1:], key[:-1], out=neq[1:])
    starts = np.flatnonzero(neq)
    heads = key[starts]
    counts = np.diff(starts, append=n_edges)
    # per-dst argmax(count) with min-label tie-break, WITHOUT a second sort:
    # runs are already grouped by pv, so pack (count, inverted label) into
    # one comparison key and take a segmented max (a lexsort here would be
    # a second full sort)
    if pow2:
        mask = (np.int64(1) << shift) - 1
        # O(runs) buffers are consumed in place: starts becomes pv, the
        # run-mask prefix becomes the group mask, heads/counts become the
        # comparison key — no further O(runs) allocations this round
        pv = starts
        np.right_shift(heads, shift, out=pv)
        gneq = neq[: len(pv)]
        gneq[0] = True
        np.not_equal(pv[1:], pv[:-1], out=gneq[1:])
        g_starts = np.flatnonzero(gneq)
        np.left_shift(counts, shift, out=counts)
        np.bitwise_and(heads, mask, out=heads)
        np.subtract(mask, heads, out=heads)
        np.bitwise_or(counts, heads, out=counts)
        best = np.maximum.reduceat(counts, g_starts)
        new = own.copy()
        new[pv[g_starts]] = mask - (best & mask)
    else:
        pv = heads // stride
        g_starts = np.flatnonzero(np.concatenate(([True], pv[1:] != pv[:-1])))
        # counts·stride + (stride−1−label), with label = heads − pv·stride
        cmp = (counts + pv) * stride + (stride - 1) - heads
        best = np.maximum.reduceat(cmp, g_starts)
        new = own.copy()
        new[pv[g_starts]] = (stride - 1) - (best % stride)
    return new, int((new != own).sum())


@dataclass
class ShardedLabelProp:
    """Synchronous histogram label propagation over the sharded layout — the
    scale path for LP (semantics identical to ``label_propagation_dense``:
    fixed rounds, most-frequent neighbor label, min-label tie-break,
    isolated vertices keep their label).

    ``assume_simple=True`` (default) asserts the input is a simple deduped
    undirected edge set (what ``undirected_from_oriented`` produces); round 1
    then runs as a sort-free segmented min (initial labels are distinct, so
    the histogram mode IS the min — see ``_labelprop_task``). Pass False for
    multigraph inputs, where duplicate (src,dst) edges make round-1 counts
    exceed 1."""

    n: int
    P: int
    assume_simple: bool = True
    executor: str = "tasks"  # "tasks" (plasma-shared cache) | "actors"
    algorithm: str = "lp_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)
    _workers: dict | None = field(default=None, repr=False)

    def prepare(self, edges: ray.data.Dataset) -> None:
        """``edges`` must be the UNDIRECTED (symmetrized) edge set, or a
        shared ``PartitionedEdges`` of it (one bulk load, many jobs)."""
        shard_size = (self.n + self.P - 1) // self.P
        part_refs = _resolve_partitioned(edges, "dst", self.P)
        self._preps = {
            p: _prep_block_lp.remote(block, self.P, shard_size)
            for p, block in part_refs.items()
        }
        if self.executor == "actors":
            self._workers = {
                p: _LPShardWorker.remote(prep_ref, p, self.P)
                for p, prep_ref in self._preps.items()
            }
            ray.get([w.ready.remote() for w in self._workers.values()])
        elif self._preps:
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        """Release the per-partition edge caches and any worker fleet
        (ClearState analog)."""
        if self._workers:
            for w in self._workers.values():
                ray.kill(w)
        self._workers = None
        self._preps = None

    def run(
        self,
        edges: ray.data.Dataset | None = None,
        rounds: int = 5,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
    ) -> np.ndarray:
        """Fixed-round LP. Checkpoint/resume uses the shared shard-snapshot
        plumbing (per-partition Parquet + lineage manifest, atomic rename);
        a resumed run replays only the remaining rounds. ``max_retries`` is
        the reference driver's recoverable-failure retry."""
        attempts = 0
        while True:
            try:
                return self._run_once(
                    edges, rounds, checkpoint_dir, checkpoint_every,
                    resume or attempts > 0,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1
                # a lost worker may have taken the actor fleet with it:
                # rebuild from the input when we have it (see ShardedPageRank)
                if edges is not None:
                    self.shutdown()

    def _run_once(
        self, edges, rounds, checkpoint_dir, checkpoint_every, resume
    ) -> np.ndarray:
        P = self.P
        shard_size = (self.n + P - 1) // P
        if self._preps is None:
            self.prepare(edges)
        preps = self._preps
        start = 0
        shard_refs: list | None = None
        if resume and checkpoint_dir:
            resumed = ShardedPageRank.resume_refs(self, checkpoint_dir)
            if resumed is not None:
                start, shard_refs = resumed
        if shard_refs is None:
            # uint32 label shards when ids fit (exact; see ShardedMinLabel —
            # the n + P cutoff keeps PADDING-slot labels below the distinct-
            # path sentinel, uint32 max, not just real-slot labels)
            ldt = (
                np.uint32
                if self.n + self.P < np.iinfo(np.uint32).max
                else np.int64
            )
            shard_refs = [
                ray.put((np.arange(shard_size, dtype=np.int64) * P + p).astype(ldt))
                for p in range(P)
            ]
        stride = self.n + 1  # labels are vertex ids < n
        for r in range(start, rounds):
            new_refs = list(shard_refs)
            distinct = self.assume_simple and r == 0
            for p, prep in preps.items():
                if self._workers is not None:
                    new_refs[p], _ = self._workers[p].step.remote(
                        stride, distinct, *shard_refs
                    )
                else:
                    new_refs[p], _ = _labelprop_task.remote(
                        prep, p, P, stride, distinct, *shard_refs
                    )
            shard_refs = new_refs
            if (
                checkpoint_dir
                and checkpoint_every
                and (r + 1) % checkpoint_every == 0
            ):
                ShardedPageRank.checkpoint(
                    self, checkpoint_dir, r + 1, shard_refs, {"round": r + 1}
                )
        label = np.empty(shard_size * P, dtype=np.int64)
        for p in range(P):
            sh = ray.get(shard_refs[p])
            label[p::P][: len(sh)] = sh
        return label[: self.n]


# ---------------------------------------------------------------------------
# Sharded SSSP — weighted min-dist relaxation over the same layout
# ---------------------------------------------------------------------------


@ray.remote
def _prep_block_sssp(
    block: pa.Table, P: int, shard_size: int, weight_col: str | None
) -> dict:
    """Edge cache for the distance kernel: the shared dst-grouped layout plus
    the per-edge weight column permuted into the same order (reference:
    ``ShortestPathsVertex.java:124-145`` relaxes each edge with its
    FloatWritable value, null → 1.0)."""
    src = block["src"].to_numpy()
    dst = block["dst"].to_numpy()
    layout, order = _dst_grouped_layout(src, dst, P, shard_size)
    del layout["_dst_s"]
    if weight_col is not None and weight_col in block.column_names:
        layout["w"] = block[weight_col].to_numpy().astype(np.float64)[order]
    else:
        layout["w"] = np.ones(len(src), dtype=np.float64)
    return layout


@ray.remote(num_returns=2)
def _sssp_task(prep: dict, p: int, P: int, live: tuple, *shards: np.ndarray):
    """One partition's min(dist + w) combine + apply for one superstep.
    ``live`` skips source shards whose distances didn't change last round
    (monotone min — see ``_minlabel_task``); at shard granularity this is the
    reference's message-driven frontier (vertices vote to halt and reactivate
    on message)."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv"]
    w = prep["w"]
    seg_rel = prep["seg_rel"]
    seg_dst = prep["seg_dst"]
    seg_bounds = prep["seg_bounds"]
    own = shards[p]
    acc = own.copy()
    scanned = 0
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s >= e or not live[q]:
            continue
        scanned += e - s
        b0, b1 = seg_bounds[q], seg_bounds[q + 1]
        cand = shards[q][sdiv[s:e]] + w[s:e]
        segmin = np.minimum.reduceat(cand, seg_rel[b0:b1])
        uniq = seg_dst[b0:b1]
        acc[uniq] = np.minimum(acc[uniq], segmin)
    changed = int((acc != own).sum())  # inf != inf is False: unreached stay
    return acc, (changed, scanned)


@dataclass
class ShardedSSSP:
    """Single-source shortest paths over the sharded layout — the scale path
    for SSSP (semantics identical to ``pipelines.sssp.SSSPDense``: min-dist
    relaxation with per-edge weights, missing weight column → 1.0, converges
    when no distance improves). Reference:
    ``pregelix-example/.../ShortestPathsVertex.java:124-145``; checkpointing
    shares ``ShardedPageRank``'s partition-parallel Parquet plumbing."""

    n: int
    P: int
    source: int = 0
    weight_col: str | None = None
    algorithm: str = "sssp_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)

    def prepare(self, edges: ray.data.Dataset) -> None:
        """``edges`` is the DIRECTED edge set (src, dst[, weight]), or a
        shared ``PartitionedEdges`` of it."""
        shard_size = (self.n + self.P - 1) // self.P
        part_refs = _resolve_partitioned(edges, "dst", self.P)
        self._preps = {
            p: _prep_block_sssp.remote(block, self.P, shard_size, self.weight_col)
            for p, block in part_refs.items()
        }
        if self._preps:
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        """Release the per-partition edge caches (ClearState analog)."""
        self._preps = None

    def run(
        self,
        edges: ray.data.Dataset | None = None,
        max_supersteps: int = 10_000,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
        post_superstep=None,
    ) -> BSPResult:
        attempts = 0
        while True:
            try:
                return self._run_once(
                    edges, max_supersteps, checkpoint_dir, checkpoint_every,
                    resume or attempts > 0, post_superstep,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1

    def _run_once(
        self,
        edges,
        max_supersteps,
        checkpoint_dir,
        checkpoint_every,
        resume,
        post_superstep,
    ) -> BSPResult:
        P = self.P
        shard_size = (self.n + P - 1) // P
        if self._preps is None:
            self.prepare(edges)
        preps = self._preps
        rounds: list[RoundMetrics] = []
        superstep = 1
        shard_refs: list | None = None
        if resume and checkpoint_dir:
            resumed = ShardedPageRank.resume_refs(self, checkpoint_dir)
            if resumed is not None:
                superstep, shard_refs = resumed
        if shard_refs is None:
            shards = [
                np.full(shard_size, np.inf, dtype=np.float64) for _ in range(P)
            ]
            shards[self.source % P][self.source // P] = 0.0
            shard_refs = [ray.put(s) for s in shards]
            # round 1's frontier is the source's shard alone
            live = tuple(q == self.source % P for q in range(P))
        else:
            # the checkpoint doesn't record the frontier: one full-relaxation
            # round re-establishes it (exact — min-propagation is idempotent)
            live = tuple(True for _ in range(P))
        while superstep <= max_supersteps:
            t0 = time.perf_counter()
            new_refs = list(shard_refs)
            metric_refs = {}
            for p, prep in preps.items():
                sref, mref = _sssp_task.remote(prep, p, P, live, *shard_refs)
                new_refs[p] = sref
                metric_refs[p] = mref
            shard_refs = new_refs
            superstep += 1
            metrics = ray.get(list(metric_refs.values()))
            live_map = dict.fromkeys(range(P), False)
            for p, m in zip(metric_refs.keys(), metrics):
                live_map[p] = m[0] > 0
            live = tuple(live_map[q] for q in range(P))
            changed = sum(m[0] for m in metrics)
            msgs = sum(m[1] for m in metrics)
            rounds.append(
                RoundMetrics(
                    superstep, msgs, changed, float(changed),
                    time.perf_counter() - t0,
                )
            )
            if (
                checkpoint_dir
                and checkpoint_every
                and superstep % checkpoint_every == 0
            ):
                ShardedPageRank.checkpoint(
                    self, checkpoint_dir, superstep, shard_refs,
                    {"changed": changed, "msgs": msgs},
                )
            if post_superstep is not None:
                post_superstep(rounds[-1])
            if changed == 0:
                break
        dist = np.empty(shard_size * P, dtype=np.float64)
        for p in range(P):
            sh = ray.get(shard_refs[p])
            dist[p::P][: len(sh)] = sh
        return BSPResult(state={"dist": dist[: self.n]}, rounds=rounds, n=self.n)


# ---------------------------------------------------------------------------
# Sharded reachability — bidirectional bitmask OR over the same layout
# ---------------------------------------------------------------------------


@ray.remote
def _prep_block_reach(block: pa.Table, P: int, shard_size: int) -> dict:
    """Edge cache for the bit-OR kernel over the direction-tagged union table
    (forward edges carry mask 1, reversed edges mask 2 — reference:
    ``ReachabilityVertex.java``, bit 1 flows src→dst, bit 2 dst→src)."""
    src = block["src"].to_numpy()
    dst = block["dst"].to_numpy()
    layout, order = _dst_grouped_layout(src, dst, P, shard_size)
    del layout["_dst_s"]
    layout["mask"] = block["mask"].to_numpy().astype(np.int64)[order]
    return layout


@ray.remote(num_returns=2)
def _reach_task(prep: dict, p: int, P: int, live: tuple, *shards: np.ndarray):
    """One partition's bitwise-OR combine + apply (monotone: ``live`` skips
    unchanged source shards exactly as in the min kernels)."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv"]
    mask = prep["mask"]
    seg_rel = prep["seg_rel"]
    seg_dst = prep["seg_dst"]
    seg_bounds = prep["seg_bounds"]
    own = shards[p]
    acc = own.copy()
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s >= e or not live[q]:
            continue
        b0, b1 = seg_bounds[q], seg_bounds[q + 1]
        cand = shards[q][sdiv[s:e]] & mask[s:e]
        segor = np.bitwise_or.reduceat(cand, seg_rel[b0:b1])
        uniq = seg_dst[b0:b1]
        acc[uniq] |= segor
    changed = int((acc != own).sum())
    return acc, (changed, bool((acc == 3).any()))


@dataclass
class ShardedReachability:
    """Bidirectional source↔dest reachability over the sharded layout — the
    scale path for ``pipelines.reachability``. The job force-terminates the
    moment any vertex holds both bits (reference ``signalTerminate``)."""

    n: int
    P: int
    source: int = 0
    dest: int = 0
    algorithm: str = "reach_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)

    def prepare(self, directed_edges: ray.data.Dataset) -> None:
        """Builds the direction-tagged union table (fwd mask 1 + rev mask 2)
        from the DIRECTED edge set, then partitions it by receiving vertex."""
        from .partition import partition_table_refs

        def tag_both(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks()
            d = t["dst"].combine_chunks()
            nfwd = len(s)
            return pa.table(
                {
                    "src": pa.concat_arrays([s, d]),
                    "dst": pa.concat_arrays([d, s]),
                    "mask": pa.array(
                        np.concatenate(
                            [
                                np.ones(nfwd, dtype=np.int64),
                                np.full(nfwd, 2, dtype=np.int64),
                            ]
                        )
                    ),
                }
            )

        union = directed_edges.map_batches(tag_both, batch_format="pyarrow")
        shard_size = (self.n + self.P - 1) // self.P
        part_refs = partition_table_refs(union, "dst", self.P)
        self._preps = {
            p: _prep_block_reach.remote(block, self.P, shard_size)
            for p, block in part_refs.items()
        }
        if self._preps:
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        """Release the per-partition edge caches (ClearState analog)."""
        self._preps = None

    def run(
        self,
        directed_edges: ray.data.Dataset | None = None,
        max_supersteps: int = 10_000,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
        post_superstep=None,
    ) -> tuple[bool, BSPResult]:
        """Shares the checkpoint/lineage/retry plumbing with the other
        sharded runners (``ShardedPageRank.checkpoint/resume_refs``): bit
        shards snapshot per superstep, a failed attempt reloads the newest
        checkpoint and resumes automatically."""
        attempts = 0
        while True:
            try:
                return self._run_once(
                    directed_edges, max_supersteps, checkpoint_dir,
                    checkpoint_every, resume or attempts > 0, post_superstep,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1

    def _run_once(
        self,
        directed_edges,
        max_supersteps,
        checkpoint_dir,
        checkpoint_every,
        resume,
        post_superstep,
    ) -> tuple[bool, BSPResult]:
        P = self.P
        shard_size = (self.n + P - 1) // P
        if self.source == self.dest:
            return True, BSPResult(state={}, rounds=[], n=self.n)
        if self._preps is None:
            self.prepare(directed_edges)
        preps = self._preps
        rounds: list[RoundMetrics] = []
        superstep = 1
        shard_refs: list | None = None
        live = tuple(
            q in (self.source % P, self.dest % P) for q in range(P)
        )
        if resume and checkpoint_dir:
            resumed = ShardedPageRank.resume_refs(self, checkpoint_dir)
            if resumed is not None:
                superstep, shard_refs = resumed
                # one full-relaxation round after resume (exact: bit-OR is
                # monotone, re-sent bits are already folded in)
                live = tuple(True for _ in range(P))
        if shard_refs is None:
            shards = [np.zeros(shard_size, dtype=np.int64) for _ in range(P)]
            shards[self.source % P][self.source // P] |= 1
            shards[self.dest % P][self.dest // P] |= 2
            shard_refs = [ray.put(s) for s in shards]
        found = False
        while superstep <= max_supersteps and not found:
            t0 = time.perf_counter()
            new_refs = list(shard_refs)
            metric_refs = {}
            for p, prep in preps.items():
                sref, mref = _reach_task.remote(prep, p, P, live, *shard_refs)
                new_refs[p] = sref
                metric_refs[p] = mref
            shard_refs = new_refs
            superstep += 1
            metrics = ray.get(list(metric_refs.values()))
            live_map = dict.fromkeys(range(P), False)
            for p, m in zip(metric_refs.keys(), metrics):
                live_map[p] = m[0] > 0
            live = tuple(live_map[q] for q in range(P))
            changed = sum(m[0] for m in metrics)
            found = any(m[1] for m in metrics)
            rounds.append(
                RoundMetrics(
                    superstep, 0, changed, float(changed),
                    time.perf_counter() - t0,
                )
            )
            if (
                checkpoint_dir
                and checkpoint_every
                and superstep % checkpoint_every == 0
            ):
                ShardedPageRank.checkpoint(
                    self, checkpoint_dir, superstep, shard_refs,
                    {"changed": changed, "found": found},
                )
            if post_superstep is not None:
                post_superstep(rounds[-1])
            if changed == 0:
                break
        return found, BSPResult(state={}, rounds=rounds, n=self.n)


# ---------------------------------------------------------------------------
# Sharded graph sampling — frontier masks over the same layout
# ---------------------------------------------------------------------------


@ray.remote(num_returns=2)
def _sample_scatter_task(
    prep: dict, p: int, P: int, live: tuple, selected, *frontiers
):
    """Partition p's newly-reached mask: ANY frontier neighbor (bit-max over
    the static dst segments), minus already-selected vertices.  ``live``
    skips source shards whose frontier emptied — the GraphSampleVertex
    scatter at shard granularity (reference
    ``pregelix-example/.../GraphSampleVertex.java``)."""
    bounds = prep["bounds"]
    sdiv = prep["sdiv"]
    seg_rel = prep["seg_rel"]
    seg_dst = prep["seg_dst"]
    seg_bounds = prep["seg_bounds"]
    newly = np.zeros(len(selected), dtype=np.uint8)
    for q in range(P):
        s, e = bounds[q], bounds[q + 1]
        if s >= e or not live[q]:
            continue
        b0, b1 = seg_bounds[q], seg_bounds[q + 1]
        cand = frontiers[q][sdiv[s:e]]
        segmax = np.maximum.reduceat(cand, seg_rel[b0:b1])
        newly[seg_dst[b0:b1]] |= segmax
    newly[selected > 0] = 0
    return newly, int(newly.sum())


@ray.remote
def _sample_count_below(newly: np.ndarray, p: int, P: int, T: int) -> int:
    """#newly vertices in this shard with GLOBAL id < T (slot i ↔ id i·P+p;
    slots ascend, so ids ascend — one searchsorted)."""
    idx = np.flatnonzero(newly)
    return int(np.searchsorted(idx * P + p, T, side="left"))


@ray.remote(num_returns=3)
def _sample_apply(selected, newly, p: int, P: int, T):
    """Fold the (possibly quota-truncated) newly mask into selected; the
    truncated mask is the next frontier.  ``T`` is the global-id threshold
    from the driver's binary search (None = no truncation)."""
    if T is not None:
        idx = np.flatnonzero(newly)
        keep = idx[idx * P + p < T]
        newly = np.zeros_like(newly)
        newly[keep] = 1
    return selected | newly, newly, int(newly.sum())


@ray.remote
def _pack_bits(sel: np.ndarray, front: np.ndarray) -> np.ndarray:
    """(selected, frontier) uint8 masks → one bit-packed checkpoint shard."""
    return (sel | (front << 1)).astype(np.uint8)


@ray.remote
def _unpack_bit(packed: np.ndarray, bit: int) -> np.ndarray:
    return ((packed >> bit) & 1).astype(np.uint8)


@ray.remote
def _mask_count(m: np.ndarray) -> int:
    return int(m.sum())


@dataclass
class ShardedSample:
    """Seeded-BFS graph sampling over the sharded layout — the scale path
    for ``pipelines.sampling.graph_sample_dense`` (bit-identical semantics:
    per round newly-reached = frontier neighbors − selected, truncated to
    the remaining quota by ascending GLOBAL vertex id).  The dense runner's
    driver-held O(n) frontier mask is replaced by per-shard uint8 masks in
    the object store; quota truncation finds the exact global-id threshold
    with a distributed binary search (O(log n) waves of counting tasks,
    only in the round that overshoots), so the driver holds counts, never
    vertex lists.  Fill rate per round is the reference's global aggregator
    (``GraphSampleVertex`` + per-iteration aggregate)."""

    n: int
    P: int
    algorithm: str = "sample_sharded"  # checkpoint-manifest label
    _preps: dict | None = field(default=None, repr=False)

    def prepare(self, undirected_edges: ray.data.Dataset) -> None:
        shard_size = (self.n + self.P - 1) // self.P
        part_refs = _resolve_partitioned(undirected_edges, "dst", self.P)
        self._preps = {
            p: _prep_block_min.remote(block, self.P, shard_size)
            for p, block in part_refs.items()
        }
        if self._preps:
            ray.wait(list(self._preps.values()), num_returns=len(self._preps))

    def shutdown(self) -> None:
        self._preps = None

    def run(
        self,
        undirected_edges: ray.data.Dataset | None = None,
        seeds: np.ndarray | None = None,
        target_fraction: float = 0.5,
        max_rounds: int = 10_000,
        checkpoint_dir: str | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        max_retries: int = 0,
        post_round=None,
    ) -> tuple[np.ndarray, int]:
        """→ (selected mask over all n vertices, rounds used).

        Checkpoint/resume shares the common plumbing: per-round snapshots
        pack (selected, frontier) into one uint8 bit shard (bit0 selected,
        bit1 frontier) — round boundaries are exact resume points because
        quota truncation is resolved WITHIN a round."""
        attempts = 0
        while True:
            try:
                return self._run_once(
                    undirected_edges, seeds, target_fraction, max_rounds,
                    checkpoint_dir, checkpoint_every,
                    resume or attempts > 0, post_round,
                )
            except Exception:
                if attempts >= max_retries or not checkpoint_dir:
                    raise
                attempts += 1

    def _run_once(
        self,
        undirected_edges,
        seeds,
        target_fraction,
        max_rounds,
        checkpoint_dir,
        checkpoint_every,
        resume,
        post_round,
    ) -> tuple[np.ndarray, int]:
        P = self.P
        shard_size = (self.n + P - 1) // P
        if self._preps is None:
            self.prepare(undirected_edges)
        preps = self._preps
        quota = int(np.ceil(target_fraction * self.n))
        sel_refs: list | None = None
        rounds = 0
        if resume and checkpoint_dir:
            resumed = ShardedPageRank.resume_refs(self, checkpoint_dir)
            if resumed is not None:
                step, packed = resumed
                rounds = step
                man = read_manifest(checkpoint_dir, step)
                n_selected = int(man.metrics["n_selected"])
                sel_refs = [_unpack_bit.remote(r, 0) for r in packed]
                front_refs = [_unpack_bit.remote(r, 1) for r in packed]
                fcounts = ray.get(
                    [_mask_count.remote(r) for r in front_refs]
                )
                live = tuple(c > 0 for c in fcounts)
        if sel_refs is None:
            if seeds is None:
                raise ValueError(
                    "ShardedSample: no checkpoint found to resume from and "
                    "no seeds provided — pass seeds or point checkpoint_dir "
                    "at an existing run"
                )
            sel = [np.zeros(shard_size, dtype=np.uint8) for _ in range(P)]
            for v in np.asarray(seeds, dtype=np.int64):
                sel[v % P][v // P] = 1
            sel_refs = [ray.put(s) for s in sel]
            front_refs = list(sel_refs)
            n_selected = int(len(np.unique(np.asarray(seeds))))
            live = tuple(
                bool((np.asarray(seeds) % P == q).any()) for q in range(P)
            )
        while n_selected < quota and any(live) and rounds < max_rounds:
            rounds += 1
            newly_refs, cnt_refs = {}, {}
            for p in range(P):
                prep = preps.get(p)
                if prep is None:
                    continue
                nref, cref = _sample_scatter_task.remote(
                    prep, p, P, live, sel_refs[p], *front_refs
                )
                newly_refs[p] = nref
                cnt_refs[p] = cref
            counts = dict(zip(cnt_refs, ray.get(list(cnt_refs.values()))))
            total_new = sum(counts.values())
            remaining = quota - n_selected
            T = None
            if total_new > remaining:
                # exact global-id threshold: minimal T with
                # Σ_p |newly_p ∩ [0, T)| == remaining (ids unique → the
                # count step function hits `remaining` exactly)
                lo, hi = 1, self.n
                while lo < hi:
                    mid = (lo + hi) // 2
                    c = sum(
                        ray.get(
                            [
                                _sample_count_below.remote(r, p, P, mid)
                                for p, r in newly_refs.items()
                            ]
                        )
                    )
                    if c < remaining:
                        lo = mid + 1
                    else:
                        hi = mid
                T = lo
            new_sel = list(sel_refs)
            new_front = list(front_refs)
            front_counts = {}
            zero = None
            for p in range(P):
                if p in newly_refs:
                    sref, fref, fcref = _sample_apply.remote(
                        sel_refs[p], newly_refs[p], p, P, T
                    )
                    new_sel[p] = sref
                    new_front[p] = fref
                    front_counts[p] = fcref
                else:
                    if zero is None:
                        zero = ray.put(np.zeros(shard_size, dtype=np.uint8))
                    new_front[p] = zero
            sel_refs, front_refs = new_sel, new_front
            fc = dict(zip(front_counts, ray.get(list(front_counts.values()))))
            live = tuple(fc.get(q, 0) > 0 for q in range(P))
            n_selected += min(total_new, remaining)
            if (
                checkpoint_dir
                and checkpoint_every
                and rounds % checkpoint_every == 0
            ):
                packed = [
                    _pack_bits.remote(sel_refs[p], front_refs[p])
                    for p in range(P)
                ]
                ShardedPageRank.checkpoint(
                    self, checkpoint_dir, rounds, packed,
                    {"n_selected": n_selected, "quota": quota},
                )
            if post_round is not None:
                post_round(rounds, n_selected)
        mask = np.zeros(shard_size * P, dtype=bool)
        for p in range(P):
            sh = ray.get(sel_refs[p])
            mask[p::P][: len(sh)] = sh > 0
        return mask[: self.n], rounds
