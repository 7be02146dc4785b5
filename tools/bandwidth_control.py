"""Ray-free hardware control for the scaling gate: runs the EXACT superstep
kernel (same dtypes, same wave shape — P tasks per superstep) under plain
multiprocessing with the same core pinning as the bench legs. Its 8→32-core
scaling is the machine's own ceiling for this kernel; comparing the Ray legs
against it separates engine overhead from single-socket DRAM contention.

Mirrors the PRE-DIVIDED mixed-precision kernel the bench legs run
(``stages/sharded._superstep_kernel_mixed``): static edge columns are two
uint16 local ids (4 B/edge), the gather reads float32 rank/outdeg shards, and
each task ends with the O(n/P) re-divide producing the next float32 shard.
Accumulation is float64 throughout, as in the engine.

Usage: python tools/bandwidth_control.py <ncpu>
"""

import numpy as np, time, os, sys
from multiprocessing import Pool

P = 32
n = 1_354_608
shard_size = (n + P - 1) // P
E_per = 274_265_856 // P
rng = np.random.default_rng(0)
src = rng.integers(0, n, E_per).astype(np.uint32); src.sort()
smod = (src % P).astype(np.int64)
order = np.argsort(smod, kind="stable")
src_sh = src[order]; sdiv = (src_sh // P).astype(np.uint16)
dst_sh = rng.integers(0, shard_size, E_per).astype(np.uint16)[order]
bounds = np.searchsorted(smod[order], np.arange(P + 1))
ranks = np.random.default_rng(1).random(shard_size * P)
# pre-divided float32 shards (rank/outdeg), as published by each task
dived = [np.ascontiguousarray(ranks[p::P]).astype(np.float32) for p in range(P)]
inv_shard = np.random.default_rng(2).random(shard_size).astype(np.float32)

def kernel(_):
    t0 = time.perf_counter()
    acc = np.zeros(shard_size)
    for q in range(P):
        s, e = bounds[q], bounds[q+1]
        if s < e:
            acc += np.bincount(dst_sh[s:e], weights=dived[q][sdiv[s:e]], minlength=shard_size)
    new = 0.15 / n + 0.85 * acc
    nd = (new * inv_shard).astype(np.float32)  # next dived shard (O(n/P))
    return time.perf_counter() - t0

if __name__ == "__main__":
    ncpu = int(sys.argv[1])
    os.sched_setaffinity(0, range(ncpu))
    # P tasks per "superstep", ncpu workers — exactly the leg's shape
    best = None
    for rep in range(4):
        with Pool(ncpu) as pool:
            pool.map(kernel, range(P))  # warm
            t0 = time.perf_counter()
            for _ in range(3):
                pool.map(kernel, range(P))
            wall = (time.perf_counter() - t0) / 3
        agg = P * E_per / wall
        best = agg if best is None else max(best, agg)
    print(f"ncpu={ncpu}: best {best/1e6:.0f} M edges/s per superstep-wave")
