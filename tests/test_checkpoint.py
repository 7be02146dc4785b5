import os
import shutil

import numpy as np
import pytest

from asterixdb_analytics_ray.bsp import BSPConfig
from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
from asterixdb_analytics_ray.sources.micrographs import as_dataset, webmap20
from asterixdb_analytics_ray.state import checkpoint as ckpt


@pytest.fixture()
def webmap_ds():
    src, dst, n = webmap20()
    return as_dataset(src, dst), np.bincount(src, minlength=n), n


def test_checkpoint_write_read_roundtrip(tmp_path):
    state = {"rank": np.random.default_rng(0).random(100)}
    man = ckpt.write_dense_checkpoint(
        str(tmp_path), 4, "pagerank", state, {"delta": 0.5}, num_partitions=8
    )
    assert man.superstep == 4
    assert len(man.partitions) == 8
    assert sum(p.rows for p in man.partitions) == 100
    got, man2 = ckpt.read_dense_checkpoint(str(tmp_path), 4)
    np.testing.assert_array_equal(got["rank"], state["rank"])
    assert man2.metrics["delta"] == 0.5


def test_checkpoint_lineage_detects_corruption(tmp_path):
    state = {"rank": np.arange(50, dtype=np.float64)}
    ckpt.write_dense_checkpoint(str(tmp_path), 2, "pagerank", state, {}, 4)
    victim = os.path.join(str(tmp_path), "step=00002", "part-0001.parquet")
    # rewrite partition 1 with different content (same schema)
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(victim)
    bad = t.set_column(1, "rank", pa.array(np.zeros(t.num_rows)))
    pq.write_table(bad, victim)
    with pytest.raises(IOError, match="lineage"):
        ckpt.read_dense_checkpoint(str(tmp_path), 2)


def test_incomplete_checkpoint_ignored(tmp_path):
    state = {"rank": np.arange(10, dtype=np.float64)}
    ckpt.write_dense_checkpoint(str(tmp_path), 2, "pagerank", state, {}, 2)
    ckpt.write_dense_checkpoint(str(tmp_path), 4, "pagerank", state, {}, 2)
    # simulate a crash mid-write of step 6: dir exists, no manifest
    os.makedirs(os.path.join(str(tmp_path), "step=00006"))
    assert ckpt.list_checkpoints(str(tmp_path)) == [2, 4]


def test_pagerank_kill_resume_identical(tmp_path, webmap_ds, ray_session):
    ds, outdeg, n = webmap_ds
    full = pagerank_dense(ds, n, outdeg, supersteps=10)

    ckdir = str(tmp_path / "ck")
    cfg = BSPConfig(checkpoint_dir=ckdir, checkpoint_every=2)
    pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg)
    steps = ckpt.list_checkpoints(ckdir)
    assert steps == [2, 4, 6, 8, 10]

    # "kill" after superstep 6: later checkpoints lost
    for s in (8, 10):
        shutil.rmtree(os.path.join(ckdir, f"step={s:05d}"))

    cfg2 = BSPConfig(checkpoint_dir=ckdir, checkpoint_every=2, resume=True)
    res = pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg2)
    # resumed mid-iteration: first replayed apply is superstep 7
    assert res.rounds[0].superstep == 7
    assert res.supersteps == 10
    np.testing.assert_allclose(res.state["rank"], full.state["rank"], atol=1e-15)
    assert ckpt.list_checkpoints(ckdir) == [2, 4, 6, 8, 10]


def test_sharded_checkpoint_kill_resume(tmp_path, webmap_ds, ray_session):
    """Sharded runner: kill after a mid-run checkpoint, resume, identical
    ranks — and the resumed run starts at the checkpointed superstep."""
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    ds, outdeg, n = webmap_ds
    full = ShardedPageRank(n=n, P=4).run(ds, outdeg, supersteps=10)

    ckdir = str(tmp_path / "shck")
    interrupted = ShardedPageRank(n=n, P=4)
    interrupted.run(
        ds, outdeg, supersteps=6, checkpoint_dir=ckdir, checkpoint_every=2
    )
    assert ckpt.list_checkpoints(ckdir) == [2, 4, 6]

    resumed = ShardedPageRank(n=n, P=4)
    resumed.prepare(ds, outdeg)
    res = resumed.run(
        supersteps=10, checkpoint_dir=ckdir, checkpoint_every=2, resume=True
    )
    np.testing.assert_allclose(
        res.state["rank"], full.state["rank"], atol=0, rtol=0
    )
    # resumed mid-iteration: only supersteps 7..10 were replayed
    assert [r.superstep for r in res.rounds] == [7, 8, 9, 10]
    assert ckpt.list_checkpoints(ckdir) == [2, 4, 6, 8, 10]


def test_sharded_mixed_checkpoint_resume(tmp_path, webmap_ds, ray_session):
    """Mixed-precision resume rebuilds the float32 dived shards from the
    float64 checkpoint shards (the checkpoint format is precision-agnostic):
    the resumed run must equal the uninterrupted mixed run bit-for-bit."""
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    ds, outdeg, n = webmap_ds
    full = ShardedPageRank(n=n, P=4, precision="mixed").run(
        ds, outdeg, supersteps=10
    )

    ckdir = str(tmp_path / "shck_mixed")
    ShardedPageRank(n=n, P=4, precision="mixed").run(
        ds, outdeg, supersteps=6, checkpoint_dir=ckdir, checkpoint_every=3
    )
    resumed = ShardedPageRank(n=n, P=4, precision="mixed")
    res = resumed.run(
        ds, outdeg, supersteps=10,
        checkpoint_dir=ckdir, checkpoint_every=3, resume=True,
    )
    np.testing.assert_allclose(
        res.state["rank"], full.state["rank"], atol=0, rtol=0
    )
    assert res.rounds[0].superstep == 7


def test_sharded_lp_checkpoint_resume(tmp_path, webmap_ds, ray_session):
    """LP checkpoint/resume: a run killed after round 2 of 5 resumes from the
    snapshot and reproduces the uninterrupted labels exactly; a PageRank
    resume pointed at the LP checkpoint is refused (algorithm mismatch)."""
    import pyarrow as pa
    import ray.data

    from asterixdb_analytics_ray.graph import undirected_from_oriented
    from asterixdb_analytics_ray.stages.sharded import (
        ShardedLabelProp,
        ShardedPageRank,
    )

    ds, outdeg, n = webmap_ds

    def sym(t: pa.Table) -> pa.Table:
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

    und = ds.map_batches(sym, batch_format="pyarrow").materialize()
    full = ShardedLabelProp(n=n, P=4).run(und, rounds=5)

    ckdir = str(tmp_path / "lpck")
    ShardedLabelProp(n=n, P=4).run(
        und, rounds=2, checkpoint_dir=ckdir, checkpoint_every=2
    )
    assert ckpt.list_checkpoints(ckdir) == [2]
    resumed = ShardedLabelProp(n=n, P=4).run(
        und, rounds=5, checkpoint_dir=ckdir, checkpoint_every=2, resume=True
    )
    np.testing.assert_array_equal(resumed, full)

    with pytest.raises(ValueError, match="algorithm"):
        ShardedPageRank(n=n, P=4).run(
            ds, outdeg, supersteps=5, checkpoint_dir=ckdir, resume=True
        )


def test_sharded_checkpoint_lineage_corruption(tmp_path, webmap_ds, ray_session):
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    ds, outdeg, n = webmap_ds
    ckdir = str(tmp_path / "shck2")
    runner = ShardedPageRank(n=n, P=4)
    runner.run(ds, outdeg, supersteps=6, checkpoint_dir=ckdir, checkpoint_every=2)
    part = os.path.join(ckdir, "step=00006", "part-0001.parquet")
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_table(part)
    bad = t.set_column(0, "value", pa.array(t["value"].to_numpy() + 1.0))
    pq.write_table(bad, part)
    r2 = ShardedPageRank(n=n, P=4)
    r2.prepare(ds, outdeg)
    with pytest.raises(Exception, match="lineage"):
        r2.run(supersteps=10, checkpoint_dir=ckdir, resume=True)


def test_sssp_sharded_checkpoint_resume(tmp_path, webmap_ds, ray_session):
    """ShardedSSSP shares the PageRank checkpoint plumbing; resume reproduces
    the uninterrupted distances (the frontier restarts all-live — exact)."""
    from asterixdb_analytics_ray.stages.sharded import ShardedSSSP

    ds, _outdeg, n = webmap_ds
    full = ShardedSSSP(n=n, P=4, source=0).run(ds)

    ckdir = str(tmp_path / "sssp_ck")
    interrupted = ShardedSSSP(n=n, P=4, source=0)
    interrupted.run(ds, max_supersteps=3, checkpoint_dir=ckdir, checkpoint_every=2)
    assert len(ckpt.list_checkpoints(ckdir)) >= 1

    resumed = ShardedSSSP(n=n, P=4, source=0)
    resumed.prepare(ds)
    res = resumed.run(checkpoint_dir=ckdir, resume=True)
    assert np.array_equal(res.state["dist"], full.state["dist"])


def test_sssp_checkpoint_rejects_wrong_algorithm(tmp_path, webmap_ds, ray_session):
    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank, ShardedSSSP

    ds, outdeg, n = webmap_ds
    ckdir = str(tmp_path / "prck")
    ShardedPageRank(n=n, P=4).run(
        ds, outdeg, supersteps=6, checkpoint_dir=ckdir, checkpoint_every=2
    )
    r = ShardedSSSP(n=n, P=4, source=0)
    r.prepare(ds)
    with pytest.raises(ValueError, match="algorithm"):
        r.run(checkpoint_dir=ckdir, resume=True)


def test_hooks_and_fault_injection_recovery(tmp_path, webmap_ds, ray_session):
    """Reference FailureRecoveryTest analog: a post-superstep hook raises
    mid-run (the reference kills NC2 via FailureInjectionIterationCompleteHook)
    after checkpoints exist; resume completes and matches the clean run."""
    ds, outdeg, n = webmap_ds
    full = pagerank_dense(ds, n, outdeg, supersteps=10)

    calls = {"pre": 0, "post": 0}

    def pre(superstep, state):
        calls["pre"] += 1

    def boom(metrics, state):
        calls["post"] += 1
        if metrics.superstep == 6:
            raise RuntimeError("injected failure")

    ckdir = str(tmp_path / "faultck")
    cfg = BSPConfig(
        checkpoint_dir=ckdir, checkpoint_every=2,
        pre_superstep=pre, post_superstep=boom,
    )
    with pytest.raises(RuntimeError, match="injected"):
        pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg)
    assert calls["pre"] == 5 and calls["post"] == 5  # rounds 2..6 ran
    assert ckpt.list_checkpoints(ckdir) == [2, 4, 6]

    cfg2 = BSPConfig(checkpoint_dir=ckdir, checkpoint_every=2, resume=True)
    res = pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg2)
    assert res.rounds[0].superstep == 7
    np.testing.assert_allclose(res.state["rank"], full.state["rank"], atol=1e-15)


def test_dense_automatic_recovery_no_reinvoke(tmp_path, webmap_ds, ray_session):
    """Reference ``Driver.runJobs:137-195``: the driver itself catches the
    failure, reloads the newest checkpoint and retries — no manual resume."""
    ds, outdeg, n = webmap_ds
    full = pagerank_dense(ds, n, outdeg, supersteps=10)

    fired = {"n": 0}

    def boom(metrics, state):
        if metrics.superstep == 6:
            fired["n"] += 1
            raise RuntimeError("injected failure")

    ckdir = str(tmp_path / "autorec")
    cfg = BSPConfig(
        checkpoint_dir=ckdir, checkpoint_every=2,
        post_superstep=boom, max_retries=3,
    )
    res = pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg)
    assert fired["n"] == 1  # failed once, recovered internally
    # superstep 6 was checkpointed before the hook fired: resume starts at 7
    assert res.rounds[0].superstep == 7
    np.testing.assert_allclose(res.state["rank"], full.state["rank"], atol=1e-15)


def test_dense_recovery_exhausts_retries(tmp_path, webmap_ds, ray_session):
    ds, outdeg, n = webmap_ds

    def always_boom(metrics, state):
        raise RuntimeError("permanent failure")

    cfg = BSPConfig(
        checkpoint_dir=str(tmp_path / "exh"), checkpoint_every=2,
        post_superstep=always_boom, max_retries=2,
    )
    with pytest.raises(RuntimeError, match="permanent"):
        pagerank_dense(ds, n, outdeg, supersteps=10, cfg=cfg)


def test_sharded_automatic_recovery(tmp_path, webmap_ds, ray_session):
    """Sharded runner retry loop: a post-superstep fault after a checkpoint
    recovers without user action and matches the clean run bit-for-bit."""
    from asterixdb_analytics_ray.stages.sharded import ShardedMinLabel

    ds, _outdeg, n = webmap_ds
    full = ShardedMinLabel(n=n, P=4).run(ds)

    fired = {"n": 0}

    def boom(metrics):
        if metrics.superstep == 4 and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("injected failure")

    r = ShardedMinLabel(n=n, P=4)
    res = r.run(
        ds, checkpoint_dir=str(tmp_path / "shrec"), checkpoint_every=2,
        max_retries=3, post_superstep=boom,
    )
    assert fired["n"] == 1
    np.testing.assert_array_equal(res.state["label"], full.state["label"])


def test_sharded_actor_fleet_recovery(tmp_path, webmap_ds, ray_session):
    """A retry after a LOST WORKER must not reuse the dead actor fleet: the
    runner rebuilds workers (shutdown + re-prepare) and resumes from the
    checkpoint (reference ``Driver.runJobs:137-195`` — the recoverable
    fault class is a lost node, not a driver-side hook error)."""
    import ray

    from asterixdb_analytics_ray.stages.sharded import ShardedPageRank

    ds, outdeg, n = webmap_ds
    full = ShardedPageRank(n=n, P=4).run(ds, outdeg, supersteps=10)

    killed = {"n": 0}
    r = ShardedPageRank(n=n, P=4, executor="actors")

    def kill_one(metrics):
        if metrics.superstep == 6 and killed["n"] == 0:
            killed["n"] += 1
            # kill beyond restart: every later call to this actor fails, so
            # a retry that reused the cached fleet would fail identically
            ray.kill(next(iter(r._workers.values())), no_restart=True)

    res = r.run(
        ds, outdeg, supersteps=10,
        checkpoint_dir=str(tmp_path / "actrec"), checkpoint_every=2,
        max_retries=3, post_superstep=kill_one,
    )
    assert killed["n"] == 1
    np.testing.assert_allclose(
        res.state["rank"], full.state["rank"], atol=1e-15
    )


def test_sharded_reachability_checkpoint_resume(tmp_path, webmap_ds, ray_session):
    """Reachability shares the checkpoint/lineage plumbing: a post-superstep
    fault after a checkpoint recovers automatically and the resumed run
    reports the same verdict as the clean run."""
    from asterixdb_analytics_ray.stages.sharded import ShardedReachability

    ds, _outdeg, n = webmap_ds
    clean_found, clean = ShardedReachability(n=n, P=4, source=0, dest=15).run(ds)

    fired = {"n": 0}

    def boom(metrics):
        if metrics.superstep == 4 and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("injected failure")

    r = ShardedReachability(n=n, P=4, source=0, dest=15)
    found, res = r.run(
        ds, checkpoint_dir=str(tmp_path / "reach"), checkpoint_every=2,
        max_retries=3, post_superstep=boom,
    )
    assert fired["n"] == 1
    assert found == clean_found
    # resumed run starts past the checkpointed superstep
    assert res.rounds[0].superstep >= 4


def test_sharded_sample_checkpoint_resume(tmp_path, webmap_ds, ray_session):
    """ShardedSample kill/resume: a post-round fault after a checkpoint
    recovers automatically and the resumed run's selected set is
    bit-identical to the clean run (round boundaries are exact resume
    points — quota truncation resolves within a round)."""
    from asterixdb_analytics_ray.stages.sharded import ShardedSample

    ds, _outdeg, n = webmap_ds
    clean_sel, clean_rounds = ShardedSample(n=n, P=4).run(
        ds, seeds=np.array([0]), target_fraction=0.9
    )

    fired = {"n": 0}

    def boom(rounds, n_selected):
        if rounds == 2 and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("injected failure")

    sel, rounds = ShardedSample(n=n, P=4).run(
        ds, seeds=np.array([0]), target_fraction=0.9,
        checkpoint_dir=str(tmp_path / "smp"), checkpoint_every=1,
        max_retries=3, post_round=boom,
    )
    assert fired["n"] == 1
    np.testing.assert_array_equal(sel, clean_sel)
