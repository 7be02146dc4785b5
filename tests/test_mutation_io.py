import numpy as np
import pyarrow as pa
import pytest
import ray.data

from asterixdb_analytics_ray.pipelines.mutation import (
    apply_edge_deltas,
    delete_vertices,
    graph_mutation_demo,
)
from asterixdb_analytics_ray.sources.micrographs import as_dataset, webmap20
from asterixdb_analytics_ray.sources.textio import (
    read_adjacency_text,
    read_vertex_tsv,
    write_vertex_tsv,
)


def test_edge_insert_delete(ray_session):
    src, dst, n = webmap20()
    ds = as_dataset(src, dst)
    ins = pa.table({"src": [0, 0], "dst": [5, 7]})
    dele = pa.table({"src": [1], "dst": [2]})
    out = apply_edge_deltas(ds, ins, dele).to_pandas()
    s = set(zip(out["src"], out["dst"]))
    assert (0, 5) in s and (0, 7) in s
    assert (1, 2) not in s
    assert len(s) == len(set(zip(src, dst))) + 2 - 1


def test_delete_vertices_cascades(ray_session):
    src, dst, n = webmap20()
    out = delete_vertices(as_dataset(src, dst), np.array([1])).to_pandas()
    assert not ((out["src"] == 1) | (out["dst"] == 1)).any()


def test_graph_mutation_demo_semantics():
    verts, dead = graph_mutation_demo(100)
    # survivors: 1, 5, 7, ... (coprime to 6); 1900 = 19*100 removed in SS2
    assert 1 in verts and 100 in verts
    assert 1900 not in verts
    assert 0 in dead and 6 in dead
    assert all(v % 2 or v % 3 for v in verts if v < 100)


def test_adjacency_text_roundtrip(tmp_path, ray_session):
    # write the reference's webmap format, parse, compare to the generator
    src, dst, n = webmap20()
    lines: dict[int, list[int]] = {}
    for s, d in zip(src, dst):
        lines.setdefault(int(s), []).append(int(d))
    p = tmp_path / "webmap_link.txt"
    with open(p, "w") as f:
        for v in range(n):
            f.write(" ".join(str(x) for x in [v] + lines.get(v, [])) + "\n")
    got = read_adjacency_text(str(p)).to_pandas()
    assert set(zip(got["src"], got["dst"])) == set(zip(src, dst))


def test_adjacency_text_weighted_sssp(tmp_path, ray_session):
    """webmapcomplex-style weighted adjacency (src d1 w1 d2 w2 ...) parses
    with weights and drives weighted SSSP end-to-end (reference
    TextShortestPathsInputFormat carries a FloatWritable per edge)."""
    from asterixdb_analytics_ray.oracle import sssp_numpy
    from asterixdb_analytics_ray.pipelines.sssp import sssp_dense

    # 0 →(5) 1 →(1) 2 ; 0 →(1) 2 directly: direct edge wins (dist[2]=1)
    p = tmp_path / "weighted.txt"
    p.write_text("0 1 5 2 1\n1 2 1\n2\n")
    ds = read_adjacency_text(str(p), weighted=True)
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert df["weight"].tolist() == [5.0, 1.0, 1.0]
    res = sssp_dense(ds, 3, source=0, weight_col="weight")
    want = sssp_numpy(
        df["src"].to_numpy(), df["dst"].to_numpy(), 3, source=0,
        weight=df["weight"].to_numpy(),
    )
    assert np.array_equal(res.state["dist"], want)
    assert res.state["dist"][2] == 1.0


def test_vertex_tsv_roundtrip(tmp_path):
    t = pa.table(
        {"v": np.arange(10, dtype=np.int64), "rank": np.linspace(0, 1, 10)}
    )
    write_vertex_tsv(t, str(tmp_path / "out"), num_partitions=3)
    back = read_vertex_tsv(str(tmp_path / "out"))
    assert back["v"].to_pylist() == list(range(10))
    assert float(back["value"][3].as_py()) == pytest.approx(t["rank"][3].as_py())


def test_global_aggregators(ray_session):
    from asterixdb_analytics_ray.pipelines.pagerank import pagerank_dense
    from asterixdb_analytics_ray.bsp import BSPConfig, run_dense_bsp
    from asterixdb_analytics_ray.pipelines.pagerank import PageRankDense
    import ray

    src, dst, n = webmap20()
    ds = as_dataset(src, dst)
    outdeg = np.bincount(src, minlength=n)
    algo = PageRankDense(
        outdeg_ref=ray.put(outdeg.astype(np.float64)), n=n, supersteps=5
    )
    res = run_dense_bsp(
        ds,
        n,
        algo,
        BSPConfig(max_supersteps=5),
        aggregators={"rank_mass": lambda s: float(s["rank"].sum())},
    )
    assert all("rank_mass" in r.extra for r in res.rounds)
    assert 0 < res.rounds[-1].extra["rank_mass"] <= 1.0 + 1e-9