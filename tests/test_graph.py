import numpy as np
import pandas as pd


def _pdf(ds):
    return ds.to_pandas()


def oracle_edges(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Driver-side pandas oracle for the three edge derivations (string keys)."""
    t = transcripts
    rows = []
    # conv_tool
    ct = t.dropna(subset=["tool"])[["conv_id", "tool"]].drop_duplicates()
    for _, r in ct.iterrows():
        rows.append(("conv", r.conv_id, "tool", r.tool, "conv_tool"))
    # reply
    for conv, g in t.groupby("conv_id"):
        idx = np.sort(g["turn_idx"].to_numpy())
        for a, b in zip(idx[:-1], idx[1:]):
            rows.append(("turn", f"{conv}:{a:04d}", "turn", f"{conv}:{b:04d}", "reply"))
    # tool_cooc
    cooc = set()
    for conv, g in t.dropna(subset=["tool"]).groupby("conv_id"):
        tools = sorted(set(g["tool"]))
        for i in range(len(tools)):
            for j in range(i + 1, len(tools)):
                cooc.add((tools[i], tools[j]))
    for a, b in sorted(cooc):
        rows.append(("tool", a, "tool", b, "tool_cooc"))
    return pd.DataFrame(
        rows, columns=["src_kind", "src_key", "dst_kind", "dst_key", "kind"]
    )


def test_edge_derivation_matches_pandas_oracle(tiny_transcripts, tiny_graph):
    t = tiny_transcripts.to_pandas()
    want = oracle_edges(t)

    # decode engine edges back to (kind,key) via the node table
    nodes = tiny_graph.node_table.to_pandas().set_index("node_id")
    got = _pdf(tiny_graph.edges)
    got = pd.DataFrame(
        {
            "src_kind": nodes.loc[got["src"], "kind"].to_numpy(),
            "src_key": nodes.loc[got["src"], "key"].to_numpy(),
            "dst_kind": nodes.loc[got["dst"], "kind"].to_numpy(),
            "dst_key": nodes.loc[got["dst"], "key"].to_numpy(),
            "kind": got["kind"],
        }
    )
    key = ["kind", "src_kind", "src_key", "dst_kind", "dst_key"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)[got_s.columns]
    pd.testing.assert_frame_equal(got_s, want_s)


def test_node_ids_dense_and_sorted(tiny_graph):
    nt = tiny_graph.node_table.to_pandas()
    assert (nt["node_id"].to_numpy() == np.arange(len(nt))).all()
    comp = (nt["kind"] + ":" + nt["key"]).tolist()
    assert comp == sorted(comp)
    assert tiny_graph.n_nodes == len(nt)


def test_undirected_and_oriented(tiny_graph):
    und = _pdf(tiny_graph.undirected())
    assert len(und) % 2 == 0
    s = set(zip(und["src"], und["dst"]))
    assert all((b, a) in s for a, b in s)
    ori = _pdf(tiny_graph.oriented())
    assert (ori["src"] < ori["dst"]).all()
    assert len(ori) * 2 == len(und)


def test_out_degrees(tiny_graph):
    deg = tiny_graph.out_degrees()
    e = _pdf(tiny_graph.directed())
    want = np.zeros(tiny_graph.n_nodes, dtype=np.int64)
    for v, c in e["src"].value_counts().items():
        want[v] = c
    assert (deg == want).all()


def test_structured_ids_isomorphic_to_dict(tiny_transcripts, tiny_graph):
    """Structured-id build must produce the same graph up to id renaming."""
    from asterixdb_analytics_ray.graph import build_link_graph_structured

    g2, ids = build_link_graph_structured(tiny_transcripts)
    e2 = g2.edges.to_pandas()

    def decode(v: int) -> tuple[str, str]:
        C, S = ids.n_convs, ids.slot
        if v < C * S:
            return ("turn", f"c{v // S:07d}:{v % S:04d}")
        if v < C * (S + 1):
            return ("conv", f"c{v - C * S:07d}")
        return ("tool", f"tool_{v - C * (S + 1):03d}")

    nodes = tiny_graph.node_table.to_pandas().set_index("node_id")
    e1 = tiny_graph.edges.to_pandas()
    set1 = {
        (
            (nodes.loc[s, "kind"], nodes.loc[s, "key"]),
            (nodes.loc[d, "kind"], nodes.loc[d, "key"]),
            k,
        )
        for s, d, k in zip(e1["src"], e1["dst"], e1["kind"])
    }
    set2 = {(decode(s), decode(d), k) for s, d, k in zip(e2["src"], e2["dst"], e2["kind"])}
    assert set1 == set2


def test_degrees_both_matches_single(tiny_graph):
    g = tiny_graph
    out2, in2 = g.degrees_both()
    np.testing.assert_array_equal(out2, g.out_degrees())
    np.testing.assert_array_equal(in2, g.in_degrees())
