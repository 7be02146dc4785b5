"""Graph mutation — vertex/edge add & delete deltas between supersteps.

Reference: ``Vertex.addEdge/removeEdge`` (``api/graph/Vertex.java:581-597``),
``Vertex.addVertex/deleteVertex`` (``:607-620``) route mutations to dedicated
insert/delete channels applied to the B-tree per iteration
(``JobGenOuterJoin.java:175-190,212-215``). The demo semantics live in
``GraphMutationVertex.java:46-70``.

Ray mapping: the vertex set and edge table are immutable Arrow datasets; a
mutation round produces delta tables and applies them with a union (inserts)
and an anti-join / mask filter (deletes). Deleting a vertex cascades to its
incident edges, as the B-tree delete does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def apply_edge_deltas(
    edges: ray.data.Dataset,
    inserts: pa.Table | None = None,
    deletes: pa.Table | None = None,
) -> ray.data.Dataset:
    """edges ∪ inserts ∖ deletes, deduplicated. Delta tables: (src, dst)."""
    import pyarrow.compute as pc

    out = edges.select_columns(["src", "dst"])
    if inserts is not None and inserts.num_rows:
        out = out.union(ray.data.from_arrow(inserts.select(["src", "dst"])))
    if deletes is not None and deletes.num_rows:
        # broadcast the (small) delete set; anti-join via packed-key mask
        key = (
            deletes["src"].to_numpy().astype(np.int64) << np.int64(32)
        ) | deletes["dst"].to_numpy().astype(np.int64)
        dref = ray.put(np.unique(key))

        def drop(t: pa.Table) -> pa.Table:
            dead = ray.get(dref)
            k = (t["src"].to_numpy() << np.int64(32)) | t["dst"].to_numpy()
            return t.filter(pa.array(~np.isin(k, dead)))

        out = out.map_batches(drop, batch_format="pyarrow")
    return out.groupby(["src", "dst"]).count().drop_columns(["count()"])


def delete_vertices(
    edges: ray.data.Dataset, dead_vertices: np.ndarray
) -> ray.data.Dataset:
    """Remove vertices and ALL their incident edges (B-tree delete cascade)."""
    dref = ray.put(np.unique(dead_vertices.astype(np.int64)))

    def drop(t: pa.Table) -> pa.Table:
        dead = ray.get(dref)
        keep = ~(np.isin(t["src"].to_numpy(), dead) | np.isin(t["dst"].to_numpy(), dead))
        return t.filter(pa.array(keep))

    return edges.map_batches(drop, batch_format="pyarrow")


def graph_mutation_demo(n: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """The reference GraphMutationVertex program on a 0..n-1 chain graph:
    superstep 1 deletes vertices divisible by 2 or 3 (< 100) and adds vertex
    100·i for each surviving vertex i; superstep 2 deletes vertex 1900.
    Returns the final (vertex_ids, edge_count_per_vertex-ish) — exercised by
    the unit test against a driver-side oracle."""
    verts = np.arange(n, dtype=np.int64)
    # SS1
    dead = verts[((verts % 2 == 0) | (verts % 3 == 0)) & (verts < 100)]
    alive = np.setdiff1d(verts, dead)
    added = alive * 100
    verts2 = np.union1d(alive, added)
    # SS2
    verts3 = np.setdiff1d(verts2, np.array([1900]))
    return verts3, dead
