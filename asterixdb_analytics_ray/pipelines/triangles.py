"""Triangle counting — the join formulation of the reference's 2-superstep BSP.

Reference: ``pregelix-example/.../TriangleCountingVertex.java:51-97`` — SS1:
each vertex b emits, for neighbor pairs a < b < c, a message (to a) naming c;
SS2: a counts messages whose named vertex is in a's adjacency; the global
``TriangleCountingAggregator`` sums per-vertex counts. Net semantics: each
triangle (a<b<c) counted once, at its minimum vertex a.

Message concat doesn't combine (DefaultMessageCombiner territory), so the BSP
message formulation explodes; per SURVEY.md §7.3 we use the equivalent
join shape:

    oriented edges (src<dst)
      → adjacency grouped by src  → wedge emission (a, b, c), b<c
      → LEFT SEMI hash join wedges ⨝ edges on (b, c)   (edge-existence test)
      → groupby(a).count()  =  per-vertex counts; global = sum

Skew note: a vertex of degree d emits d²/2 wedges; the oriented (min→max)
representation bounds d by the count of HIGHER-id neighbors, and wedge
emission streams per group so hubs spill rather than OOM. (Degree-ordered
orientation — ranking by degree instead of id — is the standard further
mitigation; id-orientation is kept for exact reference parity.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.blocks import safe_join


def triangle_count(
    oriented_edges: ray.data.Dataset,
    n: int,
    num_partitions: int = 32,
) -> tuple[ray.data.Dataset, int]:
    """→ ((v, triangles) Dataset over vertices with ≥1 triangle, global total).

    ``oriented_edges`` must be the canonical src<dst undirected representation
    (``LinkGraph.oriented()`` / micrograph helper).
    """

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        nbrs = np.sort(g["dst"].to_numpy())
        if len(nbrs) < 2:
            return pd.DataFrame({"a": [], "b": [], "c": []})
        ib, ic = np.triu_indices(len(nbrs), k=1)
        return pd.DataFrame(
            {"a": g["src"].iloc[0], "b": nbrs[ib], "c": nbrs[ic]}
        )

    wedge_ds = oriented_edges.groupby("src").map_groups(wedges, batch_format="pandas")
    closed = safe_join(
        wedge_ds,
        oriented_edges,
        "left_semi",
        num_partitions,
        on=("b", "c"),
        right_on=("src", "dst"),
    )
    per_vertex = (
        closed.groupby("a")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "v": t["a"],
                    "triangles": t["count()"],
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    total = int(per_vertex.sum("triangles") or 0)
    return per_vertex, total


def triangles_table(per_vertex: ray.data.Dataset, n: int) -> pa.Table:
    """Densify to all n vertices (zeros where no triangles), sorted by v."""
    counts = np.zeros(n, dtype=np.int64)
    for b in per_vertex.iter_batches(batch_format="pyarrow"):
        counts[b["v"].to_numpy()] = b["triangles"].to_numpy()
    return pa.table({"v": np.arange(n, dtype=np.int64), "triangles": counts})
