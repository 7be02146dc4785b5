"""Reference-shaped micro-graphs for exact golden tests.

These reproduce (programmatically, from the pattern) the topologies of the
reference conformance corpus:
- ``webmap20``: ``pregelix-example/data/webmap/webmap_link.txt`` — vertex v in
  0..9 links to 1..v+1 (two triangular fans), v in 10..18 links to 11..v+1,
  and vertex 19 links to 0 plus 11..19.
- ``clique7``: ``pregelix-example/data/clique/clique.txt`` — a 5-clique-ish
  cluster {1..5} bridged structure plus a 3-clique {5,6,7}.
- ``skew21``: the shape of ``data/skew/data.txt`` — one hub vertex with a huge
  out-degree among a small vertex set (``SkewTest.java:40-66`` uses 4146).
- ``two_components``: a chain and a ring, disjoint.

Returned as (src, dst) int64 numpy arrays (directed, as the text files are).
"""

from __future__ import annotations

import numpy as np


def _edges(pairs: list[tuple[int, int]]) -> tuple[np.ndarray, np.ndarray]:
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    return a, b


def webmap20() -> tuple[np.ndarray, np.ndarray, int]:
    pairs: list[tuple[int, int]] = [(0, 1)]
    for v in range(1, 10):
        pairs += [(v, d) for d in range(1, v + 2)]
    pairs += [(10, 11)]
    for v in range(11, 19):
        pairs += [(v, d) for d in range(11, v + 2)]
    pairs += [(19, 0)] + [(19, d) for d in range(11, 20)]
    s, d = _edges(pairs)
    return s, d, 20


def clique7() -> tuple[np.ndarray, np.ndarray, int]:
    # vertices 0..6 (reference file is 1-based 1..7; shifted to 0-based)
    adj = {
        0: [1, 2, 3],
        1: [0, 2, 3, 4],
        2: [0, 1, 3, 4],
        3: [0, 1, 2],
        4: [5, 6],
        5: [4, 6],
        6: [4, 5],
    }
    pairs = [(v, d) for v, ds in adj.items() for d in ds]
    s, d = _edges(pairs)
    return s, d, 7


def skew21(hub_degree: int = 200) -> tuple[np.ndarray, np.ndarray, int]:
    """21 base vertices; vertex 0 is a hub with ``hub_degree`` out-edges to a
    widened vertex set (multi-edges collapse, so extra leaves are added)."""
    n = 21 + hub_degree
    pairs = [(0, 21 + i) for i in range(hub_degree)]  # hub fan-out to leaves
    pairs += [(21 + i, 0) for i in range(hub_degree)]  # and back
    pairs += [(v, v + 1) for v in range(1, 20)]  # a chain over the base set
    pairs += [(20, 1), (1, 0)]
    s, d = _edges(pairs)
    return s, d, n


def two_components() -> tuple[np.ndarray, np.ndarray, int]:
    chain = [(v, v + 1) for v in range(0, 5)]  # 0-1-2-3-4-5
    ring = [(v, v + 1) for v in range(6, 11)] + [(11, 6)]  # 6..11 ring
    s, d = _edges(chain + ring)
    return s, d, 12


def as_dataset(src: np.ndarray, dst: np.ndarray):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
