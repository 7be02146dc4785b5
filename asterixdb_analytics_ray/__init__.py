"""asterixdb_analytics_ray — a Ray-Data-native link-graph analytics engine.

From-scratch re-expression of the capability set of the reference
``sigmod/asterixdb-analytics`` repo (Pregelix: BSP vertex-centric graph
analytics — see ``/root/reference/pregelix``) on top of ``ray.data.Dataset``
pipelines over zero-copy Arrow batches.

Layout:
- ``sources/``   — transcript generation + readers, micro-graph fixtures
- ``graph.py``   — edge derivation, node-id encoding, ``LinkGraph``
- ``bsp.py``     — the generic superstep loop (dense broadcast + dataset modes)
- ``pipelines/`` — PageRank, connected components, label propagation,
                   triangle counting, SSSP, reachability, degrees
- ``state/``     — per-superstep Parquet checkpoints with lineage manifest
- ``functions/`` — message combiners (reference: MessageCombiner subclasses)
- ``stages/``    — scatter/aggregation stage kernels

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions are
owned by the caller (driver, pytest fixture, or bench.py).
"""

__version__ = "0.1.0"
