"""Spectral graph scores: the second eigenvector of the symmetrically
normalized adjacency Â = D^-1/2 A D^-1/2 over the undirected simple graph —
the Fiedler-style partitioning direction (Ng/Jordan/Weiss-family spectral
embedding, one dimension).  The sign pattern of the score splits the graph
along its weakest normalized cut; magnitudes order vertices within the
split.

The reference ships no spectral example; the operator completes the
iterative-algorithm family (PageRank/HITS/Katz cover the dominant
eigenvector of row-stochastic / plain adjacency; this is the first
SUB-dominant eigen-direction, which needs deflation).  Plan shape per
superstep is the reference's PageRank job (scatter over edges, sum-combine,
apply — ``pregelix-example/.../PageRankVertex.java:118-145``), run on the
dense engine like HITS/Katz.

Numerical contract (SQL-reproducible, the ``hits.py`` discipline):

* Â's PRINCIPAL eigenvector is known in closed form — Â·√d = 1·√d — so
  deflation needs no first power iteration: project against s = √d/‖√d‖.
* The iteration runs UN-normalized (‖x_t‖ ~ λ₂ᵗ ≤ 1 shrinks, never
  overflows); the per-step s-projection coefficients are ~1e-16 residues
  (x₀ starts exactly deflated), so the global float reduction each step is
  numerically a no-op and cannot compound; ONE final max-|x| scaling (an
  order-independent reduction) + rounding makes both sides bit-stable.
* x₀ = parity vector (+1 even ids / −1 odd) minus its s-component —
  deterministic on both sides, no RNG.

Isolated vertices (degree 0 in the undirected view) have no Â row: their
score is exactly 0 after the first apply, matching the oracle's LEFT JOIN.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..bsp import BSPConfig, BSPResult, run_dense_bsp
from ..functions.combiners import SUM

SPECTRAL_ITERS = 20
SPECTRAL_DECIMALS = 6


@dataclass
class SpectralDense:
    """Dense-engine kernel: state = {x}; one Â-apply + deflation per step."""

    n: int
    s: np.ndarray          # unit principal eigenvector √d/‖√d‖ (0 on isolated)
    inv_sqrt_d: np.ndarray  # 1/√d (0 on isolated vertices)
    iters: int = SPECTRAL_ITERS

    name: str = "spectral"
    combiner = SUM
    msg_dtype = np.float64
    _isd_ref: object = field(default=None, repr=False)

    def init_state(self, n: int) -> dict[str, np.ndarray]:
        x0 = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
        x0 = x0 - float(x0 @ self.s) * self.s
        return {"x": x0}

    def scatter_factory(self, refs, superstep):
        if superstep > self.iters:
            return None
        if self._isd_ref is None:
            self._isd_ref = ray.put(self.inv_sqrt_d)
        vec_ref, isd_ref = refs["x"], self._isd_ref

        def scatter(batch: pa.Table) -> pa.Table:
            x = ray.get(vec_ref)
            isd = ray.get(isd_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            contrib = x[src] * isd[src] * isd[dst]
            v, m = SUM.segment_reduce(dst, contrib)
            return pa.table({"v": v, "msg": m})

        return scatter

    def apply(self, state, msg, has_msg, superstep):
        y = msg - float(msg @ self.s) * self.s  # kill regrown √d component
        delta = float(np.abs(y - state["x"]).max())
        return {"x": y}, self.n, delta


def spectral_scores(
    undirected: ray.data.Dataset,
    n: int,
    iters: int = SPECTRAL_ITERS,
    decimals: int = SPECTRAL_DECIMALS,
    cfg: BSPConfig | None = None,
) -> pa.Table:
    """(v, score): second eigen-direction of Â, max-|x|-scaled, rounded.

    ``undirected`` is the both-direction simple edge set (the ``und``
    view); degrees are computed from it with one pass."""
    deg = np.zeros(n, dtype=np.float64)

    for ref in undirected.select_columns(["src"]).to_arrow_refs():
        t = ray.get(ref)
        if len(t):
            np.add.at(deg, t["src"].to_numpy(), 1.0)

    with np.errstate(divide="ignore"):
        isd = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-300)), 0.0)
    s = np.sqrt(deg)
    nrm = float(np.linalg.norm(s))
    s = s / (nrm if nrm > 0 else 1.0)

    cfg = cfg or BSPConfig()
    cfg.max_supersteps = max(cfg.max_supersteps, iters + 2)
    res: BSPResult = run_dense_bsp(
        undirected, n, SpectralDense(n=n, s=s, inv_sqrt_d=isd, iters=iters),
        cfg,
    )
    x = res.state["x"]
    m = float(np.abs(x).max()) or 1.0
    return pa.table(
        {
            "v": np.arange(n, dtype=np.int64),
            "score": np.round(x / m, decimals),
        }
    )


def spectral_cut_quality(
    undirected: ray.data.Dataset,
    n: int,
    iters: int = SPECTRAL_ITERS,
    cfg: BSPConfig | None = None,
) -> pa.Table:
    """Quality of the spectral sign partition: the NORMALIZED CUT of the
    bipartition A = {score > 0}, B = {score ≤ 0} — ncut = cut(A,B)·(1/vol A
    + 1/vol B) over the undirected simple graph (Shi–Malik objective the
    second eigenvector approximately minimizes).

    → one row (cut_edges: int64, vol_a: int64, vol_b: int64, ncut).

    Composition: the ``spectral_scores`` table (already rounded — the
    sign is taken from the SAME rounded score the oracle sees, so the
    partition is bit-identical on both sides) broadcast once; ONE
    distributed pass over the both-direction edge set counts crossing
    half-edges and per-side volumes as integer partials (each undirected
    edge appears twice, so cut = crossing rows / 2 and vol sums are
    degree sums exactly)."""
    scores = spectral_scores(undirected, n, iters=iters, cfg=cfg)
    side = (scores["score"].to_numpy() > 0).astype(np.int8)
    sref = ray.put(side)

    def partial(t: pa.Table) -> pa.Table:
        s = ray.get(sref)
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        cross = int((s[src] != s[dst]).sum())
        va = int((s[src] > 0).sum())   # half-edge volume of side A
        vb = int((s[src] == 0).sum())
        return pa.table(
            {
                "cross": pa.array([cross], pa.int64()),
                "va": pa.array([va], pa.int64()),
                "vb": pa.array([vb], pa.int64()),
            }
        )

    # one int64 row per BLOCK → the driver sums a blocks-bounded table
    agg = undirected.map_batches(partial, batch_format="pyarrow").to_pandas()
    cross = int(agg["cross"].sum()) // 2
    va = int(agg["va"].sum())
    vb = int(agg["vb"].sum())
    ncut = (
        float(cross) / va + float(cross) / vb if va > 0 and vb > 0 else 0.0
    )
    return pa.table(
        {
            "cut_edges": pa.array([cross], pa.int64()),
            "vol_a": pa.array([va], pa.int64()),
            "vol_b": pa.array([vb], pa.int64()),
            "ncut": pa.array([round(ncut, 9)], pa.float64()),
        }
    )
