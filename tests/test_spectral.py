"""Spectral second-eigenvector scores: eigensolver ground truth on small
graphs (the DuckDB parity check on the real graph lives in
test_oracle_conformance.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _und_ds(pairs, reps=3):
    import ray.data

    src = np.array([a for a, b in pairs] + [b for a, b in pairs], np.int64)
    dst = np.array([b for a, b in pairs] + [a for a, b in pairs], np.int64)
    return ray.data.from_arrow(
        pa.table({"src": src, "dst": dst})
    ).repartition(reps)


def test_spectral_matches_eigensolver_two_cliques(ray_session):
    """Two K5 cliques joined by one bridge edge: the second eigenvector of
    Â separates the cliques by sign — compare direction against
    np.linalg.eigh ground truth."""
    from asterixdb_analytics_ray.pipelines.spectral import spectral_scores

    import itertools

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(5, 10), 2))
    pairs = c1 + c2 + [(4, 5)]
    n = 10
    out = (
        spectral_scores(_und_ds(pairs), n, iters=60, decimals=9)
        .to_pandas()
        .sort_values("v")
    )
    x = out["score"].to_numpy()

    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = A[b, a] = 1.0
    d = A.sum(1)
    Ahat = A / np.sqrt(np.outer(d, d))
    w, V = np.linalg.eigh(Ahat)
    v2 = V[:, np.argsort(w)[-2]]  # second-largest eigenvalue's vector
    cos = abs(x @ v2) / (np.linalg.norm(x) * np.linalg.norm(v2))
    assert cos > 0.9999
    # sign pattern splits the cliques
    assert len(set(np.sign(x[:5]))) == 1
    assert len(set(np.sign(x[5:]))) == 1
    assert np.sign(x[0]) != np.sign(x[9])


def test_spectral_isolated_vertices_score_zero(ray_session):
    from asterixdb_analytics_ray.pipelines.spectral import spectral_scores

    pairs = [(0, 1), (1, 2), (2, 0)]
    out = (
        spectral_scores(_und_ds(pairs, reps=2), 5)
        .to_pandas()
        .set_index("v")
    )
    assert out.loc[3, "score"] == 0.0
    assert out.loc[4, "score"] == 0.0


def test_spectral_deterministic_across_partitionings(ray_session):
    from asterixdb_analytics_ray.pipelines.spectral import spectral_scores

    rng = np.random.default_rng(3)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 40, (150, 2)) if p[0] != p[1]}
    a = spectral_scores(_und_ds(sorted(pairs), reps=2), 40).to_pandas()
    b = spectral_scores(_und_ds(sorted(pairs), reps=7), 40).to_pandas()
    assert a.sort_values("v").reset_index(drop=True).equals(
        b.sort_values("v").reset_index(drop=True)
    )


def test_coloring_proper_and_deterministic(ray_session):
    """Coloring is PROPER on a random graph (no edge joins same colors),
    every vertex is colored within the round margin, and the result is
    partitioning-independent."""
    from asterixdb_analytics_ray.pipelines.coloring import coloring_table

    rng = np.random.default_rng(7)
    pairs = sorted(
        {tuple(sorted(p)) for p in rng.integers(0, 60, (300, 2)) if p[0] != p[1]}
    )
    n = 60
    a = coloring_table(_und_ds(pairs, reps=3), n).to_pandas()
    b = coloring_table(_und_ds(pairs, reps=8), n).to_pandas()
    assert a.sort_values("v").reset_index(drop=True).equals(
        b.sort_values("v").reset_index(drop=True)
    )
    color = a.sort_values("v")["color"].to_numpy()
    assert (color >= 1).all()  # margin: everything colored
    for x, y in pairs:
        assert color[x] != color[y]


def test_coloring_clique_uses_k_colors(ray_session):
    """A K6 needs exactly 6 rounds (one vertex per round by priority)."""
    import itertools

    from asterixdb_analytics_ray.pipelines.coloring import coloring_table

    pairs = list(itertools.combinations(range(6), 2))
    out = coloring_table(_und_ds(pairs, reps=2), 6).to_pandas()
    colors = sorted(out["color"])
    assert colors == [1, 2, 3, 4, 5, 6]


def test_spectral_cut_two_cliques_bridge(ray_session):
    """On two K5s joined by one edge, the sign partition separates the
    cliques → cut_edges == 1 and ncut == 1/21 + 1/21."""
    import itertools

    from asterixdb_analytics_ray.pipelines.spectral import (
        spectral_cut_quality,
    )

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(5, 10), 2))
    pairs = c1 + c2 + [(4, 5)]
    out = spectral_cut_quality(_und_ds(pairs), 10, iters=60).to_pandas()
    assert out["cut_edges"].iloc[0] == 1
    assert out["vol_a"].iloc[0] + out["vol_b"].iloc[0] == 2 * len(pairs)
    assert out["ncut"].iloc[0] == pytest.approx(1 / 21 + 1 / 21, abs=1e-9)
