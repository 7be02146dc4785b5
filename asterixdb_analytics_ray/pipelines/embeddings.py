"""Similarity search + embedding near-dup over the ``embeddings`` table.

- ``knn_brute_force``: exact top-k cosine per query — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, zero-copy per task).
  The 100 TB baseline path: streams the corpus once per query batch.
- ``knn_ivf``: IVF variant — k-means coarse quantizer (trained via the IMRU
  loop), corpus bucketed by nearest centroid (one groupby), queries probe the
  ``nprobe`` nearest cells only. The scale path: touches a fraction of rows.
- ``cosine_dup_pairs``: embedding near-duplicate pairs (cosine ≥ threshold)
  via blocked matmul.

All cosines are computed in float64 and rounded to 6 decimals so the DuckDB
oracle (``list_cosine_similarity`` on DOUBLE[]) hashes identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

SIM_DECIMALS = 6


def _batch_matrix(t: pa.Table, col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n, dim) float64 matrix) from a list<float> or tensor-ext column."""
    ids = t["vec_id"].to_numpy()
    arr = t[col].combine_chunks()
    if len(ids) == 0:
        return ids, np.empty((0, 0))
    if hasattr(arr, "flatten"):  # plain Arrow list array: zero-copy flatten
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return ids, flat.reshape(len(ids), len(flat) // len(ids))
    # Ray tensor-extension array (from_pandas with ndarray cells)
    m = arr.to_numpy(zero_copy_only=False)
    if m.dtype == object:
        m = np.stack(m)
    return ids, np.asarray(m, dtype=np.float64).reshape(len(ids), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(nrm > 0, nrm, 1.0)


def knn_brute_force(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k: per-batch partial top-k, driver merge.

    → (query_id, vec_id, sim) rows, k per query, ordered (sim desc, vec_id).
    """
    qn = _normalize(queries.astype(np.float64))
    qref = ray.put(qn)

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(m) @ q.T  # (batch, nq)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, nq)
        nq = q.shape[0]
        return pa.table(
            {
                "query_id": np.repeat(np.arange(nq, dtype=np.int64), kk),
                "vec_id": ids[top.T.reshape(-1)],
                "sim": sims[top.T.reshape(-1), np.repeat(np.arange(nq), kk)],
            }
        )

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_q, out_v, out_s = [], [], []
    for qi in range(len(query_ids)):
        sub = parts[parts["query_id"] == qi]
        order = np.lexsort((sub["vec_id"].to_numpy(), -sub["sim"].to_numpy()))[:k]
        out_q.extend([int(query_ids[qi])] * len(order))
        out_v.extend(sub["vec_id"].to_numpy()[order])
        out_s.extend(np.round(sub["sim"].to_numpy()[order], SIM_DECIMALS))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


def cosine_dup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.95
) -> ray.data.Dataset:
    """(vec_a < vec_b, sim ≥ threshold) — blocked all-pairs cosine.

    Each batch multiplies against the broadcast (normalized) corpus matrix —
    O(N²·d) total but streamed block-wise; the LSH/IVF bucketed variants are
    the at-scale alternatives.
    """
    rows = embeddings.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = rows["vec_id"].to_numpy()
    m = _normalize(np.stack(rows["embedding"].to_numpy()).astype(np.float64))
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    mref, iref = ray.put(m), ray.put(ids)

    def block(t: pa.Table) -> pa.Table:
        corpus = ray.get(mref)
        corpus_ids = ray.get(iref)
        bids, bm = _batch_matrix(t)
        if len(bids) == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(bm) @ corpus.T
        bi, cj = np.nonzero(sims >= threshold)
        a = bids[bi]
        b = corpus_ids[cj]
        keep = a < b  # dedup orientation + drop self-pairs
        return pa.table(
            {
                "vec_a": a[keep],
                "vec_b": b[keep],
                "sim": np.round(sims[bi, cj][keep], SIM_DECIMALS),
            }
        )

    return embeddings.map_batches(block, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant
# ---------------------------------------------------------------------------


def train_kmeans_centroids(
    embeddings: ray.data.Dataset, n_clusters: int = 16, iters: int = 10, seed: int = 3
) -> np.ndarray:
    """k-means via the IMRU loop (map=assign+partial sums, reduce=sum,
    update=recompute centroids) — see ``asterixdb_analytics_ray/imru.py``."""
    from ..imru import KMeansJob, run_imru

    first = embeddings.limit(max(n_clusters * 8, 64)).to_pandas()
    m = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    init = m[rng.choice(len(m), size=n_clusters, replace=False)]
    job = KMeansJob(column="embedding", tol=1e-6)
    return run_imru(job, embeddings, init, max_iters=iters)


def knn_ivf(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> pa.Table:
    """IVF-flat ANN: bucket corpus by nearest centroid, probe nprobe cells."""
    cents = _normalize(train_kmeans_centroids(embeddings, n_clusters))
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"vec_id": ids, "cell": ids})
        cell = np.argmax(_normalize(m) @ c.T, axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cell))

    bucketed = embeddings.map_batches(assign, batch_format="pyarrow").materialize()

    qn = _normalize(queries.astype(np.float64))
    probe_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = np.unique(probe_cells)

    import pyarrow.compute as pc

    sub = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["cell"], value_set=pa.array(wanted))),
        batch_format="pyarrow",
    )
    # per-query masking to its probed cells happens in the merge below
    qref = ray.put(qn)
    pc_ref = ray.put(probe_cells)

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        probes = ray.get(pc_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        cells = t["cell"].to_numpy()
        sims = _normalize(m) @ q.T
        outs = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(q.shape[0]):
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            s = sims[mask, qi]
            vid = ids[mask]
            kk = min(k, len(vid))
            top = np.argpartition(-s, kk - 1)[:kk]
            outs["query_id"].extend([qi] * kk)
            outs["vec_id"].extend(vid[top])
            outs["sim"].extend(s[top])
        return pa.table(
            {
                "query_id": pa.array(outs["query_id"], pa.int64()),
                "vec_id": pa.array(np.array(outs["vec_id"], dtype=np.int64)),
                "sim": pa.array(np.array(outs["sim"], dtype=np.float64)),
            }
        )

    parts = sub.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_q, out_v, out_s = [], [], []
    for qi in range(len(query_ids)):
        subp = parts[parts["query_id"] == qi]
        order = np.lexsort((subp["vec_id"].to_numpy(), -subp["sim"].to_numpy()))[:k]
        out_q.extend([int(query_ids[qi])] * len(order))
        out_v.extend(subp["vec_id"].to_numpy()[order])
        out_s.extend(np.round(subp["sim"].to_numpy()[order], SIM_DECIMALS))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )
