"""Distributed Lloyd's k-means over an embedding column.

Each iteration is ONE streaming pass: the k x dim centroid matrix is
``ray.put`` once and read by every map task (broadcast, never re-shipped
per batch); each batch emits per-cluster partial sums (vector sum, count,
SSE) — a k-row frame regardless of batch size — and the driver folds the
tiny partials and updates centroids.  Nothing but k x dim floats ever
reaches the driver, so the shape holds at 10^12 rows: the per-iteration
cost is a full scan + an O(k * dim * blocks) fan-in.

Reference has no counterpart (target-only training-data operator, like
stages/similarity.py).  Empty clusters keep their previous centroid
(standard Lloyd fallback) so k is stable across iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _assign_partial(centroids_ref, vec_col: str):
    dim_k = None  # closed over lazily

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(centroids_ref)  # cached in the worker's object store
        m = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        # squared euclidean via the expansion trick (one matmul per batch)
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        lab = np.argmin(d2, axis=1)
        sse = d2[np.arange(len(lab)), lab]
        k, dim = cents.shape
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, lab, m)
        cnt = np.bincount(lab, minlength=k).astype(np.int64)
        err = np.bincount(lab, weights=np.maximum(sse, 0.0), minlength=k)
        return pd.DataFrame(
            {
                "cluster": np.arange(k, dtype=np.int64),
                "vec_sum": [v.tobytes() for v in sums],
                "n": cnt,
                "sse": err,
            }
        )

    return fn


def kmeans_fit(
    ds: "ray.data.Dataset",
    vec_col: str,
    init_centroids: np.ndarray,
    n_iter: int = 5,
) -> dict:
    """Run ``n_iter`` Lloyd iterations from ``init_centroids`` (k x dim).

    Returns {"centroids": k x dim float64, "counts": int64[k],
    "inertia": float} where counts/inertia describe the last assignment
    pass (against the centroids entering the final iteration).
    Deterministic given the init (argmin ties break to the lowest
    cluster id; the driver fold is order-free integer/float sums of
    per-cluster partials).
    """
    cents = np.asarray(init_centroids, dtype=np.float64)
    k, dim = cents.shape
    counts = np.zeros(k, dtype=np.int64)
    inertia = 0.0
    for _ in range(n_iter):
        parts = ds.map_batches(
            _assign_partial(ray.put(cents), vec_col), batch_format="pandas"
        ).to_pandas()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for cl, g in parts.groupby("cluster"):
            sums[cl] = np.sum(
                [np.frombuffer(b, dtype=np.float64) for b in g["vec_sum"]], axis=0
            )
            counts[cl] = int(g["n"].sum())
            inertia += float(g["sse"].sum())
        nonempty = counts > 0
        cents = np.where(nonempty[:, None], sums / np.maximum(counts, 1)[:, None], cents)
    return {"centroids": cents, "counts": counts, "inertia": inertia}
