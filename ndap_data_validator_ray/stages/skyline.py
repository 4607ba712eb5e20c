"""Distributed 2-D Pareto skyline (maximal-vector) computation.

A row is on the skyline iff no other row is at-least-as-good on both
dimensions and strictly better on one (minimize ``min_col``, maximize
``max_col``).  The distributed shape exploits closure under
union-then-reduce: a globally non-dominated row is non-dominated within
its own block, so per-block local skylines are a lossless pre-filter and
the union of local skylines reduces with the SAME kernel.

100 TB posture: the per-block local skyline of independently-distributed
dimensions is O(log block_rows) expected rows, so the union that reaches
the final fold is ~n_blocks x log(block_rows) — a few thousand rows even
at 10^8 blocks.  The fold itself IS the answer-sized computation: if the
true skyline is adversarially huge (a giant anti-chain), every exact
algorithm must emit that many rows; for that regime chain a second
map_batches(skyline2d) pass over the repartitioned candidates before the
driver fold (same kernel, still lossless).

The kernel is fully vectorized: one lexsort + group-boundary scan +
running max — no per-row Python.  Dominance test derivation: sort rows by
(min_col asc, max_col desc); with ``gmax`` = max of max_col within each
equal-min_col group and ``maxlt`` = running max over strictly-smaller
groups, a row survives iff ``max_col > maxlt`` (nothing strictly cheaper
is at least as big) AND ``max_col == gmax`` (nothing equally cheap is
strictly bigger).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def skyline2d(df: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of one DataFrame: minimize ``min_col``, maximize
    ``max_col``.  Rows with a null in either dimension are excluded (they
    can neither dominate nor be meaningfully ranked — mirrored by the
    IS NOT NULL guards in the SQL twin).  Ties on both dimensions all
    survive (dominance requires one STRICT inequality)."""
    d = df.dropna(subset=[min_col, max_col]).reset_index(drop=True)
    if d.empty:
        return d
    x = d[min_col].to_numpy()
    y = d[max_col].to_numpy(dtype=np.float64)
    order = np.lexsort((-y, x))  # min_col asc, max_col desc
    xs, ys = x[order], y[order]
    start = np.empty(len(xs), dtype=bool)
    start[0] = True
    start[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(start) - 1
    gmax_by_grp = ys[start]  # first row of each group = group max (desc sort)
    run = np.maximum.accumulate(gmax_by_grp)  # inclusive prefix group max
    maxlt = np.where(gid > 0, run[np.maximum(gid - 1, 0)], -np.inf)
    keep_sorted = (ys > maxlt) & (ys == gmax_by_grp[gid])
    return d.iloc[np.sort(order[keep_sorted])].reset_index(drop=True)


def distributed_skyline2d(
    ds: "ray.data.Dataset", min_col: str, max_col: str
) -> pd.DataFrame:
    """Per-block local skylines -> driver fold with the same kernel.
    Only local-skyline rows (tiny for non-adversarial data) ever leave
    the workers; the input streams block-by-block."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return skyline2d(batch, min_col, max_col)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return skyline2d(cand, min_col, max_col)
