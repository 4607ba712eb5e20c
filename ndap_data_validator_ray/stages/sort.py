"""Distributed global sort / ranking via range partitioning.

The scale-correct global ORDER BY: no single node ever sees the full
table.  Three streaming passes:

1. **Sample** (projected scan, tiny output): every block emits up to
   ``sample_per_block`` evenly-spaced samples of the first order column;
   the driver sorts the pooled sample and picks ``n_parts - 1`` range
   boundaries.
2. **Count** (projected scan, tiny output): per-batch bincount of the
   range-partition id → exact per-partition row counts → prefix offsets,
   broadcast to the shuffle pass.  (Counting before the shuffle lets the
   reducers emit FINAL global ranks in one pass instead of re-scanning
   the shuffled output.)
3. **Shuffle**: tag rows with their partition id, ``groupby(pid)`` —
   each reducer sorts ITS range by the full order tuple and adds the
   partition's prefix offset.

Rows equal on the first order column always share a partition
(``searchsorted(..., side="right")``), so ties are resolved entirely
inside one reducer by the full tuple — global ranks are exact and
deterministic when the tuple is unique (pass a unique tie-break column,
the same contract as SQL ROW_NUMBER with a total order).

Skew: a single first-column value larger than one partition's share is
the classic range-sort hot spot; the sample-based boundaries bound every
OTHER partition, and the hot value's partition degrades to one bigger
reducer (documented limit — same behavior as Spark's range partitioner).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

_PID_COL = "_sort_pid"


def _order_key(batch: pd.DataFrame, col: str, ascending: bool) -> np.ndarray:
    v = batch[col].to_numpy()
    if not ascending:
        if np.issubdtype(v.dtype, np.number):
            return -v
        raise ValueError("descending order needs a numeric first order column")
    return v


def global_rank(
    ds: "ray.data.Dataset",
    order_by: list[str],
    ascending: list[bool] | None = None,
    out: str = "rank",
    n_parts: int | None = None,
    sample_per_block: int = 64,
) -> "ray.data.Dataset":
    """Append a global 1-based dense row rank (``ROW_NUMBER`` over the
    total order ``order_by`` with per-column ``ascending``).  Descending
    is supported for numeric columns (negation keeps one searchsorted
    code path)."""
    if ascending is None:
        ascending = [True] * len(order_by)
    if len(ascending) != len(order_by):
        raise ValueError("ascending must match order_by")
    first, first_asc = order_by[0], ascending[0]
    n_parts = n_parts or 32

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        k = _order_key(batch, first, first_asc)
        if not len(k):
            return pd.DataFrame({"s": k})
        idx = np.linspace(0, len(k) - 1, min(sample_per_block, len(k))).astype(np.int64)
        return pd.DataFrame({"s": np.sort(k)[idx]})

    pooled = np.sort(
        ds.map_batches(sample, batch_format="pandas").to_pandas()["s"].to_numpy()
    )
    if not len(pooled):
        return ds.map_batches(
            lambda b: b.assign(**{out: np.int64([])}), batch_format="pandas"
        )
    q = np.linspace(0, len(pooled) - 1, n_parts + 1)[1:-1].astype(np.int64)
    boundaries = np.unique(pooled[q])

    def pid_of(batch: pd.DataFrame) -> np.ndarray:
        return np.searchsorted(boundaries, _order_key(batch, first, first_asc), side="right")

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(pid_of(batch), minlength=len(boundaries) + 1)
        return pd.DataFrame({"pid": np.arange(len(c), dtype=np.int64), "n": c.astype(np.int64)})

    counts = (
        ds.map_batches(count_partial, batch_format="pandas")
        .to_pandas()
        .groupby("pid")["n"]
        .sum()
        .reindex(range(len(boundaries) + 1), fill_value=0)
        .to_numpy()
    )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    off_ref = ray.put(offsets)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch[_PID_COL] = pid_of(batch)
        return batch

    def rank_partition(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        pid = int(group[_PID_COL].iloc[0])
        group = group.drop(columns=[_PID_COL]).sort_values(
            order_by, ascending=ascending, kind="stable", ignore_index=True
        )
        group[out] = offs[pid] + 1 + np.arange(len(group), dtype=np.int64)
        return group

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby(_PID_COL)
        .map_groups(rank_partition, batch_format="pandas")
    )


def global_running_sum(
    ds: "ray.data.Dataset",
    order_by: list[str],
    val: str,
    ascending: list[bool] | None = None,
    out: str = "running",
    n_parts: int | None = None,
    sample_per_block: int = 64,
) -> "ray.data.Dataset":
    """Append ``SUM(val) OVER (ORDER BY order_by ROWS UNBOUNDED
    PRECEDING)`` — the distributed un-partitioned running aggregate (the
    sweep-line primitive).  Same three passes as :func:`global_rank`, but
    pass 2 sums ``val`` per range partition instead of counting rows, so
    each reducer starts from the exact prefix SUM of every earlier range
    and one cumsum finishes its slice.  Ties on the first order column
    share a partition, so tie ordering resolves inside one reducer; rows
    tied on the FULL order tuple get order-dependent individual values
    (same as SQL ROWS framing) but an order-invariant multiset."""
    if ascending is None:
        ascending = [True] * len(order_by)
    if len(ascending) != len(order_by):
        raise ValueError("ascending must match order_by")
    first, first_asc = order_by[0], ascending[0]
    n_parts = n_parts or 32

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        k = _order_key(batch, first, first_asc)
        if not len(k):
            return pd.DataFrame({"s": k})
        idx = np.linspace(0, len(k) - 1, min(sample_per_block, len(k))).astype(np.int64)
        return pd.DataFrame({"s": np.sort(k)[idx]})

    pooled = np.sort(
        ds.map_batches(sample, batch_format="pandas").to_pandas()["s"].to_numpy()
    )
    if not len(pooled):
        return ds.map_batches(
            lambda b: b.assign(**{out: np.int64([])}), batch_format="pandas"
        )
    q = np.linspace(0, len(pooled) - 1, n_parts + 1)[1:-1].astype(np.int64)
    boundaries = np.unique(pooled[q])

    def pid_of(batch: pd.DataFrame) -> np.ndarray:
        return np.searchsorted(boundaries, _order_key(batch, first, first_asc), side="right")

    def sum_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pid = pid_of(batch)
        v = batch[val].to_numpy().astype(np.float64)
        s = np.bincount(pid, weights=v, minlength=len(boundaries) + 1)
        return pd.DataFrame({"pid": np.arange(len(s), dtype=np.int64), "v": s})

    sums = (
        ds.map_batches(sum_partial, batch_format="pandas")
        .to_pandas()
        .groupby("pid")["v"]
        .sum()
        .reindex(range(len(boundaries) + 1), fill_value=0.0)
        .to_numpy()
    )
    prefix = np.concatenate([[0.0], np.cumsum(sums)[:-1]])
    pre_ref = ray.put(prefix)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch[_PID_COL] = pid_of(batch)
        return batch

    def run_partition(group: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(pre_ref)
        pid = int(group[_PID_COL].iloc[0])
        group = group.drop(columns=[_PID_COL]).sort_values(
            order_by, ascending=ascending, kind="stable", ignore_index=True
        )
        v = group[val].to_numpy()
        if np.issubdtype(v.dtype, np.integer):
            # integer input -> exact int64 running sum (prefix sums of ints
            # are integral; the float64 exchange is exact below 2^53)
            group[out] = np.int64(round(pre[pid])) + np.cumsum(v.astype(np.int64))
        else:
            group[out] = pre[pid] + np.cumsum(v.astype(np.float64))
        return group

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby(_PID_COL)
        .map_groups(run_partition, batch_format="pandas")
    )
