"""Exact key-uniqueness / deduplication stages (A14, SURVEY.md §2.8).

Skew handling (BASELINE.json:6 "salted keys to tame clip_id skew"): the
shuffle input is **pre-aggregated per batch** — each batch contributes at
most one ``(key, cnt)`` row per distinct key, so a key duplicated H times
across the table arrives at its reducer as at most ``#batches`` partial
rows instead of H data rows.  That batch-partial step plays the role of the
salt/pre-combine phase of a salted two-phase aggregation, with the batch id
acting as the implicit salt; the final ``groupby(key)`` then sums tiny
partials.  Only the key column is ever shuffled — callers should project
(``columns=[key]`` at the read) before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def _batch_key_counts(key: str):
    def fn(batch: pa.Table) -> pa.Table:
        arr = batch[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.drop_null().value_counts()
        return pa.table({key: vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    return fn


def key_counts(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """Global exact counts per key: batch partials -> hash-shuffle groupby."""
    partial = ds.map_batches(_batch_key_counts(key), batch_format="pyarrow")
    return partial.groupby(key).aggregate(Sum("cnt", alias_name="cnt"))


def duplicate_keys(ds: "ray.data.Dataset", key: str) -> pa.Table:
    """Keys appearing more than once, with their exact counts (small result:
    materialized to the driver — violation keys, not data rows)."""
    counts = key_counts(ds, key)
    dups = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["cnt"], 1)), batch_format="pyarrow"
    )
    pdf = dups.to_pandas()
    if pdf.empty:
        key_type = ds.schema().base_schema.field(key).type
        return pa.table({key: pa.array([], key_type), "cnt": pa.array([], pa.int64())})
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    order = pa.compute.sort_indices(tbl, sort_keys=[(key, "ascending")])
    return tbl.take(order)


def exact_dedup(ds: "ray.data.Dataset", content_cols: list[str], keep_col: str) -> "ray.data.Dataset":
    """Exact dedup: keep the min-``keep_col`` row per distinct content.

    Hash-partition groupby on a content hash (full content kept alongside,
    so hash collisions cannot merge distinct contents — groups are re-split
    on true content inside ``map_groups``)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        joined = batch[content_cols].astype(str).agg("\x1f".join, axis=1)
        batch["_content_hash"] = pd.util.hash_array(joined.to_numpy(dtype=object), categorize=False).astype(np.int64)
        return batch

    def first_per_content(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(keep_col, kind="stable")
            .groupby(content_cols, as_index=False, sort=False)
            .first()
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    kept = hashed.groupby("_content_hash").map_groups(first_per_content, batch_format="pandas")
    return kept.drop_columns(["_content_hash"])
