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


def key_counts(ds: "ray.data.Dataset", key: str, n_buckets: int = 64) -> "ray.data.Dataset":
    """Global exact counts per key: batch partials -> bucketed two-phase
    merge (stages/groupby.py) — the shuffle key is a B-way bucket, never
    the raw high-cardinality key."""
    from ndap_data_validator_ray.stages.groupby import bucketed_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[key].dropna().value_counts()
        return pd.DataFrame({key: vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(key, as_index=False)["cnt"].sum()

    return bucketed_groupby(ds, [key], partial, merge, n_buckets)


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

    from ndap_data_validator_ray.stages.groupby import bucketed_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # in-batch pre-dedup: at most one candidate row per content per batch
        return batch.sort_values(keep_col, kind="stable").groupby(content_cols, as_index=False, sort=False).first()

    def first_per_content(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(keep_col, kind="stable")
            .groupby(content_cols, as_index=False, sort=False)
            .first()
        )

    return bucketed_groupby(ds, content_cols, partial, first_per_content, n_buckets=64)


def exact_dedup_counts(
    ds: "ray.data.Dataset",
    content_cols: list[str],
    keep_col: str,
    count_col: str = "n_copies",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact dedup GROUPS: min-``keep_col`` + copy count per distinct
    content, via the bucketed two-phase path (the shuffle key is the B-way
    bucket, never the raw per-document content hash — raw-key
    ``Dataset.groupby`` is 10-15x slower at high cardinality, BASELINE.md).

    Shuffles (content, min_keep, partial_count) batch partials; content
    rides along so hash-bucket collisions can never merge distinct
    documents.  100TB note: at extreme scale shuffle (hash, id) pairs and
    verify colliding hashes in a second pass instead of shipping content."""
    from ndap_data_validator_ray.stages.groupby import bucketed_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(content_cols, as_index=False, sort=False).agg(
            **{keep_col: (keep_col, "min"), count_col: (keep_col, "size")}
        )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(content_cols, as_index=False, sort=False).agg(
            **{keep_col: (keep_col, "min"), count_col: (count_col, "sum")}
        )

    return bucketed_groupby(ds, content_cols, partial, merge, n_buckets)
