"""Partitioned hash join for large x large tables.

Ray Data's native ``Dataset.join`` exists in this version but the portable,
skew-controllable pattern (ray_guide "Joins and lookups") is an explicit
bucketed hash join: tag both sides with ``bucket = stable_hash(key) % B``,
union them with a side marker, hash-shuffle on the SMALL bucket domain
(same trick as stages/groupby.py — the sort shuffle never sees the raw key
space), and pandas-merge the two sides inside each bucket group.

Use only when BOTH sides are large: a small side should be broadcast with
``ray.put`` + per-batch map instead (see pipelines/queries.py
``top_revenue_customers`` / ``customers_without_orders``).

Skew: a hot join key lands in one bucket, but only with its own bucket
peers; salt hot keys into sub-buckets via ``n_buckets`` scaling or a
pre-aggregation on one side when semantics allow (the aggregate-join
queries pre-aggregate the fact side per batch first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ndap_data_validator_ray.stages.groupby import BUCKET_COL, stable_bucket

_SIDE_COL = "_join_side"


def bucketed_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    n_buckets: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
) -> "ray.data.Dataset":
    """Hash-partitioned join of two Datasets on ``on`` columns.

    Returns a Dataset of merged rows (pandas-merge semantics per bucket).
    ``how`` supports inner/left/right plus "anti" (left rows with no right
    match, left columns only — the exact verify leg of
    ``stages/bloom.bloom_anti_join``); outer would need null-bucket care.
    """

    import pyarrow as pa

    def _arrow_fields(ds: "ray.data.Dataset") -> list[pa.Field]:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return [base.field(c) for c in base.names]
        fields = []
        for name, typ in zip(sch.names, sch.types):
            if not isinstance(typ, pa.DataType):
                npt = np.dtype(typ)
                typ = pa.string() if npt == np.dtype(object) else pa.from_numpy_dtype(npt)
            fields.append(pa.field(name, typ))
        return fields

    left_fields = _arrow_fields(left)
    right_fields = _arrow_fields(right)
    left_cols = [f.name for f in left_fields]
    right_cols = [f.name for f in right_fields]
    # union schema: left's columns, then right's extras (typed nulls pad
    # the missing side so Dataset.union type-checks)
    all_fields: list[pa.Field] = list(left_fields)
    all_fields += [f for f in right_fields if f.name not in left_cols]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for f in all_fields:
                if f.name in batch.column_names:
                    col = batch[f.name]
                    cols[f.name] = col.cast(f.type) if col.type != f.type else col
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            key_df = pd.DataFrame({c: cols[c].to_pandas() for c in on})
            cols[BUCKET_COL] = pa.array(
                stable_bucket(key_df if len(on) > 1 else key_df[on[0]], n_buckets), pa.int64()
            )
            cols[_SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group[_SIDE_COL] == 0][left_cols]
        r = group[group[_SIDE_COL] == 1][right_cols]
        if how == "anti":
            flagged = l.merge(r[on].drop_duplicates(), on=on, how="left", indicator=True)
            return flagged[flagged["_merge"] == "left_only"][left_cols]
        return l.merge(r, on=on, how=how, suffixes=suffixes)

    return tagged.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pandas")
