"""Bucketed as-of join — the ordered-inequality join Ray Data lacks.

For every left row, attach the right row with the greatest ``on`` value
<= the left's ``on`` value within the same ``by`` key (the classic
point-in-time / "most recent fact" join; SQL ``ASOF JOIN``).

Layout (same exchange as stages/join.py): tag both sides with
``bucket = stable_hash(by) % B`` and typed-null padding to a union
schema, shuffle on the SMALL bucket domain, and run
``pandas.merge_asof`` (sorted merge with per-``by`` state) inside each
bucket group.

Documented partitioning assumption: all rows of one ``by`` key land in one
reducer (guaranteed by the key-hash bucketing) and one BUCKET's rows fit
that reducer's memory — size ``n_buckets`` to the cluster.  Skewed hot
keys cost sort time within their bucket, never a wrong answer.

Determinism: when several right rows share the same (by, on) value the
stage keeps exactly one — the last under a stable sort of ALL right
payload columns — so the output is independent of shuffle arrival order
(round-2 verdict item 7; previously documented-but-not-enforced).

Dtype contract: each per-bucket group is consumed as an Arrow table and
split into its two sides BEFORE any pandas conversion, so left int64
columns never travel through a null-padded pandas frame (which upcasts
to float64 and corrupts keys above 2^53); the merged output is rebuilt
against an explicit Arrow schema (left fields + right payload fields),
restoring nullable-int payloads that pandas floats during the merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ndap_data_validator_ray.stages.groupby import BUCKET_COL, default_n_buckets, stable_bucket

_SIDE_COL = "_asof_side"
_ON_COL = "_asof_on"
_BY_COL = "_asof_by"


def _fields(ds: "ray.data.Dataset") -> dict[str, pa.DataType]:
    from ndap_data_validator_ray.stages.schema_util import arrow_field_types

    return arrow_field_types(ds)


def bucketed_asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """As-of join of ``left`` against ``right``; left-join semantics (every
    left row survives, unmatched right columns are null).

    ``on``/``right_on``: ordered columns (right is cast to the left's
    type, so they must be castable); ``by``/``right_by``: equality key.
    """
    right_on = right_on or on
    right_by = right_by or by
    n_buckets = n_buckets or default_n_buckets()

    lf = _fields(left)
    rf = _fields(right)
    left_cols = list(lf)
    # the matched right ordered value (e.g. the as-of date itself) is
    # usually the payload — carry it through unless its name collides
    # with a left column (rename on the right side first in that case)
    right_value_cols = [c for c in rf if c != right_by and c not in left_cols]
    # union schema: left columns + right value columns + ordered/equality
    # keys (typed from the LEFT side) + side/bucket markers
    union_fields: list[pa.Field] = [pa.field(c, lf[c]) for c in left_cols]
    union_fields += [pa.field(c, rf[c]) for c in right_value_cols]
    union_fields += [
        pa.field(_ON_COL, lf[on]),
        pa.field(_BY_COL, lf[by]),
        pa.field(_SIDE_COL, pa.int8()),
        pa.field(BUCKET_COL, pa.int64()),
    ]
    out_schema = pa.schema(
        [pa.field(c, lf[c]) for c in left_cols] + [pa.field(c, rf[c]) for c in right_value_cols]
    )

    def tag(side: int, on_c: str, by_c: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for f in union_fields[:-4]:
                if f.name in batch.column_names:
                    col = batch[f.name]
                    cols[f.name] = col.cast(f.type) if col.type != f.type else col
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            cols[_ON_COL] = batch[on_c].cast(lf[on])
            cols[_BY_COL] = batch[by_c].cast(lf[by])
            cols[_SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            by_series = pd.Series(cols[_BY_COL].to_pandas())
            cols[BUCKET_COL] = pa.array(stable_bucket(by_series, n_buckets), pa.int64())
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(0, on, by), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_on, right_by), batch_format="pyarrow")
    )

    def merge_bucket(group: pa.Table) -> pa.Table:
        # split sides on the ARROW table so neither side's columns pass
        # through a null-padded pandas frame (float64 upcast)
        side = group[_SIDE_COL]
        l = (
            group.filter(pc.equal(side, 0))
            .select(left_cols + [_ON_COL, _BY_COL])
            .to_pandas()
            .sort_values(_ON_COL, kind="stable")
        )
        if l.empty:
            return out_schema.empty_table()
        r = group.filter(pc.equal(side, 1)).select(right_value_cols + [_ON_COL, _BY_COL]).to_pandas()
        # deterministic tie-break: one right row per (by, on), the last
        # under a stable full-payload sort (arrival-order independent)
        r = r.sort_values([_BY_COL, _ON_COL] + right_value_cols, kind="stable")
        r = r.drop_duplicates(subset=[_BY_COL, _ON_COL], keep="last")
        r = r.sort_values(_ON_COL, kind="stable")
        merged = pd.merge_asof(l, r, on=_ON_COL, by=_BY_COL, direction=direction)
        return pa.Table.from_pandas(merged[left_cols + right_value_cols], schema=out_schema, preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pyarrow")
