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

from ndap_data_validator_ray.stages.groupby import BUCKET_COL, default_n_buckets, stable_bucket

_SIDE_COL = "_join_side"


def detect_hot_keys(
    ds: "ray.data.Dataset",
    key: str,
    min_share: float = 0.01,
    per_block_top: int = 8,
) -> list:
    """Approximate hot-key detection for join salting: each BLOCK emits its
    top-``per_block_top`` key counts (a key owning >= ``min_share`` of all
    rows is necessarily a top key in most blocks), the driver folds the
    tiny partials and keeps keys above the share threshold.  One pruned
    streaming pass; the candidate set is O(blocks x per_block_top)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[key].value_counts().head(per_block_top)
        return pd.DataFrame({key: vc.index.to_numpy(), "_cnt": vc.to_numpy().astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    total = ds.count()
    if not len(parts) or not total:
        return []
    folded = parts.groupby(key)["_cnt"].sum()
    return folded[folded >= min_share * total].index.tolist()


def bucketed_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    n_buckets: int | None = None,
    suffixes: tuple[str, str] = ("", "_r"),
    hot_keys: list | None = None,
    salt: int = 8,
) -> "ray.data.Dataset":
    """Hash-partitioned join of two Datasets on ``on`` columns.

    Returns a Dataset of merged rows (pandas-merge semantics per bucket).
    ``how`` supports inner/left/right/outer plus the filtering joins
    "semi" (left rows WITH a right match — SQL EXISTS, left multiplicity
    kept, left columns only) and "anti" (left rows with NO right match —
    SQL NOT EXISTS, the exact verify leg of ``stages/bloom.bloom_anti_join``).
    Null-key SQL semantics hold for every variant: equality never matches
    NULL, so null-keyed rows are dropped by inner/semi, kept by anti, and
    pass through unmatched (null-padded) on the preserved side(s) of
    left/right/outer.

    Performance contract: the stage reads each side's schema up front, and
    ``Dataset.schema()`` on a pipeline that ends in a shuffle (bucketed
    aggregation, map_groups) EXECUTES that pipeline once just for the
    schema — the join's own run then executes it again.  Callers joining a
    computed/aggregated side should ``.materialize()`` it first (measured
    9.2s -> 3.3s on the sf0.1 fact join); plain reads and map_batches
    chains are fine as-is (schema needs one block).

    Skew (BASELINE.json "salted keys to tame skew"): pass ``hot_keys``
    (e.g. from ``detect_hot_keys``) and a hot LEFT key's rows are sprayed
    across ``salt`` consecutive buckets while the matching RIGHT rows are
    REPLICATED to all of them — no reducer ever receives more than
    ~1/salt of a hot key's probe rows.  Only valid for how in
    inner/left/anti (each left row still meets the full right key-group
    exactly once; a replicated unmatched right row would duplicate under
    right/outer).  Assumes the right side is dim-like on hot keys (a
    hot x hot join explodes output regardless of partitioning).
    """

    import pyarrow as pa

    n_buckets = n_buckets or default_n_buckets()
    if hot_keys:
        if len(on) != 1:
            raise ValueError("hot-key salting supports single-column join keys")
        if how not in ("inner", "left", "anti"):
            raise ValueError(f"hot-key salting is not valid for how={how!r}")
        salt = max(2, min(int(salt), n_buckets))
    hot_arr = np.asarray(sorted(hot_keys)) if hot_keys else None

    def _arrow_fields(ds: "ray.data.Dataset") -> list[pa.Field]:
        from ndap_data_validator_ray.stages.schema_util import arrow_field_types

        return [pa.field(n, t) for n, t in arrow_field_types(ds).items()]

    left_fields = _arrow_fields(left)
    right_fields = _arrow_fields(right)
    left_cols = [f.name for f in left_fields]
    right_cols = [f.name for f in right_fields]
    # union schema: left's columns, then right's extras (typed nulls pad
    # the missing side so Dataset.union type-checks)
    all_fields: list[pa.Field] = list(left_fields)
    all_fields += [f for f in right_fields if f.name not in left_cols]
    union_types = {f.name: f.type for f in all_fields}

    # explicit output schema (pandas-merge column layout, Arrow types from
    # the union schema) so int64 keys survive the per-bucket pandas merge —
    # unmatched-side nulls would otherwise upcast whole columns to float64
    overlap = [c for c in left_cols if c in right_cols and c not in on]
    if how in ("anti", "semi"):
        out_schema = pa.schema([pa.field(c, union_types[c]) for c in left_cols])
    else:
        out_fields = [
            pa.field(c + suffixes[0] if c in overlap else c, union_types[c]) for c in left_cols
        ]
        out_fields += [
            pa.field(c + suffixes[1] if c in overlap else c, union_types[c])
            for c in right_cols
            if c not in on
        ]
        out_schema = pa.schema(out_fields)

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
            base = stable_bucket(key_df if len(on) > 1 else key_df[on[0]], n_buckets)
            # null keys never match anything (SQL equality), so they don't
            # need co-location — spread them round-robin instead of letting
            # every null-keyed row hash into one hot bucket (at scale a
            # high-null key column would otherwise serialize on one reducer)
            null_mask = key_df.isna().any(axis=1).to_numpy()
            if null_mask.any():
                base = np.where(null_mask, np.arange(n) % n_buckets, base)
            hot_mask = None
            if hot_arr is not None and n:
                hot_mask = np.isin(key_df[on[0]].to_numpy(), hot_arr)
            if side == 0 and hot_mask is not None and hot_mask.any():
                # spray hot probe rows over the salt window of buckets
                base = np.where(hot_mask, (base + np.arange(n) % salt) % n_buckets, base)
            cols[BUCKET_COL] = pa.array(base, pa.int64())
            cols[_SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            t0 = pa.table(cols)
            if side == 1 and hot_mask is not None and hot_mask.any():
                # replicate hot build rows into every salted bucket
                idx = np.flatnonzero(hot_mask)
                hot_tbl = t0.take(idx)
                pos = t0.column_names.index(BUCKET_COL)
                copies = [
                    hot_tbl.set_column(
                        pos, BUCKET_COL, pa.array((base[idx] + s) % n_buckets, pa.int64())
                    )
                    for s in range(1, salt)
                ]
                return pa.concat_tables([t0] + copies)
            return t0

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    import pyarrow.compute as pc

    def merge_bucket(group: pa.Table) -> pa.Table:
        # split sides while still Arrow so real values never share a pandas
        # column with the other side's typed-null padding (float64 upcast)
        side = group[_SIDE_COL]
        l = group.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        r = group.filter(pc.equal(side, 1)).select(right_cols).to_pandas()
        if how == "anti":
            # SQL NOT EXISTS semantics: NULL never equals NULL, so a
            # null-keyed probe row has no match and is KEPT (pandas merge
            # would pair NaN with NaN and wrongly drop it)
            null_key = l[on].isna().any(axis=1)
            flagged = l[~null_key].merge(
                r[on].dropna().drop_duplicates(), on=on, how="left", indicator=True
            )
            anti = flagged[flagged["_merge"] == "left_only"][left_cols]
            merged = pd.concat([anti, l.loc[null_key, left_cols]]) if null_key.any() else anti
        elif how == "semi":
            # SQL EXISTS: left multiplicity kept, right side deduped to keys
            # only, null probe keys never match (dropped)
            null_key = l[on].isna().any(axis=1)
            merged = l[~null_key].merge(
                r[on].dropna().drop_duplicates(), on=on, how="inner"
            )[left_cols]
        elif how == "outer":
            # FULL OUTER: null-keyed rows on EITHER side never match —
            # split them out, merge the non-null cores, then pass the
            # null-keyed rows through with the other side null-padded
            ln = l[on].isna().any(axis=1)
            rn = r[on].isna().any(axis=1)
            core = l[~ln].merge(r[~rn], on=on, how="outer", suffixes=suffixes)
            parts = [core]
            if ln.any():
                parts.append(l.loc[ln].rename(columns={c: c + suffixes[0] for c in overlap}))
            if rn.any():
                parts.append(r.loc[rn].rename(columns={c: c + suffixes[1] for c in overlap}))
            merged = pd.concat(parts, ignore_index=True).reindex(columns=out_schema.names)
        else:
            # SQL equality never matches NULL, but pandas merge pairs
            # NaN keys with NaN keys — drop null-keyed rows from the side
            # whose match would wrongly materialize (the preserved side's
            # null-keyed rows still flow through with null padding, as in
            # SQL LEFT/RIGHT JOIN)
            if how in ("inner", "left"):
                rn = r[on].isna().any(axis=1)
                r = r[~rn] if rn.any() else r
            if how in ("inner", "right"):
                ln = l[on].isna().any(axis=1)
                l = l[~ln] if ln.any() else l
            merged = l.merge(r, on=on, how=how, suffixes=suffixes)
        return pa.Table.from_pandas(merged[out_schema.names], schema=out_schema, preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pyarrow")
