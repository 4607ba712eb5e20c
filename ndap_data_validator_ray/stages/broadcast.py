"""Arrow-native broadcast dimension lookups.

The broadcast-join shape (ray_guide "Joins and lookups"): the small side is
``ray.put`` once and fetched per ACTOR in ``__init__`` (one object-store
read each, never re-shipped per batch); the per-batch work is pure
``pyarrow.compute`` — ``index_in`` against the key array + ``take`` on the
value array — so fact batches stay zero-copy Arrow end to end (no pandas
conversion, round-1 weakness)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


class ArrowLookup:
    """Actor stage: attach ``out_col`` by mapping ``key_col`` through a
    broadcast dict; unmatched keys get null (pandas ``.map`` semantics)."""

    def __init__(self, lookup_ref, key_col: str, out_col: str, keep: list[str] | None = None):
        lookup: dict = ray.get(lookup_ref)
        keys = list(lookup.keys())
        self.keys = pa.array(keys)
        self.vals = pa.array([lookup[k] for k in keys])
        self.key_col = key_col
        self.out_col = out_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = batch[self.key_col]
        if key.type != self.keys.type:
            key = key.cast(self.keys.type)
        idx = pc.index_in(key, value_set=self.keys)
        out = batch.append_column(self.out_col, pc.take(self.vals, idx))
        return out.select(self.keep) if self.keep else out


def attach_lookup(
    ds: "ray.data.Dataset",
    lookup: dict,
    key_col: str,
    out_col: str,
    keep: list[str] | None = None,
    concurrency: int | tuple = (1, 4),
) -> "ray.data.Dataset":
    """Broadcast ``lookup`` once and attach ``out_col`` to every batch."""
    ref = ray.put(lookup)
    return ds.map_batches(
        ArrowLookup,
        fn_constructor_kwargs={"lookup_ref": ref, "key_col": key_col, "out_col": out_col, "keep": keep},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# Broadcast-vs-shuffle switch (the Q10 guard, generalized): below the cap
# the small side ships once via ray.put; above it the fact pays a bucketed
# hash join instead of the driver holding an unbounded map.
DEFAULT_BROADCAST_CAP = 5_000_000


def attach_or_join(
    fact: "ray.data.Dataset",
    side: "ray.data.Dataset",
    on_fact: str,
    on_side: str,
    attach_cols: list[str],
    cap: int | None = None,
) -> "ray.data.Dataset":
    """INNER-join ``attach_cols`` from ``side`` onto ``fact`` (fact rows
    without a match are dropped), choosing broadcast vs shuffle by the
    side's EXACT row count: ``side`` is materialized (callers usually need
    that anyway — it is consumed once per path) and counted (metadata);
    at or under ``cap`` the sorted key + column arrays broadcast once via
    ``ray.put`` and each Arrow batch attaches via ``searchsorted``; above
    the cap the side stays distributed and the fact takes
    ``stages/join.bucketed_join``.  Side keys must be unique (dim or
    windowed-key map semantics)."""
    import numpy as np

    if cap is None:
        cap = DEFAULT_BROADCAST_CAP  # resolved at call time (tests lower it)
    side = side.materialize()
    n = side.count()
    if n == 0:
        # typed empty result: fact schema + attach cols are unknowable
        # without a match — emit no rows via an always-false filter
        return fact.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow").map_batches(
            lambda t: t, batch_format="pyarrow"
        )
    if n <= cap:
        s = side.to_pandas().sort_values(on_side)
        keys = s[on_side].to_numpy()
        ref = ray.put((keys, {c: s[c].to_numpy() for c in attach_cols}))

        def fn(t: pa.Table) -> pa.Table:
            ks, cols = ray.get(ref)
            # null fact keys never match under SQL equality — drop them
            # up front (keeps the two paths consistent; bucketed_join
            # drops them in the shuffle path)
            t = t.filter(pc.is_valid(t[on_fact]))
            fk = t[on_fact].to_numpy()
            pos = ks.searchsorted(fk).clip(0, max(len(ks) - 1, 0))
            hit = ks[pos] == fk if len(ks) else pos.astype(bool)
            kept = t.filter(pa.array(hit))
            for c in attach_cols:
                kept = kept.append_column(c, pa.array(cols[c][pos[hit]]))
            return kept

        return fact.map_batches(fn, batch_format="pyarrow")
    from ndap_data_validator_ray.stages.join import bucketed_join

    keyed = side.map_batches(
        lambda b: b[[on_side] + attach_cols].rename(columns={on_side: on_fact}),
        batch_format="pandas",
    ).materialize()
    return bucketed_join(fact, keyed, on=[on_fact], how="inner")
