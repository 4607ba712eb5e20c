"""Footer-only zonemap scan planning — which parquet row groups a
predicate can skip WITHOUT touching data pages.

The 100 TB read rule is "prune at the read": a predicate on a column the
data is clustered by (ingest order ids, dates, a Z-order key from
``zorder_layout_orders``) lets the scan drop whole row groups from the
plan using only footer statistics.  This module measures that pruning
power as a first-class operator: per row group, the footer (min, max)
and whether the predicate can possibly match.  Each footer read is a Ray
task over one file — a metadata-only pass whose cost is O(files), never
O(rows) — and paths route through ``sources/fs`` so s3:// footers work
the same as local ones.

Reference scope note: the reference validator reads whole files with
pandas (suseel96/ndap_data_validator main.py) and has no scan planning;
this operator exists for the 100 TB target, not for parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ndap_data_validator_ray.sources import fs

_OPS = (">=", "<=", "==")


def _rg_prunable(stat_min, stat_max, op: str, value) -> bool:
    """True when NO row in the group can satisfy ``col <op> value``,
    judged from footer stats alone.  Missing stats never prune."""
    if stat_min is None or stat_max is None:
        return False
    if op == ">=":
        return stat_max < value
    if op == "<=":
        return stat_min > value
    return value < stat_min or stat_max < value  # ==


def zonemap_scan_stats(
    paths: list[str],
    column: str,
    op: str,
    value,
    *,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Per-row-group footer stats + prunability for ``column <op> value``.

    Returns a Dataset of rows (path, row_group, n_rows, stat_min,
    stat_max, prunable).  Footers only — no data pages are read, so a
    100 TB table costs one ~8 KB footer fetch per file.  Stats may be
    absent (written without statistics) or, for long strings, truncated
    by the writer; ``_rg_prunable`` treats absence as unprunable, and
    pyarrow surfaces truncated stats as None via ``has_min_max``.
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")

    def footer(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        rows = []
        for path in batch["path"]:
            filesystem, rel = fs.resolve(path)
            f = pq.ParquetFile(rel, filesystem=filesystem)
            try:
                names = f.schema_arrow.names
                col_idx = names.index(column)
                for rg in range(f.metadata.num_row_groups):
                    meta = f.metadata.row_group(rg)
                    st = meta.column(col_idx).statistics
                    mn = st.min if st is not None and st.has_min_max else None
                    mx = st.max if st is not None and st.has_min_max else None
                    rows.append(
                        {
                            "path": fs.basename(path),
                            "row_group": rg,
                            "n_rows": meta.num_rows,
                            "stat_min": mn,
                            "stat_max": mx,
                            "prunable": _rg_prunable(mn, mx, op, value),
                        }
                    )
            finally:
                f.close()
        out = pd.DataFrame(
            rows, columns=["path", "row_group", "n_rows", "stat_min", "stat_max", "prunable"]
        )
        out["row_group"] = out["row_group"].astype(np.int64)
        out["n_rows"] = out["n_rows"].astype(np.int64)
        out["prunable"] = out["prunable"].astype(bool)
        return out

    items = ray.data.from_items([{"path": p} for p in paths])
    return items.map_batches(
        footer, batch_format="pandas", **({"concurrency": concurrency} if concurrency else {})
    )
