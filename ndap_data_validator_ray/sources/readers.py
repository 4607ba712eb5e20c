"""Table sources + the reference's ingest helpers.

Reference: CSV bytes -> whole-file pandas (``main.py:120-125``), preview =
first 10 rows (``main.py:673-675``), record count = a second full parse
(``main.py:676-679``), S3 folder listing with deterministic ordering
(``main.py:637-668``).  Here: streaming ``ray.data`` readers with schema
control, ``Dataset.limit`` for previews (no full scan) and metadata-backed
counts (no re-parse).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data


def list_table_files(path: str, extensions: tuple[str, ...] = (".csv", ".parquet")) -> list[str]:
    """Deterministic (sorted) file listing — stable partition/lineage ids,
    mirroring the reference's key sort (main.py:660)."""
    if os.path.isfile(path):
        return [path]
    found = []
    for root, dirs, files in os.walk(path):
        dirs[:] = sorted(d for d in dirs if not d.startswith("."))
        found.extend(
            os.path.join(root, f)
            for f in files
            if f.lower().endswith(extensions) and not f.startswith(".")
        )
    return sorted(found)


def read_table(
    path: str,
    format: str | None = None,
    columns: list[str] | None = None,
    schema: pa.Schema | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read a file or folder of CSV/Parquet as one streaming Dataset.

    CSV is the reference's native ingest format (all columns parse with
    inferred types exactly as ``pd.read_csv`` would; pass ``schema`` to pin
    types for conformance runs).  A folder is the reference's "S3 folder"
    mode: many files, one logical dataset."""
    files = list_table_files(path)
    if not files:
        raise FileNotFoundError(f"no table files under {path}")
    fmt = format or ("csv" if files[0].endswith(".csv") else "parquet")
    if fmt == "csv":
        import pyarrow.csv as pacsv

        opts = {}
        if schema is not None:
            opts["convert_options"] = pacsv.ConvertOptions(column_types=schema)
        ds = ray.data.read_csv(files, **opts, **kwargs)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if any("=" in os.path.relpath(f, path) for f in files):
        # Hive-partitioned layout (col=value/ dirs, e.g. from write_table):
        # hand the root to parquet dataset discovery so the partition
        # columns are reconstructed from the directory names.
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    return ray.data.read_parquet(files, columns=columns, **kwargs)


def preview(ds: "ray.data.Dataset", n: int = 10) -> pd.DataFrame:
    """First-n preview without a full scan (reference re-parsed the whole
    file for this — main.py:673-675)."""
    return ds.limit(n).to_pandas()


def record_count(ds: "ray.data.Dataset") -> int:
    """Row count; metadata-only on parquet (reference: second full parse,
    main.py:676-679)."""
    return ds.count()


def write_table(
    ds: "ray.data.Dataset",
    path: str,
    partition_cols: list[str] | None = None,
    **kwargs,
) -> None:
    """Partitioned parquet sink: hive-style ``col=value/`` directories when
    ``partition_cols`` is given — the resumable-output layout (one
    directory per key, so a re-run can skip or atomically replace finished
    partitions instead of rewriting one giant file).  URI-aware via
    ``sources/fs`` (s3:// etc. get an explicit pyarrow filesystem)."""
    from ndap_data_validator_ray.sources import fs as vfs

    filesystem, resolved = vfs.resolve(path)
    wkwargs = dict(kwargs)
    wkwargs["filesystem"] = filesystem
    if partition_cols:
        wkwargs["partition_cols"] = list(partition_cols)
    ds.write_parquet(resolved, **wkwargs)
