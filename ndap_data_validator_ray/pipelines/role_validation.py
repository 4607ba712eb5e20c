"""Reference-parity role-based validation over arbitrary tables.

The distributed equivalent of the reference's validate step
(``main.py:835-1130``): given a table + per-column role assignment + named
rule schema, produce the exact report shape of
``validate_dataframe_by_roles`` (``validation.py:240-357``) —
``{per_column: {role, nulls, conversion_errors, passed, reasons},
failed_columns, missing_roles, passed}`` with byte-identical reason
strings — except computed as one streaming ``map_batches`` pass with
mergeable partials instead of whole-file pandas.

Also implements the reference's folder mode (``main.py:880-936``): many
files validated independently under ONE role assignment, with the
per-file fold semantics (overall pass = all files pass; a failing or
erroring file yields a per-file failed record, never a job abort).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

import ray.data

from ndap_data_validator_ray.report import TableStats, finalize_report
from ndap_data_validator_ray.schema import TableSchema, schema_from_roles
from ndap_data_validator_ray.stages.validate import PARTITION_COL, ValidateBatch
from ndap_data_validator_ray.functions.sketches import deserialize


def _collect_stats(union_rows: pa.Table) -> dict[int, TableStats]:
    """Fold per-batch stats blobs into per-partition TableStats
    (deterministic bytewise order, independent of task completion order)."""
    per_pid: dict[int, list[bytes]] = {}
    rec = union_rows.to_pylist()
    for row in rec:
        if row["record_type"] != "stats":
            continue
        per_pid.setdefault(row["partition_id"], []).append(row["stats_blob"])
    out: dict[int, TableStats] = {}
    for pid, blobs in per_pid.items():
        total = TableStats()
        for blob in sorted(blobs):
            total = total.merge(deserialize(blob))
        out[pid] = total
    return out


def validate_dataset(
    ds: "ray.data.Dataset",
    role_selection: dict[str, str],
    measure_type_selection: dict[str, str] | None = None,
    rule_schema: str | None = None,
    schema: TableSchema | None = None,
) -> dict[str, Any]:
    """Single-table validation: one streaming pass, verdict on the driver."""
    tschema = schema or schema_from_roles(role_selection, measure_type_selection, rule_schema)
    union = ds.map_batches(ValidateBatch(tschema), batch_format="pyarrow")
    rows = pa.Table.from_pandas(union.to_pandas(), preserve_index=False)  # small: stats partials + capped violations
    stats = _collect_stats(rows)
    total = TableStats()
    for pid in sorted(stats):
        total = total.merge(stats[pid])
    return finalize_report(tschema, total)


def validate_files(
    files: list[str],
    role_selection: dict[str, str],
    measure_type_selection: dict[str, str] | None = None,
    rule_schema: str | None = None,
) -> dict[str, Any]:
    """Folder mode (reference ``main.py:880-936``): per-file reports under
    one role assignment + the overall fold — computed in ONE pipeline pass
    over all files (the reference loops files serially), partitioned by
    file for the per-file verdicts."""
    tschema = schema_from_roles(role_selection, measure_type_selection, rule_schema)
    files = sorted(files)  # deterministic file ordering (main.py:660)
    path_to_pid = {f: i for i, f in enumerate(files)}

    def attach(batch: pa.Table) -> pa.Table:
        pids = pa.array([path_to_pid.get(p, -1) for p in batch["path"].to_pylist()], pa.int64())
        return batch.drop_columns(["path"]).append_column(PARTITION_COL, pids)

    results: list[dict[str, Any]] = []
    passed_all = True
    file_errors: dict[int, str] = {}
    try:
        ds = ray.data.read_parquet(files, include_paths=True)
        union = ds.map_batches(attach, batch_format="pyarrow").map_batches(
            ValidateBatch(tschema), batch_format="pyarrow"
        )
        rows = pa.Table.from_pandas(union.to_pandas(), preserve_index=False)
        stats = _collect_stats(rows)
    except Exception:
        # a broken file aborts the fused pass: fall back to per-file
        # validation so healthy files still verdict and only broken ones
        # get failed records (reference main.py:928-936 semantics)
        stats = {}
        for pid, f in enumerate(files):
            try:
                ds = ray.data.read_parquet([f], include_paths=True)
                union = ds.map_batches(attach, batch_format="pyarrow").map_batches(
                    ValidateBatch(tschema), batch_format="pyarrow"
                )
                rows = pa.Table.from_pandas(union.to_pandas(), preserve_index=False)
                stats.update(_collect_stats(rows))
            except Exception as exc:  # noqa: BLE001 - per-file failed record
                file_errors[pid] = f"{type(exc).__name__}: {str(exc)[:200]}"

    for pid, f in enumerate(files):
        st = stats.get(pid)
        if st is None:
            # file produced no batches (empty/unreadable): failed record,
            # run continues (reference main.py:928-936 semantics)
            results.append(
                {
                    "file": f,
                    "passed": False,
                    "error": file_errors.get(pid, "no data"),
                    "failed_columns": [],
                    "rows": 0,
                }
            )
            passed_all = False
            continue
        rep = finalize_report(tschema, st)
        rep["file"] = f
        results.append(rep)
        passed_all &= bool(rep["passed"])
    return {"files": results, "passed": passed_all}
