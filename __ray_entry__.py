"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship clip-validation pipeline (full constraint
suite over the synthesized audio clip + transcript table, BASELINE.json:15)
and returns its violation rows.  ``queries()`` exposes every implemented
operator from SURVEY.md §2 (+ the training-data ops); ``oracle_sql()``
gives DuckDB equivalents where SQL can express the semantics.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pandas as pd

_CLIPS_CACHE = "/tmp/ndap_clips_cache"


def _clips_dir(n_rows: int, **kwargs) -> str:
    """Synthesize (once, cached) a deterministic clips table under /tmp."""
    from ndap_data_validator_ray.sources.synthetic import ClipTableSpec, write_clips_dataset

    spec = ClipTableSpec(n_rows=n_rows, n_files=max(4, n_rows // 500), hot_dup_copies=max(10, n_rows // 100), **kwargs)
    d = os.path.join(_CLIPS_CACHE, spec.cache_key())
    write_clips_dataset(d, spec)
    return d


def _clips_rows_for(sf_dir: str) -> int:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 20000}.get(name, 2000)


_RUN_CACHE: dict[str, dict] = {}


def _run_clip_validation(sf_dir: str) -> dict:
    """Flagship run, cached per sf_dir (several queries() entries view the
    same run's report/violations; the driver calls them in one process)."""
    if sf_dir in _RUN_CACHE:
        return _RUN_CACHE[sf_dir]
    import tempfile

    from ndap_data_validator_ray.pipelines.clip_validation import ClipRunConfig, validate_clips

    data_dir = _clips_dir(_clips_rows_for(sf_dir))
    out_dir = tempfile.mkdtemp(prefix="ndap_run_")
    report = validate_clips(
        data_dir,
        # (min, max) autoscaling pool: a FIXED pool of 4 deadlocks a 4-CPU
        # session (nothing left to feed the read stage) — same invariant as
        # the CLI clamp
        ClipRunConfig(out_dir=out_dir, run_id="DRIVER", audio_concurrency=(1, 4), resume=False),
    )
    report["_out_dir"] = out_dir
    _RUN_CACHE[sf_dir] = report
    return report


def clips_validation_report(sf_dir: str) -> pd.DataFrame:
    """Flagship verdict report flattened to one row per column."""
    rep = _run_clip_validation(sf_dir)
    rows = []
    for col, e in rep["per_column"].items():
        rows.append(
            {
                "column": col,
                "role": e["role"],
                "nulls": e["nulls"],
                "conversion_errors": e["conversion_errors"],
                "passed": bool(e["passed"]),
                "n_reasons": len(e["reasons"]),
            }
        )
    return pd.DataFrame(rows).sort_values("column").reset_index(drop=True)


def clips_violation_rows(sf_dir: str) -> pd.DataFrame:
    """Materialized violation rows (check, column, key) from the flagship run."""
    import pyarrow.dataset as pads

    rep = _run_clip_validation(sf_dir)
    union = pads.dataset(os.path.join(rep["_out_dir"], "run-DRIVER", "union"), format="parquet").to_table().to_pandas()
    out = union[union["record_type"] == "violation"][["check", "column", "key"]]
    return out.sort_values(["check", "column", "key"]).reset_index(drop=True)


def clips_violation_counts(sf_dir: str) -> pd.DataFrame:
    """Exact per-check violation counts (uncapped counters)."""
    rep = _run_clip_validation(sf_dir)
    items = sorted(rep["violation_counts"].items())
    return pd.DataFrame({"check": [k for k, _ in items], "n_violations": [int(v) for _, v in items]})


def clips_audio_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact audio-content duplicate groups (decoded-PCM md5) of the same
    synthesized clips table the flagship validates — finds the injected
    hot-dup copies and id-duplicate rows by CONTENT, not metadata.
    Rows-only: the fingerprint space is engine-defined (no SQL audio
    decode); parity vs a single-process brute force is pinned by tests."""
    from ndap_data_validator_ray.pipelines.audio_dedup import audio_dup_groups

    return audio_dup_groups(_clips_dir(_clips_rows_for(sf_dir)))


def clips_audio_near_dup(sf_dir: str) -> pd.DataFrame:
    """Audio NEAR-dup clusters (codec-robust spectral fingerprints + the
    embedding LSH machinery): collapses re-encodes of the same signal the
    exact PCM dedup keeps apart.  Rows-only; cross-codec collapse and
    silence grouping pinned by tests."""
    from ndap_data_validator_ray.pipelines.audio_dedup import audio_near_dup_groups

    return audio_near_dup_groups(_clips_dir(_clips_rows_for(sf_dir)))


def clips_zonemap_prune(sf_dir: str) -> pd.DataFrame:
    """Footer-only zonemap scan planning over the multi-file clips table:
    for the predicate clip_id >= <60th-percentile id> — a column the
    shards are naturally clustered by (ingest order) — report, per file,
    how many row groups the scan can skip without reading data pages.
    Rows-only: row-group layout is physical, not SQL-visible; parity vs
    DuckDB's parquet_metadata() and a pruned-vs-full read equivalence are
    pinned by tests (test_zonemap.py)."""
    from ndap_data_validator_ray.sources.synthetic import clip_files
    from ndap_data_validator_ray.sources.zonemap import zonemap_scan_stats

    n = _clips_rows_for(sf_dir)
    threshold = f"clip-{int(n * 0.6):012d}"
    stats = zonemap_scan_stats(
        clip_files(_clips_dir(n)), "clip_id", ">=", threshold
    ).to_pandas()  # O(row groups) rows — footer metadata, never data
    g = stats.groupby("path")
    out = pd.DataFrame(
        {
            "path": g.size().index.to_numpy(),
            "n_rowgroups": g.size().to_numpy("int64"),
            "n_pruned": g["prunable"].sum().to_numpy("int64"),
            "rows_total": g["n_rows"].sum().to_numpy("int64"),
            "rows_scanned": g.apply(
                lambda d: int(d.loc[~d["prunable"], "n_rows"].sum()), include_groups=False
            ).to_numpy("int64"),
        }
    )
    return out.sort_values("path").reset_index(drop=True)


def role_validation_lineitem(sf_dir: str) -> pd.DataFrame:
    """Reference-parity role validation applied to lineitem (rows-only:
    report shape is the reference's, not a SQL result)."""
    import ray.data

    from ndap_data_validator_ray.pipelines.role_validation import validate_dataset

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_orderkey", "l_quantity"],
    )
    rep = validate_dataset(
        ds,
        role_selection={
            "l_returnflag": "Location",
            "l_linestatus": "Others",
            "l_orderkey": "Measures",
            "l_quantity": "Measures",
        },
        measure_type_selection={"l_orderkey": "integer", "l_quantity": "float"},
    )
    rows = [
        {
            "column": col,
            "role": e["role"],
            "nulls": e["nulls"],
            "conversion_errors": e["conversion_errors"],
            "passed": bool(e["passed"]),
        }
        for col, e in rep["per_column"].items()
    ]
    out = pd.DataFrame(rows).sort_values("column").reset_index(drop=True)
    out["missing_roles"] = ",".join(rep["missing_roles"])
    return out


def entry() -> Any:
    """Flagship pipeline at smoke scale; returns the violation rows table."""
    return clips_violation_rows("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ndap_data_validator_ray.pipelines.queries import REGISTRY

    out: dict[str, Callable[[str], Any]] = {name: fn for name, (fn, _sql) in REGISTRY.items()}
    out["clips_validation_report"] = clips_validation_report
    out["clips_violation_rows"] = clips_violation_rows
    out["clips_violation_counts"] = clips_violation_counts
    out["clips_audio_dedup"] = clips_audio_dedup
    out["clips_audio_near_dup"] = clips_audio_near_dup
    out["clips_zonemap_prune"] = clips_zonemap_prune
    out["role_validation_lineitem"] = role_validation_lineitem
    return out


def oracle_sql() -> dict[str, str]:
    from ndap_data_validator_ray.pipelines.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
