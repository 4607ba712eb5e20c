"""Footer-only zonemap scan planning (sources/zonemap.py): stats parity
vs DuckDB's parquet_metadata(), pruning safety (skipped row groups
contain no matching rows), and the driver-entry clips aggregation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ndap_data_validator_ray.sources.zonemap import zonemap_scan_stats


def _write_clustered(tmp_path, n=100, rg=10):
    """ids 0..n-1 in order, row groups of rg rows -> perfectly clustered."""
    p = str(tmp_path / "t.parquet")
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "v": pa.array(np.arange(n, dtype=np.float64) * 1.5),
        }
    )
    pq.write_table(tbl, p, row_group_size=rg)
    return p


def test_stats_match_duckdb_parquet_metadata(tmp_path):
    """Engine footer stats equal DuckDB's parquet_metadata() view of the
    same file — a cross-engine value check on the metadata read itself."""
    p = _write_clustered(tmp_path)
    eng = (
        zonemap_scan_stats([p], "id", ">=", 55)
        .to_pandas()
        .sort_values("row_group")
        .reset_index(drop=True)
    )
    ora = duckdb.sql(
        f"""
        SELECT row_group_id, row_group_num_rows,
               CAST(stats_min AS BIGINT) AS mn, CAST(stats_max AS BIGINT) AS mx
        FROM parquet_metadata('{p}')
        WHERE path_in_schema = 'id' ORDER BY row_group_id
        """
    ).df()
    assert len(eng) == len(ora) == 10
    assert (eng["row_group"].to_numpy() == ora["row_group_id"].to_numpy()).all()
    assert (eng["n_rows"].to_numpy() == ora["row_group_num_rows"].to_numpy()).all()
    assert (eng["stat_min"].to_numpy(np.int64) == ora["mn"].to_numpy(np.int64)).all()
    assert (eng["stat_max"].to_numpy(np.int64) == ora["mx"].to_numpy(np.int64)).all()
    # id >= 55: groups [0..4] (max 49) prune plus none after
    assert eng["prunable"].tolist() == [True] * 5 + [False] * 5


@pytest.mark.parametrize("op,value", [(">=", 55), ("<=", 23), ("==", 77)])
def test_pruning_is_safe(tmp_path, op, value):
    """Row groups marked prunable contain NO matching rows, and reading
    only the surviving groups yields exactly the full filtered result."""
    p = _write_clustered(tmp_path)
    stats = zonemap_scan_stats([p], "id", op, value).to_pandas()
    keep = stats.loc[~stats["prunable"], "row_group"].tolist()
    f = pq.ParquetFile(p)
    got = f.read_row_groups(keep).to_pandas() if keep else pd.DataFrame({"id": []})
    full = f.read().to_pandas()
    mask = {"<=": full["id"] <= value, ">=": full["id"] >= value, "==": full["id"] == value}[op]
    expect = full[mask]
    got_match = got[
        {"<=": got["id"] <= value, ">=": got["id"] >= value, "==": got["id"] == value}[op]
    ]
    assert sorted(got_match["id"]) == sorted(expect["id"])
    # and the plan actually pruned something on this clustered layout
    assert stats["prunable"].any()


def test_unclustered_column_never_prunes_but_never_lies(tmp_path):
    """A column uncorrelated with row order has wide per-group ranges:
    nothing prunes (honest no-win), nothing is wrongly skipped."""
    rng = np.random.RandomState(0)
    p = str(tmp_path / "u.parquet")
    pq.write_table(
        pa.table({"x": pa.array(rng.permutation(200).astype(np.int64))}), p, row_group_size=20
    )
    stats = zonemap_scan_stats([p], "x", ">=", 100).to_pandas()
    assert not stats["prunable"].any()


def test_missing_stats_never_prune(tmp_path):
    p = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table({"id": pa.array(range(50), pa.int64())}),
        p, row_group_size=10, write_statistics=False,
    )
    stats = zonemap_scan_stats([p], "id", ">=", 45).to_pandas()
    assert stats["stat_min"].isna().all()
    assert not stats["prunable"].any()


def test_string_ids_prune_like_the_clips_predicate(tmp_path):
    """String min/max stats prune zero-padded id predicates — the shape
    clips_zonemap_prune relies on."""
    p = str(tmp_path / "s.parquet")
    ids = [f"clip-{i:012d}" for i in range(80)]
    pq.write_table(pa.table({"clip_id": pa.array(ids)}), p, row_group_size=8)
    stats = zonemap_scan_stats([p], "clip_id", ">=", f"clip-{48:012d}").to_pandas()
    assert stats["prunable"].tolist() == [True] * 6 + [False] * 4


def test_clips_entry_aggregation():
    """Driver-entry op over the real synthesized clips table: totals add
    up and the 60% threshold prunes a strict subset of row groups."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ray_entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.clips_zonemap_prune("/root/testdata/sf0.001")
    assert (out["rows_total"] >= out["rows_scanned"]).all()
    assert (out["n_pruned"] <= out["n_rowgroups"]).all()
    assert int(out["n_pruned"].sum()) > 0  # clustered ids -> real pruning
    # files before the 60% id threshold prune fully, the boundary file partially
    assert int(out["rows_scanned"].sum()) < int(out["rows_total"].sum())
