"""CSV/parquet sources, preview/count, and rule-schema JSON loading."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ndap_data_validator_ray.sources.readers import list_table_files, preview, read_table, record_count


def _write_csvs(tmp_path, n_files=3, rows=20):
    paths = []
    for k in range(n_files):
        df = pd.DataFrame(
            {
                "state": [f"S{i % 4}" for i in range(rows)],
                "period": ["2020"] * rows,
                "value": [str(i + k) for i in range(rows)],
            }
        )
        p = tmp_path / f"file{k}.csv"
        df.to_csv(p, index=False)
        paths.append(str(p))
    return paths


def test_csv_folder_roundtrip(tmp_path):
    paths = _write_csvs(tmp_path)
    assert list_table_files(str(tmp_path)) == sorted(paths)
    ds = read_table(str(tmp_path))
    assert record_count(ds) == 60
    head = preview(ds, 5)
    assert len(head) == 5 and list(head.columns) == ["state", "period", "value"]


def test_csv_schema_override(tmp_path):
    _write_csvs(tmp_path, n_files=1)
    schema = pa.schema([("value", pa.string())])
    ds = read_table(str(tmp_path), schema=schema)
    assert dict(zip(ds.schema().names, [str(t) for t in ds.schema().types]))["value"] == "string"


def test_csv_role_validation_end_to_end(tmp_path):
    """The reference's actual workflow: CSV folder -> roles -> verdict."""
    from ndap_data_validator_ray.pipelines.role_validation import validate_dataset

    _write_csvs(tmp_path)
    ds = read_table(str(tmp_path))
    rep = validate_dataset(
        ds,
        role_selection={"state": "Location", "period": "Time", "value": "Measures"},
        measure_type_selection={"value": "integer"},
    )
    assert rep["passed"] is True
    assert rep["per_column"]["value"]["conversion_errors"] == 0


def test_parquet_read(tmp_path):
    tbl = pa.table({"a": [1, 2, 3]})
    pq.write_table(tbl, str(tmp_path / "t.parquet"))
    ds = read_table(str(tmp_path))
    assert record_count(ds) == 3


def test_partitioned_write_roundtrip(tmp_path):
    """write_table(partition_cols=...) lays out col=value/ dirs (resumable
    output: a re-run can replace one key's directory) and read_table
    reconstructs the partition column from the directory names."""
    import ray.data

    from ndap_data_validator_ray.sources.readers import write_table

    df = pd.DataFrame(
        {
            "bucket": ["a", "b", "a", "c", "b", "a"],
            "k": [1, 2, 3, 4, 5, 6],
            "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )
    out = tmp_path / "part_out"
    write_table(ray.data.from_pandas(df), str(out), partition_cols=["bucket"])
    subdirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert subdirs == ["bucket=a", "bucket=b", "bucket=c"]
    back = (
        read_table(str(out))
        .to_pandas()
        .astype({"bucket": str})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back[["bucket", "k", "v"]], df.sort_values("k").reset_index(drop=True)
    )


def test_list_table_files_recurses(tmp_path):
    (tmp_path / "bucket=a").mkdir()
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "bucket=a" / "f.parquet"))
    pq.write_table(pa.table({"x": [2], "bucket": ["b"]}), str(tmp_path / "top.parquet"))
    files = list_table_files(str(tmp_path))
    assert [f.split(str(tmp_path))[1] for f in files] == ["/bucket=a/f.parquet", "/top.parquet"]


def test_load_rule_schemas(tmp_path):
    from ndap_data_validator_ray import schema as sch

    custom = {
        "version": 1,
        "defaultSchema": "Strict",
        "schemas": {
            "Strict": {
                "Location": {"notNull": True, "mandatory": True, "numericOnly": False},
                "Measures": {"notNull": True, "mandatory": True, "numericOnly": True},
                "Time": {"notNull": True, "mandatory": True, "numericOnly": False},
                "Others": {"notNull": False, "mandatory": False, "numericOnly": False},
            }
        },
    }
    p = tmp_path / "rules.json"
    p.write_text(json.dumps(custom))
    default = sch.load_rule_schemas(str(p))
    try:
        assert default == "Strict"
        ts = sch.schema_from_roles({"x": "Measures"}, rule_schema="Strict")
        assert ts.role_flags("Measures")["notNull"] is True
        assert "Location" in ts.missing_roles()  # mandatory in Strict
    finally:
        sch.RULE_SCHEMAS.pop("Strict", None)
