"""Gold-standard conformance: run the ACTUAL reference implementation
(read-only at /root/reference) side-by-side with the engine on the same
fixtures and require identical reports.

The reference module is loaded dynamically and never imported by the
engine; when the reference checkout is absent (standalone repo use) these
tests skip — the pandas oracle in ``tests/oracle_reference.py`` still pins
the same semantics.
"""

import importlib.util
import os

import pandas as pd
import pytest

_REF = "/root/reference/utils/validation.py"


@pytest.fixture(scope="module")
def ref_validation():
    if not os.path.exists(_REF):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("_ref_validation", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


from tests.test_validation_report import MEASURE_TYPES, ROLES, VARIANTS, _engine_report, _f2_table


@pytest.mark.parametrize("variant", VARIANTS)
def test_engine_matches_reference_exactly(ref_validation, variant):
    """Engine report == the reference's own coerce+validate output, byte-
    for-byte on every field the reference produces (validation.py:352-357)."""
    df = _f2_table(variant)
    cleaned, coercion_report = ref_validation.coerce_dataframe_by_roles(df.copy(), ROLES, MEASURE_TYPES)
    expected = ref_validation.validate_dataframe_by_roles(cleaned, ROLES, coercion_report)
    (got,) = _engine_report(df)
    assert got["failed_columns"] == expected["failed_columns"]
    assert got["missing_roles"] == expected["missing_roles"]
    assert got["passed"] == expected["passed"]
    for col, exp in expected["per_column"].items():
        g = got["per_column"][col]
        for key in ("role", "nulls", "conversion_errors", "passed", "reasons"):
            assert g[key] == exp[key], (variant, col, key, g[key], exp[key])


def test_time_conversion_errors_match_reference(ref_validation):
    """M8 conversion-error accounting equals the reference per-value loop
    (validation.py:147-188) on a format mix with a unique majority."""
    import pyarrow as pa

    from ndap_data_validator_ray.functions import timefmt

    vals = ["2020", "2020", "Jan-2020", "junk", "", "05-Dec-2020", None, "2021", "FEB-1999"]
    ser = pd.Series(vals, dtype=object)
    expected = ref_validation._count_time_format_errors(ser)
    hist = timefmt.batch_histogram(pa.array(vals, pa.string()))
    assert timefmt.conversion_errors_from_hist(hist) == expected


def test_boolean_tokens_match_reference(ref_validation):
    import pyarrow as pa

    from ndap_data_validator_ray.functions import coercion as co

    vals = ["true", " T ", "YES", "n", "0", "maybe", "", None, "01", "No"]
    exp_series, exp_errs = ref_validation._coerce_to_boolean(pd.Series(vals, dtype=object))
    got, got_errs = co.coerce_boolean(pa.array(vals, pa.string()))
    assert got_errs == exp_errs
    assert got.to_pylist() == [None if pd.isna(v) else bool(v) for v in exp_series.tolist()]
