"""Conformance: Arrow coercion kernels vs the pandas reference oracle
(semantics of /root/reference/utils/validation.py:34-90,:200-231)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ndap_data_validator_ray.functions import coercion as co
from tests.oracle_reference import oracle_coerce

MESSY_NUMERIC = ["1", "2.5", "-3", " 4 ", "5e2", "abc", "", None, "inf", "nan", "1_000", "0x1f", "7.0", "١٢"]
MESSY_BOOL = ["true", " T ", "YES", "y", "1", "false", "F", "no", "N", "0", "maybe", "", None, "01"]
MESSY_TIME = ["2020", "Jan-2021", "2020-21", "nope", "", None, "Feb - Mar, 2019", "05-Dec-2020"]


@pytest.mark.parametrize("role,mtype", [("Measures", "integer"), ("Measures", "float")])
def test_numeric_parity(role, mtype):
    ser = pd.Series(MESSY_NUMERIC, dtype=object)
    expect, expect_errs = oracle_coerce(ser, role, mtype)
    arr = pa.array(MESSY_NUMERIC, pa.string())
    got, got_errs = co.coerce_by_role(arr, role, mtype)
    assert got_errs == expect_errs
    got_vals = got.to_pylist()
    exp_vals = [None if pd.isna(v) else float(v) for v in expect.tolist()]
    assert [None if v is None else float(v) for v in got_vals] == exp_vals


def test_numeric_parity_on_typed_input():
    vals = [1.0, 2.5, None, -7.0, 3.999]
    for mtype in ("integer", "float"):
        expect, e_errs = oracle_coerce(pd.Series(vals), "Measures", mtype)
        got, g_errs = co.coerce_by_role(pa.array(vals, pa.float64()), "Measures", mtype)
        assert g_errs == e_errs
        assert [None if v is None else float(v) for v in got.to_pylist()] == [
            None if pd.isna(v) else float(v) for v in expect.tolist()
        ]


def test_boolean_tokens():
    got, errs = co.coerce_boolean(pa.array(MESSY_BOOL, pa.string()))
    # oracle per validation.py:60-76
    as_str = pd.Series(MESSY_BOOL, dtype=object).astype("string").str.strip().str.lower()
    exp = as_str.map(lambda v: True if v in {"true", "t", "yes", "y", "1"} else (False if v in {"false", "f", "no", "n", "0"} else pd.NA))
    exp_errs = int(exp.isna().sum()) - int(pd.Series(MESSY_BOOL).isna().sum())
    assert errs == max(exp_errs, 0)
    assert got.to_pylist() == [None if pd.isna(v) else bool(v) for v in exp.tolist()]


def test_datetime_parity():
    vals = ["2020-01-02", "2020-01-02 03:04:05", "notadate", "", None, "13/45/9999"]
    got, errs = co.coerce_datetime(pa.array(vals, pa.string()))
    # oracle is the same pandas parse the reference performs (validation.py:80)
    exp = pd.to_datetime(pd.Series(vals), errors="coerce")
    assert errs == int(exp.isna().sum()) - 1  # one original null
    # value parity
    got_list = got.to_pylist()
    for g, e in zip(got_list, exp.tolist()):
        assert (g is None) == pd.isna(e)
        if g is not None:
            assert g == e.to_pydatetime()


def test_location_and_others():
    arr = pa.array(["x", None, "7"], pa.string())
    got, errs = co.coerce_by_role(arr, "Location", None)
    assert errs == 0 and got.to_pylist() == ["x", None, "7"]
    got, errs = co.coerce_by_role(arr, "Others", None)
    assert errs == 0 and pa.types.is_dictionary(got.type)


def test_binary_passthrough():
    arr = pa.array([b"\xff\xfe", None], pa.binary())
    got, errs = co.coerce_by_role(arr, "Others", None)
    assert errs == 0 and got.to_pylist() == [b"\xff\xfe", None]


def test_batch_split_invariance():
    """Sum of per-batch error counts == whole-column count (the partial+merge
    algebra the distributed pass relies on)."""
    rng = np.random.default_rng(7)
    vals = [str(v) for v in rng.normal(0, 10, 500)] + ["junk"] * 37 + [None] * 23 + ["7.5"] * 11
    rng.shuffle(vals)
    whole, whole_errs = co.coerce_integer(pa.array(vals, pa.string()))
    split_errs = 0
    for i in range(0, len(vals), 61):
        _, e = co.coerce_integer(pa.array(vals[i : i + 61], pa.string()))
        split_errs += e
    assert split_errs == whole_errs


# ---------------------------------------------------------------------------
# property-based conformance vs the pandas oracle
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_messy_value = st.one_of(
    st.none(),
    st.text(max_size=8),
    st.integers(-10**6, 10**6).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda v: f"{v:.4g}"),
    st.sampled_from(["", " ", "1.5", "-0.0", "1e3", "nan", "inf", "-inf", "0x10", "1_000", "+7", ".5", "5."]),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_messy_value, max_size=30), st.sampled_from(["integer", "float"]))
def test_numeric_coercion_property(vals, mtype):
    """Arbitrary messy strings: error counts and values match the pandas
    reference semantics exactly (validation.py:40-57)."""
    ser = pd.Series(vals, dtype=object)
    try:
        exp, exp_errs = oracle_coerce(ser, "Measures", mtype)
    except TypeError:
        # reference behavior: integer coercion CRASHES on values beyond
        # int64 range; the engine nulls-and-counts them instead
        # (documented deviation) — just require it not to crash
        got, _ = co.coerce_by_role(pa.array(vals, pa.string()), "Measures", mtype)
        assert len(got) == len(vals)
        return
    got, got_errs = co.coerce_by_role(pa.array(vals, pa.string()), "Measures", mtype)
    assert got_errs == exp_errs
    assert [None if v is None else float(v) for v in got.to_pylist()] == [
        None if pd.isna(v) else float(v) for v in exp.tolist()
    ]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=10)), max_size=25))
def test_boolean_coercion_property(vals):
    ser = pd.Series(vals, dtype=object).astype("string").str.strip().str.lower()
    exp = ser.map(
        lambda v: True if v in {"true", "t", "yes", "y", "1"} else (False if v in {"false", "f", "no", "n", "0"} else pd.NA)
    )
    exp_errs = max(int(exp.isna().sum()) - int(pd.Series(vals).isna().sum()), 0)
    got, got_errs = co.coerce_boolean(pa.array(vals, pa.string()))
    assert got_errs == exp_errs
    assert got.to_pylist() == [None if pd.isna(v) else bool(v) for v in exp.tolist()]


def test_guess_datatype_option_matches_reference_semantics():
    """Reference guess_datatype_option_for_series (validation.py:22-31) on
    Arrow types: int->integer, float->float, bool->boolean,
    timestamp->datetime, everything else->string."""
    import pyarrow as pa

    from ndap_data_validator_ray.functions.coercion import guess_datatype_option

    assert guess_datatype_option(pa.int64()) == "integer"
    assert guess_datatype_option(pa.int32()) == "integer"
    assert guess_datatype_option(pa.float64()) == "float"
    assert guess_datatype_option(pa.bool_()) == "boolean"
    assert guess_datatype_option(pa.timestamp("us")) == "datetime"
    assert guess_datatype_option(pa.string()) == "string"
    assert guess_datatype_option(pa.binary()) == "string"


def test_guess_role_matches_reference_semantics():
    """Reference guess_role_for_series (validation.py:189-197): temporal
    dtype OR name token -> Time; numeric -> Measures(+type); else Others.
    Name tokens win over numeric dtype, as in the reference's ordering."""
    import pyarrow as pa

    from ndap_data_validator_ray.functions.coercion import guess_role

    assert guess_role(pa.timestamp("us"), "ts") == ("Time", None)
    assert guess_role(pa.string(), "order_date") == ("Time", None)
    assert guess_role(pa.int64(), "birth_year") == ("Time", None)  # name token beats dtype
    assert guess_role(pa.int64(), "qty") == ("Measures", "integer")
    assert guess_role(pa.float64(), "price") == ("Measures", "float")
    assert guess_role(pa.string(), "name") == ("Others", None)


def test_infer_dataset_roles_schema_only():
    import pandas as pd

    import ray.data

    from ndap_data_validator_ray.functions.coercion import infer_dataset_roles

    df = pd.DataFrame(
        {"ship_date": pd.to_datetime(["2020-01-01"]), "qty": [1], "price": [1.5], "flag": ["A"]}
    )
    roles = infer_dataset_roles(ray.data.from_pandas(df))
    assert roles == {
        "ship_date": ("Time", None),
        "qty": ("Measures", "integer"),
        "price": ("Measures", "float"),
        "flag": ("Others", None),
    }
