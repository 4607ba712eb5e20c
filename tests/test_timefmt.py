"""Time-format kernel vs the per-value oracle (validation.py:147-188)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ndap_data_validator_ray.functions import timefmt
from tests.oracle_reference import _PATTERNS, time_conversion_errors, time_format_labels

SAMPLES = [
    "2020", "1999", "2020-21", "Jan-2020", "jan-2020", "JAN-2020",
    "Jan-Feb, 2020", "Jan-Feb,2020", "Jan - Feb, 2020", "01-Jan-2020",
    "31-Dec-1999", "32-Jan-2020", "0-Jan-2020", "205", "20205", "",
    " ", "  2020  ", None, "Month-2020", "Jan–2020",
]


def test_format_ids_match_oracle():
    ids = timefmt.format_ids(pa.array(SAMPLES, pa.string())).to_pylist()
    for v, got in zip(SAMPLES, ids):
        if v is None:
            assert got is None
            continue
        s = str(v).strip()
        exp = -1
        if s:
            for k, pat in enumerate(_PATTERNS):
                if pat.match(s):
                    exp = k
                    break
        assert got == exp, (v, got, exp)


def test_conversion_errors_match_oracle():
    hist = timefmt.batch_histogram(pa.array(SAMPLES, pa.string()))
    assert timefmt.conversion_errors_from_hist(hist) == time_conversion_errors(pd.Series(SAMPLES, dtype=object))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(SAMPLES),
            st.text(max_size=12),
            st.none(),
        ),
        max_size=40,
    )
)
def test_property_parity(vals):
    """Histogram-derived counts equal the reference per-value loop for
    arbitrary inputs (excluding majority ties, where the engine's
    order-free tie-break intentionally differs — SURVEY.md §7.3)."""
    ser = pd.Series(vals, dtype=object)
    labels, invalid = time_format_labels(ser)
    hist = timefmt.batch_histogram(pa.array(ser.tolist(), pa.string()))
    assert timefmt.invalid_count_from_hist(hist) == invalid
    assert timefmt.distinct_formats_from_hist(hist) == len(set(labels))
    if labels:
        counts = pd.Series(labels).value_counts()
        if (counts == counts.max()).sum() == 1:  # unique majority: exact parity
            assert timefmt.conversion_errors_from_hist(hist) == time_conversion_errors(ser)


def test_batch_split_invariance():
    vals = SAMPLES * 13
    whole = timefmt.batch_histogram(pa.array(vals, pa.string()))
    parts = sum(
        (timefmt.batch_histogram(pa.array(vals[i : i + 17], pa.string())) for i in range(0, len(vals), 17)),
        np.zeros(timefmt.HIST_SIZE, dtype=np.int64),
    )
    assert np.array_equal(whole, parts)
