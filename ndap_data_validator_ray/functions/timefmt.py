"""Vectorized time-format matching (reference M8, order-free reformulation).

The reference matches each Time value against 6 anchored regexes in priority
order with a Python per-value loop (``validation.py:148-188`` and the
duplicate at ``:255-315``).  Here the same patterns run as
``pyarrow.compute.match_substring_regex`` kernels over the whole batch,
producing a per-value *format id* (0..5 = first matching pattern, -1 =
invalid non-empty/no-match or empty-after-strip, null = null input).

Per-batch output is a tiny fixed-size histogram ``[invalid, fmt0..fmt5]``.
All reference verdicts are recomputed exactly from summed histograms:

- invalid count           = hist[0]                        (validation.py:300-315)
- majority-dissent errors = sum(valid) - max(valid bins)   (validation.py:180-188)
- consistency             = (#nonzero valid bins) <= 1     — order-free
  reformulation of the reference's "first format vs rest" scan
  (validation.py:322-327): identical verdict, no row-order dependence
  (SURVEY.md §2.6 A5).  Majority ties: the reference breaks ties by first
  occurrence order in the data; this engine breaks them by lowest pattern
  index.  Affects only the conversion-error count in exact-tie cases;
  documented intentional deviation (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MONTH = "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"

# (label, regex, ignore_case) — priority order matches validation.py:149-162
TIME_PATTERNS: list[tuple[str, str, bool]] = [
    ("YYYY", r"^\d{4}$", False),
    ("YYYY-YY", r"^\d{4}-\d{2}$", False),
    ("MMM-YYYY", rf"^{_MONTH}-\d{{4}}$", True),
    ("MMM-MMM, YYYY", rf"^{_MONTH}-{_MONTH},\s*\d{{4}}$", True),
    ("MMM - MMM, YYYY", rf"^{_MONTH} - {_MONTH},\s*\d{{4}}$", True),
    ("DD-MMM-YYYY", rf"^(?:0?[1-9]|[12][0-9]|3[01])-{_MONTH}-\d{{4}}$", True),
]

N_FORMATS = len(TIME_PATTERNS)
HIST_SIZE = 1 + N_FORMATS  # slot 0 = invalid, slots 1..6 = formats


def format_ids(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-value format id: int8 array; -1 invalid, 0..5 format, null null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = arr if pa.types.is_string(arr.type) else pc.cast(arr, pa.string())
    stripped = pc.utf8_trim_whitespace(s)
    fmt = np.full(len(s), -1, dtype=np.int8)
    valid_mask = pc.is_valid(stripped).to_numpy(zero_copy_only=False)
    unmatched = valid_mask.copy()
    # empty-after-strip stays -1 (invalid: validation.py:303-306)
    for k, (_label, pattern, icase) in enumerate(TIME_PATTERNS):
        if not unmatched.any():
            break
        m = pc.match_substring_regex(stripped, pattern, ignore_case=icase)
        m_np = m.to_numpy(zero_copy_only=False)
        hit = unmatched & np.asarray(m_np, dtype=bool)
        fmt[hit] = k
        unmatched &= ~hit
    return pa.array(fmt, pa.int8(), mask=~valid_mask)


def batch_histogram(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Fixed [invalid, fmt0..fmt5] int64 histogram over non-null values."""
    ids = format_ids(arr)
    vals = ids.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
    return np.bincount(vals + 1, minlength=HIST_SIZE).astype(np.int64)


def conversion_errors_from_hist(hist: np.ndarray) -> int:
    """Reference ``_count_time_format_errors`` (validation.py:147-188):
    invalid + rows not matching the majority valid format."""
    invalid = int(hist[0])
    valid = hist[1:]
    total_valid = int(valid.sum())
    if total_valid == 0:
        return invalid
    return invalid + (total_valid - int(valid.max()))


def invalid_count_from_hist(hist: np.ndarray) -> int:
    return int(hist[0])


def distinct_formats_from_hist(hist: np.ndarray) -> int:
    return int((hist[1:] > 0).sum())
