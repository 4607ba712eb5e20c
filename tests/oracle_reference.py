"""Independent pandas oracle pinning the reference validator's semantics.

This is a from-scratch, compact reimplementation of the behavior specified
by ``/root/reference/utils/validation.py`` (coercion :34-90, role dispatch
:200-231, verdicts :240-357) used ONLY as a test oracle — the engine under
test never imports it.  Structured differently from the reference (single
table-driven pass) but semantically equivalent, including clamp-at-zero
error accounting and literal reason strings.
"""

from __future__ import annotations

import re

import pandas as pd

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
_PATTERNS = [
    re.compile(r"^\d{4}$"),
    re.compile(r"^\d{4}-\d{2}$"),
    re.compile(rf"^(?:{_MONTHS})-\d{{4}}$", re.I),
    re.compile(rf"^(?:{_MONTHS})-(?:{_MONTHS}),\s*\d{{4}}$", re.I),
    re.compile(rf"^(?:{_MONTHS}) - (?:{_MONTHS}),\s*\d{{4}}$", re.I),
    re.compile(rf"^(0?[1-9]|[12][0-9]|3[01])-(?:{_MONTHS})-\d{{4}}$", re.I),
]

RULES = {
    "Location": dict(notNull=True, mandatory=False, numericOnly=False),
    "Measures": dict(notNull=False, mandatory=True, numericOnly=True),
    "Time": dict(notNull=True, mandatory=True, numericOnly=False),
    "Others": dict(notNull=False, mandatory=False, numericOnly=False),
}


def time_format_labels(series: pd.Series) -> tuple[list[int], int]:
    """Per non-null value: matched pattern index list + invalid count."""
    labels, invalid = [], 0
    for val in series.dropna().astype("string"):
        v = str(val).strip()
        if not v:
            invalid += 1
            continue
        for k, pat in enumerate(_PATTERNS):
            if pat.match(v):
                labels.append(k)
                break
        else:
            invalid += 1
    return labels, invalid


def time_conversion_errors(series: pd.Series) -> int:
    labels, invalid = time_format_labels(series)
    if not labels:
        return invalid
    counts = pd.Series(labels).value_counts()
    return invalid + (len(labels) - int(counts.max()))


def oracle_coerce(series: pd.Series, role: str, measure_type: str | None) -> tuple[pd.Series, int]:
    base_nulls = int(series.isna().sum())
    if role in ("Location", "Time"):
        out = series.astype("string")
        errs = time_conversion_errors(series) if role == "Time" else 0
        return out, errs
    if role == "Measures":
        num = pd.to_numeric(series, errors="coerce")
        if (measure_type or "float") == "integer":
            frac = num.notna() & (num % 1 != 0)
            num = num.mask(frac, other=pd.NA).astype("Int64")
        else:
            num = num.astype("Float64")
        return num, max(int(num.isna().sum()) - base_nulls, 0)
    return series.astype("string").astype("category"), 0


def oracle_validate(
    df: pd.DataFrame, roles: dict[str, str], measure_types: dict[str, str] | None = None
) -> dict:
    """End-to-end oracle: coerce by roles then produce the reference-shape
    verdict report with literal reason strings."""
    measure_types = measure_types or {}
    per_column, failed = {}, []
    for col in df.columns:
        role = roles.get(col, "Others")
        coerced, conv = oracle_coerce(df[col], role, measure_types.get(col, "float"))
        nulls = int(coerced.isna().sum())
        flags = RULES[role]
        reasons = []
        if flags["numericOnly"] and conv > 0:
            reasons.append("Non-numeric values detected")
        if flags["notNull"] and nulls > 0:
            reasons.append("No Nulls allowed")
        if role == "Time":
            labels, invalid = time_format_labels(df[col])
            if invalid > 0:
                reasons.append(
                    "Invalid time format; allowed: 'YYYY', 'YYYY-YY', 'MMM-YYYY', "
                    "'MMM-MMM, YYYY', 'MMM - MMM, YYYY' "
                )
            elif labels and len(set(labels)) > 1:
                reasons.append("Inconsistent time formats across rows")
        passed = not reasons
        per_column[col] = {
            "role": role,
            "nulls": nulls,
            "conversion_errors": conv,
            "passed": passed,
            "reasons": reasons,
        }
        if not passed:
            failed.append(col)
    mandatory = [r for r, f in RULES.items() if f["mandatory"]]
    for hard in ("Time", "Measures"):
        if hard not in mandatory:
            mandatory.append(hard)
    assigned = set(roles.values())
    missing = [r for r in mandatory if r not in assigned]
    return {
        "per_column": per_column,
        "failed_columns": failed,
        "missing_roles": missing,
        "passed": not failed and not missing,
    }
