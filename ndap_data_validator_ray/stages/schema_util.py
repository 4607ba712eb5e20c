"""Shared Dataset-schema → Arrow-type resolution for the bucketed join
family (join/asof/rangejoin).

A Dataset built from pandas blocks reports a ``PandasBlockSchema`` whose
unified ``.types`` contains ``None`` wherever a pandas extension dtype
(nullable Int64, boolean, ...) has no direct ``pa.from_numpy_dtype``
mapping — and ``np.dtype(None)`` silently means float64, which is exactly
the int64-key corruption the join stages guard against.  Resolve those
entries from the base pandas dtypes instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def arrow_field_types(ds: "ray.data.Dataset") -> dict[str, pa.DataType]:
    """Ordered {column: Arrow type} for a Dataset of Arrow OR pandas blocks."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    base_types = list(getattr(base, "types", None) or sch.types)
    out: dict[str, pa.DataType] = {}
    for name, typ, base_typ in zip(sch.names, sch.types, base_types):
        if not isinstance(typ, pa.DataType):
            typ = base_typ
            if isinstance(typ, pd.api.extensions.ExtensionDtype):
                typ = pa.Array.from_pandas(pd.Series([], dtype=typ)).type
            else:
                npt = np.dtype(typ)
                typ = pa.string() if npt == np.dtype(object) else pa.from_numpy_dtype(npt)
        out[name] = typ
    return out
