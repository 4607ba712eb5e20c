"""Drift baseline snapshots (SURVEY.md F3 / BASELINE.json:6).

A baseline is the merged per-column digest state from a clean reference run
(t-digests for quantile-tracked columns, plus null counts and row counts
for context).  Current runs compare their merged digests against it with
KS / PSI statistics (functions/sketches.py) on the driver — tiny data, no
cluster work (reference analogue: the J2 broadcast lookup, SURVEY.md §2.5).
"""

from __future__ import annotations

import base64
import json
import os

from ndap_data_validator_ray.functions.sketches import TDigest, deserialize, serialize
from ndap_data_validator_ray.report import TableStats


def save_baseline(path: str, stats: TableStats) -> None:
    cols = {}
    for name, cs in stats.columns.items():
        if cs.tdigest is not None and cs.tdigest.total_weight() > 0:
            cols[name] = {
                "tdigest": base64.b85encode(serialize(cs.tdigest)).decode(),
                "nulls": cs.nulls,
                "rows": cs.rows,
            }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 1, "rows": stats.rows, "columns": cols}, f)
    os.replace(tmp, path)


def load_baseline(path: str) -> dict[str, TDigest]:
    with open(path) as f:
        raw = json.load(f)
    return {name: deserialize(base64.b85decode(c["tdigest"])) for name, c in raw["columns"].items()}
