"""Round-5 fifth-wave gates: integer HITS hubs/authorities, Theil-Sen
robust trend, the DuckDB-bit-exact Jaro-Winkler kernel, and the exact
histogram trimmed mean."""

import datetime
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


# --- Jaro-Winkler kernel: bit-equality vs the DuckDB builtin ------------------

def test_jaro_winkler_bit_exact_vs_duckdb():
    """The whole point of the kernel is that the oracle can use the SQL
    builtin: every float must be IDENTICAL (no tolerance).  Edge cases +
    seeded fuzz over a small alphabet (maximizes matches/transpositions
    and short-string window clamping)."""
    import duckdb

    from ndap_data_validator_ray.functions.strdist import jaro_winkler_batch

    rng = random.Random(20260820)
    alpha = "abcde "
    pairs = [
        ("", ""), ("a", ""), ("", "a"), ("a", "a"), ("ab", "ba"), ("b", "ba"),
        ("CRAZY", "crazy"), ("aa", "aaaa"), ("martha", "marhta"),
        ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ]
    for _ in range(1000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.3:
            b = a[: rng.randint(0, len(a))] + b
        pairs.append((a, b))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", pairs)
    duck = np.array(
        [r[0] for r in con.execute("SELECT jaro_winkler_similarity(a,b) FROM p").fetchall()]
    )
    mine = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    mism = np.nonzero(mine != duck)[0]
    assert len(mism) == 0, [(pairs[i], duck[i], mine[i]) for i in mism[:5]]


# --- integer HITS ---------------------------------------------------------------

def _write_bipartite(tmp_path):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([101, 102], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    # duplicate (101, 10) lineitem row: edges must dedup before HITS
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([101, 101, 101, 102, 102, 102], pa.int64()),
                "l_partkey": pa.array([10, 20, 10, 10, 20, 30], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
        row_group_size=2,
    )


def test_hits_planted_bipartite(tmp_path):
    """c1-{10,20}, c2-{10,20,30}: auth1 = part degree (2,2,1); hub1 =
    (4,5); auth2 = (9,9,5) — exact ints, duplicate edge collapsed."""
    from ndap_data_validator_ray.pipelines.queries import hits_copurchase_parts

    _write_bipartite(tmp_path)
    out = hits_copurchase_parts(str(tmp_path))
    assert out["l_partkey"].tolist() == [10, 20, 30]
    assert out["auth1"].tolist() == [2, 2, 1]
    assert out["auth2"].tolist() == [9, 9, 5]
    assert str(out["auth2"].dtype) == "int64"


# --- Theil-Sen -------------------------------------------------------------------

def _write_orders_daily(tmp_path, day_cents: dict[int, int]):
    days = sorted(day_cents)
    epoch = datetime.date(1970, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(
                    [epoch + datetime.timedelta(days=d) for d in days], pa.date32()
                ),
                "o_totalprice": pa.array([day_cents[d] / 100.0 for d in days], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
        row_group_size=3,
    )


def test_theil_sen_exact_line(tmp_path):
    from ndap_data_validator_ray.pipelines.queries import theil_sen_daily_revenue

    _write_orders_daily(tmp_path, {d: 100 + 7 * d for d in range(10)})
    out = theil_sen_daily_revenue(str(tmp_path))
    assert int(out["n_days"].iloc[0]) == 10
    assert int(out["n_pairs"].iloc[0]) == 45
    assert float(out["slope_cents_per_day"].iloc[0]) == 7.0
    assert float(out["intercept_cents"].iloc[0]) == 100.0


def test_theil_sen_robust_to_outlier(tmp_path):
    """One wild day: <50% of pairwise slopes touch it, so the median
    slope/intercept are untouched — the property OLS lacks."""
    from ndap_data_validator_ray.pipelines.queries import theil_sen_daily_revenue

    series = {d: 100 + 7 * d for d in range(10)}
    series[20] = 10_000_000
    _write_orders_daily(tmp_path, series)
    out = theil_sen_daily_revenue(str(tmp_path))
    assert int(out["n_days"].iloc[0]) == 11
    assert float(out["slope_cents_per_day"].iloc[0]) == 7.0
    assert float(out["intercept_cents"].iloc[0]) == 100.0


# --- trimmed mean -----------------------------------------------------------------

def test_trimmed_mean_exact_trim_and_small_group(tmp_path):
    """Flag A (n=40, trim 2/side): both outliers plus one nominal value
    per side drop, kept mean is exactly 10.00; flag B (n=5 < 20) trims
    nothing — plain mean."""
    from ndap_data_validator_ray.pipelines.queries import trimmed_mean_price_by_flag

    a_vals = [10.00] * 38 + [0.01, 9999.99]
    b_vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"] * len(a_vals) + ["B"] * len(b_vals)),
                "l_extendedprice": pa.array(a_vals + b_vals, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
        row_group_size=7,
    )
    out = trimmed_mean_price_by_flag(str(tmp_path))
    a = out[out["l_returnflag"] == "A"].iloc[0]
    assert int(a["n_kept"]) == 36
    assert int(a["lo_cut_cents"]) == 1000 and int(a["hi_cut_cents"]) == 1000
    assert float(a["trimmed_mean"]) == 10.0
    b = out[out["l_returnflag"] == "B"].iloc[0]
    assert int(b["n_kept"]) == 5
    assert int(b["lo_cut_cents"]) == 100 and int(b["hi_cut_cents"]) == 10000
    assert float(b["trimmed_mean"]) == 22.0


def test_trimmed_mean_boundary_cell_split(tmp_path):
    """The trim boundary lands INSIDE a histogram cell: 20 copies of
    1.00 and 20 of 2.00 (n=40, trim 2/side) must drop exactly 2 rows
    from each cell, not whole cells."""
    from ndap_data_validator_ray.pipelines.queries import trimmed_mean_price_by_flag

    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"] * 40),
                "l_extendedprice": pa.array([1.0] * 20 + [2.0] * 20, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
        row_group_size=9,
    )
    out = trimmed_mean_price_by_flag(str(tmp_path))
    a = out.iloc[0]
    assert int(a["n_kept"]) == 36
    # kept: 18 x 100c + 18 x 200c -> mean 1.50
    assert float(a["trimmed_mean"]) == 1.5
    assert int(a["lo_cut_cents"]) == 100 and int(a["hi_cut_cents"]) == 200


# --- HLL weekly rollup --------------------------------------------------------

def test_hll_rollup_week_boundary_and_exact_counts(tmp_path):
    """Epoch day 3 (Sun) and day 4 (Mon) land in different Monday-truncated
    weeks; a user active on two days of one week counts once; a user
    active in both weeks counts in each."""
    from ndap_data_validator_ray.pipelines.queries import hll_rollup_weekly_users

    ts = pd.to_datetime(
        [
            "1970-01-03 10:00",  # Sat, epoch day 2, week 0
            "1970-01-04 11:00",  # Sun, epoch day 3, week 0
            "1970-01-04 12:00",  # Sun again, same user -> still 1 distinct
            "1970-01-05 09:00",  # Mon, epoch day 4, week 1
        ]
    )
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            }
        ),
        str(tmp_path / "events.parquet"),
        row_group_size=2,
    )
    out = hll_rollup_weekly_users(str(tmp_path))
    assert out["week"].tolist() == [0, 1]
    assert out["n_days"].tolist() == [2, 1]
    assert out["n_users"].tolist() == [1, 1]
    # one distinct user -> one touched register -> small-range branch
    import math
    expect = round(128.0 * math.log(128.0 / 127.0), 6)
    assert float(out["hll_est"].iloc[0]) == expect
    assert float(out["hll_est"].iloc[1]) == expect


# --- integer SPRT ----------------------------------------------------------------

def _write_orders_priority(tmp_path, priorities):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, len(priorities) + 1), pa.int64()),
                "o_orderpriority": pa.array(priorities),
            }
        ),
        str(tmp_path / "orders.parquet"),
        row_group_size=13,
    )


def test_sprt_crosses_upper_boundary(tmp_path):
    """All-urgent stream: s = 4k crosses +200 exactly at k = 50."""
    from ndap_data_validator_ray.pipelines.queries import sprt_urgent_share_orders

    _write_orders_priority(tmp_path, ["1-URGENT"] * 60)
    out = sprt_urgent_share_orders(str(tmp_path))
    assert out["decision"].iloc[0] == "accept_h1"
    assert int(out["n_seen"].iloc[0]) == 50
    assert int(out["score"].iloc[0]) == 200


def test_sprt_crosses_lower_boundary(tmp_path):
    """No-urgent stream: s = -k crosses -200 exactly at k = 200."""
    from ndap_data_validator_ray.pipelines.queries import sprt_urgent_share_orders

    _write_orders_priority(tmp_path, ["3-MEDIUM"] * 250)
    out = sprt_urgent_share_orders(str(tmp_path))
    assert out["decision"].iloc[0] == "accept_h0"
    assert int(out["n_seen"].iloc[0]) == 200
    assert int(out["score"].iloc[0]) == -200


def test_sprt_no_decision(tmp_path):
    from ndap_data_validator_ray.pipelines.queries import sprt_urgent_share_orders

    _write_orders_priority(tmp_path, ["3-MEDIUM"] * 10)
    out = sprt_urgent_share_orders(str(tmp_path))
    assert out["decision"].iloc[0] == "no_decision"
    assert int(out["n_seen"].iloc[0]) == 10
    assert int(out["score"].iloc[0]) == -10
