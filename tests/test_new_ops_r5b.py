"""Round-5 third-wave gates: Holt level/trend smoothing, exact grouped
skewness/kurtosis, reciprocal-rank fusion (cosine + L2 legs), token
frequency spectrum, two-proportion z-test."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

SF = "/root/testdata/sf0.001"


# --- Holt double-exponential smoothing ---------------------------------------

def test_holt_tracks_exact_linear_series(tmp_path):
    """On an exactly linear daily series the Holt recurrence with
    l0=x0, b0=x1-x0 reproduces the line: level == revenue every day and
    trend == the constant slope."""
    from ndap_data_validator_ray.pipelines.queries import holt_trend_daily_revenue

    n, base, slope = 25, 100.0, 7.0
    prices = [base + slope * i for i in range(n)]
    dates = np.arange(n, dtype=np.int64).astype("datetime64[D]").astype("datetime64[us]")
    tbl = pa.table(
        {"o_orderdate": pa.array(dates), "o_totalprice": pa.array(prices, pa.float64())}
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"), row_group_size=4)
    out = holt_trend_daily_revenue(str(tmp_path))
    assert len(out) == n
    np.testing.assert_allclose(out["level"].to_numpy(), out["revenue"].to_numpy())
    np.testing.assert_allclose(out["trend"].to_numpy(), np.full(n, slope))


def test_holt_recurrence_replay(tmp_path):
    """On a noisy planted series the emitted (level, trend) follow the
    a=0.5 / g=0.25 coupled recurrence exactly (replayed in cents)."""
    from ndap_data_validator_ray.pipelines.queries import holt_trend_daily_revenue

    rng = np.random.default_rng(3)
    prices = np.round(rng.uniform(50, 150, 16), 2)
    dates = np.arange(16, dtype=np.int64).astype("datetime64[D]").astype("datetime64[us]")
    tbl = pa.table(
        {"o_orderdate": pa.array(dates), "o_totalprice": pa.array(prices, pa.float64())}
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"), row_group_size=3)
    out = holt_trend_daily_revenue(str(tmp_path))
    x = np.round(prices * 100).astype(np.int64).astype(np.float64)
    l, b = x[0], x[1] - x[0]
    exp_l, exp_b = [l], [b]
    for i in range(1, 16):
        l_new = 0.5 * x[i] + 0.5 * (l + b)
        b = 0.25 * (l_new - l) + 0.75 * b
        l = l_new
        exp_l.append(l)
        exp_b.append(b)
    np.testing.assert_allclose(out["level"].to_numpy(), np.round(np.array(exp_l) / 100, 2))
    np.testing.assert_allclose(out["trend"].to_numpy(), np.round(np.array(exp_b) / 100, 2))


# --- grouped skewness / excess kurtosis --------------------------------------

def test_skew_kurtosis_known_distributions(tmp_path):
    """Planted two-flag table: a symmetric flag has skewness 0 and the
    two-point flag {a,a,b,b} has excess kurtosis exactly -2 (Bernoulli
    p=1/2); both replay the population-moment formulas."""
    from ndap_data_validator_ray.pipelines.queries import skew_kurtosis_quantity_by_flag

    sym = [1, 2, 2, 3, 3, 3, 4, 4, 5]  # symmetric around 3
    two = [10, 10, 40, 40]  # Bernoulli-like: g2 = -2
    flags = ["A"] * len(sym) + ["B"] * len(two)
    qty = sym + two
    tbl = pa.table(
        {
            "l_returnflag": pa.array(flags),
            "l_quantity": pa.array([float(v) for v in qty], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"), row_group_size=3)
    out = skew_kurtosis_quantity_by_flag(str(tmp_path)).set_index("l_returnflag")
    assert out.loc["A", "skewness"] == 0.0
    assert out.loc["B", "kurtosis_excess"] == -2.0
    # replay flag A's kurtosis from raw population moments
    a = np.array(sym, dtype=np.float64)
    m2 = ((a - a.mean()) ** 2).mean()
    m4 = ((a - a.mean()) ** 4).mean()
    np.testing.assert_allclose(out.loc["A", "kurtosis_excess"], m4 / m2**2 - 3.0, atol=1e-8)


def test_skew_kurtosis_matches_pandas_on_fixture():
    """Fixture run agrees with a single-process population-moment
    recomputation (pandas) to rounding tolerance."""
    from ndap_data_validator_ray.pipelines.queries import skew_kurtosis_quantity_by_flag

    got = skew_kurtosis_quantity_by_flag(SF).set_index("l_returnflag")
    df = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]).to_pandas()
    for flag, g in df.groupby("l_returnflag"):
        q = np.round(g["l_quantity"].to_numpy(np.float64))
        m = q.mean()
        m2 = ((q - m) ** 2).mean()
        m3 = ((q - m) ** 3).mean()
        m4 = ((q - m) ** 4).mean()
        assert int(got.loc[flag, "n_rows"]) == len(q)
        np.testing.assert_allclose(got.loc[flag, "skewness"], m3 / m2**1.5, atol=1e-6)
        np.testing.assert_allclose(got.loc[flag, "kurtosis_excess"], m4 / m2**2 - 3.0, atol=1e-6)


# --- reciprocal-rank fusion ---------------------------------------------------

def test_brute_force_l2_metric_matches_numpy():
    """metric='l2' ranks by exact Euclidean distance (ties by id): verify
    against a full numpy recomputation on the fixture."""
    from ndap_data_validator_ray.pipelines.queries import _query_vectors, _read
    from ndap_data_validator_ray.stages.similarity import brute_force_topk

    qids, qmat = _query_vectors(SF)
    ds = _read(SF, "embeddings", columns=["vec_id", "embedding"])
    got = brute_force_topk(ds, qids, qmat, k=10, concurrency=2, metric="l2")
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy(np.int64)
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qids):
        d = np.sqrt(((mat - qmat[qi]) ** 2).sum(axis=1))
        order = np.lexsort((ids, d))[:10]
        want = ids[order]
        have = got[got["query_id"] == qid].sort_values("rank")["neighbor_id"].to_numpy(np.int64)
        np.testing.assert_array_equal(have, want)


def test_rrf_fusion_replay():
    """The fused top-10 replays exactly from the two legs' rank lists:
    score = sum of 1/(60+rank) over the lists containing the candidate,
    ties by neighbor_id."""
    from ndap_data_validator_ray.pipelines.queries import (
        _query_vectors,
        _read,
        knn_rrf_fusion,
    )
    from ndap_data_validator_ray.stages.similarity import brute_force_topk

    got = knn_rrf_fusion(SF)
    qids, qmat = _query_vectors(SF)
    ds = _read(SF, "embeddings", columns=["vec_id", "embedding"])
    cos = brute_force_topk(ds, qids, qmat, k=20, concurrency=2)
    l2 = brute_force_topk(ds, qids, qmat, k=20, concurrency=2, metric="l2")
    for qid in qids:
        scores: dict[int, float] = {}
        for leg in (cos, l2):
            for _, r in leg[leg["query_id"] == qid].iterrows():
                scores[int(r["neighbor_id"])] = scores.get(int(r["neighbor_id"]), 0.0) + 1.0 / (
                    60.0 + float(r["rank"])
                )
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        sub = got[got["query_id"] == qid].sort_values("fused_rank")
        np.testing.assert_array_equal(
            sub["neighbor_id"].to_numpy(np.int64), np.array([w[0] for w in want], np.int64)
        )
        np.testing.assert_allclose(
            sub["rrf_score"].to_numpy(), np.round([w[1] for w in want], 9), atol=1e-12
        )


# --- token frequency spectrum --------------------------------------------------

def test_token_freq_spectrum_planted(tmp_path):
    """Planted corpus with known token frequencies {a:1, b:2, c:2, d:5}:
    the spectrum is [(1,1), (2,2), (5,1)] with shares over vocab=4."""
    from ndap_data_validator_ray.pipelines.queries import token_freq_spectrum_documents

    docs = ["a b c", "b c d d", "d d d", None, ""]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs, pa.string())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"), row_group_size=2)
    out = token_freq_spectrum_documents(str(tmp_path))
    assert out["freq"].tolist() == [1, 2, 5]
    assert out["n_types"].tolist() == [1, 2, 1]
    np.testing.assert_allclose(out["type_share"].to_numpy(), np.round([1 / 4, 2 / 4, 1 / 4], 9))


# --- two-proportion z-test -----------------------------------------------------

def test_ztest_hand_computed(tmp_path):
    """Planted counts (urgent 3/6 finished, low 1/4 finished) replay the
    pooled two-proportion z formula."""
    from ndap_data_validator_ray.pipelines.queries import ztest_finished_share_priority

    rows = [("1-URGENT", "F")] * 3 + [("1-URGENT", "O")] * 3 + [("5-LOW", "F")] + [
        ("5-LOW", "O")
    ] * 3 + [("3-MEDIUM", "F")] * 5  # other priorities must be ignored
    tbl = pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows]),
            "o_orderstatus": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"), row_group_size=3)
    out = ztest_finished_share_priority(str(tmp_path))
    assert out.loc[0, "n_urgent"] == 6 and out.loc[0, "finished_urgent"] == 3
    assert out.loc[0, "n_low"] == 4 and out.loc[0, "finished_low"] == 1
    p1, p2, pp = 3 / 6, 1 / 4, 4 / 10
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / 6 + 1 / 4))
    np.testing.assert_allclose(out.loc[0, "z_score"], round(z, 9))
