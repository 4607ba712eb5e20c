"""Round-5 fourth-wave gates: Heaps vocabulary growth, Spearman rank
correlation, source-pair MinHash similarity, KMV set-overlap sketch,
scalar embedding quantization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


# --- Heaps vocabulary growth --------------------------------------------------

def test_vocab_growth_exact_power_law(tmp_path):
    """Planted corpus where every doc adds exactly 2 new tokens and
    repeats 2 old ones: cum_vocab = 2r and cum_tokens = 4r at every doc
    rank r, so ln(cumv) on ln(cumt) is an exact line with slope 1."""
    from ndap_data_validator_ray.pipelines.queries import vocab_growth_documents

    n = 40
    texts = [f"a{i} b{i} a{i} b{i}" for i in range(n)]
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"), row_group_size=7)
    out = vocab_growth_documents(str(tmp_path))
    assert int(out["n_docs"].iloc[0]) == n
    assert int(out["total_tokens"].iloc[0]) == 4 * n
    assert int(out["n_vocab"].iloc[0]) == 2 * n
    assert int(out["n_points"].iloc[0]) == n  # step=1 at 40 docs
    assert abs(float(out["heaps_slope"].iloc[0]) - 1.0) < 1e-9


def test_vocab_growth_first_doc_wins_across_blocks(tmp_path):
    """A token appearing in many docs counts as new only at its MINIMUM
    doc_id even when the docs land in different row groups / blocks."""
    from ndap_data_validator_ray.pipelines.queries import vocab_growth_documents

    n = 30
    texts = [f"shared tok{i}" for i in range(n)]
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"), row_group_size=3)
    out = vocab_growth_documents(str(tmp_path))
    # vocab = n unique tok{i} + 1 shared token
    assert int(out["n_vocab"].iloc[0]) == n + 1
    assert int(out["total_tokens"].iloc[0]) == 2 * n


# --- Spearman rank correlation ------------------------------------------------

def _write_lineitem(tmp_path, qty, price):
    tbl = pa.table(
        {
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array(price, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"), row_group_size=11)


def test_spearman_perfect_monotone(tmp_path):
    from ndap_data_validator_ray.pipelines.queries import spearman_price_quantity

    n = 60
    _write_lineitem(tmp_path, [float(i + 1) for i in range(n)], [2.0 * i + 5.0 for i in range(n)])
    out = spearman_price_quantity(str(tmp_path))
    assert int(out["n_rows"].iloc[0]) == n
    assert abs(float(out["spearman_rho"].iloc[0]) - 1.0) < 1e-9


def test_spearman_ties_match_pandas(tmp_path):
    """With heavy ties on both sides the engine matches pandas'
    average-rank Spearman (rank(method='average') then Pearson)."""
    from ndap_data_validator_ray.pipelines.queries import spearman_price_quantity

    rng = np.random.RandomState(7)
    n = 200
    qty = rng.randint(1, 8, n).astype(np.float64)
    price = (qty * 3 + rng.randint(0, 5, n)).astype(np.float64)
    _write_lineitem(tmp_path, qty.tolist(), price.tolist())
    out = spearman_price_quantity(str(tmp_path))
    rq = pd.Series(np.round(qty * 100)).rank(method="average")
    rp = pd.Series(np.round(price * 100)).rank(method="average")
    expect = float(np.corrcoef(rq, rp)[0, 1])
    assert abs(float(out["spearman_rho"].iloc[0]) - round(expect, 6)) < 2e-6


# --- Source-pair MinHash similarity -------------------------------------------

def test_source_minhash_identical_and_disjoint(tmp_path):
    from ndap_data_validator_ray.pipelines.queries import source_minhash_similarity

    rows = []
    # s0 and s1 share the exact token set; s2 is disjoint
    for i in range(10):
        rows.append(("s0", f"tok{i} tok{i + 1}"))
        rows.append(("s1", f"tok{i + 1} tok{i}"))
        rows.append(("s2", f"zzz{i} zzz{i + 1}"))
    df = pd.DataFrame(rows, columns=["source", "text"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"),
                   row_group_size=5)
    out = source_minhash_similarity(str(tmp_path)).set_index(["source_a", "source_b"])
    same = out.loc[("s0", "s1")]
    assert float(same["exact_jaccard"]) == 1.0
    assert float(same["est_jaccard"]) == 1.0  # identical sets -> identical sigs
    disj = out.loc[("s0", "s2")]
    assert float(disj["exact_jaccard"]) == 0.0
    assert int(disj["n_inter"]) == 0


# --- KMV set-overlap sketch ----------------------------------------------------

def test_kmv_overlap_exact_branch(tmp_path):
    """Fewer than k=128 users per set: every estimate degrades to the
    exact value by construction (sketches hold the full sets)."""
    from ndap_data_validator_ray.pipelines.queries import kmv_user_overlap_event_types

    rows = []
    for u in range(40):
        rows.append((u, "click"))
    for u in range(20, 50):  # 20 overlap, 10 purchase-only
        rows.append((u, "purchase"))
    for u in range(100, 110):
        rows.append((u, "view"))  # ignored type
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=13)
    out = kmv_user_overlap_event_types(str(tmp_path))
    assert int(out["n_click_exact"].iloc[0]) == 40
    assert int(out["n_purchase_exact"].iloc[0]) == 30
    assert int(out["n_both_exact"].iloc[0]) == 20
    assert float(out["est_click"].iloc[0]) == 40.0
    assert float(out["est_purchase"].iloc[0]) == 30.0
    assert float(out["est_union"].iloc[0]) == 50.0
    assert float(out["est_inter"].iloc[0]) == 20.0
    assert abs(float(out["est_jaccard"].iloc[0]) - 0.4) < 1e-9


def test_kmv_overlap_flags_merge_across_blocks(tmp_path):
    """A user whose click and purchase events land in different row
    groups must still be counted in the intersection (flag OR-merge)."""
    from ndap_data_validator_ray.pipelines.queries import kmv_user_overlap_event_types

    rows = [(1, "click"), (2, "click"), (3, "click"), (4, "click"),
            (5, "view"), (6, "view"), (7, "view"), (8, "view"),
            (1, "purchase"), (9, "purchase"), (10, "purchase"), (11, "purchase")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=4)  # click in rg0, purchase in rg2
    out = kmv_user_overlap_event_types(str(tmp_path))
    assert int(out["n_both_exact"].iloc[0]) == 1
    assert float(out["est_inter"].iloc[0]) == 1.0


# --- Scalar embedding quantization ---------------------------------------------

def test_embedding_quantization_codes_exact(tmp_path):
    """Hand-checkable plant: dim0 spans [0, 254] so scale=1 and codes
    equal the rounded values; dim1 is constant (degenerate -> code 127,
    zero error)."""
    from ndap_data_validator_ray.pipelines.queries import embedding_quantization_stats

    vecs = [[0.0, 5.0], [254.0, 5.0], [100.25, 5.0], [100.75, 5.0]]
    tbl = pa.table(
        {
            "label": pa.array([0, 0, 1, 1], pa.int32()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"), row_group_size=2)
    out = embedding_quantization_stats(str(tmp_path)).set_index("label")
    # label 0: codes (0, 127) and (254, 127); label 1: (100, 127) and (101, 127)
    assert int(out.loc[0, "sum_code"]) == 0 + 254 + 127 + 127
    assert int(out.loc[1, "sum_code"]) == 100 + 101 + 127 + 127
    assert int(out.loc[0, "n_min_code"]) == 1
    assert int(out.loc[0, "n_max_code"]) == 1
    # dim0 scale is exactly 1.0 -> worst error is |100.75 - 101| = 0.25
    assert abs(float(out.loc[1, "max_abs_err"]) - 0.25) < 1e-9
    assert float(out.loc[0, "max_abs_err"]) == 0.0


def test_embedding_quantization_error_bound(tmp_path):
    """Random vectors: every reconstruction error is bounded by half a
    quantization step of its dimension."""
    from ndap_data_validator_ray.pipelines.queries import embedding_quantization_stats

    rng = np.random.RandomState(3)
    m = rng.uniform(-4, 9, size=(50, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "label": pa.array(rng.randint(0, 3, 50), pa.int32()),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"), row_group_size=16)
    out = embedding_quantization_stats(str(tmp_path))
    md = m.astype(np.float64)
    step = (md.max(axis=0) - md.min(axis=0)).max() / 254.0
    assert (out["max_abs_err"] <= step / 2.0 + 1e-12).all()
    assert int(out["n_vals"].sum()) == 50 * 64


# --- AMS F2 sketch ---------------------------------------------------------------

def test_ams_f2_exact_and_sketch_bounds(tmp_path):
    """Planted frequencies: exact F2 is the known sum of squares; each
    AMS estimator is unbiased so the lower median must land within the
    (loose) 16-estimator concentration band around F2 — and be exactly
    reproducible (pure function of md5 bits)."""
    from ndap_data_validator_ray.pipelines.queries import ams_f2_user_events

    rows = []
    freqs = {1: 10, 2: 5, 3: 1, 4: 1, 5: 3}
    for u, f in freqs.items():
        rows.extend([(u,)] * f)
    df = pd.DataFrame(rows, columns=["user_id"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=7)
    out = ams_f2_user_events(str(tmp_path))
    f2 = sum(v * v for v in freqs.values())
    assert int(out["f2_exact"].iloc[0]) == f2
    again = ams_f2_user_events(str(tmp_path))
    assert int(again["f2_est_median"].iloc[0]) == int(out["f2_est_median"].iloc[0])
    # estimator sanity: median of squares of Σ±f must be within [0, (Σf)²]
    n = sum(freqs.values())
    assert 0 <= int(out["f2_est_median"].iloc[0]) <= n * n


def test_ams_f2_single_user_is_exact(tmp_path):
    """One user with f events: every estimator is (±f)² = f² exactly, so
    median and mean BOTH equal the exact F2 — the degenerate case that
    pins the sign-sum algebra."""
    from ndap_data_validator_ray.pipelines.queries import ams_f2_user_events

    df = pd.DataFrame({"user_id": [7] * 9})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=4)
    out = ams_f2_user_events(str(tmp_path))
    assert int(out["f2_exact"].iloc[0]) == 81
    assert int(out["f2_est_median"].iloc[0]) == 81
    assert float(out["f2_est_mean"].iloc[0]) == 81.0


# --- Session path mining -----------------------------------------------------------

def test_session_paths_gap_and_truncation(tmp_path):
    """One user, two sessions split by a >30min gap; the first session
    has 4 events (path truncates to 3), the second has 2."""
    from ndap_data_validator_ray.pipelines.queries import session_paths_events

    t0 = pd.Timestamp("2024-01-01 09:00:00")
    rows = [
        (1, t0, 1, "view"),
        (1, t0 + pd.Timedelta(minutes=5), 2, "click"),
        (1, t0 + pd.Timedelta(minutes=10), 3, "view"),
        (1, t0 + pd.Timedelta(minutes=12), 4, "purchase"),  # 4th -> truncated
        (1, t0 + pd.Timedelta(minutes=50), 5, "signup"),  # new session
        (1, t0 + pd.Timedelta(minutes=55), 6, "error"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=2)
    out = session_paths_events(str(tmp_path)).set_index("path")["cnt"]
    assert int(out["view>click>view"]) == 1
    assert int(out["signup>error"]) == 1
    assert len(out) == 2


def test_session_paths_same_ts_tiebreak(tmp_path):
    """Two events sharing a timestamp order by event_id — deterministic
    path strings under ties."""
    from ndap_data_validator_ray.pipelines.queries import session_paths_events

    t0 = pd.Timestamp("2024-01-01 09:00:00")
    rows = [(1, t0, 20, "click"), (1, t0, 10, "view"), (2, t0, 5, "view"), (2, t0, 4, "click")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"),
                   row_group_size=1)
    out = session_paths_events(str(tmp_path)).set_index("path")["cnt"]
    assert int(out["view>click"]) == 1  # user 1: event_id 10 first
    assert int(out["click>view"]) == 1  # user 2: event_id 4 first
