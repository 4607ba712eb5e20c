import functools

import numpy as np
import pandas as pd
import pytest

from ndap_data_validator_ray.functions import sketches as sk


def test_hll_accuracy_and_merge():
    vals = np.array([f"k{i}" for i in range(40000)], dtype=object)
    whole = sk.HyperLogLog()
    whole.update(vals)
    assert abs(whole.estimate() - 40000) / 40000 < 0.05
    parts = []
    for chunk in np.array_split(vals, 7):
        h = sk.HyperLogLog()
        h.update(chunk)
        parts.append(h)
    merged = functools.reduce(lambda a, b: a.merge(b), parts)
    assert np.array_equal(merged.registers, whole.registers)


def test_hll_merge_commutative_idempotent():
    a, b = sk.HyperLogLog(), sk.HyperLogLog()
    a.update(np.array(["x", "y", "z"], dtype=object))
    b.update(np.array(["y", "w"], dtype=object))
    ab, ba = a.merge(b), b.merge(a)
    assert np.array_equal(ab.registers, ba.registers)
    assert np.array_equal(ab.merge(ab).registers, ab.registers)  # idempotent union


def test_hll_small_range():
    h = sk.HyperLogLog()
    h.update(np.array(["a", "b", "c", "a"], dtype=object))
    assert round(h.estimate()) == 3


@pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform_int"])
def test_tdigest_quantiles(dist):
    rng = np.random.default_rng(3)
    if dist == "normal":
        v = rng.normal(50, 9, 100000)
    elif dist == "lognormal":
        v = rng.lognormal(3, 1, 100000)
    else:
        v = rng.integers(0, 500, 100000).astype(float)
    d = sk.TDigest()
    for c in np.array_split(v, 16):
        d.update(c)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(v, q)
        spread = np.quantile(v, min(q + 0.02, 1)) - np.quantile(v, max(q - 0.02, 0))
        assert abs(d.quantile(q) - exact) <= max(spread, 1e-9) + 1e-6, (q, d.quantile(q), exact)


def test_tdigest_merge_weight_and_extremes():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 30000)
    parts = []
    for c in np.array_split(v, 5):
        d = sk.TDigest()
        d.update(c)
        parts.append(d)
    m = functools.reduce(lambda a, b: a.merge(b), parts)
    assert m.total_weight() == pytest.approx(30000)
    assert m.min_val == v.min() and m.max_val == v.max()
    m2 = functools.reduce(lambda a, b: a.merge(b), reversed(parts))
    # merge is order-insensitive within digest accuracy
    for q in (0.05, 0.5, 0.95):
        assert abs(m.quantile(q) - m2.quantile(q)) < 0.05


def test_ks_psi_drift_detection():
    rng = np.random.default_rng(9)
    base = sk.TDigest(); base.update(rng.normal(100, 10, 50000))
    same = sk.TDigest(); same.update(rng.normal(100, 10, 50000))
    shifted = sk.TDigest(); shifted.update(rng.normal(130, 10, 50000))
    assert sk.ks_statistic(base, same) < 0.05
    assert sk.ks_statistic(base, shifted) > 0.5
    assert sk.psi_statistic(base, same) < 0.05
    assert sk.psi_statistic(base, shifted) > 1.0


def test_serialize_roundtrip():
    d = sk.TDigest()
    d.update(np.arange(1000, dtype=float))
    d2 = sk.deserialize(sk.serialize(d))
    assert d2.quantile(0.5) == d.quantile(0.5)


def test_countmin_never_undercounts_and_merges():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 5000, size=200_000)
    true = pd.Series(keys).value_counts()
    h = sk.stable_hash64(true.index.to_numpy())

    # split the stream in two, build partials, merge — same estimates
    cm_a, cm_b = sk.CountMin(width=4096, depth=4), sk.CountMin(width=4096, depth=4)
    half = len(keys) // 2
    for cm, part in ((cm_a, keys[:half]), (cm_b, keys[half:])):
        vc = pd.Series(part).value_counts()
        cm.add_hashes(sk.stable_hash64(vc.index.to_numpy()), vc.to_numpy())
    merged = cm_a.merge(cm_b)

    est = merged.estimate(h)
    assert (est >= true.to_numpy()).all()  # CM never under-counts
    # overestimate bounded in expectation: within ~2*N/width of the truth
    assert (est - true.to_numpy()).mean() < 2 * len(keys) / 4096
    # merge with empty is identity
    ident = merged.merge(sk.CountMin(width=4096, depth=4))
    np.testing.assert_array_equal(ident.counts, merged.counts)


def test_heavy_hitters_exact_over_threshold():
    import ray.data

    from ndap_data_validator_ray.stages.heavy import heavy_hitters

    rng = np.random.default_rng(5)
    keys = np.concatenate([rng.integers(0, 3000, size=30_000),  # background
                           np.repeat([7001, 7002, 7003], [500, 120, 60])])
    rng.shuffle(keys)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    got = heavy_hitters(ds, "k", threshold=60, count_col="cnt").to_pandas()
    true = pd.Series(keys).value_counts()
    want = true[true >= 60].sort_index()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want.index.tolist()
    assert got["cnt"].tolist() == want.to_numpy().tolist()  # exact counts


def test_quantile_from_counts_matches_numpy():
    from ndap_data_validator_ray.pipelines.queries import _quantile_from_counts

    rng = np.random.default_rng(11)
    for _ in range(50):
        vals = rng.integers(1, 20, size=int(rng.integers(1, 200)))
        vc = pd.Series(vals).value_counts().sort_index()
        for q in (0.0, 0.25, 0.5, 0.75, 1.0):
            got = _quantile_from_counts(vc.index.to_numpy(), vc.to_numpy(), q)
            assert abs(got - float(np.quantile(vals, q))) < 1e-9
    # single-value histogram and empty histogram
    assert _quantile_from_counts(np.array([7]), np.array([3]), 0.5) == 7.0
    assert np.isnan(_quantile_from_counts(np.array([]), np.array([]), 0.5))
