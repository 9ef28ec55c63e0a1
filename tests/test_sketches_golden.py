"""Golden-vector replay of the reference test suite (FIXTURES.md §A).

Every vector here is lifted from the reference's own tests:
library/tests/test_*.c and lua_binding/tests/test.lua.
"""

import math

import numpy as np
import pytest

from streaming_algorithms_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    Matrix,
    P2Histogram,
    P2Quantile,
    RunningStats,
    TimeSeries,
    anomaly_from_profile,
)

# --------------------------------------------------------------------------
# A1 — Count-Min sketch (library/tests/test_cm_sketch.c:36-120, test.lua:171-192)
# --------------------------------------------------------------------------


def test_cms_creation_params():
    sk = CountMinSketch(0.1, 0.1, mode="conservative")
    assert sk.width == 28 and sk.depth == 3
    with pytest.raises(ValueError):
        CountMinSketch(0.0, 0.1)
    with pytest.raises(ValueError):
        CountMinSketch(0.1, 1.0)


def test_cms_golden_sequence():
    sk = CountMinSketch(0.1, 0.1, mode="conservative")
    assert sk.update("a", -10) == 0
    assert sk.item_count == 0 and sk.unique_count == 0
    sk.update("c", 6)
    sk.update("a", 1)
    sk.update("b", 2)
    sk.update("c", -3)
    sk.update(2, 1)  # number key: 8-byte LE double
    assert sk.item_count == 7
    assert sk.unique_count == 4
    assert sk.point_query("a") == 1
    assert sk.point_query("b") == 2
    assert sk.point_query("c") == 3
    assert sk.update("c", -4) == 0
    assert sk.item_count == 4
    assert sk.unique_count == 3


def test_cms_serialize_roundtrip():
    sk = CountMinSketch(0.1, 0.1, mode="conservative")
    for key, n in [("x", 5), ("y", 2), ("z", 9)]:
        sk.update(key, n)
    buf = sk.to_bytes()
    assert len(buf) == 16 + 4 * 28 * 3
    back = CountMinSketch.from_bytes(buf, width=28, depth=3, mode="conservative")
    assert back.item_count == sk.item_count
    assert back.unique_count == sk.unique_count
    assert np.array_equal(back.counts, sk.counts)
    assert back.to_bytes() == buf


def test_cms_standard_batch_equals_sequential_standard():
    keys = [f"k{i % 17}" for i in range(500)]
    a = CountMinSketch(0.01, 0.01)
    a.update_batch(keys)
    b = CountMinSketch(0.01, 0.01)
    for k in keys:
        b.update(k, 1)
    assert np.array_equal(a.counts, b.counts)
    # standard CM never underestimates and meets the bound easily here
    assert a.point_query("k3") >= keys.count("k3")


# --------------------------------------------------------------------------
# A2 — P² quantile & histogram (library/tests/test_p2.c:47-104, test.lua:99-125)
# --------------------------------------------------------------------------

P2_DATA = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62, 15.92,
           34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42, 0.09, 11.37]
P2_MARKERS = [0.02, 0.493895, 4.44063, 17.2039, 38.62]
P2_COUNTS = [1, 6, 10, 16, 20]


def test_p2_quantile_golden():
    q = P2Quantile(0.5)
    assert math.isnan(q.estimate())
    for i, x in enumerate(P2_DATA):
        r = q.add(x)
        if i < 4:
            assert math.isnan(r)
    for m in range(5):
        assert q.estimate(m) == pytest.approx(P2_MARKERS[m], abs=1e-5)
        assert q.count(m) == P2_COUNTS[m]


def test_p2_histogram_golden():
    h = P2Histogram(4)
    for x in P2_DATA:
        h.add(x)
    for m in range(5):
        assert h.estimate(m) == pytest.approx(P2_MARKERS[m], abs=1e-5)
        assert h.count(m) == P2_COUNTS[m]


def test_p2_serialize_roundtrip():
    q = P2Quantile(0.5)
    for x in P2_DATA:
        q.add(x)
    back = P2Quantile.from_bytes(q.to_bytes())
    assert back.estimate(2) == q.estimate(2)
    assert back.to_bytes() == q.to_bytes()
    h = P2Histogram(4)
    for x in P2_DATA:
        h.add(x)
    hb = P2Histogram.from_bytes(h.to_bytes())
    assert hb.estimate(2) == h.estimate(2)
    with pytest.raises(ValueError):
        P2Quantile.from_bytes(q.to_bytes()[:-1])  # rc 1: bad length


# --------------------------------------------------------------------------
# A3 — running stats (library/tests/test_running_stats.c:39-75, test.lua:28-51)
# --------------------------------------------------------------------------


def test_running_stats_golden_small():
    rs = RunningStats()
    for x in (1.0, 2.0, 3.0):
        rs.add(x)
    assert rs.count == 3
    assert rs.mean == pytest.approx(2.0)
    assert rs.sd() == pytest.approx(1.0)
    assert rs.usd() == pytest.approx(0.816497, abs=1e-6)
    assert rs.variance() == pytest.approx(1.0)


def test_running_stats_golden_1_to_10():
    rs = RunningStats()
    rs.update_batch(np.arange(1.0, 11.0))
    assert rs.count == 10
    assert rs.mean == pytest.approx(5.5)
    assert rs.sd() == pytest.approx(3.02765, abs=1e-5)
    assert rs.usd() == pytest.approx(2.87228, abs=1e-5)
    assert rs.variance() == pytest.approx(9.16667, abs=1e-5)


def test_running_stats_skips_nonfinite():
    rs = RunningStats()
    rs.add(math.inf)
    rs.add(math.nan)
    rs.add(-math.inf)
    assert rs.count == 0
    rs.update_batch([math.nan, 1.0, math.inf, 3.0])
    assert rs.count == 2 and rs.mean == pytest.approx(2.0)


def test_running_stats_chan_merge_exact():
    xs = np.random.default_rng(7).normal(10, 3, 10_000)
    full = RunningStats()
    full.update_batch(xs)
    parts = [RunningStats() for _ in range(8)]
    for i, p in enumerate(parts):
        p.update_batch(xs[i::8])
    merged = RunningStats()
    for p in parts:
        merged.merge(p)
    assert merged.count == full.count
    assert merged.mean == pytest.approx(full.mean, rel=1e-12)
    assert merged.variance() == pytest.approx(full.variance(), rel=1e-10)
    back = RunningStats.from_bytes(merged.to_bytes())
    assert back.mean == merged.mean


# --------------------------------------------------------------------------
# A4 — time series + matrix profile (library/tests/test_time_series.c:672-809,
#       test.lua:253-414)
# --------------------------------------------------------------------------

MP_DATA = [132, 161, 144, 145, 31, 44, 47, 26, 232, 236, 254, 262, 339, 360,
           313, 340, 1]
MP_GOLD = [1.5010956572519172, 1.7133271671869412, 1.4465117438199946,
           2.2386180615118265, 1.4207401525040495, 0.62038241908389491,
           0.39903111714324457, 1.0783010406460811, 0.17635816443144478,
           0.62038241908389491, 0.17635816443144478, 1.0783010406460811,
           1.446511743819994]
MPI_GOLD = [7, 4, 12, 1, 11, 9, 10, 11, 10, 5, 8, 7, 2]


def _mp_series():
    ts = TimeSeries(17, 1)
    for i, v in enumerate(MP_DATA):
        ts.add(i, v)
    return ts


def test_matrix_profile_golden():
    ts = _mp_series()
    mp, mpi = ts.matrix_profile(ns=0, n=16, m=4, percent=100)
    assert len(mp) == 13
    np.testing.assert_allclose(mp, MP_GOLD, atol=1e-5)
    assert list(mpi) == MPI_GOLD


def test_anomaly_golden():
    ts = _mp_series()
    out = ts.anomaly(ns=0, n=16, m=4, percent=100)
    assert out is not None
    t, pct, dist = out
    assert t == 3
    assert pct == pytest.approx(68.356354, abs=1e-4)
    assert dist == pytest.approx(1.078937, abs=1e-5)


def test_anomaly_current_golden():
    ts = _mp_series()
    mp, _ = ts.matrix_profile(ns=0, n=16, m=4, percent=100)
    out = anomaly_from_profile(mp, 0, 1, 4, current_only=True)
    t, pct, dist = out
    assert t == 12
    assert math.isnan(pct) and math.isnan(dist)


def test_ring_semantics():
    ts = TimeSeries(10, 1)
    # initial window covers rows 0..9
    assert ts.current_time == 9
    assert ts.add(3, 5) == 5
    assert ts.add(3, 2) == 7
    # future read rejected
    assert ts.get(50) == np.iinfo(np.int32).min
    # advance zero-fills the gap
    ts.add(15, 1)
    assert ts.get(10) == 0
    # write older than window rejected
    assert ts.add(3, 1) == np.iinfo(np.int32).min
    # int32 saturation
    ts2 = TimeSeries(2, 1)
    ts2.add(1, 2**31 - 1)
    assert ts2.add(1, 10) == 2**31 - 1


def test_windowed_stats_golden():
    # test.lua:368-414: rows=6, values {1,2,3,0,5,6} at ns 1..6 (row for ns 0 is 0)
    ts = TimeSeries(6, 1)
    for ns, v in zip(range(1, 7), [1, 2, 3, 0, 5, 6]):
        ts.set(ns, v)
    s = ts.stats(include_zero=False)
    assert s["sum"] == 17 and s["count"] == 5
    assert s["min"] == 1 and s["max"] == 6
    assert s["avg"] == pytest.approx(3.4)
    assert s["sd"] == pytest.approx(2.07364, abs=1e-5)
    assert s["usd"] == pytest.approx(1.85472, abs=1e-5)
    s = ts.stats(include_zero=True)
    assert s["sum"] == 17 and s["count"] == 6
    assert s["min"] == 0 and s["max"] == 6
    assert s["avg"] == pytest.approx(2.83333, abs=1e-5)
    assert s["sd"] == pytest.approx(2.31660, abs=1e-5)
    assert s["usd"] == pytest.approx(2.11476, abs=1e-5)


def test_ts_merge_set_and_add():
    src = TimeSeries(6, 1)
    for ns, v in zip(range(1, 7), [1, 2, 3, 0, 5, 6]):
        src.set(ns, v)
    dst = TimeSeries(10, 1)
    dst.merge(src, "set")
    for ns, v in zip(range(1, 7), [1, 2, 3, 0, 5, 6]):
        assert dst.get(ns) == v
    dbl = TimeSeries(6, 1)
    dbl.merge(src, "add").merge(src, "add")
    for ns, v in zip(range(1, 7), [1, 2, 3, 0, 5, 6]):
        assert dbl.get(ns) == 2 * v


def test_ts_serialize_roundtrip():
    ts = _mp_series()
    back = TimeSeries.from_bytes(ts.to_bytes())
    assert back.current_time == ts.current_time
    assert np.array_equal(back.v, ts.v)
    assert back.to_bytes() == ts.to_bytes()


# --------------------------------------------------------------------------
# A5 — matrix pcc / merge / sum (test.lua:479-735)
# --------------------------------------------------------------------------

PCC_ROWS = [[1, 2, 5, 10], [0, 1, 2, 3], [-1, 0, 7, 26], [1, 2, 3, 4]]


def _pcc_matrix(dtype="int"):
    m = Matrix(4, 4, dtype)
    for r, row in enumerate(PCC_ROWS):
        for c, v in enumerate(row):
            m.set(r, c, v)
    return m


def test_matrix_pcc_golden_int():
    m = _pcc_matrix()
    coef, row = m.pcc(3, "max")
    assert coef == pytest.approx(1.0) and row == 1
    coef, row = m.pcc(3, "min")
    assert coef == pytest.approx(0.90765069670774, abs=1e-10) and row == 2
    m.clear_row(1)
    coef, row = m.pcc(3, "max")
    assert coef == pytest.approx(0.95831484749991, abs=1e-10) and row == 0


def test_matrix_pcc_golden_float_with_nan():
    m = _pcc_matrix("float")
    coef, row = m.pcc(3, "max")
    assert coef == pytest.approx(1.0) and row == 1
    coef, row = m.pcc(3, "min")
    assert coef == pytest.approx(0.90765069670774, abs=1e-6) and row == 2


def test_matrix_merge_reproduces_pcc():
    src = _pcc_matrix()
    dst = Matrix(4, 4, "int")
    dst.merge(src, "add")
    coef, row = dst.pcc(3, "max")
    assert coef == pytest.approx(1.0) and row == 1


def test_matrix_row_sum():
    m = Matrix(1, 5, "float")
    for c, v in enumerate([1, 2, 3, 4]):
        m.set(0, c, v)
    assert m.sum(0) == pytest.approx(10.0)  # trailing NaN cell skipped


def test_matrix_int_saturation_and_float_nan_add():
    m = Matrix(2, 2, "int")
    m.set(0, 0, 2**31 - 1)
    assert m.add(0, 0, 10) == 2**31 - 1
    f = Matrix(2, 2, "float")
    assert f.add(0, 0, 5.0) == 5.0  # add to NaN cell sets
    assert f.add(0, 0, 2.0) == 7.0


def test_matrix_float_merge_add_skips_nan_sources():
    a = Matrix(2, 2, "float")
    a.set(0, 0, 3.0)
    b = Matrix(2, 2, "float")
    b.set(0, 1, 4.0)
    a.merge(b, "add")
    assert a.get(0, 0) == 3.0  # not clobbered by NaN source
    assert a.get(0, 1) == 4.0


def test_matrix_serialize_roundtrip():
    m = _pcc_matrix()
    back = Matrix.from_bytes(m.to_bytes())
    assert np.array_equal(back.v, m.v)
    f = _pcc_matrix("float")
    fb = Matrix.from_bytes(f.to_bytes(), dtype="float")
    assert np.array_equal(np.isnan(fb.v), np.isnan(f.v))


# --------------------------------------------------------------------------
# Extensions — HLL / KLL / Bloom accuracy within published bounds
# --------------------------------------------------------------------------


def test_hll_within_published_bound():
    sk = HyperLogLog(p=12)  # m=4096, rse ~1.63%
    n = 50_000
    keys = [f"url-{i}".encode() for i in range(n)]
    sk.update_batch(keys)
    est = sk.estimate()
    assert abs(est - n) / n < 3 * sk.relative_error


def test_hll_merge_is_bytes_identical_and_order_free():
    keys = [f"k{i}".encode() for i in range(10_000)]
    whole = HyperLogLog(p=10)
    whole.update_batch(keys)
    import random

    rnd = random.Random(1)
    shuffled = keys[:]
    rnd.shuffle(shuffled)
    parts = [HyperLogLog(p=10) for _ in range(5)]
    for i in range(5):
        parts[i].update_batch(shuffled[i::5])
    m1 = HyperLogLog(p=10)
    for p in parts:
        m1.merge(p)
    m2 = HyperLogLog(p=10)
    for p in reversed(parts):
        m2.merge(p)
    assert m1.to_bytes() == m2.to_bytes() == whole.to_bytes()
    back = HyperLogLog.from_bytes(m1.to_bytes())
    assert back.estimate() == m1.estimate()


def test_kll_rank_error_within_bound():
    rng = np.random.default_rng(3)
    xs = rng.lognormal(3, 1, 100_000)
    sk = KLL(k=200)
    sk.update_batch(xs)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95, 0.99):
        est = sk.quantile(q)
        true_rank = (xs <= est).mean()
        assert abs(true_rank - q) < 0.02  # k=200 → ~1.65% @99%


def test_kll_merge_preserves_bound():
    rng = np.random.default_rng(4)
    xs = rng.normal(0, 1, 80_000)
    parts = [KLL(k=200, seed=i) for i in range(8)]
    for i, p in enumerate(parts):
        p.update_batch(xs[i::8])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == len(xs)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        assert abs((xs <= est).mean() - q) < 0.025
    back = KLL.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)


def test_bloom_no_false_negatives_and_fpr():
    keys = [f"in-{i}".encode() for i in range(20_000)]
    bf = BloomFilter(capacity=20_000, fpr=1e-3)
    bf.update_batch(keys)
    assert bf.contains_batch(keys).all()  # no false negatives, ever
    probes = [f"out-{i}".encode() for i in range(20_000)]
    fp = bf.contains_batch(probes).mean()
    assert fp < 5e-3  # ~5x headroom over configured 1e-3


def test_bloom_merge_bytes_identical():
    keys = [f"x{i}".encode() for i in range(5000)]
    whole = BloomFilter(5000, 1e-4)
    whole.update_batch(keys)
    a = BloomFilter(5000, 1e-4)
    b = BloomFilter(5000, 1e-4)
    a.update_batch(keys[::2])
    b.update_batch(keys[1::2])
    a.merge(b)
    assert a.bits.tobytes() == whole.bits.tobytes()
    back = BloomFilter.from_bytes(a.to_bytes())
    assert back.contains(b"x17")
