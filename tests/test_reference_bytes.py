"""Byte-for-byte serialization parity with the reference C library.

The vectors in tests/ref_vectors/ were produced by compiling the reference's
own sources and replaying the FIXTURES.md §A golden sequences through its
sa_serialize_* functions (generator: scripts/gen_ref_vectors.c; rebuild with
  gcc -O2 -std=c99 -DOUTDIR='"tests/ref_vectors"' \
      -I$REF/library/include -I$REF/library/src $REF/library/src/*.c \
      scripts/gen_ref_vectors.c -lm -o gen && ./gen
where REF=/root/reference).  Our codecs must reproduce the exact bytes.
"""

import os

import numpy as np

from streaming_algorithms_spark.sketches import (
    CountMinSketch,
    Matrix,
    P2Histogram,
    P2Quantile,
    RunningStats,
    TimeSeries,
)

VEC = os.path.join(os.path.dirname(__file__), "ref_vectors")


def _ref(name: str) -> bytes:
    with open(os.path.join(VEC, name + ".bin"), "rb") as f:
        return f.read()


def test_running_stats_bytes_match_reference():
    rs = RunningStats()
    for i in range(1, 11):
        rs.add(float(i))
    assert rs.to_bytes() == _ref("running_stats_1to10")


P2_DATA = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62, 15.92,
           34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42, 0.09, 11.37]


def test_p2_quantile_bytes_match_reference():
    q = P2Quantile(0.5)
    for x in P2_DATA:
        q.add(x)
    assert q.to_bytes() == _ref("p2_quantile_golden")
    # and the reference bytes restore into an identical sketch
    back = P2Quantile.from_bytes(_ref("p2_quantile_golden"))
    assert back.estimate(2) == q.estimate(2)


def test_p2_histogram_bytes_match_reference():
    h = P2Histogram(4)
    for x in P2_DATA:
        h.add(x)
    ref = _ref("p2_histogram_golden")
    assert h.to_bytes() == ref
    assert P2Histogram.from_bytes(ref).estimate(2) == h.estimate(2)


def test_cms_bytes_match_reference():
    sk = CountMinSketch(0.1, 0.1, mode="conservative")
    sk.update("a", -10)
    sk.update("c", 6)
    sk.update("a", 1)
    sk.update("b", 2)
    sk.update("c", -3)
    sk.update(2, 1)  # number key -> 8-byte LE double (lua binding rule)
    sk.update("c", -4)
    ref = _ref("cms_golden")
    assert sk.to_bytes() == ref
    back = CountMinSketch.from_bytes(ref, width=28, depth=3, mode="conservative")
    assert back.point_query("b") == 2


MP_DATA = [132, 161, 144, 145, 31, 44, 47, 26, 232, 236, 254, 262, 339, 360,
           313, 340, 1]


def test_time_series_bytes_match_reference():
    ts = TimeSeries(17, 1)
    for i, v in enumerate(MP_DATA):
        ts.add(i, v)
    ref = _ref("time_series_golden")
    ours = ts.to_bytes()
    # last 4 bytes of the C buffer are uninitialized struct padding (the
    # reference mallocs sizeof(struct)+cells and never writes the pad) —
    # compare the defined region, lengths must agree
    assert len(ours) == len(ref)
    assert ours[:-4] == ref[:-4]
    back = TimeSeries.from_bytes(ref)
    assert np.array_equal(back.v, ts.v)


def test_matrix_bytes_match_reference():
    rows = [[1, 2, 5, 10], [0, 1, 2, 3], [-1, 0, 7, 26], [1, 2, 3, 4]]
    m = Matrix(4, 4, "int")
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            m.set(r, c, v)
    ref = _ref("matrix_int_golden")
    assert m.to_bytes() == ref
    back = Matrix.from_bytes(ref, dtype="int")
    assert back.pcc(3, "max")[1] == 1
