"""Frequent Directions: published bound, mergeability across partition
orders, wire roundtrip, and the Spark operators."""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_algorithms_spark.sketches.frequent_directions import (
    FrequentDirections,
)


def _lowrank(n, d, rng):
    U = rng.normal(size=(n, 5))
    V = rng.normal(size=(5, d))
    return U @ V + 0.1 * rng.normal(size=(n, d))


def test_bound_and_psd_direction():
    rng = np.random.default_rng(0)
    n, d, ell = 5000, 64, 32
    A = _lowrank(n, d, rng)
    sk = FrequentDirections(ell, d)
    for i in range(0, n, 700):
        sk.insert_batch(A[i:i + 700])
    G = A.T @ A
    err = np.linalg.norm(G - sk.gram(), 2)
    assert err <= sk.error_bound()
    # FD under-estimates: A'A - B'B is PSD (0 <= x'(G-Gs)x)
    assert np.linalg.eigvalsh(G - sk.gram()).min() >= -1e-6
    assert sk.n_rows == n
    assert sk.fro_sq == pytest.approx((A * A).sum())


def test_merge_any_partition_order_holds_bound():
    rng = np.random.default_rng(1)
    n, d, ell = 4000, 32, 16
    A = _lowrank(n, d, rng)
    G = A.T @ A
    for seed in (2, 3):
        parts = np.array_split(A[rng.permutation(n)], 9)
        sks = []
        for p in parts:
            s = FrequentDirections(ell, d)
            s.insert_batch(p)
            sks.append(s)
        random.Random(seed).shuffle(sks)
        # merge through the wire format, like merge_partials does
        m = FrequentDirections.from_bytes(sks[0].to_bytes())
        for s in sks[1:]:
            m.merge(FrequentDirections.from_bytes(s.to_bytes()))
        assert np.linalg.norm(G - m.gram(), 2) <= m.error_bound()
        assert m.n_rows == n
        assert m.fro_sq == pytest.approx((A * A).sum())


def test_wire_roundtrip_identical():
    rng = np.random.default_rng(4)
    sk = FrequentDirections(8, 16)
    sk.insert_batch(rng.normal(size=(100, 16)))
    back = FrequentDirections.from_bytes(sk.to_bytes())
    assert np.array_equal(back.sketch_rows(), sk.sketch_rows())
    assert (back.n_rows, back.fro_sq) == (sk.n_rows, sk.fro_sq)


def test_shape_errors():
    sk = FrequentDirections(4, 8)
    with pytest.raises(ValueError):
        sk.insert_batch(np.zeros((3, 9)))
    with pytest.raises(ValueError):
        sk.merge(FrequentDirections(4, 9))
    with pytest.raises(ValueError):
        FrequentDirections(1, 8)


def test_spark_operators_match_numpy(spark):
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.operators.sketch_agg import (
        exact_gram,
        fd_gram,
    )

    rng = np.random.default_rng(5)
    A = _lowrank(600, 16, rng)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(A)],
        "vec_id long, embedding array<double>",
    ).repartition(6)

    ex = exact_gram(df, "embedding", 16).collect()[0]
    G = np.array(ex["gram_flat"]).reshape(16, 16)
    assert np.allclose(G, A.T @ A, atol=1e-8)
    assert ex["n_rows"] == 600

    fd = fd_gram(df, "embedding", 16, ell=8).collect()[0]
    Gs = np.array(fd["gram_flat"]).reshape(16, 16)
    assert fd["bound"] == pytest.approx((A * A).sum() / 8)
    assert np.abs(A.T @ A - Gs).max() <= fd["bound"]
    assert np.linalg.norm(A.T @ A - Gs, 2) <= fd["bound"]
