"""Count-Sketch / AMS: unbiased point estimates, F2 bound, linear merge."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_algorithms_spark.sketches.count_sketch import CountSketch
from streaming_algorithms_spark.sketches.xxhash import xxh64_batch


def _zipf_stream(n_keys=5000, scale=30000):
    keys = [f"k{i}".encode() for i in range(n_keys)]
    freqs = np.maximum(1, (scale / np.arange(1, n_keys + 1) ** 1.1)).astype(np.int64)
    return xxh64_batch(keys), freqs


def test_f2_within_published_bound_and_point_estimates():
    h, freqs = _zipf_stream()
    sk = CountSketch(2048, 5)
    sk.update_hashes(h, freqs)
    F2 = float((freqs.astype(np.float64) ** 2).sum())
    assert abs(sk.f2_estimate() - F2) / F2 <= sk.f2_relative_bound
    # unbiased point estimates: |est - f| <= 4*sqrt(F2/w) on the head keys
    pe = sk.estimate_hashes(h[:50])
    assert np.abs(pe - freqs[:50]).max() <= 4 * np.sqrt(F2 / 2048)


def test_linear_merge_is_exact_any_partition_order():
    h, freqs = _zipf_stream(2000, 5000)
    whole = CountSketch(1024, 5)
    whole.update_hashes(h, freqs)
    rng = np.random.default_rng(1)
    for seed in (2, 3):
        order = rng.permutation(len(h))
        parts = np.array_split(order, 7)
        sks = []
        for p in parts:
            s = CountSketch(1024, 5)
            s.update_hashes(h[p], freqs[p])
            sks.append(s)
        rng2 = np.random.default_rng(seed)
        rng2.shuffle(sks)
        m = CountSketch.from_bytes(sks[0].to_bytes())
        for s in sks[1:]:
            m.merge(CountSketch.from_bytes(s.to_bytes()))
        # linear sketch: merged table is BYTE-IDENTICAL to one-shot
        assert np.array_equal(m.table, whole.table)
        assert m.n_items == whole.n_items
        assert m.to_bytes() == whole.to_bytes()


def test_wire_and_param_validation():
    sk = CountSketch(256, 3)
    sk.update_hashes(xxh64_batch([b"a", b"b"]))
    back = CountSketch.from_bytes(sk.to_bytes())
    assert np.array_equal(back.table, sk.table)
    with pytest.raises(ValueError):
        CountSketch(1000, 3)  # not a power of two
    with pytest.raises(ValueError):
        sk.merge(CountSketch(512, 3))
    with pytest.raises(ValueError):
        CountSketch.from_bytes(sk.to_bytes()[:-3])


def test_unbiasedness_sign_symmetry():
    """Keys absent from the stream estimate near zero (signed cancellation),
    unlike CMS which always over-counts."""
    h, freqs = _zipf_stream()
    sk = CountSketch(2048, 5)
    sk.update_hashes(h, freqs)
    absent = xxh64_batch([f"absent{i}".encode() for i in range(200)])
    est = sk.estimate_hashes(absent)
    F2 = float((freqs.astype(np.float64) ** 2).sum())
    assert np.abs(est).max() <= 4 * np.sqrt(F2 / 2048)
    assert abs(float(np.mean(est))) <= np.sqrt(F2 / 2048)  # centered near 0


def test_build_probe_roundtrip_spark(spark):
    """count_sketch_build -> broadcast bytes -> count_sketch_probe: estimates
    on present keys near their true counts, absent keys near zero."""
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.operators.sketch_agg import (
        count_sketch_build,
        count_sketch_probe,
    )

    rows = [(g, int(k)) for g in ("a", "b")
            for k in np.repeat(np.arange(200), np.maximum(1, 2000 // np.arange(1, 201)))]
    df = spark.createDataFrame(rows, "grp string, key long").repartition(8)
    built = count_sketch_build(df, ["grp"], "key", width=1024, depth=5).collect()
    sketches = {(r["grp"],): r["sketch"] for r in built}
    assert set(sketches) == {("a",), ("b",)}

    exact = {(r["grp"], r["key"]): r["cnt"] for r in
             df.groupBy("grp", "key").agg(F.count("*").alias("cnt")).collect()}
    F2 = {g: sum(v * v for (gg, _), v in exact.items() if gg == g)
          for g in ("a", "b")}

    cand = spark.createDataFrame(
        [(g, int(k)) for g in ("a", "b") for k in range(0, 250, 10)],
        "grp string, key long",
    )
    out = count_sketch_probe(cand, ["grp"], "key", sketches).collect()
    for r in out:
        true = exact.get((r["grp"], r["key"]), 0)
        bound = 4 * np.sqrt(F2[r["grp"]] / 1024)
        assert abs(r["cs_estimate"] - true) <= bound, (r, true, bound)
