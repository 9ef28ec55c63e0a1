"""TokenSketch kernel + distributed build (compute-dense scaling workload)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_algorithms_spark.operators.token_sketch import (
    TokenSketch,
    token_sketch_build,
)


def test_token_sketch_kernel_counts():
    sk = TokenSketch(epsilon=1e-3, delta=0.01, p=12)
    texts = np.array(["a b c a", "b b d", "e f a"], dtype=object)
    sk.update_texts(texts)
    assert sk.total_tokens == 10
    # CMS point query from the same hashing path
    from streaming_algorithms_spark.sketches.xxhash import xxh64_batch

    h = xxh64_batch([b"a", b"b", b"c", b"d", b"z"])
    est = sk.cms.point_query_hashes(h)
    assert est[0] >= 3 and est[1] >= 3 and est[2] >= 1 and est[3] >= 1
    assert est[4] <= 1e-3 * 10 + 1  # absent token bounded by eps*N
    # distinct tokens a b c d e f = 6
    assert abs(sk.hll.estimate() - 6) <= 2


def test_token_sketch_merge_bytes_roundtrip():
    a, b = TokenSketch(p=10), TokenSketch(p=10)
    a.update_texts(np.array(["x y z"] * 5, dtype=object))
    b.update_texts(np.array(["x q r s"] * 3, dtype=object))
    buf_a, buf_b = a.to_bytes(), b.to_bytes()
    m1 = TokenSketch.from_bytes(buf_a).merge(TokenSketch.from_bytes(buf_b))
    m2 = TokenSketch.from_bytes(buf_b).merge(TokenSketch.from_bytes(buf_a))
    assert m1.to_bytes() == m2.to_bytes()  # commutative merge, same bytes
    assert m1.total_tokens == 15 + 12


def test_token_sketch_build_distributed(spark, webpages):
    out = {r["lang"]: r for r in
           token_sketch_build(webpages, ["lang"], "text", p=14).collect()}
    exact = {r["lang"]: r for r in
             webpages.select("lang", F.explode(F.split("text", " ")).alias("t"))
             .groupBy("lang")
             .agg(F.countDistinct("t").alias("d"), F.count("*").alias("n"))
             .collect()}
    rse = 1.04 / np.sqrt(2 ** 14)
    for lang, e in exact.items():
        o = out[lang]
        assert o["total_tokens"] == e["n"]  # exact token totals
        assert abs(o["distinct_tokens"] - e["d"]) <= max(3 * rse * e["d"], 3)
