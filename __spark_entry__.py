"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query (sf0.001 smoke).
- ``queries()``      — one entry per implemented operator (SURVEY §2 +
  training-data-pipeline extensions), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``   — DuckDB-equivalent SQL for EVERY query (the oracle
  map covers the full registry; nothing rides the weaker rows-only check).
  Exact values (distincts, quantiles, pair sets, byte lengths, hashes,
  header-parsed dims) are value-hash-gated; approximate/probabilistic
  results fold into within-published-bound booleans, so the driver's
  value-hash compare *is* the sketch accuracy gate.  Non-SQL-expressible
  internals (LSH banding, P² marker dynamics, SCRIMP kernels, streaming
  state, codec roundtrips) are additionally pytest-verified against golden
  vectors / exact recomputation (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_algorithms_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-lang approximate distinct documents (mergeable HLL over
    two-stage partial aggregation) with the exact answer and bound check."""
    import pyspark.sql.functions as F

    from streaming_algorithms_spark.operators import hll_distinct
    from streaming_algorithms_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    est = hll_distinct(docs, ["lang"], "text", p=12)
    exact = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact_distinct"))
    rse = 1.04 / (2 ** 12) ** 0.5
    return (
        exact.join(est, "lang")
        .select(
            "lang",
            "exact_distinct",
            "approx_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.greatest(3 * rse * F.col("exact_distinct"), F.lit(3.0))
            ).alias("within_bound"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
