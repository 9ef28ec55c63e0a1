"""Bucketed table layout — the co-located-join strategy for repeated big
joins (north-rule: "partitioning / shuffle / skew handled explicitly").

A join between two tables bucketed on the SAME keys into the SAME bucket
count needs NO shuffle: each task reads matching bucket files from both
sides (Spark's bucketing contract — hash(key) % n_buckets determines the
file), so the exchange that dominates a repeated fact-fact join is paid
ONCE at write time instead of per query.  ``sortBy`` on the same keys
additionally removes the per-task sort of a sort-merge join when the
session opts into bucket-sort propagation (see ``save_bucketed``).

When to use (the 100-TB calculus): a corpus joined against per-document
side tables (dedup keep-sets, quality scores, embedding shards) on
``doc_id``/``url`` many times amortizes its bucketed write after ~2 joins;
a one-shot join does not — let AQE pick the strategy instead.

Skew caveat (tested in test_bucketed_join_skewed_hot_host): bucketing
removes the Exchange but concentrates a hot key's rows in ONE bucket
file, and with no Exchange in the plan AQE's skew-join splitting never
applies — the per-task imbalance survives.  Bucket on near-uniform keys
(doc_id, url hash); for a Zipf-hot key (host) where per-task skew
dominates, salt the key instead and keep the shuffle AQE can split.

Iceberg note: at production scale the same co-location comes from Iceberg's
``bucket(N, col)`` partition transform on both tables; this module is the
sandbox (spark_catalog parquet) expression of the identical layout
decision.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, name: str, keys: Sequence[str],
                  n_buckets: int, path: str | None = None,
                  sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) parquet table
    registered in the session catalog.  ``path`` makes it an external
    table (required in ephemeral test sessions without a warehouse).

    The explicit ``repartition(n_buckets, *keys)`` before the write is
    load-bearing: only with ONE file per bucket can the scan's sort
    metadata ever be trusted at read time.  Note Spark >= 3.0 does not
    propagate bucket sort ordering by DEFAULT even then (SPARK-28595;
    multi-file buckets would need a merge-sort) — the join still skips
    the Exchange (the expensive part) but re-Sorts per task unless
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` is set,
    in which case the plan has neither Exchange nor Sort (both
    configurations verified in test_bucketed_join_has_no_exchange)."""
    keys = list(keys)
    w = (df.repartition(n_buckets, *keys)
         .write.mode("overwrite").bucketBy(n_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def bucketed_join(spark: SparkSession, left_name: str, right_name: str,
                  keys: Sequence[str], how: str = "inner",
                  force_merge: bool = False) -> DataFrame:
    """Join two catalog tables previously written with ``save_bucketed`` on
    the same keys/bucket count — plans as a shuffle-free (and with
    ``sort=True`` sort-free) sort-merge join; see
    test_bucketed_join_has_no_exchange for the plan assertion.

    ``force_merge`` adds the MERGE join hint: below the broadcast
    threshold Catalyst would otherwise pick a broadcast join and never
    touch the bucket co-location — the hint pins the sort-merge strategy
    the layout exists for, without touching session config (the
    at-scale case needs no hint; both sides exceed the threshold)."""
    left, right = spark.table(left_name), spark.table(right_name)
    if force_merge:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, list(keys), how)
