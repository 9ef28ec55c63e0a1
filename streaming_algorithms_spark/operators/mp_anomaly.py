"""Distributed SCRIMP matrix-profile anomaly detection per series.

The reference's EP2 query (SURVEY §3): ``ts:matrix_profile(...)`` + P²-based
discord scoring (lua_binding/time_series.c:348-427), re-expressed as one
grouped-pandas stage: the group shuffle is the only node boundary, the SCRIMP
sweep runs vectorized numpy per series.

Scaling shape: each series is an independent O(n²) float kernel over a
cache-resident window — pure ALU work, embarrassingly parallel across
executors.  This is the compute kernel used for the bench scaling-efficiency
evidence (bench.py): unlike scan-/factorize-bound jobs it is not limited by
the sandbox VM's memory bandwidth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matrix_profile_per_series(df: DataFrame, series_col: str, order_col: str,
                              value_col: str, ms=(64,),
                              max_points: int = 4096,
                              percent: float = 100.0,
                              pre_partitioned: bool = False) -> DataFrame:
    """For every series: sort by order_col, run SCRIMP at each subsequence
    length in ``ms`` (multi-resolution motif/discord search) over up to
    max_points values, emit the discord (max matrix-profile distance) per m.

    Output: (series, m, n_points, discord_idx, discord_distance, mp_mean).

    ``pre_partitioned=True`` skips the repartition for input that is
    ALREADY hash-clustered on ``series_col`` — a bucketed table
    (sources/bucketed.py) or a prior explicit repartition on the same
    key.  Over a bucketed scan the grouped stage then plans with NO
    Exchange (asserted in test_plans_scale.py): the write-once bucket
    layout replaces the per-run corpus shuffle, which is the dominant
    non-kernel cost of a repeated anomaly scan at scale.

    The contract is CHECKED at plan time: if the input is NOT actually
    clustered, Spark inserts its own Exchange to satisfy the groupBy —
    and since that exchange is planner-inserted (not user-specified),
    AQE coalescing may collapse this Python-heavy stage to 1-2 tasks
    (the exact pitfall the default path's explicit repartition exists
    to prevent).  The pre_partitioned path therefore compares Exchange
    counts between the input plan and the grouped plan and raises
    instead of silently planning the hazard; when unsure, leave the
    default."""

    out_schema = (
        f"`{series_col}` long, m long, n_points long, discord_idx long, "
        "discord_distance double, mp_mean double"
    )
    cols = [series_col, "m", "n_points", "discord_idx",
            "discord_distance", "mp_mean"]

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..sketches import matrix_profile

        pdf = pdf.sort_values(order_col)
        vals = pdf[value_col].to_numpy(np.float64)[:max_points]
        sid = int(pdf[series_col].iloc[0])
        recs = []
        for m in ms:
            if vals.size < 4 * m:
                continue
            mp, _ = matrix_profile(vals, m=m, percent=percent, seed=0,
                                   with_index=False)
            finite = mp[np.isfinite(mp)]
            if not finite.size:
                continue
            idx = int(np.nanargmax(np.where(np.isfinite(mp), mp, -np.inf)))
            recs.append((sid, m, int(vals.size), idx, float(mp[idx]),
                         float(finite.mean())))
        return pd.DataFrame(recs, columns=cols)

    if pre_partitioned:
        # bucketed/pre-clustered input already satisfies the groupBy's
        # distribution; an added repartition would reintroduce the exact
        # Exchange the layout exists to avoid.  Verify the claim on the
        # PHYSICAL plan (driver-side, no job): a planner-added Exchange
        # below the grouped stage means the input was not clustered.
        out = df.groupBy(series_col).applyInPandas(per_series, out_schema)
        # anchor the match to a hash Exchange ON THE GROUP KEY (raw
        # 'Exchange' substring counts misjudge reused/AQE-rewritten
        # exchanges elsewhere in a complex-but-clustered input plan)
        anchor = f"Exchange hashpartitioning({series_col}"
        n_in = df._jdf.queryExecution().executedPlan().toString().count(
            anchor)
        n_out = out._jdf.queryExecution().executedPlan().toString().count(
            anchor)
        if n_out > n_in:
            raise ValueError(
                "matrix_profile_per_series(pre_partitioned=True): the "
                f"input is not clustered on {series_col!r} — the planner "
                "inserted an Exchange to satisfy the groupBy, which AQE "
                "may coalesce to 1-2 tasks.  Use a bucketed table "
                "(sources/bucketed.py), repartition on the key first, or "
                "drop pre_partitioned."
            )
        return out
    # explicit (user-specified) hash repartitioning: satisfies the groupBy's
    # distribution requirement AND is exempt from AQE shuffle coalescing,
    # which would otherwise collapse this compute-dense stage to 1-2 tasks
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(n_parts, series_col)
        .groupBy(series_col)
        .applyInPandas(per_series, out_schema)
    )


def url_series_anomaly(df: DataFrame, n_series: int = 256, ms=(64,),
                       max_points: int = 4096) -> DataFrame:
    """Bench/demo wrapper over a webpages-shaped table: series = url-hash
    bucket, value = text length, order = crawl timestamp.  JVM computes the
    bucket + length; Python sees (long, long, long)."""
    prepped = df.select(
        F.pmod(F.xxhash64("url"), F.lit(n_series)).alias("series_id"),
        F.unix_micros("warc_ts").alias("ts_us"),
        F.length("text").alias("v"),
    )
    return matrix_profile_per_series(prepped, "series_id", "ts_us", "v",
                                     ms=ms, max_points=max_points)
