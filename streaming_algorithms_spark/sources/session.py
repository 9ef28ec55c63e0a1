"""SparkSession factory with scale-oriented defaults.

The sandbox runs local[N] single-JVM; the config is chosen so the same code
ships unchanged via ``spark-submit --py-files`` to a multi-executor cluster:

- AQE on (runtime shuffle coalescing + skew-join splitting — the `lang`
  key is Zipfian, FIXTURES.md §B1).
- Arrow exchange on, large batches: every sketch update is a vectorized
  numpy pass over an Arrow batch, so bigger batches amortize Python hops.
- shuffle.partitions kept modest: the engine's shuffles move only binary
  sketch partials (O(partitions x keys x sketch_size)), never raw rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "streaming_algorithms_spark",
              cores: int | str = None,
              shuffle_partitions: int = None) -> SparkSession:
    # one BLAS thread per python worker: N workers x M BLAS threads
    # oversubscribes the box and *reduces* throughput at high parallelism
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalescing is byte-based; grouped-pandas stages carry huge
        # Python compute per shuffled byte, so coalescing them to 1-2 tasks
        # serializes the cluster (measured 0.29 -> 0.77 scaling efficiency on
        # the matrix-profile stage).  Rather than disabling coalescing
        # globally (it helps join-heavy relational plans), the python-heavy
        # operators use explicit `repartition(n, keys)` — user-specified
        # partitioning that AQE never coalesces.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
