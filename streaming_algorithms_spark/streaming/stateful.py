"""Structured Streaming variants of the reference's streaming semantics.

The reference runs inside Heka/luasandbox: a message stream updates in-process
sketches, state is preserved across restarts by serialize hooks, and the ring
buffer rejects writes older than its window (library/src/time_series.c:34-58).
The Structured Streaming mapping (SURVEY §2.7 streaming-only):

- ring-buffer window advance + zero-fill  ->  tumbling ``window()`` aggregation
- "reject writes older than window"       ->  ``withWatermark`` late-data drop
- luasandbox preserve_data/serialize      ->  checkpointed state store +
  our HLL state carried in ``applyInPandasWithState``
- timer_event periodic emission           ->  trigger(processingTime/availableNow)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches import HyperLogLog


def streaming_windowed_stats(stream: DataFrame, ts_col: str, value_col: str,
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum/avg with watermark late-data rejection —
    the distributed time-series ring (SURVEY §2.4 add/stats)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(F.col("bucket.start").alias("bucket_start"), "n", "sum_value", "avg_value")
    )


def streaming_hll_distinct(stream: DataFrame, key_col: str, value_col: str,
                           p: int = 12) -> DataFrame:
    """Per-key running approximate-distinct over a stream: HLL registers are
    the state (binary) in ``applyInPandasWithState`` — the exact analogue of
    the reference's preserved sketch state (lua_binding/cm_sketch.c:167-202),
    with Spark's checkpoint replacing the Lua restore script.

    Same hot-path shape as the batch ``hll_distinct``: NULL values are
    filtered (SQL DISTINCT semantics) and the 64-bit hash is computed by
    codegen'd ``xxhash64`` in the JVM projection, so only 8-byte hashes
    cross the Arrow boundary per micro-batch — never the value strings.

    State format: the serialized HLL is prefixed with a version byte tied to
    the INSERT HASH (v2 = JVM xxhash64 of the value; v1, unversioned, used
    the sketch's internal Python xxh64 of value bytes).  Registers built
    with different hash functions must never merge — the estimate would
    silently double-count every value seen under both — so a restored state
    without the current version byte is rejected loudly: resuming across the
    hash change requires a fresh checkpointLocation."""
    import numpy as np
    from pyspark.sql import functions as F

    out_schema = f"`{key_col}` string, approx_distinct long, batches long"
    state_schema = "sketch binary, batches long"
    _STATE_VERSION = b"\x02"  # insert hash = JVM xxhash64(value)

    def update_fn(key, pdfs, state: GroupState):
        if state.exists:
            buf, batches = state.get
            buf = bytes(buf)
            if not buf[:1] == _STATE_VERSION:
                raise ValueError(
                    "streaming_hll_distinct: restored state lacks the v2 "
                    "(JVM-xxhash64) version byte — registers from the old "
                    "insert hash cannot be merged without silent "
                    "double-counting; restart with a fresh checkpointLocation"
                )
            sk = HyperLogLog.from_bytes(buf[1:])
        else:
            sk, batches = HyperLogLog(p), 0
        for pdf in pdfs:
            sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))
        # ONE increment per invocation: update_fn runs once per key per
        # MICRO-BATCH, while the iterator may deliver several Arrow chunks
        # (maxRecordsPerBatch) — counting chunks would let the
        # multi_batch_ok >= 2 gate pass inside a single micro-batch
        batches += 1
        state.update((_STATE_VERSION + sk.to_bytes(), batches))
        yield pd.DataFrame(
            {key_col: [key[0]], "approx_distinct": [int(round(sk.estimate()))],
             "batches": [batches]}
        )

    hashed = (
        stream.filter(F.col(value_col).isNotNull())
        .select(key_col, F.xxhash64(value_col).alias("_h"))
    )
    return (
        hashed.groupBy(key_col)
        .applyInPandasWithState(
            update_fn, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def streaming_bloom_dedup(stream: DataFrame, value_col: str,
                          capacity: int = 1 << 20, fpr: float = 1e-9,
                          n_buckets: int = 32) -> DataFrame:
    """Streaming FIRST-SEEN filter with BOUNDED state: each value routes to
    one of ``n_buckets`` independent Bloom-filter states by a deterministic
    hash (so the operator parallelizes across buckets while remaining a
    global dedup), and every micro-batch emits only values never seen in
    any earlier batch OF THE STREAM.  Duplicates are ALWAYS suppressed
    (Bloom has no false negatives); a genuinely new value is lost only to a
    false positive (P ~ fpr, sized per bucket) — the classic trade that
    bounds state at ~capacity bits forever, where exact streaming dedup
    (dropDuplicates) grows state with the distinct count.

    The distributed re-expression of the reference workload's duplicate
    alerting (heka_message_monitor.lua:359-410) as an emitting filter.
    Within a batch, first occurrence wins; output schema is the single
    ``value_col`` column (join back on it for full rows)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ..sketches import BloomFilter

    out_schema = f"`{value_col}` string"
    state_schema = "bloom binary"
    per_bucket = max(capacity // n_buckets, 1024)

    def update_fn(key, pdfs, state: GroupState):
        if state.exists:
            bloom = BloomFilter.from_bytes(bytes(state.get[0]))
        else:
            bloom = BloomFilter(per_bucket, fpr)
        emitted = []
        for pdf in pdfs:
            uniq = pd.unique(pdf[value_col])  # within-chunk, order-stable
            if not len(uniq):
                continue
            keys = [str(v).encode("utf-8") for v in uniq]
            new_mask = ~bloom.contains_batch(keys)
            new_keys = [k for k, m in zip(keys, new_mask) if m]
            if new_keys:
                bloom.update_batch(new_keys)
                emitted.append(uniq[new_mask])
        state.update((bloom.to_bytes(),))
        vals = np.concatenate(emitted) if emitted else np.array([], object)
        yield pd.DataFrame({value_col: vals})

    routed = (
        stream.filter(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).cast("string"),
            F.pmod(F.xxhash64(value_col), F.lit(n_buckets)).alias("_bucket"),
        )
    )
    return (
        routed.groupBy("_bucket")
        .applyInPandasWithState(
            update_fn, out_schema, state_schema,
            "append", GroupStateTimeout.NoTimeout,
        )
    )


def streaming_kll_quantiles(stream: DataFrame, key_col: str, value_col: str,
                            k: int = 200,
                            qs: tuple = (0.5, 0.95)) -> DataFrame:
    """Per-key running quantiles over a stream: a KLL sketch is the state
    (binary) in ``applyInPandasWithState`` — the mergeable distributed
    replacement for the reference's sequential P² accumulators, with the
    same preserved-state contract as ``streaming_hll_distinct``.

    State layout: version byte + serialized KLL.  v1 is the first format;
    a future wire change must bump the byte so restored state is rejected
    loudly instead of merging incompatible sketches.  The per-key state is
    O(k log n) values regardless of stream length.  Emits one update row
    per (key, micro-batch) with the current quantile estimates and the
    micro-batch counter (the driver gate uses the max counter row)."""
    import numpy as np

    from ..sketches import KLL

    _STATE_VERSION = b"\x01"
    # round, don't truncate: int(0.57*100) == 56 in binary floats, which
    # would mislabel columns and let adjacent qs collide into duplicates
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError(f"quantile labels collide at 1% resolution: {qs}")
    out_schema = (f"`{key_col}` string, "
                  + ", ".join(f"{c} double" for c in qcols)
                  + ", n_seen long, batches long")
    state_schema = "sketch binary, batches long"

    def update_fn(key, pdfs, state: GroupState):
        if state.exists:
            buf, batches = state.get
            buf = bytes(buf)
            if buf[:1] != _STATE_VERSION:
                raise ValueError(
                    "streaming_kll_quantiles: restored state has an unknown "
                    "version byte; restart with a fresh checkpointLocation"
                )
            sk = KLL.from_bytes(buf[1:])
        else:
            sk, batches = KLL(k), 0
        for pdf in pdfs:
            sk.update_batch(pdf[value_col].to_numpy(np.float64))
        batches += 1  # once per micro-batch invocation, never per Arrow chunk
        state.update((_STATE_VERSION + sk.to_bytes(), batches))
        rec = {key_col: key[0],
               "n_seen": int(sk.n), "batches": batches}
        for q, c in zip(qs, qcols):
            rec[c] = float(sk.quantile(q))
        yield pd.DataFrame([rec])

    src = stream.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    ).select(key_col, value_col)
    return src.groupBy(key_col).applyInPandasWithState(
        update_fn, out_schema, state_schema,
        "update", GroupStateTimeout.NoTimeout,
    )


def streaming_multi_sketch(stream: DataFrame, key_col: str,
                           distinct_col: str, value_col: str,
                           p: int = 14, k: int = 200,
                           qs: tuple = (0.5,)) -> DataFrame:
    """Per-key HLL distinct AND KLL quantiles in ONE stateful pass — the
    production shape for multi-metric keyed monitoring: one state-store
    lookup/write and one Arrow transfer per key per micro-batch instead of
    one full pipeline per sketch.  (The reference's Heka monitor likewise
    keeps ALL its accumulators in one sandbox per message stream —
    heka_message_monitor.lua carries counts + distribution state together.)

    Semantics are identical to composing ``streaming_hll_distinct`` (JVM
    xxhash64 insert hash) with ``streaming_kll_quantiles``: both sketches
    update from the same micro-batch slice of the key's rows, NULL
    ``distinct_col`` rows skip the HLL insert, NULL/NaN ``value_col`` rows
    skip the KLL insert, and the batches counter increments once per
    micro-batch invocation.

    State layout (version-fenced like the single-sketch ops): version byte
    ``\\x01`` + u32 LE HLL length + HLL bytes + KLL bytes.  A restored
    state with a different version byte is rejected loudly — never merged.
    """
    import numpy as np

    from ..sketches import KLL

    _STATE_VERSION = b"\x01"
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError(f"quantile labels collide at 1% resolution: {qs}")
    out_schema = (f"`{key_col}` string, approx_distinct long, "
                  + ", ".join(f"{c} double" for c in qcols)
                  + ", n_seen long, batches long")
    state_schema = "sketch binary, batches long"

    def update_fn(key, pdfs, state: GroupState):
        if state.exists:
            buf, batches = state.get
            buf = bytes(buf)
            if buf[:1] != _STATE_VERSION:
                raise ValueError(
                    "streaming_multi_sketch: restored state has an unknown "
                    "version byte; restart with a fresh checkpointLocation"
                )
            n_hll = int.from_bytes(buf[1:5], "little")
            hll = HyperLogLog.from_bytes(buf[5:5 + n_hll])
            kll = KLL.from_bytes(buf[5 + n_hll:])
        else:
            hll, kll, batches = HyperLogLog(p), KLL(k), 0
        for pdf in pdfs:
            hv = (pdf["_h"].to_numpy(np.int64)
                  [pdf["_hok"].to_numpy(bool)].view(np.uint64))
            if len(hv):
                hll.add_hashes(hv)
            v = pdf[value_col].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if len(v):
                kll.update_batch(v)
        batches += 1  # per micro-batch invocation, never per Arrow chunk
        hb = hll.to_bytes()
        state.update((
            _STATE_VERSION + len(hb).to_bytes(4, "little") + hb
            + kll.to_bytes(),
            batches,
        ))
        rec = {key_col: key[0],
               "approx_distinct": int(round(hll.estimate())),
               "n_seen": int(kll.n), "batches": batches}
        for q, c in zip(qs, qcols):
            rec[c] = float(kll.quantile(q)) if kll.n else float("nan")
        yield pd.DataFrame([rec])

    src = stream.select(
        key_col,
        # xxhash64 is computed UNCONDITIONALLY so ``_h`` is a
        # non-nullable long and every Arrow chunk lands in pandas as
        # int64 — wrapping it in when(isNotNull, ...) makes the column
        # nullable, and any chunk containing a NULL arrives as float64,
        # silently rounding hashes to 53-bit precision (the same id then
        # inserts as DIFFERENT values from null-containing vs null-free
        # chunks).  NULL rows are dropped via the separate boolean mask
        # instead: xxhash64(NULL) returns the seed, which must not
        # insert a phantom value.
        F.xxhash64(distinct_col).alias("_h"),
        F.col(distinct_col).isNotNull().alias("_hok"),
        F.col(value_col).cast("double").alias(value_col),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update_fn, out_schema, state_schema,
        "update", GroupStateTimeout.NoTimeout,
    )
