"""Incremental sketch-table maintenance (sketch_table.SketchTable).

Contracts under test, in the order a production deployment hits them:

1. incremental == one-shot: N appends then estimates() equals a single
   sketch_aggregate over the union of the batches (merge associativity —
   the whole point of maintaining sketches instead of raw history).
2. compaction is estimate-preserving and read-amplification-bounding;
   append-after-compact and second-generation compaction work; vacuum
   removes exactly the subsumed units and changes nothing observable.
3. commit protocol: duplicate batch ids refused; a batch dir without
   _SUCCESS (crashed append) is invisible; a compact dir without
   MANIFEST.json (crashed compaction) is invisible.
4. version fence: live rows stamped by a different ALGO_VERSION fail
   loudly, naming the stale batch.
"""
import json
import os

import pytest


def _hll_callables():
    # closures, not test-module imports: executors can't import from tests/
    from streaming_algorithms_spark.sketches.hll import HyperLogLog

    import numpy as np

    def factory():
        return HyperLogLog(12)

    def update(sk, pdf):
        sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))

    def finalize(sk, rows):
        return {"approx_distinct": int(round(sk.estimate())),
                "rows_seen": rows}

    from streaming_algorithms_spark.sketches.hll import HyperLogLog as H

    return factory, update, H.from_bytes, finalize, (
        "approx_distinct bigint, rows_seen bigint")


def _batches(spark, n_batches=3, rows_per=600):
    """Deterministic url batches with cross-batch overlap, keyed by lang."""
    from pyspark.sql import functions as F

    out = []
    for b in range(n_batches):
        df = (
            spark.range(b * rows_per, (b + 1) * rows_per + 200)  # overlap
            .select(
                F.concat(F.lit("lang"), (F.col("id") % 3)).alias("lang"),
                F.concat(F.lit("https://h"), (F.col("id") % 97),
                         F.lit("/p"), F.col("id")).alias("url"),
            )
            .withColumn("_h", F.xxhash64("url"))
            .repartition(4)
        )
        out.append(df)
    return out


def _estimates_pdf(table, from_bytes, finalize, schema):
    return (
        table.estimates(from_bytes, finalize, schema)
        .orderBy("lang").toPandas()
    )


def test_incremental_equals_oneshot_and_compact_preserves(spark, tmp_path):
    from functools import reduce

    from streaming_algorithms_spark.operators.sketch_agg import (
        sketch_aggregate,
    )
    from streaming_algorithms_spark.sketch_table import SketchTable

    factory, update, from_bytes, finalize, schema = _hll_callables()
    batches = _batches(spark)
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    for i, b in enumerate(batches):
        t.append(b, f"day-{i}", factory, update)

    inc = _estimates_pdf(t, from_bytes, finalize, schema)

    union = reduce(lambda a, b: a.unionByName(b), batches)
    oneshot = (
        sketch_aggregate(union, ["lang"], factory, update, from_bytes,
                         finalize, schema)
        .orderBy("lang").toPandas()
    )
    assert inc.equals(oneshot)

    # compact: one row per key afterwards, identical estimates
    gen = t.compact(from_bytes)
    assert t.live_units() == [f"{gen}/data"]
    assert t.sketch_rows().count() == 3  # 3 langs
    assert _estimates_pdf(t, from_bytes, finalize, schema).equals(inc)

    # append after compact; estimates fold the new batch in
    extra = _batches(spark, n_batches=4)[3]
    t.append(extra, "day-3", factory, update)
    assert set(t.live_units()) == {f"{gen}/data", "batch-day-3"}
    inc4 = _estimates_pdf(t, from_bytes, finalize, schema)
    union4 = union.unionByName(extra)
    oneshot4 = (
        sketch_aggregate(union4, ["lang"], factory, update, from_bytes,
                         finalize, schema)
        .orderBy("lang").toPandas()
    )
    assert inc4.equals(oneshot4)

    # second generation subsumes the first + day-3; vacuum removes them
    gen2 = t.compact(from_bytes)
    assert gen2 != gen
    covers = json.load(open(
        tmp_path / "tbl" / gen2 / "MANIFEST.json"))["covers"]
    assert covers == ["day-0", "day-1", "day-2", "day-3"]
    removed = t.vacuum()
    assert set(removed) == {"batch-day-0", "batch-day-1", "batch-day-2",
                            "batch-day-3", gen}
    assert _estimates_pdf(t, from_bytes, finalize, schema).equals(inc4)


def test_commit_protocol_and_key_pinning(spark, tmp_path):
    from streaming_algorithms_spark.sketch_table import SketchTable

    factory, update, from_bytes, finalize, schema = _hll_callables()
    b0, b1 = _batches(spark, n_batches=2)
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    t.append(b0, "day-0", factory, update)

    with pytest.raises(ValueError, match="already exists"):
        t.append(b0, "day-0", factory, update)
    with pytest.raises(ValueError, match="must match"):
        t.append(b0, "day 0!", factory, update)
    with pytest.raises(ValueError, match="keyed by"):
        SketchTable(spark, str(tmp_path / "tbl"), ["url"]).append(
            b1, "day-1", factory, update)

    # crashed append: batch dir without _SUCCESS is invisible
    t.append(b1, "day-1", factory, update)
    os.remove(tmp_path / "tbl" / "batch-day-1" / "_SUCCESS")
    assert t.committed_batches() == ["day-0"]
    base = _estimates_pdf(t, from_bytes, finalize, schema)

    # crashed compaction: data written, no manifest -> invisible
    t.compact(from_bytes)
    os.remove(tmp_path / "tbl" / "compact-000000" / "MANIFEST.json")
    assert t.live_units() == ["batch-day-0"]
    assert _estimates_pdf(t, from_bytes, finalize, schema).equals(base)

    # retrying the compaction reclaims the orphan at the same generation
    # number instead of colliding on the leftover data dir forever
    assert t.compact(from_bytes) == "compact-000000"
    assert t.live_units() == ["compact-000000/data"]
    assert _estimates_pdf(t, from_bytes, finalize, schema).equals(base)

    # crashed append (dir without _BATCH_META = uncommitted orphan):
    # the same writer's RETRY reclaims it instead of "already exists"
    import shutil
    shutil.rmtree(tmp_path / "tbl" / "batch-day-1")
    t.append(b1, "day-1", factory, update)
    os.remove(tmp_path / "tbl" / "batch-day-1" / "_BATCH_META.json")
    t.append(b1, "day-1", factory, update)  # self-heals
    assert "day-1" in t.committed_batches()


def test_append_many_one_pass_equals_separate_appends(spark, tmp_path):
    """append_many commits N batches from one partial-build pass; the table
    state must be indistinguishable from N separate appends (same committed
    batches, same per-batch _BATCH_META commits, same estimates), and the
    declared-ledger contract must hold (unknown batch values error, id
    collisions refused up front)."""
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.sketch_table import SketchTable

    factory, update, from_bytes, finalize, schema = _hll_callables()
    b0, b1 = _batches(spark, n_batches=2)
    tagged = (b0.withColumn("_day", F.lit("day-0"))
              .unionByName(b1.withColumn("_day", F.lit("day-1"))))

    t_many = SketchTable(spark, str(tmp_path / "many"), ["lang"])
    t_many.append_many(tagged, "_day", ["day-0", "day-1"], factory, update)
    t_sep = SketchTable(spark, str(tmp_path / "sep"), ["lang"])
    t_sep.append(b0, "day-0", factory, update)
    t_sep.append(b1, "day-1", factory, update)

    assert t_many.committed_batches() == ["day-0", "day-1"]
    for b in ("day-0", "day-1"):
        meta = json.load(open(tmp_path / "many" / f"batch-{b}"
                              / "_BATCH_META.json"))
        assert meta["batch_id"] == b
    assert _estimates_pdf(t_many, from_bytes, finalize, schema).equals(
        _estimates_pdf(t_sep, from_bytes, finalize, schema))
    # lineage rows carry the per-row batch id, not a shared query_id
    lin = t_many.lineage_metrics().toPandas()
    assert set(lin["batch_id"]) == {"day-0", "day-1"}

    # contract guards
    with pytest.raises(ValueError, match="not in batch_ids"):
        t_many.append_many(
            tagged.withColumn("_day", F.lit("day-9")), "_day",
            ["day-2"], factory, update)
    with pytest.raises(ValueError, match="already exists"):
        t_many.append_many(tagged, "_day", ["day-0", "day-1"],
                           factory, update)
    with pytest.raises(ValueError, match="must match"):
        t_many.append_many(tagged, "_day", ["day 2!"], factory, update)
    with pytest.raises(ValueError, match="no column"):
        t_many.append_many(b0, "_nope", ["day-2"], factory, update)
    # the failed calls left no half-committed dirs behind
    assert t_many.committed_batches() == ["day-0", "day-1"]


def test_version_fence_names_stale_batch(spark, tmp_path, monkeypatch):
    from streaming_algorithms_spark import sketch_table as st_mod
    from streaming_algorithms_spark.sketch_table import SketchTable

    factory, update, from_bytes, finalize, schema = _hll_callables()
    b0, b1 = _batches(spark, n_batches=2)
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    t.append(b0, "day-0", factory, update)
    t.append(b1, "day-1", factory, update)

    # simulate a library upgrade after the appends: the reader's current
    # version no longer matches what the rows were stamped with (the fence
    # comparison is driver-side, so patching the module global is exactly
    # the upgrade scenario — the persisted stamps are the real ones)
    monkeypatch.setattr(st_mod, "ALGO_VERSION", "99")

    with pytest.raises(ValueError, match="day-1"):
        _estimates_pdf(t, from_bytes, finalize, schema)
    with pytest.raises(ValueError, match="ALGO_VERSION"):
        t.compact(from_bytes)

    # back on the writing version, the same table reads fine
    monkeypatch.undo()
    assert len(_estimates_pdf(t, from_bytes, finalize, schema)) == 3


def test_retract_uncovered_batch_only(spark, tmp_path):
    """retract() — the bad-segment verb.  An uncovered batch retracts
    (estimates equal a build that never saw it; the id is free for a
    corrected re-append), a covered batch refuses (sketch merges are a
    monoid, not a group — not invertible), and an unknown/crashed id
    refuses.  A crash mid-cleanup (meta already unlinked) leaves an
    orphan a later append self-heals."""
    from streaming_algorithms_spark.sketch_table import SketchTable

    factory, update, from_bytes, finalize, schema = _hll_callables()
    b0, b1, b2 = _batches(spark)
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    t.append(b0, "day-0", factory, update)
    t.append(b1, "day-1", factory, update)
    t.append(b2, "day-2-bad", factory, update)

    t.retract("day-2-bad")
    assert t.committed_batches() == ["day-0", "day-1"]
    got = _estimates_pdf(t, from_bytes, finalize, schema)
    clean = SketchTable(spark, str(tmp_path / "clean"), ["lang"])
    clean.append(b0, "day-0", factory, update)
    clean.append(b1, "day-1", factory, update)
    assert got.equals(_estimates_pdf(clean, from_bytes, finalize, schema))

    # the id is free again: corrected re-append lands
    t.append(b2, "day-2-bad", factory, update)
    assert t.committed_batches() == ["day-0", "day-1", "day-2-bad"]

    # covered by a compaction -> baked into merged rows -> refused
    t.compact(from_bytes)
    with pytest.raises(ValueError, match="not invertible"):
        t.retract("day-0")
    with pytest.raises(ValueError, match="no committed batch"):
        t.retract("never-appended")

    # crash mid-cleanup: meta unlinked, dir left behind -> batch is
    # already invisible, and the orphan self-heals on the next append
    t2 = SketchTable(spark, str(tmp_path / "tbl2"), ["lang"])
    t2.append(b0, "seg-0", factory, update)
    os.remove(tmp_path / "tbl2" / "batch-seg-0" / "_BATCH_META.json")
    assert t2.committed_batches() == []
    t2.append(b0, "seg-0", factory, update)  # reclaim, not "already exists"
    assert t2.committed_batches() == ["seg-0"]
