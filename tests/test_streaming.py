"""Structured Streaming stateful variants: multi-batch state continuity and
watermark late-data semantics."""

import time

import pytest
from pyspark.sql import functions as F

from streaming_algorithms_spark.streaming import (
    streaming_hll_distinct,
    streaming_windowed_stats,
)


@pytest.fixture()
def stream_dir(spark, webpages, tmp_path):
    """Two parquet 'micro-batches' of the webpages stream."""
    d = tmp_path / "stream_in"
    a, b = webpages.limit(6000), webpages.subtract(webpages.limit(6000))
    a.write.parquet(str(d / "batch=0"))
    b.write.parquet(str(d / "batch=1"))
    return str(d)


def test_streaming_hll_state_accumulates(spark, webpages, stream_dir, tmp_path):
    schema = webpages.schema
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(stream_dir)
    out = streaming_hll_distinct(stream.select("lang", "url"), "lang", "url", p=12)
    q = (
        out.writeStream.format("memory").queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = {r["lang"]: r["approx_distinct"]
           for r in spark.sql(
               "select lang, max_by(approx_distinct, batches) approx_distinct "
               "from hll_stream group by lang").collect()}
    exact = {r["lang"]: r["exact"] for r in
             webpages.groupBy("lang").agg(F.countDistinct("url").alias("exact")).collect()}
    rse = 1.04 / (2 ** 12) ** 0.5
    for lang, ex in exact.items():
        assert abs(res[lang] - ex) <= max(3 * rse * ex, 3), (lang, ex, res[lang])


def test_streaming_windowed_stats(spark, webpages, stream_dir, tmp_path):
    schema = webpages.schema
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(stream_dir)
    out = streaming_windowed_stats(
        stream.withColumn("one", F.lit(1.0)), "warc_ts", "one", "1 day", "2 days"
    )
    q = (
        out.writeStream.format("memory").queryName("win_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {str(r["bucket_start"]): r["n"] for r in spark.sql(
        "select * from win_stream").collect()}
    exact = {str(r["d"]): r["n"] for r in
             webpages.groupBy(F.date_trunc("day", "warc_ts").alias("d"))
             .agg(F.count("*").alias("n")).collect()}
    assert got == exact


def test_streaming_drift_detector(spark, tmp_path):
    """Three micro-batches: two from the same lognormal distribution, one
    shifted — the pcc drift alert must stay quiet then fire."""
    import numpy as np

    from streaming_algorithms_spark.streaming.drift import streaming_drift_detector

    rng = np.random.default_rng(3)
    d = tmp_path / "drift_in"
    base1 = rng.lognormal(3, 0.5, 4000)
    base2 = rng.lognormal(3, 0.5, 4000)
    shifted = rng.lognormal(6, 0.2, 4000)  # very different shape
    for i, vals in enumerate([base1, base2, shifted]):
        spark.createDataFrame(
            [("k", float(v)) for v in vals], "key string, value double"
        ).coalesce(1).write.parquet(str(d / f"batch={i}"))

    stream = spark.readStream.schema("key string, value double").option(
        "maxFilesPerTrigger", "1"
    ).option("recursiveFileLookup", "true").parquet(str(d))
    # marker-position pcc is affine-invariant (reference semantics:
    # heka_message_monitor.lua:328-340 snapshots P2 *estimates*), so even a
    # big scale shift keeps r ~0.9; threshold 0.98 separates same-dist
    # (~0.999) from shape change for this test
    out = streaming_drift_detector(stream, "key", "value", buckets=8,
                                   threshold=0.98)
    q = (
        out.writeStream.format("memory").queryName("drift_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["interval"]: r for r in
            spark.sql("select * from drift_stream").collect()}
    assert len(rows) == 3
    import math
    first = rows[0]["best_corr"]  # nothing to compare against yet (null/NaN)
    assert first is None or math.isnan(first)
    assert rows[1]["best_corr"] > 0.98 and not rows[1]["drifted"]  # same dist
    assert rows[2]["best_corr"] < rows[1]["best_corr"] - 0.02
    assert rows[2]["drifted"]  # shifted dist fires the alert


def test_streaming_hll_restart_parity(spark, webpages, tmp_path):
    """Kill-and-restart equivalence for sketch state (the reference's EP3
    serialize/restore hooks, lua_binding/cm_sketch.c:167-202): run phase 1
    over half the stream, stop, add the second half, restart from the SAME
    checkpoint — the restored HLL state must yield estimates identical to an
    uninterrupted streaming run over the full data (HLL register-max is
    order/partition-independent, so equality is exact)."""
    schema = webpages.schema
    d = tmp_path / "stream_in"
    a = webpages.limit(6000)
    b = webpages.subtract(a)
    a.write.parquet(str(d / "batch=0"))

    def run(ck, sink):
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(d))
        out = streaming_hll_distinct(stream.select("lang", "url"),
                                     "lang", "url", p=12)

        def write_batch(batch_df, batch_id):  # memory sink can't recover;
            batch_df.write.mode("append").parquet(sink)  # foreachBatch can

        q = (
            out.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def final_by_lang(sink):
        spark.read.parquet(sink).createOrReplaceTempView("hll_restart_out")
        return {r["lang"]: (r["approx_distinct"], r["batches"])
                for r in spark.sql(
                    "select lang, max_by(approx_distinct, batches) "
                    "approx_distinct, max(batches) batches "
                    "from hll_restart_out group by lang").collect()}

    ck, sink = str(tmp_path / "ck_restart"), str(tmp_path / "sink_restart")
    run(ck, sink)                       # phase 1: first half only
    b.write.parquet(str(d / "batch=1"))
    run(ck, sink)                       # phase 2: restart, second half
    got = final_by_lang(sink)

    # uninterrupted reference: fresh checkpoint, all data in one run
    ck2, sink2 = str(tmp_path / "ck_whole"), str(tmp_path / "sink_whole")
    run(ck2, sink2)
    ref = final_by_lang(sink2)

    assert set(got) == set(ref)
    for lang, (exp, _) in ref.items():
        est, batches = got[lang]
        assert est == exp, (lang, est, exp)   # exact: state was restored
        assert batches >= 2                    # continued, not recomputed

    # and the estimates are real: within the published HLL bound of exact
    exact = {r["lang"]: r["exact"] for r in webpages.groupBy("lang").agg(
        F.countDistinct("url").alias("exact")).collect()}
    rse = 1.04 / (2 ** 12) ** 0.5
    for lang, ex in exact.items():
        assert abs(got[lang][0] - ex) <= max(3 * rse * ex, 3)


def test_streaming_bloom_dedup_suppresses_across_batches(spark, tmp_path):
    """First-seen semantics across micro-batches: values repeated in a LATER
    file must be suppressed (Bloom state survives the batch boundary),
    emitted values are globally unique, and every distinct value is emitted
    exactly once (fpr 1e-9 -> no FP losses at this size)."""
    from streaming_algorithms_spark.streaming import streaming_bloom_dedup

    d = tmp_path / "dedup_in"
    rows0 = [(f"u{i}",) for i in range(500)]
    rows1 = [(f"u{i}",) for i in range(250, 750)]  # 250 repeats + 250 new
    spark.createDataFrame(rows0, "user string").write.parquet(str(d / "b=0"))
    spark.createDataFrame(rows1, "user string").write.parquet(str(d / "b=1"))
    stream = (
        spark.readStream.schema("user string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = streaming_bloom_dedup(stream, "user", capacity=1 << 16, n_buckets=8)
    q = (
        out.writeStream.format("memory").queryName("bloom_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = [r["user"] for r in spark.table("bloom_dedup").collect()]
    assert len(emitted) == len(set(emitted))  # no duplicate emits, ever
    assert set(emitted) == {f"u{i}" for i in range(750)}  # complete


def test_streaming_multi_sketch_matches_singles(spark, webpages, stream_dir,
                                                tmp_path):
    """The combined HLL+KLL state op must (a) carry BOTH sketches across
    micro-batch boundaries and (b) produce the SAME final estimates as
    the single-sketch streaming ops over the same input — composition is
    an implementation detail, not a semantics change."""
    from streaming_algorithms_spark.streaming import (
        streaming_kll_quantiles,
        streaming_multi_sketch,
    )

    schema = webpages.schema

    def drain(op_df, name, ck):
        q = (
            op_df.writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name)

    def src():
        return spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).option("maxFilesPerTrigger", 1).parquet(stream_dir).withColumn(
            "text_len", F.length("text").cast("double")
        )

    combo = drain(
        streaming_multi_sketch(src().select("lang", "url", "text_len"),
                               "lang", "url", "text_len", p=12, k=200),
        "multi_stream", "ck_multi",
    )
    final = {r["lang"]: r for r in spark.sql(
        "select lang, max_by(approx_distinct, batches) approx_distinct, "
        "max_by(q50, batches) q50, max_by(n_seen, batches) n_seen, "
        "max(batches) batches from multi_stream group by lang").collect()}

    # state crossed >= 2 micro-batches for every lang (both files carry
    # every lang: webpages langs are dense)
    assert all(r["batches"] >= 2 for r in final.values()), final

    # HLL side: identical to the single-op estimate (same p, same JVM
    # xxhash64 insert hash -> identical registers)
    single_hll = drain(
        streaming_hll_distinct(src().select("lang", "url"), "lang", "url",
                               p=12),
        "hll_single_stream", "ck_hll_s",
    )
    want_hll = {r["lang"]: r["approx_distinct"] for r in spark.sql(
        "select lang, max_by(approx_distinct, batches) approx_distinct "
        "from hll_single_stream group by lang").collect()}
    assert {k: v["approx_distinct"] for k, v in final.items()} == want_hll

    # KLL side: same median estimate as the single op (same k; same
    # insertion order batch-by-batch)
    single_kll = drain(
        streaming_kll_quantiles(src().select("lang", "text_len"), "lang",
                                "text_len", k=200, qs=(0.5,)),
        "kll_single_stream", "ck_kll_s",
    )
    want_kll = {r["lang"]: (r["q50"], r["n_seen"]) for r in spark.sql(
        "select lang, max_by(q50, batches) q50, max_by(n_seen, batches) "
        "n_seen from kll_single_stream group by lang").collect()}
    got_kll = {k: (v["q50"], v["n_seen"]) for k, v in final.items()}
    assert got_kll == want_kll


def test_streaming_multi_sketch_null_ids_keep_exact_hashes(spark, tmp_path):
    """Regression: chunks CONTAINING a NULL distinct_col must not corrupt
    the other rows' insert hashes.  The old plan wrapped xxhash64 in
    when(isNotNull, ...), making the column nullable — a null-containing
    Arrow chunk then landed in pandas as float64 and every hash in it was
    silently rounded to 53-bit precision, so the same id inserted as
    different values from null-containing vs null-free chunks.  The gate:
    the streamed estimate must EQUAL a locally-built HLL fed the exact
    JVM xxhash64 values of the non-null ids."""
    from streaming_algorithms_spark.sketches.hll import HyperLogLog
    from streaming_algorithms_spark.streaming import streaming_multi_sketch

    import numpy as np

    rows = []
    for i in range(400):
        # every 5th id NULL -> every Arrow chunk contains nulls
        rid = None if i % 5 == 0 else f"user-{i % 97}"
        rows.append(("k", rid, float(i)))
    df = spark.createDataFrame(rows, "key string, id string, val double")
    d = tmp_path / "null_stream"
    df.repartition(1).write.parquet(str(d / "batch=0"))

    stream = spark.readStream.schema(df.schema).option(
        "recursiveFileLookup", "true").parquet(str(d))
    out = streaming_multi_sketch(stream, "key", "id", "val", p=12, k=200)
    q = (
        out.writeStream.format("memory").queryName("null_mix_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_null_mix"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select max_by(approx_distinct, batches) approx_distinct, "
        "max_by(n_seen, batches) n_seen from null_mix_stream").first()

    # reference registers from the exact JVM hash values, no stream
    hashes = (
        df.filter(F.col("id").isNotNull())
        .select(F.xxhash64("id").alias("h")).toPandas()["h"]
        .to_numpy(np.int64).view(np.uint64)
    )
    ref = HyperLogLog(12)
    ref.add_hashes(hashes)
    assert got["approx_distinct"] == int(round(ref.estimate()))
    assert got["n_seen"] == 400  # NULL ids still contribute their values


def test_warc_stream_incremental_ingest(spark, tmp_path):
    """Continuous crawl ingestion: read_warc_stream picks up newly landed
    archive segments, a restart from the same checkpoint resumes
    exactly-once (already-ingested archives never re-parse), and the
    accumulated table equals the batch read of everything landed."""
    from streaming_algorithms_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        write_warc,
    )
    from streaming_algorithms_spark.sources.webpages import generate_webpages

    drop = tmp_path / "drop"
    drop.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "ingested")

    pages = generate_webpages(spark, 120, n_hosts=6, partitions=3).cache()
    seg_a = pages.filter("xxhash64(url) % 3 = 0")
    seg_b = pages.filter("xxhash64(url) % 3 = 1")
    seg_c = pages.subtract(seg_a).subtract(seg_b)

    def land(df, name):
        d = tmp_path / ("stage_" + name)
        write_warc(df.coalesce(1), str(d), compress=True, cc_style=True)
        import os
        import shutil
        for f in os.listdir(str(d)):
            if f.startswith("part-"):
                shutil.move(str(d / f), str(drop / (name + ".warc.gz")))

    def drain():
        q = (
            read_warc_stream(spark, str(drop), max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land(seg_a, "seg-a")
    land(seg_b, "seg-b")
    drain()
    first = spark.read.parquet(out).count()
    assert first == seg_a.count() + seg_b.count()

    # new segment lands; restart from the SAME checkpoint: only seg-c is
    # parsed (exactly-once), and the table now holds everything
    land(seg_c, "seg-c")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == pages.count()  # no re-ingest duplicates

    batch = read_warc(spark, str(drop))
    def rowset(df):
        return sorted((r["url"], r["warc_ts"], bytes(r["html"]))
                      for r in df.collect())
    assert rowset(got) == rowset(batch)


def test_stream_to_incremental_stores_end_to_end(spark, tmp_path):
    """The composed 10^12-doc operating loop (streaming/ingest.py): a WARC
    drop directory streams through foreachBatch into BOTH incremental
    stores — SketchTable (per-host HLL partials) and IvfIndex
    (deterministic hash embeddings) — one append per micro-batch.  After
    3 segments across two drains plus a mid-stream CRASH (injected after
    the epoch's store commits but before the streaming checkpoint commits
    the epoch), the replay is idempotent: exactly one batch per epoch in
    each ledger, sketch estimates EQUAL the one-shot aggregate over
    everything landed, and full-probe index search equals brute force."""
    import numpy as np
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.ivf_index import IvfIndex
    from streaming_algorithms_spark.operators.sketch_agg import (
        sketch_aggregate,
    )
    from streaming_algorithms_spark.operators.similarity import (
        brute_force_topk,
    )
    from streaming_algorithms_spark.sketch_table import SketchTable
    from streaming_algorithms_spark.sketches.hll import HyperLogLog
    from streaming_algorithms_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        write_warc,
    )
    from streaming_algorithms_spark.sources.webpages import generate_webpages
    from streaming_algorithms_spark.streaming.ingest import (
        AppendRoute,
        ingest_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    ck = str(tmp_path / "ck")

    pages = generate_webpages(spark, 90, n_hosts=5, partitions=2).cache()
    segs = [pages.filter(f"xxhash64(url) % 3 = {i}") for i in range(2)]
    segs.append(pages.subtract(segs[0]).subtract(segs[1]))

    def land(df, name):
        d = tmp_path / ("stage_" + name)
        write_warc(df.coalesce(1), str(d), compress=True, cc_style=True)
        import os
        import shutil
        for f in os.listdir(str(d)):
            if f.startswith("part-"):
                shutil.move(str(d / f), str(drop / (name + ".warc.gz")))

    # --- the two stores and their route transforms -----------------------
    def factory():
        return HyperLogLog(12)

    def update(sk, pdf):  # closure: executors can't import from tests/
        sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))

    def finalize(sk, rows):
        return {"approx_distinct": int(round(sk.estimate())),
                "rows_seen": rows}

    schema = "approx_distinct bigint, rows_seen bigint"

    def to_host_hashes(batch_df):
        return batch_df.select(
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
            F.xxhash64("url").alias("_h"))

    def to_embeddings(batch_df):
        # deterministic 8-dim hash embedding: the Spark-side plumbing is
        # the test subject, not the featurizer
        return batch_df.select(
            F.xxhash64("url").alias("vec_id"),
            F.array(*[(F.xxhash64("url", F.lit(i)) % 1000)
                      .cast("double") for i in range(8)]).alias("vec"))

    table = SketchTable(spark, str(tmp_path / "tbl"), ["host"])
    index = IvfIndex(spark, str(tmp_path / "ivf"), "vec_id", "vec")
    routes = [
        AppendRoute(table, to_host_hashes,
                    {"factory": factory, "update": update}),
        AppendRoute(index, to_embeddings, {"n_lists": 4}),
    ]

    def drain(on_epoch=None):
        q = ingest_stream(
            read_warc_stream(spark, str(drop), max_files_per_trigger=1),
            routes, ck, on_epoch=on_epoch)
        q.awaitTermination(180)

    # drain 1: two segments -> two epochs -> two batches per store
    land(segs[0], "seg-a")
    land(segs[1], "seg-b")
    drain()
    assert table.committed_batches() == ["epoch-000000000",
                                         "epoch-000000001"]
    assert index.committed_batches() == table.committed_batches()

    # drain 2 with a CRASH: seg-c's epoch commits to both stores, then the
    # injected failure kills the query BEFORE the checkpoint commits the
    # epoch -- the classic replay window
    land(segs[2], "seg-c")
    armed = {"on": True}

    def fail_once(epoch_id, batch_df):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("injected crash before epoch commit")

    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        drain(on_epoch=fail_once)
    assert "epoch-000000002" in table.committed_batches()  # committed...

    # restart from the SAME checkpoint: the epoch replays, both appends
    # are skipped as already-committed (no "already exists" error), and
    # the ledgers hold exactly one batch per epoch
    drain()
    assert table.committed_batches() == [
        "epoch-000000000", "epoch-000000001", "epoch-000000002"]
    assert index.committed_batches() == table.committed_batches()

    # incremental == one-shot over everything landed (both stores)
    everything = read_warc(spark, str(drop))
    inc = (table.estimates(HyperLogLog.from_bytes, finalize, schema)
           .orderBy("host").toPandas())
    oneshot = (sketch_aggregate(to_host_hashes(everything), ["host"],
                                factory, update, HyperLogLog.from_bytes,
                                finalize, schema)
               .orderBy("host").toPandas())
    assert inc.equals(oneshot)

    vecs = to_embeddings(everything)
    got = {(r["vec_id"], r["rank"]): r["neighbor_id"]
           for r in index.topk(k=1, n_probe=None).collect()}
    bf = {(r["vec_id"], r["rank"]): r["neighbor_id"]
          for r in brute_force_topk(vecs, vecs, "vec_id", "vec",
                                    k=1).collect()}
    assert got == bf


def test_ingest_routes_sharing_a_store_need_distinct_names(spark, tmp_path):
    """Two routes into ONE ledger with the same batch-id suffix would make
    the second a silent exactly-once no-op every epoch — refused at
    construction, as is a name that can't be a batch-dir component.
    Distinct names route both through: each epoch lands one batch per
    name and the merged estimates cover BOTH routes' rows."""
    import json

    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.sketch_table import SketchTable
    from streaming_algorithms_spark.sketches.hll import HyperLogLog
    from streaming_algorithms_spark.streaming.ingest import (
        AppendRoute,
        ingest_stream,
    )

    t = SketchTable(spark, str(tmp_path / "tbl"), ["side"])

    def factory():
        return HyperLogLog(12)

    def update(sk, pdf):  # closure: executors can't import from tests/
        sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))

    def mk(side, lo, hi):
        def tf(df):
            return (df.where(f"value >= {lo} AND value < {hi}")
                    .select(F.lit(side).alias("side"),
                            F.xxhash64("value").alias("_h")))
        return tf

    kw = {"factory": factory, "update": update}
    with _pytest.raises(ValueError, match="distinct name"):
        ingest_stream(None, [AppendRoute(t, mk("a", 0, 50), kw),
                             AppendRoute(t, mk("b", 50, 100), kw)],
                      checkpoint=str(tmp_path / "ck0"))
    with _pytest.raises(ValueError, match="A-Za-z0-9"):
        ingest_stream(None, [AppendRoute(t, None, kw, name="bad name!")],
                      checkpoint=str(tmp_path / "ck0"))

    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text("\n".join(
        json.dumps({"value": i}) for i in range(100)))
    stream = spark.readStream.schema("value long").json(str(src))
    q = ingest_stream(
        stream,
        [AppendRoute(t, mk("a", 0, 50), kw, name="ra"),
         AppendRoute(t, mk("b", 50, 100), kw, name="rb")],
        checkpoint=str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert sorted(t.committed_batches()) == [
        "epoch-000000000-ra", "epoch-000000000-rb"]

    def finalize(sk, rows):
        return {"est": int(round(sk.estimate()))}

    est = {r["side"]: r["est"]
           for r in t.estimates(HyperLogLog.from_bytes, finalize,
                                "est bigint").collect()}
    assert est["a"] > 0 and est["b"] > 0
