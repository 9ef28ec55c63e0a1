#!/usr/bin/env python
"""Cluster entry point: the flagship sketch-build job, shipped via

    python scripts/make_pyfiles_zip.py                 # -> dist/sketchlib.zip
    spark-submit --py-files dist/sketchlib.zip scripts/submit_job.py \
        --input /path/to/webpages_parquet --output /path/to/out \
        [--checkpoint /path/to/ckpt] [--resume]

On a real cluster the SparkSession comes from spark-submit's conf (master,
executor counts); locally it falls back to local[*].  The job builds the
per-lang HLL/KLL/Welford combo sketches with checkpointed per-partition
lineage, so a killed run resumes from the partials (north_rule).

Incremental mode (``--sketch-table DIR --batch-id ID [--compact]``):
instead of a one-shot build, append this input as one ingest batch to a
persistent sketch table (sketch_table.SketchTable) and write the
TABLE-WIDE estimates — the daily-crawl-segment operating flow, where
each day's spark-submit folds ~0.1% new data into sketches over the
full history without rescanning it.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--sketch-table", default=None,
                    help="incremental mode: append --input as batch "
                         "--batch-id to this sketch table, then write the "
                         "table-wide estimates to --output (the daily-"
                         "segment operating flow; mutually exclusive with "
                         "--checkpoint)")
    ap.add_argument("--batch-id", default=None)
    ap.add_argument("--compact", action="store_true",
                    help="compact the sketch table after appending")
    ap.add_argument("--query-id", default="sketch_build")
    ap.add_argument("--id-col", default="url",
                    help="distinct-counted identifier column (url for the "
                         "north-rule webpages table)")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("sketch_build").getOrCreate()

    import numpy as np
    import pandas as pd

    from streaming_algorithms_spark.checkpoint import SketchCheckpoint
    from streaming_algorithms_spark.operators.sketch_agg import (
        build_partials,
        merge_partials,
    )
    from streaming_algorithms_spark.sketches import KLL, HyperLogLog, RunningStats

    df = spark.read.parquet(args.input).select(
        "lang",
        F.xxhash64(args.id_col).alias("url_h"),
        F.length(args.text_col).alias("text_len"),
    )

    class Combo:
        def __init__(self):
            self.hll = HyperLogLog(14)
            self.kll = KLL(200)
            self.rs = RunningStats()

        def update(self, pdf: pd.DataFrame) -> None:
            self.hll.add_hashes(pdf["url_h"].to_numpy(np.int64).view(np.uint64))
            xs = pdf["text_len"].to_numpy("float64")
            self.kll.update_batch(xs)
            self.rs.update_batch(xs)

        def merge(self, o):
            self.hll.merge(o.hll)
            self.kll.merge(o.kll)
            self.rs.merge(o.rs)
            return self

        def to_bytes(self) -> bytes:
            parts = [self.hll.to_bytes(), self.kll.to_bytes(), self.rs.to_bytes()]
            return b"".join(len(x).to_bytes(8, "little") + x for x in parts)

        @classmethod
        def from_bytes(cls, buf: bytes):
            sk = cls()
            off, out = 0, []
            for _ in range(3):
                n = int.from_bytes(buf[off:off + 8], "little")
                off += 8
                out.append(buf[off:off + n])
                off += n
            sk.hll = HyperLogLog.from_bytes(out[0])
            sk.kll = KLL.from_bytes(out[1])
            sk.rs = RunningStats.from_bytes(out[2])
            return sk

    finalize = lambda sk, rows: {  # noqa: E731
        "distinct_urls": int(round(sk.hll.estimate())),
        "p50_len": float(sk.kll.quantile(0.5)),
        "p95_len": float(sk.kll.quantile(0.95)),
        "avg_len": sk.rs.mean,
        "rows_seen": rows,
    }
    schema = ("distinct_urls bigint, p50_len double, p95_len double, "
              "avg_len double, rows_seen bigint")
    update = lambda sk, pdf: sk.update(pdf)  # noqa: E731

    if args.sketch_table and args.checkpoint:
        ap.error("--sketch-table and --checkpoint are mutually exclusive")
    if args.sketch_table:
        if not args.batch_id:
            ap.error("--sketch-table requires --batch-id")
        from streaming_algorithms_spark.sketch_table import SketchTable

        t = SketchTable(spark, args.sketch_table, ["lang"])
        t.append(df, args.batch_id, Combo, update)
        if args.compact:
            t.compact(Combo.from_bytes)
        out = t.estimates(Combo.from_bytes, finalize, schema)
    elif args.checkpoint:
        ck = SketchCheckpoint(spark, args.checkpoint, args.query_id)
        out = ck.run(df, ["lang"], Combo, update, Combo.from_bytes,
                     finalize, schema)
    else:
        partials = build_partials(df, ["lang"], Combo, update)
        out = merge_partials(partials, ["lang"], Combo.from_bytes,
                             finalize, schema)

    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
