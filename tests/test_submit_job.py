"""End-to-end test of the north-rule SHIP MECHANISM: the library zipped by
scripts/make_pyfiles_zip.py must run under a REAL ``spark-submit
--py-files`` in a fresh JVM + fresh Python with the repo absent from
PYTHONPATH — proving the zip alone carries the package — and the job's
sketch output must match an exact recomputation of the same input.

This is the one test that exercises scripts/submit_job.py at all; it
caught the job assuming the webpages ``url`` column on a table that
doesn't have one (now an explicit ``--id-col``)."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

ROOT = Path(__file__).resolve().parents[1]
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    # webpages-shaped input (north-rule input_hint: url/text/lang) derived
    # from the frozen documents table; urls unique per row
    inp = tmp_path / "webpages_in"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (docs.select(
        F.concat(F.lit("https://example.com/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "text", "lang",
    ).repartition(4).write.parquet(str(inp)))
    exact = {
        r["lang"]: r
        for r in docs.groupBy("lang").agg(
            F.count("*").alias("n"),
            F.avg(F.length("text")).alias("avg_len"),
        ).collect()
    }

    # the documented flow: build the zip, ship it, run with NO repo on
    # PYTHONPATH (the zip must be self-contained)
    subprocess.run([sys.executable, str(ROOT / "scripts/make_pyfiles_zip.py")],
                   check=True, capture_output=True, cwd=str(ROOT))
    out = tmp_path / "out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [shutil.which("spark-submit"), "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(ROOT / "dist/sketchlib.zip"),
         str(ROOT / "scripts/submit_job.py"),
         "--input", str(inp), "--output", str(out)],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    got = pq.read_table(str(out)).to_pandas().set_index("lang")
    assert set(got.index) == set(exact)
    rse = 1.04 / (2 ** 14) ** 0.5
    for lang, e in exact.items():
        row = got.loc[lang]
        assert int(row["rows_seen"]) == e["n"]
        # urls are unique per row -> exact distinct == row count
        assert abs(row["distinct_urls"] - e["n"]) <= 3 * rse * e["n"] + 3
        assert abs(row["avg_len"] - e["avg_len"]) <= 1e-6 * max(e["avg_len"], 1)
        # KLL under capacity is exact: the reported median is a real text
        # length whose rank in the lang's distribution is ~0.5
        lens = [len(t) for t in
                docs.filter(F.col("lang") == lang)
                    .select("text").toPandas()["text"]]
        rank = sum(1 for x in lens if x <= row["p50_len"]) / len(lens)
        assert 0.45 <= rank <= 0.56, (lang, row["p50_len"], rank)

    # ---- incremental mode through the same ship mechanism: two separate
    # spark-submit JVMs play two crawl days appending to ONE sketch table
    # (the daily-segment operating flow); day-0 also compacts.
    def submit(extra):
        rr = subprocess.run(
            [shutil.which("spark-submit"), "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--py-files", str(ROOT / "dist/sketchlib.zip"),
             str(ROOT / "scripts/submit_job.py")] + extra,
            env=env, capture_output=True, text=True, timeout=300,
            cwd=str(tmp_path),
        )
        assert rr.returncode == 0, rr.stderr[-3000:]

    tbl = tmp_path / "sketch_tbl"
    out_d0, out_d1 = tmp_path / "out_d0", tmp_path / "out_d1"
    submit(["--input", str(inp), "--output", str(out_d0),
            "--sketch-table", str(tbl), "--batch-id", "day-0", "--compact"])

    # single-batch table estimates must EQUAL the one-shot job's output:
    # same registers, same finalize — the merge tree is the only difference
    d0 = pq.read_table(str(out_d0)).to_pandas().set_index("lang").sort_index()
    one = got.sort_index()
    assert (d0["distinct_urls"] == one["distinct_urls"]).all()
    assert (d0["rows_seen"] == one["rows_seen"]).all()
    assert (abs(d0["avg_len"] - one["avg_len"])
            <= 1e-9 * abs(one["avg_len"])).all()
    assert (abs(d0["p50_len"] - one["p50_len"]) <= 1e-9).all()

    # day-1: disjoint url space, new JVM, appends to the compacted table
    inp2 = tmp_path / "webpages_in2"
    (docs.select(
        F.concat(F.lit("https://example.org/x/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "text", "lang",
    ).repartition(4).write.parquet(str(inp2)))
    submit(["--input", str(inp2), "--output", str(out_d1),
            "--sketch-table", str(tbl), "--batch-id", "day-1"])

    d1 = pq.read_table(str(out_d1)).to_pandas().set_index("lang").sort_index()
    rse3 = 3 * 1.04 / (2 ** 14) ** 0.5
    for lang, e in exact.items():
        row = d1.loc[lang]
        assert int(row["rows_seen"]) == 2 * e["n"]  # both days counted
        assert abs(row["distinct_urls"] - 2 * e["n"]) <= rse3 * 2 * e["n"] + 3

    # table layout after the two JVMs: one generation + day-1 residual
    from streaming_algorithms_spark.sketch_table import SketchTable
    t = SketchTable(spark, str(tbl), ["lang"])
    assert set(t.live_units()) == {"compact-000000/data", "batch-day-1"}
