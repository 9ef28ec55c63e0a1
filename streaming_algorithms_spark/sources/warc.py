"""WARC source/sink — the Common-Crawl-style ingestion path.

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages"; upstream of that table sits the crawl archive itself: WARC files
(ISO 28500), one gzip member stream per segment, each ``response`` record
carrying a target URI, a capture date, and the payload bytes.  This
module re-expresses that boundary Spark-first:

- ``read_warc``: ``spark.read.format("binaryFile")`` over ``*.warc[.gz]``
  — one task per archive file (exactly the parallelism unit Common Crawl
  ships: ~1 GB segment files), then a ``mapInPandas`` record parser that
  emits ``(url, warc_ts, html)`` rows.  No shuffle; downstream column
  pruning/filters apply after parse.  At 100 TB the file listing is the
  only driver-side work.
- ``write_warc``: ``foreachPartition`` sink writing one
  ``part-<pid>.warc[.gz]`` per partition — the shuffle-free inverse, used
  to materialize corpora back into the archive interchange format.

Simplifications vs the full spec (documented contract, tested):
records are ``WARC-Type: response`` with the payload stored directly
(real CC wraps an HTTP response envelope; the envelope strip is a
byte-prefix drop that changes nothing structural); per-record gzip
members are replaced by whole-file gzip (``.warc.gz``); WARC-Date uses
millisecond precision (WARC 1.1 allows fractional seconds) so the
``warc_ts`` column roundtrips exactly — the corpus timestamps are
ms-truncated (sources/webpages.py).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"

_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def _record(url: str, ts, payload: bytes) -> bytes:
    """One WARC/1.0 response record.  The record id is derived from the
    url digest, not random — re-writing the same corpus produces
    byte-identical archives (the determinism contract every other sink in
    this repo follows)."""
    rid = uuid.UUID(hashlib.md5(url.encode()).hexdigest())
    date = pd.Timestamp(ts).strftime(_DATE_FMT)[:-3] + "Z"  # ms precision
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/octet-stream\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def write_warc(df: DataFrame, path: str, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html",
               compress: bool = True) -> None:
    """Write ``df`` as WARC files, one per partition (shuffle-free sink;
    repartition first to choose the archive file count).  Local/shared
    filesystem paths (the sandbox case); an object-store deployment swaps
    the ``open`` for its client in this one function."""
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def write_partition(rows):
        first = next(iter(rows), None)
        if first is None:
            return
        import itertools

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}{ext}")
        chunks = []
        for row in itertools.chain([first], rows):
            chunks.append(_record(row[url_col], row[ts_col],
                                  bytes(row[payload_col])))
        blob = b"".join(chunks)
        if compress:
            # mtime=0: gzip headers embed a timestamp; zeroing it keeps
            # re-writes byte-identical (determinism contract)
            blob = gzip.compress(blob, mtime=0)
        with open(out, "wb") as f:
            f.write(blob)

    df.select(url_col, ts_col, payload_col).foreachPartition(write_partition)


def _parse_warc_bytes(blob: bytes):
    """Yield (url, warc_ts, payload) from one decompressed WARC stream."""
    pos = 0
    n = len(blob)
    while pos < n:
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        head = blob[pos:end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        payload = blob[end + 4:end + 4 + length]
        if fields.get("warc-type") == "response":
            url = fields.get("warc-target-uri", "")
            ts = pd.Timestamp(fields.get("warc-date", "").rstrip("Z"))
            yield url, ts, payload
        pos = end + 4 + length + 4  # skip payload + record separator


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one row per archive file from binaryFile
    (PathGlobFilter keeps sidecars out), record parsing in Arrow batches.
    Returns (url, warc_ts, html)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            urls, tss, payloads = [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if p.endswith(".gz"):
                    blob = gzip.decompress(blob)
                for url, ts, payload in _parse_warc_bytes(blob):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
            yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                "html": payloads})

    return files.mapInPandas(gen, WARC_SCHEMA)
