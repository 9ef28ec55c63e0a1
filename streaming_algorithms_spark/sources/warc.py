"""WARC source/sink — the Common-Crawl-style ingestion path.

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages"; upstream of that table sits the crawl archive itself: WARC files
(ISO 28500), one gzip member stream per segment, each ``response`` record
carrying a target URI, a capture date, and the payload bytes.  This
module re-expresses that boundary Spark-first:

- ``read_warc``: ``spark.read.format("binaryFile")`` over ``*.warc[.gz]``
  — one task per archive file (exactly the parallelism unit Common Crawl
  ships: ~1 GB segment files), then a ``mapInPandas`` record parser that
  emits ``(url, warc_ts, html)`` rows, one output batch per archive file
  (peak memory is bounded by ONE decompressed archive per task).  No
  shuffle; downstream column pruning/filters apply after parse.  At
  100 TB the file listing is the only driver-side work.
- ``write_warc``: ``foreachPartition`` sink STREAMING one
  ``part-<pid>.warc[.gz]`` per partition, record by record (O(record)
  task memory, not O(partition)).  The target directory must be empty
  (stale part files from a previous layout would otherwise silently
  union into reads) and a ``_SUCCESS`` marker is written after the job
  completes, mirroring the Hadoop commit convention.

Simplifications vs the full spec (documented contract, tested):
records are ``WARC-Type: response`` with the payload stored directly
(real CC wraps an HTTP response envelope; the envelope strip is a
byte-prefix drop that changes nothing structural); per-record gzip
members are replaced by whole-file gzip (``.warc.gz``); WARC-Date uses
millisecond precision (WARC 1.1 allows fractional seconds) so the
``warc_ts`` column roundtrips exactly — the corpus timestamps are
ms-truncated (sources/webpages.py).  Record ids hash (url, date,
payload digest): deterministic re-writes, unique per distinct capture —
byte-identical duplicate captures share an id (deviation from strict
per-record uniqueness, accepted for the determinism contract).
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


def _header_value(v: str) -> str:
    """CR/LF percent-encoded ('%' escaped first so the encoding is
    lossless for urls that legitimately contain '%0D'): a url containing
    a newline would otherwise terminate the header block early and
    corrupt the framing of every following record (header-injection
    against our own parser)."""
    return (v.replace("%", "%25")
            .replace("\r", "%0D").replace("\n", "%0A"))


def _decode_header_value(v: str) -> str:
    return (v.replace("%0D", "\r").replace("%0A", "\n")
            .replace("%25", "%"))


def _record(url: str, ts, payload: bytes) -> bytes:
    """One WARC/1.0 response record; see module docstring for the record-id
    and date contracts."""
    date = pd.Timestamp(ts).strftime(_DATE_FMT)[:-3] + "Z"  # ms precision
    digest = hashlib.md5(
        url.encode() + b"\x00" + date.encode() + b"\x00"
        + hashlib.md5(payload).digest()
    ).hexdigest()
    rid = uuid.UUID(digest)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {_header_value(url)}\r\n"
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
    the ``open`` for its client in this one function.  Refuses a
    non-empty target directory."""
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if not f.startswith(".")]
    if existing:
        raise ValueError(
            f"write_warc: target {path!r} is not empty ({existing[:3]}...); "
            "stale part files would silently union into reads — write to a "
            "fresh directory"
        )
    ext = ".warc.gz" if compress else ".warc"

    def write_partition(rows):
        first = next(iter(rows), None)
        if first is None:
            return
        import itertools

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}{ext}")
        # stream record-by-record: O(record) memory, and mtime=0 keeps
        # gzip output byte-identical across re-writes (determinism)
        raw = open(out, "wb")
        f = (gzip.GzipFile(fileobj=raw, mode="wb", mtime=0)
             if compress else raw)
        try:
            for row in itertools.chain([first], rows):
                f.write(_record(row[url_col], row[ts_col],
                                bytes(row[payload_col])))
        finally:
            f.close()
            if f is not raw:
                raw.close()

    df.select(url_col, ts_col, payload_col).foreachPartition(write_partition)
    with open(os.path.join(path, "_SUCCESS"), "wb"):
        pass


def _parse_warc_bytes(blob: bytes):
    """Yield (url, warc_ts, payload) from one decompressed WARC stream.
    Raises on truncation — a payload shorter than its Content-Length means
    a partial/corrupt archive, which must surface, not produce
    plausible-looking short rows."""
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
        if end + 4 + length > n:
            raise ValueError(
                f"truncated WARC record at offset {pos}: declared "
                f"content-length {length} exceeds remaining {n - end - 4} "
                "bytes (partial/corrupt archive)"
            )
        payload = blob[end + 4:end + 4 + length]
        if fields.get("warc-type") == "response":
            url = _decode_header_value(fields.get("warc-target-uri", ""))
            ts = pd.Timestamp(fields.get("warc-date", "").rstrip("Z"))
            yield url, ts, payload
        pos = end + 4 + length + 4  # skip payload + record separator


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one row per archive file from binaryFile
    (PathGlobFilter keeps sidecars out), record parsing in Arrow batches,
    ONE output batch per archive file.  Returns (url, warc_ts, html)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if p.endswith(".gz"):
                    blob = gzip.decompress(blob)
                urls, tss, payloads = [], [], []
                for url, ts, payload in _parse_warc_bytes(blob):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
                yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                    "html": payloads})

    return files.mapInPandas(gen, WARC_SCHEMA)
