"""WARC source/sink — the Common-Crawl-style ingestion path.

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages"; upstream of that table sits the crawl archive itself: WARC files
(ISO 28500), one gzip stream per segment, each ``response`` record
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
  task memory, not O(partition)), under a task-commit protocol (below).

Real-Common-Crawl compatibility (both are handled transparently on read):

- **Per-record gzip members.**  CC archives gzip each record as its own
  member and concatenate; ``gzip``/``zlib`` decode a concatenated-member
  stream as the concatenation of the members (RFC 1952 §2.2), and the
  reader decompresses member-by-member with a streaming ``zlib``
  decompressobj, so one task never holds compressed+decompressed copies
  of more than the running archive.  ``write_warc(cc_style=True)``
  produces this exact layout (one deterministic mtime=0 member per
  record), which is what the spec-faithful roundtrip tests read back.
- **HTTP response envelope.**  CC ``response`` records carry
  ``Content-Type: application/http; msgtype=response`` and wrap the body
  in a full HTTP response (status line + headers + CRLFCRLF).  The parser
  strips the envelope whenever the record's content type says
  ``application/http`` — the returned ``html`` column is the body bytes,
  byte-identical to what was archived.  A missing envelope terminator is
  a corrupt record and raises (fail-loud contract).

Remaining simplifications vs the full spec (documented, tested):
``write_warc``'s default (``cc_style=False``) stores the payload directly
with whole-file gzip — the compact internal interchange format; WARC-Date
uses millisecond precision (WARC 1.1 allows fractional seconds) so the
``warc_ts`` column roundtrips exactly — the corpus timestamps are
ms-truncated (sources/webpages.py).  Record ids hash (url, date,
payload digest): deterministic re-writes, unique per distinct capture —
byte-identical duplicate captures share an id (deviation from strict
per-record uniqueness, accepted for the determinism contract).

Task-commit protocol (sink): each task streams to a dot-prefixed temp
file ``.part-<pid>-<taskAttemptId>.<ext>.tmp`` — invisible to Spark file
listings (leading-dot paths are filtered by every Hadoop/Spark file
index) and unique per ATTEMPT, so a speculative or retried attempt can
never interleave bytes with another attempt — then atomically
``os.replace``s it to the final ``part-<pid>`` name on task success.
Either attempt's rename yields a whole archive (last-writer-wins with
whole files, the same guarantee as Hadoop's v1 commit rename).  A failed
job leaves only dot-temps and no ``_SUCCESS``; ``read_warc(...,
require_success=True)`` turns the marker into a read-side integrity
check for directories produced by this sink.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
import zlib

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


def _record(url: str, ts, payload: bytes, cc_style: bool = False) -> bytes:
    """One WARC/1.0 response record; see module docstring for the record-id
    and date contracts.  ``cc_style`` wraps the payload in an HTTP/1.1
    response envelope and stamps the CC content type — the record id still
    hashes the BODY digest, so the same capture gets the same id in either
    format."""
    date = pd.Timestamp(ts).strftime(_DATE_FMT)[:-3] + "Z"  # ms precision
    digest = hashlib.md5(
        url.encode() + b"\x00" + date.encode() + b"\x00"
        + hashlib.md5(payload).digest()
    ).hexdigest()
    rid = uuid.UUID(digest)
    if cc_style:
        envelope = (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=UTF-8\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode() + payload
        ctype = "application/http; msgtype=response"
    else:
        envelope = payload
        ctype = "application/octet-stream"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {_header_value(url)}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(envelope)}\r\n"
        "\r\n"
    ).encode()
    return head + envelope + b"\r\n\r\n"


class _TaskWriter:
    """Task-commit protocol for one partition's archive (module docstring).

    ``write`` streams records (O(record) memory); ``commit`` closes the
    temp file and atomically renames it over the final part name;
    ``abort`` (or never committing) leaves only the dot-temp, which Spark
    file listings ignore.  Deterministic output: gzip mtime=0 whether
    whole-file (default) or per-record member (``cc_style``)."""

    def __init__(self, path: str, pid: int, attempt: int, compress: bool,
                 cc_style: bool):
        ext = ".warc.gz" if compress else ".warc"
        self.final = os.path.join(path, f"part-{pid:05d}{ext}")
        self.tmp = os.path.join(path, f".part-{pid:05d}-{attempt}{ext}.tmp")
        self.compress = compress
        self.cc_style = cc_style
        self._raw = open(self.tmp, "wb")
        # whole-file gzip: one stream; cc_style: one member per record.
        # filename="" suppresses the FNAME header field — GzipFile would
        # otherwise embed the temp path (which carries the task ATTEMPT id)
        # and break byte-determinism across re-writes.  Level 6 (zlib
        # default, what CC's own tooling ships) — level 9 costs ~2x CPU
        # for ~1% on this payload shape.
        self._f = (gzip.GzipFile(filename="", fileobj=self._raw, mode="wb",
                                 mtime=0, compresslevel=6)
                   if compress and not cc_style else self._raw)

    def write(self, url: str, ts, payload: bytes) -> None:
        rec = _record(url, ts, payload, cc_style=self.cc_style)
        if self.cc_style and self.compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0,
                               compresslevel=6) as g:
                g.write(rec)
            rec = buf.getvalue()
        self._f.write(rec)

    def _close(self) -> None:
        self._f.close()
        if self._f is not self._raw:
            self._raw.close()

    def commit(self) -> None:
        self._close()
        # the one atomic swap — runs executor-side, through the shared
        # commit seam (commit.publish_file; os.replace locally, the object
        # store's primitive in that deployment)
        from .. import commit as _commit
        _commit.publish_file(self.tmp, self.final)

    def abort(self) -> None:
        self._close()
        try:
            os.remove(self.tmp)
        except OSError:
            pass


def write_warc(df: DataFrame, path: str, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html",
               compress: bool = True, cc_style: bool = False) -> None:
    """Write ``df`` as WARC files, one per partition (shuffle-free sink;
    repartition first to choose the archive file count).  ``cc_style``
    emits the spec-faithful Common-Crawl layout (per-record gzip members +
    HTTP response envelope); the default is the compact internal format.
    Local/shared filesystem paths (the sandbox case); an object-store
    deployment swaps ``commit.publish_file`` (the shared atomic-publish
    seam ``_TaskWriter.commit`` routes through) plus the ``open`` for its
    client.  Refuses a non-empty target directory."""
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if not f.startswith(".")]
    if existing:
        raise ValueError(
            f"write_warc: target {path!r} is not empty ({existing[:3]}...); "
            "stale part files would silently union into reads — write to a "
            "fresh directory"
        )

    def write_partition(rows):
        first = next(iter(rows), None)
        if first is None:
            return
        import itertools

        from pyspark import TaskContext

        ctx = TaskContext.get()
        w = _TaskWriter(path, ctx.partitionId(), ctx.taskAttemptId(),
                        compress, cc_style)
        try:
            for row in itertools.chain([first], rows):
                w.write(row[url_col], row[ts_col], bytes(row[payload_col]))
        except BaseException:
            w.abort()
            raise
        w.commit()

    df.select(url_col, ts_col, payload_col).foreachPartition(write_partition)
    with open(os.path.join(path, "_SUCCESS"), "wb"):
        pass


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — real CC
    archives are one gzip member PER RECORD concatenated (RFC 1952
    §2.2).  ``GzipFile`` walks the members in C with a chunked internal
    reader: O(archive) total work.  (A hand-rolled decompressobj loop is
    QUADRATIC here — ``blob[pos:]`` / ``unused_data`` copy the remaining
    archive once per member, ~30k members per real 1 GB CC segment.)
    Fail-loud contract preserved: a truncated member raises EOFError and
    non-gzip trailing garbage raises BadGzipFile inside the walk — both
    surface as ValueError, never a silently short archive."""
    try:
        with gzip.GzipFile(fileobj=io.BytesIO(blob), mode="rb") as g:
            return g.read()
    except EOFError as e:
        raise ValueError(
            f"truncated gzip member: archive ends mid-member "
            f"(partial/corrupt archive): {e}"
        ) from e
    except (zlib.error, OSError) as e:  # BadGzipFile subclasses OSError
        raise ValueError(f"corrupt gzip framing: {e}") from e


def _parse_warc_bytes(blob: bytes):
    """Yield (url, warc_ts, payload) from one decompressed WARC stream.
    Fail-loud contract: a payload shorter than its Content-Length, OR an
    archive cut inside a header block, OR a response record whose declared
    HTTP envelope has no terminator, raises — a partial/corrupt archive
    must surface, never produce plausible-looking short rows.  Records
    whose content type is ``application/http`` have the HTTP response
    envelope stripped (real Common-Crawl layout); others yield the payload
    directly.  Non-``response`` records (warcinfo/request/metadata) are
    skipped."""
    pos = 0
    n = len(blob)
    _crlf = b"\r\n"[0], b"\r\n"[1]
    while pos < n:
        # skip record-separator padding in place — slicing the tail here
        # (blob[pos:]) would copy the remaining archive once per record
        while pos < n and blob[pos] in _crlf:
            pos += 1
        if pos >= n:
            break  # trailing record-separator padding only
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError(
                f"truncated WARC record at offset {pos}: archive ends "
                "inside a header block (no CRLFCRLF terminator; "
                "partial/corrupt archive)"
            )
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
            if fields.get("content-type", "").startswith("application/http"):
                sep = payload.find(b"\r\n\r\n")
                if sep < 0:
                    raise ValueError(
                        f"corrupt response record at offset {pos}: "
                        "application/http payload has no HTTP header "
                        "terminator"
                    )
                payload = payload[sep + 4:]
            url = _decode_header_value(fields.get("warc-target-uri", ""))
            ts = pd.Timestamp(fields.get("warc-date", "").rstrip("Z"))
            yield url, ts, payload
        pos = end + 4 + length + 4  # skip payload + record separator


_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def read_warc_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """CONTINUOUS archive ingestion: a Structured Streaming source over a
    WARC drop directory — each newly landed ``*.warc[.gz]`` segment
    becomes one record batch of (url, warc_ts, html), parsed by the same
    member-gzip/HTTP-envelope parser as ``read_warc``.

    This is the production crawl-to-table path: segments land continuously
    (Common Crawl publishes ~1 GB files), the file-stream source tracks
    processed files in the checkpoint, and a restart resumes EXACTLY where
    it left off — already-ingested archives are never re-parsed, newly
    landed ones are picked up (exactly-once file-level semantics, the
    same guarantee Spark's file sources give parquet).  Downstream:
    ``.writeStream.format("parquet")`` for the raw-pages table, or any
    stateful operator in streaming/stateful.py directly on the stream.
    ``max_files_per_trigger`` bounds micro-batch size (files ARE the
    parallelism unit, so this is executor-count sizing)."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .schema(_BINARYFILE_SCHEMA)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_parse_archives, WARC_SCHEMA)


def _parse_archives(batches):
    """Shared batch parser: one output pdf per archive file (bounded peak
    memory: ONE decompressed archive per task at a time)."""
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            blob = bytes(content)
            if p.endswith(".gz"):
                blob = _gunzip_members(blob)
            urls, tss, payloads = [], [], []
            for url, ts, payload in _parse_warc_bytes(blob):
                urls.append(url)
                tss.append(ts)
                payloads.append(payload)
            yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                "html": payloads})


def read_warc(spark: SparkSession, path: str,
              require_success: bool = False) -> DataFrame:
    """Distributed WARC reader: one row per archive file from binaryFile
    (PathGlobFilter keeps sidecars out), record parsing in Arrow batches,
    ONE output batch per archive file.  Reads both this module's compact
    format and real Common-Crawl layout (per-record gzip members + HTTP
    envelope).  ``require_success=True`` refuses a directory without the
    sink's ``_SUCCESS`` marker — the read-side half of the task-commit
    protocol for archives produced by ``write_warc`` (leave False for
    external archives, which ship no marker).  Returns
    (url, warc_ts, html)."""
    if require_success and not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise ValueError(
            f"read_warc: {path!r} has no _SUCCESS marker — the writing job "
            "did not complete (partial archive set); pass "
            "require_success=False only for externally-produced archives"
        )
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_archives, WARC_SCHEMA)
