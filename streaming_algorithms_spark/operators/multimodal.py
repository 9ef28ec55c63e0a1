"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns plus typed metadata — the same shape
the webpages table uses for ``html``.  The Spark-side plumbing (schemas,
partition sizing, Arrow batch shapes, UDF signatures) is real and tested;
the actual codec calls are stubbed because the sandbox ships no image/audio
libraries — each stub is clearly marked and either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode), per the round-1 brief.

Scale notes baked into the design:
- decode/feature-extract is mapInPandas with SMALL Arrow batches
  (media rows are MBs; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  must come down for real media — parameterized here).
- metadata-only operations never touch the binary column (column pruning:
  select() before the UDF so the scan skips the blob pages).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def _fake_decode_image(payload: bytes, out_hw: tuple) -> np.ndarray:
    """STUB — deterministic fake decoder.  A real deployment swaps in
    PIL/libvips here; the Spark plumbing around it is unchanged."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], np.uint64)[0])
    return rng.integers(0, 256, (*out_hw, 3), dtype=np.uint8)


def decode_and_resize(df: DataFrame, payload_col: str = "payload",
                      out_h: int = 64, out_w: int = 64,
                      strict: bool = False) -> DataFrame:
    """binary -> fixed-shape uint8 image tensor (flattened array<int> +
    dims).  Batch shape: (batch, H, W, 3) built per Arrow batch."""
    out_schema = "media_id long, pixels array<int>, h int, w int, c int"

    def gen(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL/libvips — not in this container"
                )
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = _fake_decode_image(bytes(payload), (out_h, out_w))
                recs.append((int(mid), img.ravel().tolist(), out_h, out_w, 3))
            yield pd.DataFrame(recs, columns=["media_id", "pixels", "h", "w", "c"])

    return df.select("media_id", payload_col).mapInPandas(gen, out_schema)


def media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap content features that don't need a codec: byte length, sha256,
    byte-entropy — all real (no stub), vectorized per batch."""
    out_schema = "media_id long, n_bytes long, sha256 string, byte_entropy double"

    def gen(batches):
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), np.uint8)
                if b.size:
                    counts = np.bincount(b, minlength=256)
                    probs = counts[counts > 0] / b.size
                    ent = float(-(probs * np.log2(probs)).sum())
                else:
                    ent = 0.0
                recs.append((int(mid), int(b.size),
                             hashlib.sha256(bytes(payload)).hexdigest(), ent))
            yield pd.DataFrame(recs, columns=["media_id", "n_bytes", "sha256",
                                              "byte_entropy"])

    return df.select("media_id", payload_col).mapInPandas(gen, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan from metadata ONLY (duration_ms) — the scan
    never reads the payload column (verify with .explain: ReadSchema excludes
    it).  Emits (media_id, frame_ts_ms) rows for a downstream decoder."""
    return (
        df.select("media_id", "duration_ms")
        .filter(F.col("duration_ms") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media_table(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        size = int(rng.integers(100, 4000))
        payload = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, f"application/x-{kind}",
                     64, 64, int(rng.integers(1000, 10000))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
