"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns plus typed metadata — the same shape
the webpages table uses for ``html``.  The Spark-side plumbing (schemas,
partition sizing, Arrow batch shapes, UDF signatures) is real and tested.
Codecs: simple container formats with public byte layouts are decoded for
real in pure numpy — 24-bit uncompressed BMP (BITMAPINFOHEADER) and PCM16
RIFF/WAVE — so decode → resize → feature-extract runs end-to-end with zero
external libraries.  Compressed formats (JPEG/PNG/MP3/H.264) require real
codec libs the sandbox doesn't ship: those payloads raise
``NotImplementedError`` in strict mode or fall back to a clearly-marked
deterministic fake.

Scale notes baked into the design:
- decode/feature-extract is mapInPandas with SMALL Arrow batches
  (media rows are MBs; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  must come down for real media — parameterized here).
- metadata-only operations never touch the binary column (column pruning:
  select() before the UDF so the scan skips the blob pages).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


# ---------------------------------------------------------------------------
# real pure-numpy codecs (public byte layouts; no external libs)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * row_bytes, offset=off)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 PCM samples -> RIFF/WAVE (PCM16 mono) bytes."""
    data = np.asarray(samples, np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes):
    """RIFF/WAVE (PCM16) bytes -> (samples int16 ndarray, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, _ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or bits != 16 or rate <= 0:
                raise ValueError("unsupported WAV variant (not PCM16/bad rate)")
        elif cid == b"data":
            samples = np.frombuffer(body, np.int16)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("truncated WAV payload")
    return samples, rate


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (pure numpy)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri[:, None], ci[None, :]]


def _fake_decode_image(payload: bytes, out_hw: tuple) -> np.ndarray:
    """STUB — deterministic fake for compressed formats the sandbox can't
    decode.  A real deployment swaps in PIL/libvips here; the Spark plumbing
    around it is unchanged."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], np.uint64)[0])
    return rng.integers(0, 256, (*out_hw, 3), dtype=np.uint8)


def decode_and_resize(df: DataFrame, payload_col: str = "payload",
                      out_h: int = 64, out_w: int = 64,
                      strict: bool = False) -> DataFrame:
    """binary -> fixed-shape uint8 image tensor (flattened array<int> +
    dims).  Batch shape: (batch, H, W, 3) built per Arrow batch.

    BMP payloads decode for real (pure numpy, nearest-neighbor resize);
    other formats raise in strict mode or produce the deterministic fake.
    The `decoded` column is True only for genuinely decoded payloads, so
    fake-fallback pixels (including a corrupt 'BM'-sniffed payload) are
    always distinguishable downstream; `src_h`/`src_w` carry the payload's
    NATIVE dimensions as parsed from its header (-1 when not decoded)."""
    out_schema = ("media_id long, pixels array<int>, h int, w int, c int, "
                  "src_h int, src_w int, decoded boolean")

    def gen(batches):
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(payload)
                img = None
                src_h = src_w = -1
                if raw[:2] == b"BM":
                    try:
                        native = decode_bmp(raw)
                        src_h, src_w = native.shape[:2]
                        img = _resize_nearest(native, out_h, out_w)
                    except Exception:
                        img = None  # 'BM' sniff hit a corrupt/non-BMP payload
                        src_h = src_w = -1
                decoded = img is not None
                if img is None:
                    if strict:
                        raise NotImplementedError(
                            "non-BMP image decode requires PIL/libvips — "
                            "not in this container"
                        )
                    img = _fake_decode_image(raw, (out_h, out_w))
                recs.append((int(mid), img.ravel().tolist(),
                             out_h, out_w, 3, src_h, src_w, decoded))
            yield pd.DataFrame(recs, columns=["media_id", "pixels",
                                              "h", "w", "c",
                                              "src_h", "src_w", "decoded"])

    return df.select("media_id", payload_col).mapInPandas(gen, out_schema)


def _fake_decode_audio(payload: bytes):
    """STUB — deterministic fake samples for compressed audio the sandbox
    can't decode (same contract as _fake_decode_image)."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], np.uint64)[0])
    n = int(rng.integers(400, 4000))
    return rng.integers(-4000, 4000, n).astype(np.int16), 16000


def audio_features(df: DataFrame, payload_col: str = "payload",
                   strict: bool = False) -> DataFrame:
    """PCM16 WAV payloads -> real audio features (duration, RMS, peak,
    zero-crossing rate), decoded with the pure-numpy WAV parser.  Non-WAV
    payloads raise in strict mode or get deterministic fake samples (the
    features of the fake are then computed for real, keeping downstream
    shapes honest)."""
    out_schema = ("media_id long, sample_rate int, n_samples long, "
                  "duration_ms double, rms double, peak int, zcr double")

    def gen(batches):
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(payload)
                try:
                    samples, rate = decode_wav(raw)
                except Exception:
                    if strict:
                        raise NotImplementedError(
                            "non-WAV audio decode requires real codec libs "
                            "— not in this container"
                        )
                    samples, rate = _fake_decode_audio(raw)
                x = samples.astype(np.float64)
                zc = np.count_nonzero(np.diff(np.signbit(samples))) if samples.size > 1 else 0
                recs.append((
                    int(mid), int(rate), int(samples.size),
                    round(samples.size * 1000.0 / rate, 6),
                    round(float(np.sqrt((x * x).mean())) if x.size else 0.0, 6),
                    int(np.abs(samples).max()) if samples.size else 0,
                    round(zc / max(samples.size - 1, 1), 6),
                ))
            yield pd.DataFrame(recs, columns=[
                "media_id", "sample_rate", "n_samples", "duration_ms",
                "rms", "peak", "zcr"])

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
    """Deterministic media table for tests: image rows carry REAL 24-bit BMP
    payloads, audio rows REAL PCM16 WAV payloads (both decodable by the pure-
    numpy codecs above); video rows stay opaque bytes + metadata (no raw
    video container is practical without codec libs)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payload, mime = encode_bmp(img), "image/bmp"
            width, height, dur = w, h, 0
        elif kind == "audio":
            rate = 8000
            n = int(rng.integers(800, 4000))
            t = np.arange(n)
            freq = float(rng.uniform(100, 900))
            samples = (3000 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
            payload, mime = encode_wav(samples, rate), "audio/wav"
            width, height, dur = 0, 0, int(n * 1000 / rate)
        else:
            size = int(rng.integers(100, 4000))
            payload = bytes(rng.integers(0, 256, size, dtype=np.uint8))
            mime = "video/x-opaque"
            width, height, dur = 64, 64, int(rng.integers(1000, 10000))
        rows.append((i, kind, payload, mime, width, height, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
