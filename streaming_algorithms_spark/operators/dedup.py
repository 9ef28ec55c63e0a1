"""Deduplication operators for training-data pipelines.

Four tiers, all Spark-first:

- exact: hash-groupBy on content (pure DataFrame ops — one shuffle on a
  64-hex digest, not the full text; at 100 TB group on the digest so shuffle
  rows are ~100 B regardless of document size).
- exact n-gram Jaccard: shingle explode + self-join — the *oracle-grade*
  near-dup (quadratic in candidates; fine at verification scale, and the
  correctness reference for MinHash).
- MinHash + LSH: the scale path — signature via k xxh64 seeds over shingle
  hashes (vectorized numpy), banded into LSH buckets, candidate pairs from
  bucket joins, exact-Jaccard rerank of candidates only.  Linear shuffle
  volume (rows x bands), no all-pairs comparison.
- SimHash: 64-bit near-dup fingerprint (Charikar 2002); equal fingerprints
  (or small Hamming distance via band join) => near-duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches.xxhash import xxh64_batch

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content: (text_hash, dup_count, min_id).
    Shuffles only (digest, id) pairs."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative per distinct content."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(F.broadcast(keep) if keep.isStreaming is False else keep,
                   id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard (oracle-grade)
# ---------------------------------------------------------------------------


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc — pure Catalyst (transform over
    a token array), no Python."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def exact_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold.  Exact (quadratic in
    co-shingled docs) — the correctness oracle for MinHash-LSH.

    The size tables are broadcast-hinted: they are one row per doc and this
    exact path is only for verification-scale inputs by construction (the
    scale path is MinHash-LSH), so the hint is always safe here."""
    sh = word_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 128, shingle_n: int = 3) -> DataFrame:
    """(id, signature array<long>) — k minhashes over word-shingle xxh64s.

    Vectorized per Arrow batch: one xxh64 pass over all shingles, then k
    cheap (a*h+b mod p) permutations on the uint64s (standard universal
    hashing, no per-row Python)."""
    p = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(42)
    A = rng.integers(1, 1 << 60, num_hashes, dtype=np.uint64) | np.uint64(1)
    B = rng.integers(0, 1 << 60, num_hashes, dtype=np.uint64)

    out_schema = f"`{id_col}` long, signature array<long>"

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            texts = pdf[text_col].astype(str).to_numpy()
            for doc_id, text in zip(pdf[id_col].to_numpy(), texts):
                toks = text.split()
                if len(toks) < shingle_n:
                    sh = [" ".join(toks)] if toks else [""]
                else:
                    sh = list({" ".join(toks[i:i + shingle_n])
                               for i in range(len(toks) - shingle_n + 1)})
                h = xxh64_batch([s.encode() for s in sh])
                with np.errstate(over="ignore"):
                    perms = (A[:, None] * h[None, :] + B[:, None]) % p
                sigs.append(perms.min(axis=1).astype(np.int64))
                ids.append(doc_id)
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        bands: int = 32) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash): candidate
    pairs only — shuffle is rows x bands, never all-pairs."""
    sig = signatures
    r = F.size("signature") / bands
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice("signature", (b * r + 1).cast("int"), r.cast("int")).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame,
                             id_col: str, broadcast_signatures: bool = True) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhash positions.

    broadcast_signatures=True hints the signature table broadcast — right
    when the candidate set is the big side (typical dedup).  Pass False at
    the scale where signatures themselves exceed executor memory (they are
    ~1 KB/doc: fine to ~10M docs per executor GB)."""
    bcast = F.broadcast if broadcast_signatures else (lambda x: x)
    sa = bcast(
        signatures.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    )
    sb = bcast(
        signatures.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn("est_jaccard", agree / F.size("sig_a"))
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_lsh_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                            threshold: float = 0.7, num_hashes: int = 128,
                            bands: int = 32, shingle_n: int = 3) -> DataFrame:
    """End-to-end near-dup pairs: signatures -> LSH candidates -> estimate."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).cache()
    pairs = lsh_candidate_pairs(sigs, id_col, bands)
    est = minhash_jaccard_estimate(sigs, pairs, id_col)
    return est.filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sign-sum of
    token xxh64 bits weighted by term frequency.  Vectorized numpy per batch."""
    out_schema = f"`{id_col}` long, simhash long"

    def gen(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col].to_numpy(),
                                    pdf[text_col].astype(str).to_numpy()):
                toks = text.split()
                if not toks:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                uniq, cnt = np.unique(toks, return_counts=True)
                h = xxh64_batch([t.encode() for t in uniq])
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
                fp = np.uint64(0)
                for bit in np.nonzero(votes > 0)[0]:
                    fp |= np.uint64(1) << np.uint64(bit)
                ids.append(doc_id)
                hashes.append(int(fp.astype(np.int64)))
            yield pd.DataFrame({id_col: ids, "simhash": hashes})

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs sharing an identical simhash (hamming distance 0)."""
    return (
        simhash(df, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )
