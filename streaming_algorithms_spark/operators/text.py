"""Text-analysis operators: quality profile, language ID, token stats,
document fingerprinting.

Everything except the rolling-hash fingerprint is pure Catalyst
(see ..functions) — stays in WholeStageCodegen.  The fingerprint is a
Karp–Rabin rolling hash with winnowing (Schleimer et al., SIGMOD 2003
"MOSS"), vectorized numpy per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as fn

# Karp–Rabin in the natural uint64 ring (mod 2^64 via numpy wraparound) with
# an odd base: lets the whole k-gram hash vectorize as one sliding-window
# dot product — no per-byte Python.
_BASE = np.uint64(1099511628211)  # FNV-1a 64 prime (odd => full period)


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality profile — one narrow projection, zero Python."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        fn.token_count(c).alias("n_tokens"),
        fn.char_count(c).alias("n_chars"),
        F.round(fn.avg_token_len(c), 6).alias("avg_token_len"),
        F.round(fn.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(fn.stopword_ratio(c, "en"), 6).alias("stopword_ratio"),
        fn.lang_id(c).alias("lang_pred"),
        F.round(fn.quality_score(c), 6).alias("quality"),
    )


def rolling_fingerprints(df: DataFrame, id_col: str, text_col: str,
                         k: int = 16, window: int = 8) -> DataFrame:
    """Winnowed Karp–Rabin fingerprints: k-byte rolling hashes, min per
    window — the standard document-fingerprint for plagiarism/contamination
    checks.  Output: (id, fingerprint) rows, ~len/window per doc."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, fingerprint long"
    with np.errstate(over="ignore"):
        # weights [B^(k-1), ..., B, 1] mod 2^64 (cumprod wraps correctly;
        # never divide after wraparound)
        weights = np.cumprod(
            np.concatenate([np.ones(1, np.uint64), np.full(k - 1, _BASE, np.uint64)])
        )[::-1].copy()

    def doc_fps(data: bytes) -> np.ndarray:
        from numpy.lib.stride_tricks import sliding_window_view

        b = np.frombuffer(data, np.uint8).astype(np.uint64)
        if b.size < k:
            return np.zeros(0, np.uint64)
        with np.errstate(over="ignore"):
            grams = sliding_window_view(b, k)
            hashes = (grams * weights[None, :]).sum(axis=1)  # mod 2^64 wrap
        if hashes.size <= window:
            return np.unique(hashes.min(keepdims=True))
        return np.unique(sliding_window_view(hashes, window).min(axis=1))

    def gen(batches):
        for pdf in batches:
            ids_in = pdf[id_col].to_numpy()
            per_doc = [doc_fps(t.encode())
                       for t in pdf[text_col].astype(str).to_numpy()]
            counts = np.fromiter((a.size for a in per_doc), np.int64,
                                 len(per_doc))
            # vectorized emit: repeat ids by fingerprint count, one concat —
            # never per-fingerprint Python appends (millions/boxed-int lists
            # at full Arrow batches)
            flat = (np.concatenate(per_doc) if per_doc
                    else np.zeros(0, np.uint64))
            yield pd.DataFrame({
                id_col: np.repeat(ids_in, counts),
                "fingerprint": flat.view(np.int64),
            })

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


def fingerprint_overlap(df: DataFrame, id_col: str, text_col: str,
                        min_shared: int = 3,
                        max_doc_freq: int = 64) -> DataFrame:
    """Docs sharing >= min_shared winnowed fingerprints (contamination pairs).

    One shuffle (groupBy fingerprint), bucket-capped: fingerprints appearing
    in more than ``max_doc_freq`` docs — boilerplate k-grams (headers,
    license text, navigation chrome) — are DROPPED before pair generation.
    They carry no contamination signal (a genuinely overlapping pair shares
    rarer grams too), and without the cap one 16-gram shared by 10k docs
    creates a 10k² pair blow-up.  With the cap every bucket emits at most
    C(max_doc_freq, 2) pairs, so the pair stage is linear in the number of
    fingerprint buckets.  Pair expansion runs in Catalyst (higher-order
    transform over the sorted id list — codegen'd, no Python), so the only
    Python stage is the fingerprint emit itself.  max_doc_freq=None disables
    the cap (exact semantics; verification scale only)."""
    fps = rolling_fingerprints(df, id_col, text_col)
    buckets = (
        fps.groupBy("fingerprint")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_doc_freq is not None:
        buckets = buckets.filter(F.size("ids") <= max_doc_freq)
    # all ordered (i < j) pairs of each bucket's sorted id list
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def cross_fingerprint_overlap(train: DataFrame, eval_df: DataFrame,
                              id_col: str, text_col: str,
                              min_shared: int = 3, max_doc_freq: int = 64,
                              k: int = 16, window: int = 8) -> DataFrame:
    """Cross-corpus contamination at scale: winnowed fingerprints on BOTH
    corpora, one (fingerprint) shuffle, and the same hot-fingerprint cap as
    fingerprint_overlap — computed over the COMBINED doc frequency, so
    boilerplate present in either corpus is dropped before the join.  Cost
    is linear in fingerprints plus bucket-bounded pair emit; the exact
    verification oracle is dedup.exact_containment_pairs.  Output:
    (train_id, eval_id, shared)."""
    fps_t = rolling_fingerprints(train, id_col, text_col, k, window).select(
        F.col(id_col).alias("train_id"), "fingerprint"
    )
    fps_e = rolling_fingerprints(eval_df, id_col, text_col, k, window).select(
        F.col(id_col).alias("eval_id"), "fingerprint"
    )
    keep = (
        fps_t.select("fingerprint").unionAll(fps_e.select("fingerprint"))
        .groupBy("fingerprint").agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_doc_freq)
        .select("fingerprint")
    )
    return (
        fps_e.join(keep, "fingerprint", "left_semi")
        .join(fps_t, "fingerprint")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — pure DataFrame ops, no Python.

    score = tf * (ln((N+1)/(df_t+1)) + 1) (smoothed idf).  Ranking uses
    ROUND(score, 9) with a term tie-break: two engines' libm ln() can
    differ in the last ulp, and rounding first collapses those into exact
    ties that the lexical tie-break resolves identically (the same
    portability trick as the md5-derived sampling keys).

    Scale shape: one (id, term) shuffle for tf, one (term) shuffle for
    document frequency, N as an aggregated singleton (AQE broadcasts it),
    then a per-doc window top-k — no driver collect, no quadratic stage.
    Output: (id, term, score) with score rounded to 6dp."""
    from pyspark.sql import Window

    from .. import functions as fn

    toks = df.select(F.col(id_col),
                     F.explode(fn.tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    # document frequency FROM tf (one row per (doc, term) already): avoids
    # re-tokenizing the corpus for a second exploded scan and turns
    # countDistinct into a plain count
    dft = tf.groupBy("term").agg(F.count("*").alias("_dft"))
    n = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(n)
        .withColumn(
            "score",
            F.col("_tf")
            * (F.log((F.col("_n") + 1.0) / (F.col("_dft") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 9).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col(id_col), "term", F.round("score", 6).alias("score"))
    )


def sequence_packing_plan(df: DataFrame, id_col: str, text_col: str,
                          seq_len: int = 512,
                          order_col: str | None = None,
                          n_parts: int | None = None) -> DataFrame:
    """GPT-style sequence-packing plan: documents are (logically)
    concatenated in ``order_col`` order (default: id; must be UNIQUE — the
    cumulative sum over ties would depend on shuffle arrival) and the token
    stream is chunked into fixed ``seq_len`` sequences, documents splitting
    across chunk boundaries — the standard pretraining packing that wastes
    zero tokens (vs. first-fit binning, which is sequential and lossy).

    Emits per doc: n_tokens, the global start offset, and the
    (sequence, offset) coordinates of the doc's first and last token —
    everything a downstream tokenizer shard needs to materialize its
    sequences without a global pass.

    Scale shape — TWO-PASS RANGE-PARTITIONED CUMSUM, no global window:
    ``repartitionByRange(n_parts, order)`` splits the corpus into ordered
    ranges; pass 1 computes each range's local cumulative sum (a window
    PARTITIONED by the range id — n_parts concurrent tasks); pass 2 turns
    the n_parts per-range totals into exclusive prefix offsets (a window
    over n_parts rows — trivially small) and broadcast-joins them back.
    The only total order ever materialized is over one row per range, so
    the plan has no single-task stage at any corpus size.  All integer
    arithmetic, so the plan is engine-exact (SQL-parity gated)."""
    from pyspark.sql import Window

    order = order_col or id_col
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                               "200"))
    cols = [F.col(id_col)] + ([F.col(order)] if order != id_col else [])
    toks = df.select(
        *cols,
        fn.token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    # pass 1: ordered ranges (RangePartitioner assigns ascending key ranges
    # to ascending partition ids), local cumsum within each range.  The
    # explicit numPartitions makes this a user-specified partitioning AQE
    # never coalesces (CLAUDE.md rule for Python-free grouped stages too).
    ranged = (toks.repartitionByRange(n_parts, F.col(order))
              .withColumn("_pid", F.spark_partition_id()))
    # NULL-token docs (NULL text) occupy ZERO width in the packed stream and
    # get NULL coordinates — the COALESCE keeps the cumsum total and
    # partition-shape independent (a partitioned SUM over an all-NULL range
    # would otherwise yield NULL where the global window wouldn't)
    contrib = F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
    w_local = (Window.partitionBy("_pid").orderBy(order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranged.withColumn("_lcum", F.sum(contrib).over(w_local))
    # pass 2: one row per range -> exclusive prefix offsets; the global
    # orderBy here runs over n_parts rows, not the corpus
    w_off = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        local.groupBy("_pid").agg(F.sum(contrib).alias("_ptotal"))
        .withColumn("_off", F.coalesce(F.sum("_ptotal").over(w_off),
                                       F.lit(0).cast("long")))
        .select("_pid", "_off")
    )
    merged = local.join(F.broadcast(offsets), "_pid").withColumn(
        "_cum", F.col("_lcum") + F.col("_off")
    )
    start = F.col("_cum") - F.col("n_tokens")
    # `div` is exact 64-bit integer division — floor(long/int) would go
    # through double precision and can mis-chunk once the global cumsum
    # exceeds 2^53 tokens
    return merged.select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        F.expr(f"(_cum - n_tokens) div {int(seq_len)}").alias("start_seq"),
        F.pmod(start, F.lit(seq_len)).cast("long").alias("start_pos"),
        F.when(F.col("n_tokens").isNotNull(),
               F.expr(f"(_cum - 1) div {int(seq_len)}")).alias("end_seq"),
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    §A1.1 quality filters): the fraction of duplicate word 3-grams and the
    fraction of all 2-grams taken by the single most frequent 2-gram —
    high values flag boilerplate/spam/keyword-stuffed pages.

    Output: (id, n_tokens, dup_3gram_frac, top_2gram_frac), fractions
    rounded to 6dp, NULL when the doc is too short to have the n-grams.

    Shape — measured at sf0.1/local[32] (fastest JVM-native variant):
    n-grams come from ``pyspark.ml.feature.NGram`` (Scala-side, one pass;
    a Catalyst ``transform``-lambda construction evaluates INTERPRETED per
    element and measured ~9x slower, an ``aggregate`` run-length fold
    slower still), the 3-gram stat is array-local (no shuffle), and the
    top-2-gram count shuffles only JVM-computed ``xxhash64`` values — the
    CLAUDE.md hashes-not-strings rule; round 3 shuffled every 2-gram
    STRING in the corpus and was the bench outlier.  Within-doc hash
    collisions would merge two grams' counts: P ~ sum n_doc^2/2^65
    (~3e-10 for a 50k-doc corpus) — accepted; the full-parity oracle
    would surface one immediately."""
    from pyspark.ml.feature import NGram

    toks = fn.tokens(F.col(text_col))
    n = F.size(toks)
    # NGram's Scala UDF needs a non-NULL array; n_tokens keeps the
    # NULL-text -> NULL contract by deriving from the raw tokens expression
    toked = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.coalesce(toks, F.array()).alias("_toks"),
    )
    g = NGram(n=3, inputCol="_toks", outputCol="_tri").transform(toked)
    g = NGram(n=2, inputCol="_toks", outputCol="_bi").transform(g)
    nt = F.col("n_tokens")
    base = g.select(
        F.col(id_col),
        nt,
        F.when(nt >= 3, F.round(
            1.0 - F.size(F.array_distinct("_tri")) / F.size("_tri"), 6
        )).alias("dup_3gram_frac"),
        F.col("_bi"),
    )
    bi = (
        base.select(F.col(id_col),
                    F.explode(F.when(nt >= 2, F.col("_bi"))).alias("gram"))
        .select(F.col(id_col), F.xxhash64("gram").alias("_g"))
    )
    top = (
        bi.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_total"))
        .select(F.col(id_col),
                F.round(F.col("_top") / F.col("_total"), 6).alias("top_2gram_frac"))
    )
    return base.drop("_bi").join(top, id_col, "left")


def unigram_logprob_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-relative unigram log-probability per document — the cheap
    stand-in for LM-perplexity quality filtering (CCNet-style): documents
    whose tokens are unusually improbable under the corpus unigram
    distribution are OOD/noise candidates; unusually probable ones are
    boilerplate candidates.  score = mean over token OCCURRENCES of
    ln(count(token)/total_tokens).

    Pure DataFrame ops, pre-aggregated before the join (the tfidf_top_terms
    shape): tokens collapse to per-(id, term) counts FIRST, so the freq
    join and the totals crossJoin move (id, term, tf) rows — the distinct
    vocabulary footprint per doc — instead of one row per token OCCURRENCE
    (~3-10x smaller on natural text, and the (id, term) shuffle doubles as
    the map-side combine).  The occurrence-weighted mean is then
    sum(tf*ln(cnt/total))/sum(tf) — identical to the per-occurrence avg.
    Output: (id, n_tokens, logprob) with logprob rounded to 6dp — fully
    SQL-re-derivable."""
    toks = df.select(F.col(id_col),
                     F.explode(fn.tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    freq = tf.groupBy("term").agg(F.sum("_tf").alias("_cnt"))
    total = freq.agg(F.sum("_cnt").alias("_total"))
    scored = (
        tf.join(freq, "term")
        .crossJoin(total)
        .groupBy(id_col)
        .agg(
            F.sum("_tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("_tf") * F.log(F.col("_cnt") / F.col("_total")))
                / F.sum("_tf"), 6,
            ).alias("logprob"),
        )
    )
    # keep EVERY input doc (NULL metrics for NULL/empty text) — the same
    # per-doc row contract as repetition_profile, so joining the quality
    # signals never silently drops documents
    return df.select(id_col).join(scored, id_col, "left")
