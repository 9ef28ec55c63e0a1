"""End-to-end curation pipeline: crawl archive -> training-ready corpus.

This module composes the engine's operators into the pipeline a
pretraining-data user actually runs, as ONE lazy Spark plan:

    WARC segments -> extract text -> quality/lang/repetition signals
      -> exact dedup -> near-dup dedup (MinHash LSH + connected
         components, quality-aware survivor)
      -> semantic dedup (optional, SemDeDup-style over a precomputed
         embedding column — same LSH/components/election shape)
      -> filter -> split
      -> sequence-packing plan for the train stream

``curate()`` returns a :class:`CurationPlan` of three DataFrames the
caller writes, counts, or composes further.  Two stages execute AT
CALL TIME, the rest is lazy: (a) connected components over the
near-dup pair graph is iterative — its O(log n) convergence rounds
are Spark jobs (this also materializes the staged corpus and minhash
signature cache as a side effect); the pair graph is duplicate-sized,
orders of magnitude smaller than the corpus, and the component table
it leaves behind is checkpoint-backed, so downstream actions reuse it
instead of re-running the loop; (b) ``stage=<path>`` writes the
extracted corpus to a parquet staging table up front.

Funnel accounting is a *column*, not a sequence of filters: every input
document is annotated with the first ``drop_reason`` that applies
(``exact_duplicate`` / ``near_duplicate`` / ``semantic_duplicate`` /
``contaminated`` / ``contaminated_semantic`` / ``lang`` /
``low_quality`` / ``repetitive`` / NULL = kept), so the
full attrition report is ONE aggregation over one plan instead of a
count-per-stage job cascade — at 100 TB that is the difference between
one corpus pass and six.

Scale shape of the composed plan (sf-independent):

- extract + signals: a pure map over input splits (mapInPandas for the
  regex extraction, Catalyst for quality/lang) — the html column is
  read once and never crosses a shuffle.  The extracted corpus is
  STAGED (persisted, or parquet via ``stage=<path>``) because four
  downstream branches consume it — see ``curate``'s ``stage`` param.
- exact dedup: shuffles (md5, doc_id) pairs only, never text.
- near-dup: MinHash signatures in one Arrow pass over EXACT-SURVIVORS
  only, one (band, bucket) join, candidate-pair verification on
  signatures, components on the pair graph, then an id-keyed join back
  to the corpus.  No all-pairs stage at any point.
- repetition signals: the NGram/xxhash64 shape from
  operators/text.py (hashes cross the shuffle, not gram strings).
- decontamination (optional): winnowed fingerprints on corpus + eval
  set, one fingerprint-hash shuffle with the combined-frequency
  boilerplate cap (operators/text.cross_fingerprint_overlap) — linear
  in fingerprints, never a corpus x eval product.  The optional
  SEMANTIC variant (cross_set_near_dup_pairs) buckets both sets with
  shared hyperplanes and joins corpus x eval on (table, bucket) only.
- split: pure hash arithmetic, no shuffle.
- packing: the two-pass range-partitioned cumsum (operators/text.py)
  — no corpus-wide single-task window.

Reference framing: the reference library's sketches feed exactly this
kind of ingestion loop (SURVEY §0/§1 — Common-Crawl-style web pages);
this module is the loop itself, Spark-first.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import commit as _commit
from . import functions as fn
from .operators.components import dedup_resolve
from .operators.dedup import exact_dedup_groups, minhash_lsh_dedup_pairs
from .operators.html_text import extract_text_series
from .operators.text import repetition_profile, sequence_packing_plan

DEFAULT_SPLITS = {"train": 0.98, "val": 0.01, "test": 0.01}


@dataclass(frozen=True)
class CurationPlan:
    """The three lazy outputs of :func:`curate`.

    ``annotated``: every input document with its signals and verdict —
    (doc_id, url, warc_ts, text, n_tokens, lang, quality,
    dup_3gram_frac, top_2gram_frac, component, drop_reason); with an
    ``embedding_col``, also the embedding and its ``sem_component``
    semantic-cluster label.
    ``kept``: the curated corpus (drop_reason IS NULL) plus ``split``.
    ``train_packing``: sequence coordinates for the train split
    (doc_id, n_tokens, start_offset, start_seq, start_pos, end_seq).
    """

    annotated: DataFrame
    kept: DataFrame
    train_packing: DataFrame

    def funnel(self) -> DataFrame:
        """Attrition report in ONE corpus pass: (stage, docs, tokens),
        ``stage`` = drop_reason or 'kept', tokens = sum of doc token
        counts (NULL-text docs count 0)."""
        return (
            self.annotated
            .groupBy(F.coalesce("drop_reason", F.lit("kept")).alias("stage"))
            .agg(F.count("*").alias("docs"),
                 F.sum(F.coalesce("n_tokens", F.lit(0)).cast("long"))
                 .alias("tokens"))
        )


def _stage_fingerprint(pages: DataFrame, params: dict) -> str:
    """Identity stamp for a staging table: extraction params + the input's
    identity.  File-backed inputs use the sorted file list (stable across
    sessions — the 100-TB resumability case).  In-memory/RDD-backed frames
    (whose plan string is schema-only, e.g. LogicalRDD) add the analyzed
    plan's semanticHash, which pins the exact in-session lineage: a
    DIFFERENT driver-built frame never silently reuses the stage, and
    cross-session reuse of in-memory data is refused — correctly, since
    the data itself dies with the session."""
    import hashlib
    import json
    import re

    import os

    try:
        files = sorted(pages.inputFiles())
    except Exception:
        files = []
    if files:
        # Path alone is NOT identity: a segment re-fetched IN PLACE (same
        # path, new bytes) must invalidate the stage, so fold each file's
        # size and mtime in.  Unstat-able paths (e.g. non-local URIs in a
        # real deployment) contribute (None, None) — still path-keyed,
        # never an exception.
        def _stat(p):
            local = re.sub(r"^file:/*", "/", p) if p.startswith("file:") else p
            try:
                st = os.stat(local)
                return [p, st.st_size, st.st_mtime_ns]
            except OSError:
                return [p, None, None]

        ident = [_stat(p) for p in files]
    else:
        qe = pages._jdf.queryExecution()
        ident = [re.sub(r"#\d+L?", "", qe.logical().toString()),
                 str(qe.analyzed().semanticHash())]
    blob = json.dumps({"params": params, "input": ident}, sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


def _extract(pages: DataFrame, url_col: str, ts_col: str,
             html_col: str, doc_id,
             passthrough: list[tuple[str, str]] = ()) -> DataFrame:
    """(doc_id, url, warc_ts, text[, passthrough...]): the extraction map
    with identity columns carried through — html_to_text's batch
    extractor, without the id-keyed join a two-output-column operator
    would force (the join would shuffle every extracted text; this
    shuffles nothing).  ``doc_id`` is the caller's id Column expression
    (see ``curate``'s ``id_col`` for the uniqueness contract and
    collision math).  ``passthrough``: (name, ddl_type) columns of
    ``pages`` carried through the map unchanged (e.g. a precomputed
    embedding column for the semantic-dedup stage)."""
    extra = list(passthrough)

    def gen(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "text": extract_text_series(pdf["html"]),
            }
            for name, _ in extra:
                out[name] = pdf[name]
            yield pd.DataFrame(out)

    schema = ("doc_id long, url string, warc_ts timestamp, text string"
              + "".join(f", `{n}` {t}" for n, t in extra))
    return (
        pages.select(
            doc_id.alias("doc_id"),
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("warc_ts"),
            F.col(html_col).alias("html"),
            *[F.col(n) for n, _ in extra],
        )
        .mapInPandas(gen, schema)
    )


def curate(pages: DataFrame, *,
           html_col: str | None = "html",
           text_col: str | None = None,
           url_col: str = "url",
           ts_col: str = "warc_ts",
           near_threshold: float = 0.8,
           num_hashes: int = 128,
           bands: int = 32,
           shingle_n: int = 3,
           embedding_col: str | None = None,
           semantic_threshold: float = 0.95,
           semantic_n_bits: int = 8,
           semantic_n_tables: int = 12,
           semantic_max_bucket_size: int | None = None,
           decontaminate_against: DataFrame | None = None,
           decontaminate_text_col: str = "text",
           decontaminate_min_shared: int = 3,
           decontaminate_k: int = 32,
           decontaminate_embedding_col: str | None = None,
           decontaminate_cosine: float = 0.95,
           lang_allow: list[str] | None = None,
           min_quality: float = 0.3,
           max_dup_3gram_frac: float = 0.5,
           max_top_2gram_frac: float = 0.3,
           splits: Mapping[str, float] | None = None,
           split_salt: str = "",
           seq_len: int = 2048,
           stage: bool | str = True,
           id_col: str | None = None) -> CurationPlan:
    """Compose the full curation pipeline over ``pages`` (module
    docstring).  ``pages`` needs (url, warc_ts, html binary) — the WARC
    reader's shape and the north-rule input_hint — or pass
    ``text_col`` to skip extraction (html_col is then ignored).

    ``id_col``: a column of ``pages`` holding a UNIQUE long id per
    capture, used verbatim as ``doc_id``.  When None (the default),
    ``doc_id = xxhash64(url, warc_ts)``: 64-bit, so by the birthday
    bound a collision somewhere in the corpus becomes likely at large
    scale (P ~ n²/2⁶⁵ — ~3% at 10⁹ captures, near-certain at 10¹⁰),
    and a collided pair multiplies rows through the id-keyed joins
    (funnel counts then exceed the input count — loud, not silent).
    Supply a real unique id for >10⁸-capture corpora.

    Thresholds are the standard pretraining-filter shapes (Gopher
    repetition bounds, composite quality floor, optional language
    allow-list); defaults are permissive — tune per corpus.  The
    near-dup survivor per duplicate cluster is the highest-quality
    member (ties: min doc_id), so re-runs keep the same documents.

    ``embedding_col``: a precomputed document-embedding column of
    ``pages`` (``array<float>``/``array<double>``) — when given, a
    SEMANTIC near-dup stage (SemDeDup-style, Abbas et al. 2023) runs
    AFTER the text near-dup verdict, over only the docs still alive:
    random-hyperplane LSH candidates + exact cosine rerank at
    ``semantic_threshold`` (operators/similarity.embedding_near_dup_
    pairs — rows x n_tables shuffle, never all-pairs), connected
    components over the verified pair graph, and the SAME
    quality-aware survivor election as the text stage.  Losers drop as
    ``semantic_duplicate``; ``annotated`` gains a ``sem_component``
    cluster label.  Docs with a NULL embedding are exempt (never
    dropped by this stage).  The two stages are complementary: MinHash
    catches lexical copies, embeddings catch paraphrases MinHash
    cannot see.  ``semantic_max_bucket_size`` (None = off) drops
    degenerate hyperplane hot buckets — zero/default embeddings that
    would turn candidate generation quadratic — from BOTH embedding
    stages (the max_doc_freq analogue).

    ``decontaminate_against``: an evaluation/benchmark set (any
    DataFrame with a ``decontaminate_text_col`` column) — corpus docs
    sharing >= ``decontaminate_min_shared`` winnowed fingerprints with
    ANY eval doc are dropped as ``contaminated`` (benchmark
    decontamination, the fingerprint scale path; the exact-containment
    operator remains the verification oracle).  ``decontaminate_k`` is
    the fingerprint byte-gram length: the default 32 (~5-6 words of
    context, window 16) is deliberately longer than the intra-corpus
    operator's 16 — cross-corpus flagging wants specific quotes, not
    shared phrasing (measured: k=16/min_shared=2 flagged half a
    synthetic zipf-vocab corpus off 25 eval docs; k=32/min_shared=3
    flags the actual quote sources).

    ``decontaminate_embedding_col``: a document-embedding column of
    ``decontaminate_against`` — when given (requires ``embedding_col``
    on the corpus side too), a SEMANTIC decontamination stage also
    runs: corpus docs whose embedding reaches cosine >=
    ``decontaminate_cosine`` against ANY eval embedding drop as
    ``contaminated_semantic``.  The join shape is
    operators/similarity.cross_set_near_dup_pairs — both sets bucketed
    by the SAME seeded hyperplanes, one (table, bucket) corpus x eval
    join, exact cosine rerank on candidates only; never the
    |corpus| x |eval| product.  The two decontamination stages are
    complementary exactly like the two dedup stages: fingerprints
    catch verbatim benchmark quotes, embeddings catch paraphrased or
    translated restatements that share no 32-byte-gram.  NULL
    embeddings (either side) are exempt.

    Cache lifetime: with ``stage`` truthy, curate() persists up to three
    intermediate frames (the extracted corpus, the exact-survivor frame,
    and the annotated verdict spine; plus ``alive`` when an embedding
    column is given) and never unpersists them — their lifetime is the
    caller's.  A session that calls curate() in a loop should
    ``spark.catalog.clearCache()`` between iterations (what bench.py
    does between samples) or the cached spines accumulate.

    ``stage`` controls the staging boundary on the extracted corpus.
    The plan fans ``docs`` into four branches (signals, repetition,
    exact groups, minhash survivors) and Spark does NOT dedupe common
    subplans — unstaged, the extraction map would re-run once per
    branch per action.  ``True`` (default) persists the extracted
    corpus (memory, disk spill) so extraction runs once per cluster
    lifetime; a path string writes it to parquet and re-reads (the
    100-TB choice: durable, resumable, column-pruned downstream
    reads); ``False`` skips staging (fine when ``pages`` is already a
    cheap columnar read — but extraction will re-run per branch).

    Call-time cost: the near-dup components loop runs its rounds
    inside this function (module docstring) — at call time the corpus
    IS extracted, minhashed, and pair-resolved.  What remains lazy is
    everything per-document downstream: signals, verdicts, splits,
    packing.
    """
    splits = dict(splits) if splits is not None else dict(DEFAULT_SPLITS)
    did = (F.col(id_col).cast("long") if id_col is not None
           else F.xxhash64(F.col(url_col), F.col(ts_col)))
    if embedding_col is not None and embedding_col not in pages.columns:
        raise ValueError(
            f"embedding_col {embedding_col!r} is not a column of pages "
            f"({pages.columns})")
    if decontaminate_embedding_col is not None:
        if decontaminate_against is None:
            raise ValueError(
                "decontaminate_embedding_col requires decontaminate_against")
        if embedding_col is None:
            raise ValueError(
                "semantic decontamination needs embedding_col on the "
                "corpus side too")
        if decontaminate_embedding_col not in decontaminate_against.columns:
            raise ValueError(
                f"decontaminate_embedding_col "
                f"{decontaminate_embedding_col!r} is not a column of "
                f"decontaminate_against ({decontaminate_against.columns})")
    emb_cols = ([] if embedding_col is None
                else [(embedding_col, dict(pages.dtypes)[embedding_col])])
    if text_col is not None:
        docs = pages.select(
            did.alias("doc_id"),
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("warc_ts"),
            F.col(text_col).alias("text"),
            *[F.col(n) for n, _ in emb_cols],
        )
    else:
        docs = _extract(pages, url_col, ts_col, html_col, did,
                        passthrough=emb_cols)
    if isinstance(stage, str):
        # Reuse-if-completed backs the "resumable" claim: a completed
        # staging table is read as-is, so a re-run after a downstream
        # failure skips re-extraction.  The commit point is
        # _STAGE_META.json with state=complete AND a fingerprint (input
        # identity + extraction params) matching THIS call — a stale
        # table for different data or params is REFUSED, never silently
        # read.  Crash recovery: a pending-state meta marks OUR crashed
        # stage (written before the data), so the re-run overwrites and
        # self-heals; a dir with data but NO meta was not written by this
        # protocol and is refused rather than clobbered.
        import json
        import os
        fp = _stage_fingerprint(pages, {
            "text_col": text_col, "html_col": html_col,
            "url_col": url_col, "ts_col": ts_col, "id_col": id_col,
            # staged schema depends on the passthrough column; a stage
            # written without it must not satisfy a call that needs it
            "embedding_col": embedding_col,
        })
        meta_path = os.path.join(stage, "_STAGE_META.json")
        data_path = os.path.join(stage, "data")
        meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        foreign = (meta is None and os.path.isdir(stage)
                   and any(not e.endswith(".tmp") and not e.startswith(".")
                           for e in os.listdir(stage)))
        if foreign:
            raise ValueError(
                f"stage={stage!r} exists but carries no _STAGE_META.json — "
                "not a staging table written by this pipeline; refusing to "
                "overwrite it (point stage= at a fresh path)")
        if meta is not None and meta.get("state") == "complete":
            if meta.get("fingerprint") != fp:
                raise ValueError(
                    f"staging table at {stage!r} was built from different "
                    "input or extraction params (fingerprint "
                    f"{meta.get('fingerprint')} != {fp}) — reusing it "
                    "would return results for the OLD corpus; point "
                    "stage= at a fresh path or delete the stale table")
        else:
            # fresh dir, or our own crashed stage (state=pending); the
            # pending marker lands BEFORE the data (overwrite only touches
            # data/), the complete marker after — the commit point
            os.makedirs(stage, exist_ok=True)
            _commit.commit_json({"state": "pending", "fingerprint": fp},
                                meta_path)
            docs.write.mode("overwrite").parquet(data_path)
            _commit.commit_json({"state": "complete", "fingerprint": fp},
                                meta_path)
        docs = docs.sparkSession.read.parquet(data_path)
    elif stage:
        from pyspark import StorageLevel
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)

    # Columnar signals (Catalyst, zero shuffle) + repetition profile
    # (NGram + xxhash64-only shuffle).  Signals are computed for EVERY
    # doc — dropped docs keep theirs so the funnel can be sliced by any
    # signal after the fact.  quality is pinned to 0 for NULL text:
    # quality_score(NULL)'s when-chain would otherwise fall through to
    # its otherwise() branches and score an unusable row 1.0 — and a
    # quality-aware dedup election must never prefer a NULL doc.
    sig = docs.select(
        "*",
        fn.lang_id(F.col("text")).alias("lang"),
        F.when(F.col("text").isNull(), F.lit(0.0))
        .otherwise(F.round(fn.quality_score(F.col("text")), 6))
        .alias("quality"),
    )
    rep = repetition_profile(docs, "doc_id", "text")
    sig = sig.join(rep, "doc_id", "left")

    # Exact dedup verdict: keep iff this doc_id is its content group's
    # min-id representative.  Joining on text_hash (16-byte md5) keeps
    # text out of the shuffle.  NULL text is grouped AS empty content
    # (coalesce before md5): md5(NULL) would exempt every NULL doc from
    # exact dedup, and k exempted no-content docs all share the
    # hash-of-'' minhash signature downstream — a C(k,2) LSH candidate
    # clique.  Grouping them here keeps exactly one no-content survivor.
    nn_text = F.coalesce(F.col("text"), F.lit(""))
    groups = exact_dedup_groups(
        docs.select("doc_id", nn_text.alias("text")), "doc_id", "text")
    sig = (
        sig.withColumn("_th", F.md5(nn_text))
        .join(groups.select(F.col("text_hash").alias("_th"), "keep_id"),
              "_th", "left")
        .withColumn("_exact_keep", F.col("doc_id") == F.col("keep_id"))
        .drop("_th", "keep_id", "dup_count")
    )

    # Near-dup verdict on exact survivors only (duplicate captures are
    # already gone — no point minhashing them).  dedup_resolve labels
    # every survivor with its cluster and a quality-aware canonical
    # flag; docs outside any cluster are their own component.
    # survivors is a join-bearing subplan consumed by SEVERAL stages
    # (minhash signature pass, resolve's quality election, optional
    # decontamination) — persist it alongside the docs staging so the
    # exact-dedup join chain runs once, not once per consumer (same
    # rationale as `stage`; measured ~2x on the composed gate).
    survivors = sig.filter(F.col("_exact_keep")).select(
        "doc_id", "text", "quality")
    if stage:  # any staging mode (True or a path)
        from pyspark import StorageLevel
        survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = minhash_lsh_dedup_pairs(
        survivors, "doc_id", "text", threshold=near_threshold,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n)
    resolved = dedup_resolve(survivors, pairs, "doc_id",
                             quality_col="quality")
    sig = sig.join(resolved.select("doc_id", "component",
                                   F.col("is_canonical").alias("_near_keep")),
                   "doc_id", "left")

    # Semantic near-dup (SemDeDup-style) over docs still alive after the
    # text stages — lexical copies are already gone, so the embedding
    # pass prices only paraphrase candidates.  Same LSH-not-all-pairs
    # scale shape (rows x n_tables shuffle, exact cosine on candidates
    # only) and the same quality-aware survivor election.  NULL-embedding
    # docs are exempt: absence of evidence never drops a doc.
    if embedding_col is not None:
        from .operators.similarity import embedding_near_dup_pairs
        alive = (
            sig.filter(F.col("_exact_keep")
                       & F.coalesce("_near_keep", F.lit(True))
                       & F.col(embedding_col).isNotNull())
            .select("doc_id", embedding_col, "quality"))
        # ALWAYS persisted (not gated on `stage` like the corpus): alive's
        # lineage is the full sig join chain, and >= 4 subplans consume it
        # (the LSH dim probe, the signature pass, the election, and the
        # semantic-decontamination corp side below) — unpersisted, each
        # would re-run extract -> dedup -> resolve once per action
        from pyspark import StorageLevel
        alive = alive.persist(StorageLevel.MEMORY_AND_DISK)
        sem_pairs = embedding_near_dup_pairs(
            alive, "doc_id", embedding_col, threshold=semantic_threshold,
            n_bits=semantic_n_bits, n_tables=semantic_n_tables,
            max_bucket_size=semantic_max_bucket_size)
        sem = dedup_resolve(alive, sem_pairs, "doc_id",
                            quality_col="quality")
        sig = sig.join(
            sem.select("doc_id",
                       F.col("component").alias("sem_component"),
                       F.col("is_canonical").alias("_sem_keep")),
            "doc_id", "left")
    else:
        sig = sig.withColumn("_sem_keep", F.lit(None).cast("boolean"))

    if decontaminate_against is not None:
        from .operators.text import cross_fingerprint_overlap
        # distinct eval texts: a benchmark item repeated in the eval set
        # would otherwise share one xxhash64 id across rows and emit each
        # fingerprint once PER ROW, double-counting `shared` and silently
        # halving the min_shared threshold
        ev = (decontaminate_against
              .select(F.col(decontaminate_text_col).alias("text"))
              .filter(F.col("text").isNotNull()).distinct()
              .select(F.xxhash64("text").alias("doc_id"), "text"))
        # fingerprint exact SURVIVORS only (same economy as the near-dup
        # stage): an exact duplicate's verdict is already decided, so
        # fingerprinting its copies would be a wasted partial corpus pass
        hits = cross_fingerprint_overlap(
            survivors.select("doc_id", "text"), ev, "doc_id", "text",
            min_shared=decontaminate_min_shared,
            k=decontaminate_k, window=decontaminate_k // 2)
        sig = sig.join(
            hits.select(F.col("train_id").alias("doc_id")).distinct()
            .withColumn("_contaminated", F.lit(True)),
            "doc_id", "left")
    else:
        sig = sig.withColumn("_contaminated", F.lit(None).cast("boolean"))

    if (decontaminate_against is not None
            and decontaminate_embedding_col is not None):
        from .operators.similarity import cross_set_near_dup_pairs
        # eval ids are pure bookkeeping (only id_a — the corpus side —
        # is consumed); xxhash64 over the vector is deterministic across
        # the two subplans that re-scan the eval frame, unlike
        # monotonically_increasing_id
        ev_emb = (decontaminate_against
                  .select(F.col(decontaminate_embedding_col).alias("emb"))
                  .filter(F.col("emb").isNotNull()).distinct()
                  .select(F.xxhash64("emb").alias("doc_id"), "emb"))
        # corpus side: the semantic stage's PERSISTED `alive` frame
        # (exact+near survivors with an embedding) — every doc whose
        # verdict can still BE contaminated_semantic is in it (dedup
        # losers take an earlier drop reason), and reusing it keeps this
        # stage off the unpersisted sig spine: joining a frame derived
        # from sig back INTO sig would re-run the whole upstream join
        # chain once more per action (Spark does not dedupe common
        # subplans — measured ~3x on the composed gate)
        corp = alive.select("doc_id", F.col(embedding_col).alias("emb"))
        sem_hits = cross_set_near_dup_pairs(
            corp, ev_emb, "doc_id", "emb",
            threshold=decontaminate_cosine,
            n_bits=semantic_n_bits, n_tables=semantic_n_tables,
            max_bucket_size=semantic_max_bucket_size)
        sig = sig.join(
            sem_hits.select(F.col("id_a").alias("doc_id")).distinct()
            .withColumn("_contaminated_sem", F.lit(True)),
            "doc_id", "left")
    else:
        sig = sig.withColumn("_contaminated_sem",
                             F.lit(None).cast("boolean"))

    lang_ok = (F.lit(True) if lang_allow is None
               else F.col("lang").isin(list(lang_allow)))
    drop = (
        F.when(~F.col("_exact_keep"), F.lit("exact_duplicate"))
        .when(~F.coalesce("_near_keep", F.lit(True)), F.lit("near_duplicate"))
        .when(~F.coalesce("_sem_keep", F.lit(True)),
              F.lit("semantic_duplicate"))
        .when(F.coalesce("_contaminated", F.lit(False)),
              F.lit("contaminated"))
        .when(F.coalesce("_contaminated_sem", F.lit(False)),
              F.lit("contaminated_semantic"))
        .when(~lang_ok, F.lit("lang"))
        .when(F.coalesce("quality", F.lit(0.0)) < min_quality,
              F.lit("low_quality"))
        .when((F.coalesce("dup_3gram_frac", F.lit(0.0))
               > max_dup_3gram_frac)
              | (F.coalesce("top_2gram_frac", F.lit(0.0))
                 > max_top_2gram_frac),
              F.lit("repetitive"))
    )
    annotated = (
        sig.withColumn("drop_reason", drop)
        .drop("_exact_keep", "_near_keep", "_sem_keep", "_contaminated",
              "_contaminated_sem")
    )
    if stage:
        # The verdict spine is consumed by >= 3 independent outputs
        # (annotated/funnel, kept, train_packing) and its lineage is the
        # WHOLE composition (staged scan + signals + two dedup joins +
        # optional semantic/decontamination joins).  Persisting it does two
        # things: downstream actions materialize the join chain once
        # instead of once per consumer, and — the larger effect at gate
        # scale — Catalyst's cache substitution truncates every consumer's
        # plan at an InMemoryRelation, so the optimizer stops re-walking
        # the multi-hundred-KB composed plan per aggregate subtree
        # (measured: the composed one-row datasheet collect spends more
        # driver time PLANNING the six crossjoined aggregates over the
        # full spine than executing them; spark_optimization_guide §3.3 /
        # §7.3 "materialise intermediates to truncate the plan").
        from pyspark import StorageLevel
        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)

    from .operators.sampling import assign_splits
    kept = assign_splits(
        annotated.filter(F.col("drop_reason").isNull()).drop("drop_reason"),
        "doc_id", splits, salt=split_salt)
    train = kept.filter(F.col("split") == "train")
    packing = sequence_packing_plan(train, "doc_id", "text",
                                    seq_len=seq_len)
    return CurationPlan(annotated=annotated, kept=kept,
                        train_packing=packing)


def curate_from_warc(spark: SparkSession, path: str,
                     **kw) -> CurationPlan:
    """The archive-to-corpus path: ``read_warc`` (real Common-Crawl
    layout or this engine's compact format) -> :func:`curate`.  One
    task per ~1 GB segment feeds the extraction map directly."""
    from .sources.warc import read_warc
    return curate(read_warc(spark, path), **kw)
