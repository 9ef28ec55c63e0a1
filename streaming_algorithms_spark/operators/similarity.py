"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the dedup design:

- brute-force top-k cosine: correctness baseline.  The query set is
  collected + broadcast as a normalized numpy matrix; each Arrow batch does
  one BLAS matmul (vectorized pandas UDF path).  At 100 TB the *corpus*
  stays distributed — only the query block is broadcast, so cost is
  O(corpus x queries / cluster) with no shuffle at all.
- LSH-bucketed (random hyperplane, Charikar): signature bands shrink the
  candidate set, exact cosine reranks candidates only — the scale path when
  the query set is itself huge (self-join ANN).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


_COSINE_PD = None


def _cosine_pd():
    """Arrow-vectorized float64 cosine for the candidate RERANK joins: one
    einsum + two norms per batch.  The Catalyst zip_with/aggregate cosine
    (functions.cosine_similarity) evaluates its lambdas INTERPRETED per
    element — measured ~2.2 s for a 107k-pair rerank at 64 dims vs ~0.2 s
    here; only fixed-width float arrays cross the Arrow boundary.
    Zero-norm vectors score 0 (the brute_force_topk convention).  Built
    lazily: pandas_udf parses its DDL schema at decoration time and needs
    an active session."""
    global _COSINE_PD
    if _COSINE_PD is None:
        @F.pandas_udf("double")
        def cos(a: pd.Series, b: pd.Series) -> pd.Series:
            if not len(a):
                return pd.Series(np.zeros(0, np.float64))
            A = np.stack(a.to_numpy()).astype(np.float64)
            B = np.stack(b.to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            return pd.Series(
                np.where(den == 0, 0.0, num / np.where(den == 0, 1, den))
            )

        _COSINE_PD = cos
    return _COSINE_PD


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 10, exclude_self: bool = True,
                     max_query_rows: int = 1_000_000) -> DataFrame:
    """Top-k cosine neighbors in `queries` for every corpus row.

    queries is the broadcast-small side (like a dimension table); ties break
    on neighbor id ascending (deterministic).  Only the QUERY side is
    driver-collected and broadcast — the corpus stays distributed, so cost
    is O(corpus x queries / cluster) with zero shuffle.  `max_query_rows`
    guards the collect: at 1M x 64-dim float64 the broadcast is ~0.5 GB,
    the executor-memory ceiling of this pattern.  For self-join ANN where
    queries == corpus at data scale, use lsh_topk / ivf_topk (bucketed, no
    driver collect) — this operator is their exactness oracle."""
    qrows = queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"brute_force_topk: query side exceeds max_query_rows="
            f"{max_query_rows}; use lsh_topk/ivf_topk for corpus-scale "
            f"self-join ANN"
        )
    q_ids = np.array([r[id_col] for r in qrows], np.int64)
    q_mat = _normalize(np.array([r[vec_col] for r in qrows]))
    # pre-sort queries by id: a stable cosine-desc argsort then breaks ties
    # by id ascending for free, so ranking vectorizes across the whole batch
    q_order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[q_order], q_mat[q_order]
    sc = corpus.sparkSession.sparkContext
    b_ids = sc.broadcast(q_ids)
    b_mat = sc.broadcast(q_mat)

    out_schema = f"`{id_col}` long, neighbor_id long, cosine double, rank int"

    def gen(batches):
        ids_b, mat_b = b_ids.value, b_mat.value
        kk = min(k, len(ids_b))
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(np.int64)
            c_mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
            sims = c_mat @ mat_b.T  # one BLAS call per Arrow batch
            if exclude_self:
                sims[ids_b[None, :] == c_ids[:, None]] = -np.inf
            if kk == 1:
                # argmax returns the FIRST max — with queries pre-sorted by
                # id that IS the (cosine desc, id asc) tie-break, at O(Q)
                order = np.argmax(sims, axis=1)[:, None]
            else:
                # one stable argsort for the batch: cosine desc, id asc
                order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            rows_idx = np.arange(len(c_ids))[:, None]
            top_sims = sims[rows_idx, order]
            top_ids = ids_b[order]
            keep = np.isfinite(top_sims)  # drop masked self matches
            n_keep = keep.sum(axis=1)
            ranks = np.broadcast_to(np.arange(1, kk + 1), top_sims.shape)
            yield pd.DataFrame({
                id_col: np.repeat(c_ids, n_keep),
                "neighbor_id": top_ids[keep],
                "cosine": top_sims[keep],
                "rank": ranks[keep].astype(np.int32),
            })

    return corpus.select(id_col, vec_col).mapInPandas(gen, out_schema)


def embedding_near_dup_pairs_bruteforce(df: DataFrame, id_col: str,
                                        vec_col: str,
                                        threshold: float = 0.95,
                                        max_query_rows: int = 1_000_000
                                        ) -> DataFrame:
    """ALL pairs with cosine >= threshold via brute-force float64 block
    matmul (broadcast pattern) — the correctness baseline / test oracle
    for the LSH-candidate scale path below.  TRUE all-pairs: the batch
    threshold mask (np.argwhere) replaces any top-k/sort stage, so no
    per-row neighbor cap can truncate a dense near-dup cluster, and
    there's no argsort cost.  Quadratic by design — frozen-size oracle
    use only (`max_query_rows` guards the broadcast like
    brute_force_topk)."""
    qrows = df.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(qrows) > max_query_rows:
        raise ValueError(
            "embedding_near_dup_pairs_bruteforce: corpus exceeds "
            f"max_query_rows={max_query_rows}; this is the frozen-size "
            "oracle — use embedding_near_dup_pairs at scale"
        )
    q_ids = np.array([r[id_col] for r in qrows], np.int64)
    q_mat = _normalize(np.array([r[vec_col] for r in qrows]))
    sc = df.sparkSession.sparkContext
    b_ids = sc.broadcast(q_ids)
    b_mat = sc.broadcast(q_mat)

    def gen(batches):
        ids_b, mat_b = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(np.int64)
            c_mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
            sims = c_mat @ mat_b.T
            rows, cols = np.nonzero(
                (sims >= threshold) & (c_ids[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame({
                "id_a": c_ids[rows],
                "id_b": ids_b[cols],
                "cosine": np.round(sims[rows, cols], 6),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, "id_a long, id_b long, cosine double"
    )


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95, n_bits: int = 8,
                             n_tables: int = 12,
                             max_bucket_size: int | None = None
                             ) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold), scale path:
    random-hyperplane LSH buckets generate candidates (shuffle is
    rows x n_tables, never all-pairs), exact Arrow-vectorized cosine
    reranks candidates only (_cosine_pd) — no driver collect of the
    corpus, no false positives.  Per-pair recall at
    cosine c is 1-(1-p^n_bits)^n_tables with p = 1 - arccos(c)/pi
    (Charikar 2002): ~0.988 at c=0.95, ~0.9999 at c=0.99 for the defaults.
    Brute force (embedding_near_dup_pairs_bruteforce) is the oracle.
    ``max_bucket_size`` drops degenerate hot buckets (see _cap_buckets)."""
    cands = _lsh_candidates(df, id_col, vec_col, n_bits, n_tables,
                            max_bucket_size=max_bucket_size).filter(
        F.col("id_a") < F.col("id_b")
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return _rerank_pairs(cands, va, vb, threshold)


def _rerank_pairs(cands: DataFrame, va: DataFrame, vb: DataFrame,
                  threshold: float) -> DataFrame:
    """Shared exact-rerank tail of the pair generators: join the vectors
    onto the candidate (id_a, id_b) set, Arrow-vectorized cosine, keep
    >= threshold, 6dp round — ONE definition of the pair contract so the
    intra-set and cross-set operators cannot drift apart."""
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", _cosine_pd()(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def cross_set_near_dup_pairs(left: DataFrame, right: DataFrame,
                             id_col: str, vec_col: str,
                             threshold: float = 0.95, n_bits: int = 8,
                             n_tables: int = 12, seed: int = 42,
                             max_bucket_size: int | None = None
                             ) -> DataFrame:
    """CROSS-set near-duplicate pairs (cosine >= threshold) between two
    corpora — the semantic-decontamination join shape: which left-side
    (training) vectors semantically match ANY right-side (benchmark)
    vector.  Both frames need ``id_col``/``vec_col`` columns; the id
    namespaces are independent (id_a always names a left row, id_b a
    right row — a collision across sides is fine).

    Scale shape mirrors embedding_near_dup_pairs: both sides are
    bucketed by the SAME seeded hyperplanes (one Arrow pass each, all
    n_tables at once), candidates come from ONE (table, bucket)
    left x right join — never an intra-set pair, never the
    |left| x |right| product — and the exact Arrow-vectorized cosine
    reranks candidates only, so there are no false positives and the
    per-pair recall bound is the same Charikar expression (~0.988 at
    c=0.95 for the defaults).  The right side is typically an eval
    set (thousands of rows), the left a corpus (billions): the shuffle
    is rows x n_tables hashes on each side.  A degenerate hot bucket
    (|bucket_l| x |bucket_r| blow-up) is bounded per side by
    ``max_bucket_size`` (see _cap_buckets); None disables the cap."""
    sig_l = _cap_buckets(
        lsh_bucket_table(left, id_col, vec_col, n_bits, n_tables,
                         seed=seed), max_bucket_size)
    sig_r = _cap_buckets(
        lsh_bucket_table(right, id_col, vec_col, n_bits, n_tables,
                         seed=seed), max_bucket_size)
    cands = (
        sig_l.select(F.col(id_col).alias("id_a"), "table", "bucket")
        .join(sig_r.select(F.col(id_col).alias("id_b"), "table", "bucket"),
              ["table", "bucket"])
        .select("id_a", "id_b")
        .distinct()
    )
    va = left.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("vec_a"))
    vb = right.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vec_b"))
    return _rerank_pairs(cands, va, vb, threshold)


def auto_n_lists(n_rows: int) -> int:
    """IVF sizing policy: n_lists ~ sqrt(N) (the standard IVF heuristic —
    balances list length N/L against probe fan-out L), clamped to [4, 4096].
    Keeps the probe+rerank candidate volume ~N^1.5/L ~ N per probe as the
    corpus grows, instead of degrading toward all-pairs with a fixed L."""
    return int(min(4096, max(4, round(np.sqrt(max(n_rows, 1))))))


def _lloyd_refine_distributed(df: DataFrame, vec_col: str, cent: np.ndarray,
                              iters: int) -> np.ndarray:
    """Refine centroids with full-batch Lloyd iterations over the WHOLE
    distributed corpus: each pass broadcasts the centroids, computes
    per-partition (sum, count) partials per list in one vectorized Arrow
    sweep, and reduces the tiny (n_lists x dim) partials on the driver —
    the treeAggregate shape, no raw rows ever collected.  This is the
    above-sample-threshold fit the fixed 2048-row driver k-means can't
    give: centroids see every row, cost is iters extra scans."""
    sc = df.sparkSession.sparkContext
    for _ in range(max(iters, 0)):
        b_cent = sc.broadcast(cent)
        L, dim = cent.shape

        def part(batches):
            C = b_cent.value
            sums = np.zeros((L, dim))
            cnts = np.zeros(L, np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = _normalize(np.stack(pdf[vec_col].to_numpy()))
                a = (vm @ C.T).argmax(axis=1)
                np.add.at(sums, a, vm)
                cnts += np.bincount(a, minlength=L)
            yield pd.DataFrame({"sums": [sums.ravel()], "cnts": [cnts]})

        partials = df.select(vec_col).mapInPandas(
            part, "sums array<double>, cnts array<double>"
        ).collect()  # one tiny row per partition
        sums = np.zeros((L, dim))
        cnts = np.zeros(L)
        for r in partials:
            sums += np.asarray(r["sums"]).reshape(L, dim)
            cnts += np.asarray(r["cnts"])
        nz = cnts > 0
        new = sums[nz] / cnts[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = cent.copy()
        cent[nz] = new / norms
        b_cent.destroy()
    return cent


def ivf_assign(df: DataFrame, id_col: str, vec_col: str,
               n_lists: int = 16, sample: int = None, iters: int = 8,
               seed: int = 42, dist_iters: int = None,
               n_rows: int = None):
    """IVF coarse quantizer.  Centroids are initialized by k-means on a
    BOUNDED driver-side sample (deterministic seed; ``sample`` defaults to
    max(2048, 32*n_lists)), then — when the corpus exceeds the sample —
    refined with distributed full-batch Lloyd passes (partial-sum shape, no
    raw-row collect), so the quantizer tracks the real data distribution at
    any scale.  ``n_lists=None`` applies the sqrt(N) policy (auto_n_lists).
    Every row is then assigned its nearest list in one Arrow sweep.
    Returns (assigned_df with `list_id`, centroids ndarray)."""
    if n_lists is None:
        if n_rows is None:
            n_rows = df.count()
        n_lists = auto_n_lists(n_rows)
    if sample is None:
        sample = min(max(2048, 32 * n_lists), 1 << 16)
    rows = df.select(vec_col).limit(sample).collect()
    mat = _normalize(np.array([r[vec_col] for r in rows]))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(mat.shape[0], size=min(n_lists, mat.shape[0]),
                          replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if members.size:
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    if dist_iters is None:
        if n_rows is not None:
            dist_iters = 2 if n_rows > len(rows) else 0
        else:
            # sample saturated => corpus likely exceeds it; refine.  (No
            # count() job just to decide — corpus == sample exactly makes
            # refinement redundant but harmless.)
            dist_iters = 2 if len(rows) >= sample else 0
    if dist_iters:
        cent = _lloyd_refine_distributed(df, vec_col, cent, dist_iters)
    return assign_with_centroids(df, vec_col, cent), cent


def assign_with_centroids(df: DataFrame, vec_col: str, cent: np.ndarray,
                          with_cos: bool = False) -> DataFrame:
    """Assign every row its nearest centroid (`list_id`) in ONE Arrow pass
    with a broadcast (n_lists x dim) matrix — the incremental-index append
    path: folding a new batch into a built IVF index costs exactly this
    map over ONLY the new rows.  ``with_cos`` adds ``assign_cos`` (cosine
    to the assigned centroid), the per-batch drift statistic."""
    sc = df.sparkSession.sparkContext
    b_cent = sc.broadcast(cent)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", list_id int" + (", assign_cos double" if with_cos else "")

    def gen(batches):
        C = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = _normalize(np.stack(pdf[vec_col].to_numpy()))
            sims = vm @ C.T
            a = sims.argmax(axis=1)
            pdf = pdf.copy()
            pdf["list_id"] = a.astype(np.int32)
            if with_cos:
                pdf["assign_cos"] = sims[np.arange(len(a)), a]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def ivf_search(assigned: DataFrame, cent: np.ndarray, id_col: str,
               vec_col: str, k: int = 10, n_probe: int = 3,
               corpus_pre_partitioned: bool = False,
               n_parts: int | None = None,
               queries: DataFrame | None = None) -> DataFrame:
    """IVF probe + per-list exact rerank over an ALREADY-ASSIGNED corpus
    (`assigned` carries ``list_id``): queries replicate to their n_probe
    nearest lists, each list group computes one BLAS product emitting only
    local top-k rows, global window keeps the final top-k.  Factored out
    of ivf_topk so the incremental index (ivf_index.IvfIndex) reuses the
    identical search plan over its persisted postings.

    ``queries=None`` (default) is the SELF-JOIN mode: the corpus queries
    itself and each row's own id is excluded from its neighbors.  Passing
    a ``queries`` DataFrame (same ``id_col``/``vec_col`` column names,
    ids unique — the rank window partitions on them) searches an EXTERNAL
    query set against the corpus — the retrieval / eval-decontamination
    entry point.  No self-exclusion then: query and corpus ids are
    separate namespaces, so an id collision must not suppress a true
    neighbor.  The query side is never collected — it replicates
    x n_probe through the same hash shuffle as self-join probes, so a
    billion-row eval set is as fine as a ten-row one.

    ``corpus_pre_partitioned=True`` skips the corpus-side repartition for
    input already hash-clustered on ``list_id`` (IvfIndex's BUCKETED
    compact generation): the cogroup's corpus child plans with NO
    Exchange — the per-query corpus shuffle is paid once at compact-write
    time, the same write-once layout strategy as sources/bucketed.py.
    ``n_parts`` must then equal the bucket count so the probe side's
    explicit repartition co-partitions with the bucketed scan (same
    Murmur3 hash family).  The claim is CHECKED on the physical plan
    (the mp_anomaly pre_partitioned pattern): a planner-inserted
    corpus-side Exchange raises instead of silently shuffling."""
    from pyspark.sql import Window

    n_lists = cent.shape[0]
    if n_probe is None or n_probe > n_lists:
        n_probe = n_lists
    sc = assigned.sparkSession.sparkContext
    b_cent = sc.broadcast(cent)
    probe_src = assigned if queries is None else queries
    exclude_self = queries is None
    vec_type = dict(probe_src.dtypes)[vec_col]
    probe_schema = f"`{id_col}` long, `{vec_col}` {vec_type}, list_id int"

    def probes(batches):
        C = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = _normalize(np.stack(pdf[vec_col].to_numpy()))
            sims = vm @ C.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            idx = np.repeat(np.arange(len(pdf)), n_probe)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[idx],
                vec_col: pdf[vec_col].to_numpy()[idx],
                "list_id": top.ravel().astype(np.int32),
            })

    probe_df = probe_src.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(probes, probe_schema)
    corpus = assigned.select(id_col, vec_col, "list_id")
    out_schema = f"`{id_col}` long, neighbor_id long, cosine double"

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return pd.DataFrame(columns=[id_col, "neighbor_id", "cosine"])
        qi = left[id_col].to_numpy(np.int64)
        qm = _normalize(np.stack(left[vec_col].to_numpy()))
        ci = right[id_col].to_numpy(np.int64)
        cm = _normalize(np.stack(right[vec_col].to_numpy()))
        order = np.argsort(ci)  # id-asc members => stable argsort tie-break
        ci, cm = ci[order], cm[order]
        sims = qm @ cm.T
        if exclude_self:  # self-join mode only — external ids are a
            sims[qi[:, None] == ci[None, :]] = -np.inf  # separate namespace
        kk = min(k, sims.shape[1])
        if kk == 1:
            sel = np.argmax(sims, axis=1)[:, None]  # first max = lowest id
        else:
            sel = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows_idx = np.arange(len(qi))[:, None]
        top = sims[rows_idx, sel]
        keep = np.isfinite(top)
        return pd.DataFrame({
            id_col: np.repeat(qi, keep.sum(axis=1)),
            "neighbor_id": ci[sel][keep],
            "cosine": top[keep],
        })

    if n_parts is None:
        n_parts = int(
            assigned.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    corpus_side = (corpus if corpus_pre_partitioned
                   else corpus.repartition(n_parts, "list_id"))
    scored = (
        probe_df.repartition(n_parts, "list_id").groupby("list_id")
        .cogroup(corpus_side.groupby("list_id"))
        .applyInPandas(score, out_schema)
    )
    if corpus_pre_partitioned:
        # verify on the PHYSICAL plan that the bucketed layout actually
        # satisfied the cogroup (driver-side, no job): exactly one
        # list_id Exchange (the probe side's explicit repartition)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        if plan.count("Exchange hashpartitioning(list_id") > 1:
            raise ValueError(
                "ivf_search(corpus_pre_partitioned=True): the corpus is "
                "not hash-clustered on list_id with the probe side's "
                "partition count — the planner inserted a corpus-side "
                "Exchange.  Pass the bucketed compact table (IvfIndex "
                "refresh) with n_parts equal to its bucket count, or "
                "drop the flag.")
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"),
                                           F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "cosine", "rank")
    )


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 10,
             n_lists: int = 16, n_probe: int = 3, seed: int = 42) -> DataFrame:
    """Self-join ANN via IVF: queries probe their n_probe nearest lists,
    exact cosine reranks within the probed lists only.  Work is
    ~(n_probe/n_lists) of brute force; recall tested in
    tests/test_pipeline_ops.py.  ``n_probe=None`` (or >= n_lists) probes
    EVERY list — provably exact, the fully-distributed replacement for the
    driver-collect brute force (no corpus collect anywhere).

    Scoring shape: a cogrouped per-list numpy matmul.  Queries replicate to
    their probed lists (shuffle rows x n_probe), corpus rows shuffle once to
    their own list, and each list group computes one BLAS product emitting
    only local top-k rows — never per-pair join rows with JVM array cosine
    (measured 17.5 s -> ~2 s at sf0.1 full-probe).  A corpus row lives in
    exactly one list, so (query, neighbor) pairs are scored at most once;
    local selection pre-sorts members by id so the stable argsort tie-breaks
    (cosine desc, id asc) exactly like the global window and the SQL
    ROW_NUMBER oracle.  ``n_lists=None`` applies the sqrt(N) policy with
    distributed Lloyd refinement (see ivf_assign)."""
    assigned, cent = ivf_assign(df, id_col, vec_col, n_lists, seed=seed)
    return ivf_search(assigned.select(id_col, vec_col, "list_id"), cent,
                      id_col, vec_col, k=k, n_probe=n_probe)


def hyperplane_signatures(df: DataFrame, id_col: str, vec_col: str,
                          n_bits: int = 16, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH signature (sign pattern) per vector."""
    dim = len(df.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).normal(size=(n_bits, dim))
    sc = df.sparkSession.sparkContext
    b_planes = sc.broadcast(planes)

    out_schema = f"`{id_col}` long, bucket long"

    def gen(batches):
        P = b_planes.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ P.T) > 0
            bucket = (signs.astype(np.uint64)
                      << np.arange(signs.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "bucket": bucket.astype(np.int64)})

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def lsh_bucket_table(df: DataFrame, id_col: str, vec_col: str,
                     n_bits: int, n_tables: int, seed: int = 42,
                     carry_vec: bool = False) -> DataFrame:
    """(id, table, bucket) rows for all n_tables hyperplane tables in ONE
    Arrow pass: a single (n_tables*n_bits, dim) matmul per batch, sign bits
    packed per table.  Table t's planes come from default_rng(seed+t) — the
    same buckets as n_tables separate `hyperplane_signatures` calls, at 1/n
    of the Python-stage passes.  ``carry_vec`` keeps the vector on each
    row (n_tables copies) so a downstream per-bucket rerank needs no join
    back to the corpus.

    NULL vectors produce no bucket rows and an empty input produces an
    empty table — so a composed caller (curate()'s semantic stages on a
    batch where every doc was an exact dup, or had no embedding) sees
    zero candidates, not a crash.

    Vectors must share ONE dimension (the embedding-column contract):
    planes derive per task from (seed, n_bits, dim), so a mixed-dim
    within a task raises; a corpus whose PARTITIONS are internally
    homogeneous at different dims (two embedding models unioned) is a
    caller error this operator cannot detect — re-embed before dedup."""
    if not 0 < n_bits <= 64:
        raise ValueError(f"n_bits must be in (0, 64], got {n_bits}")
    out_schema = f"`{id_col}` long, table int, bucket long"
    if carry_vec:
        vec_t = dict(df.dtypes)[vec_col]
        out_schema += f", `{vec_col}` {vec_t}"
    weights = np.arange(n_bits, dtype=np.uint64)

    def gen(batches):
        # Planes are generated IN the worker from (seed, n_bits, dim):
        # deterministic per table t (default_rng(seed+t)), so every task —
        # and both sides of a cross-set join sharing the seed — derives
        # the identical matrix.  The previous shape probed the vector dim
        # with a driver-side first() — one extra scheduler round trip per
        # operator call (two per gate that banding-joins two frames),
        # pure fixed overhead at any scale (r08 measurement); the ~n_bits
        # x dim normal draws per task are microseconds.  All-NULL or
        # empty input now simply yields no rows — the same empty bucket
        # table the probe short-circuit returned.
        P = None
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if P is None:
                dim = mat.shape[1]
                P = np.concatenate(
                    [np.random.default_rng(seed + t).normal(size=(n_bits, dim))
                     for t in range(n_tables)])
            elif mat.shape[1] != dim:
                # keep the mixed-dimension failure LOUD: with per-task
                # plane derivation, two internally-homogeneous partitions
                # of different dims would otherwise each build their own
                # planes and silently produce incomparable buckets
                raise ValueError(
                    f"lsh_bucket_table: inconsistent vector dimension "
                    f"({mat.shape[1]} vs {dim}) within one task")
            signs = (mat @ P.T) > 0                    # (rows, n_tables*n_bits)
            signs = signs.reshape(len(pdf), n_tables, n_bits)
            bucket = (signs.astype(np.uint64)
                      << weights[None, None, :]).sum(axis=2)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            tables = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            cols = {id_col: ids, "table": tables,
                    "bucket": bucket.reshape(-1).astype(np.int64)}
            if carry_vec:
                cols[vec_col] = np.repeat(pdf[vec_col].to_numpy(), n_tables)
            yield pd.DataFrame(cols)

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def _cap_buckets(sig: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop (table, bucket) groups larger than ``max_bucket_size`` before
    any pairing join — the embedding analogue of the winnowed-fingerprint
    ``max_doc_freq`` cap (text.py): an oversized hyperplane bucket is
    almost always a DEGENERATE-embedding artifact (zero vectors, model
    default outputs, padding rows), and one such bucket of m rows turns
    the candidate stage into m² pairs (identical vectors collide in
    EVERY table, so the other tables don't rescue them).  With the cap,
    every bucket emits at most C(cap, 2) pairs — linear in buckets.
    None (default) disables the cap (exact LSH semantics)."""
    if max_bucket_size is None:
        return sig
    if max_bucket_size < 2:
        raise ValueError(
            f"max_bucket_size must be >= 2, got {max_bucket_size}")
    # window count, NOT a groupBy+join: the size-agg branch and the join
    # branch would be two non-identical subplans over the same
    # mapInPandas output, and Spark does not dedupe common subplans —
    # the signature matmul pass would run twice.  The window rides ONE
    # (table, bucket) shuffle of the single signature pass (no orderBy,
    # so the frame is the whole partition).
    from pyspark.sql import Window

    w = Window.partitionBy("table", "bucket")
    return (sig.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= max_bucket_size).drop("_bsz"))


def _lsh_candidates(df: DataFrame, id_col: str, vec_col: str,
                    n_bits: int, n_tables: int,
                    max_bucket_size: int | None = None) -> DataFrame:
    """Distinct directed candidate pairs (id_a, id_b), id_a != id_b, from
    bucket self-joins over n_tables independent hyperplane tables — one
    signature pass and ONE (table, bucket) join, not n_tables of each.
    ``max_bucket_size``: see _cap_buckets."""
    sig = _cap_buckets(
        lsh_bucket_table(df, id_col, vec_col, n_bits, n_tables),
        max_bucket_size)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def lsh_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 10,
             n_bits: int = 12, n_tables: int = 4,
             n_parts: int | None = None,
             max_bucket_size: int | None = None) -> DataFrame:
    """Self-join ANN: union candidates over n_tables independent hyperplane
    tables, exact-cosine rerank of candidates only.  Approximate (recall < 1
    by design); the scale path when queries == corpus and both are huge.

    Plan shape (the 100-TB calculus): ONE Arrow signature pass carries
    (id, vec) into (table, bucket) groups — the only large shuffle is
    n_tables copies of the corpus, hash-partitioned on (table, bucket)
    with an explicit repartition (AQE must not coalesce the Python-heavy
    stage; CLAUDE.md).  Each bucket group reranks with ONE BLAS matmul
    and emits only its per-id top-k, so candidate PAIRS are never
    materialized, joined back to vectors, or distinct-ed — the prior plan
    (join two vector copies onto every candidate pair + global distinct)
    moved ~20x the bytes at sf0.1.  The final global top-k runs over
    <= n_tables*k rows per id (tiny).  Per-bucket memory is O(bucket^2)
    for the cosine matrix — ``max_bucket_size`` skips degenerate
    mega-buckets INSIDE the grouped stage, before the quadratic matmul
    (an identical-embedding cluster of m rows is otherwise an m x m
    product inside ONE task; group assembly itself is linear).  Rows
    living ONLY in skipped buckets return no neighbors — the right
    answer for zero/default embeddings.  Ties broken
    by ascending neighbor id, identical to the previous window
    ordering."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sig = lsh_bucket_table(df, id_col, vec_col, n_bits, n_tables,
                           carry_vec=True)

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        # the cap is checked INSIDE the group (group assembly is linear
        # in rows; the matmul below is quadratic) — a pre-filter join
        # would re-run the Arrow signature pass once more (see
        # _cap_buckets), which for THIS operator is the dominant cost
        if max_bucket_size is not None and n > max_bucket_size:
            n = 0
        if n < 2:
            return pd.DataFrame({"id_a": np.zeros(0, np.int64),
                                 "id_b": np.zeros(0, np.int64),
                                 "cosine": np.zeros(0, np.float64)})
        # ascending-id row order + stable argsort = ties resolved by the
        # smallest neighbor id, matching the global window ordering below
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy(np.int64)
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(X, axis=1)
        Xn = X / np.where(norms == 0.0, 1.0, norms)[:, None]
        S = Xn @ Xn.T
        np.fill_diagonal(S, -np.inf)  # exclude self-pairs
        m = min(k, n - 1)
        order = np.argsort(-S, axis=1, kind="stable")[:, :m]
        return pd.DataFrame({
            "id_a": np.repeat(ids, m),
            "id_b": ids[order].reshape(-1),
            "cosine": np.take_along_axis(S, order, axis=1).reshape(-1),
        })

    pairs = (
        sig.repartition(n_parts, "table", "bucket")
        .groupBy("table", "bucket")
        .applyInPandas(bucket_topk, "id_a long, id_b long, cosine double")
    )
    # the same pair surfacing from several tables carries an identical
    # cosine; max() is pure dedup
    best = pairs.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias(id_col),
                F.col("id_b").alias("neighbor_id"), "cosine", "rank")
    )
