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
                                        threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine >= threshold via brute-force float64 block
    matmul (broadcast pattern) — the correctness baseline / test oracle for
    the LSH-candidate scale path below."""
    topk = brute_force_topk(df, df, id_col, vec_col, k=64)
    return (
        topk.filter(F.col("cosine") >= threshold)
        .filter(F.col(id_col) < F.col("neighbor_id"))
        .select(F.col(id_col).alias("id_a"),
                F.col("neighbor_id").alias("id_b"),
                F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95, n_bits: int = 8,
                             n_tables: int = 12) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold), scale path:
    random-hyperplane LSH buckets generate candidates (shuffle is
    rows x n_tables, never all-pairs), exact JVM-side cosine reranks — no
    driver collect of the corpus, no false positives.  Per-pair recall at
    cosine c is 1-(1-p^n_bits)^n_tables with p = 1 - arccos(c)/pi
    (Charikar 2002): ~0.988 at c=0.95, ~0.9999 at c=0.99 for the defaults.
    Brute force (embedding_near_dup_pairs_bruteforce) is the oracle."""
    cands = _lsh_candidates(df, id_col, vec_col, n_bits, n_tables).filter(
        F.col("id_a") < F.col("id_b")
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    from ..functions import cosine_similarity

    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine",
                    cosine_similarity(F.col("vec_a").cast("array<double>"),
                                      F.col("vec_b").cast("array<double>")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def ivf_assign(df: DataFrame, id_col: str, vec_col: str,
               n_lists: int = 16, sample: int = 2048, iters: int = 8,
               seed: int = 42):
    """IVF coarse quantizer: k-means centroids fitted on a driver-side sample
    (deterministic seed), broadcast; every row assigned its nearest list.
    Returns (assigned_df with `list_id`, centroids ndarray)."""
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
    sc = df.sparkSession.sparkContext
    b_cent = sc.broadcast(cent)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", list_id int"

    def gen(batches):
        C = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = _normalize(np.stack(pdf[vec_col].to_numpy()))
            pdf = pdf.copy()
            pdf["list_id"] = (vm @ C.T).argmax(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, out_schema), cent


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 10,
             n_lists: int = 16, n_probe: int = 3, seed: int = 42) -> DataFrame:
    """Self-join ANN via IVF: queries probe their n_probe nearest lists,
    exact cosine reranks within the probed lists only.  Work is
    ~(n_probe/n_lists) of brute force; recall tested in
    tests/test_pipeline_ops.py.  The alternative scale path to lsh_topk."""
    assigned, cent = ivf_assign(df, id_col, vec_col, n_lists, seed=seed)
    assigned = assigned.cache()
    sc = df.sparkSession.sparkContext
    b_cent = sc.broadcast(cent)

    probe_schema = f"`{id_col}` long, list_id int"

    def probes(batches):
        C = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = _normalize(np.stack(pdf[vec_col].to_numpy()))
            sims = vm @ C.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy(), n_probe)
            yield pd.DataFrame({id_col: ids,
                                "list_id": top.ravel().astype(np.int32)})

    probe_df = df.select(id_col, vec_col).mapInPandas(probes, probe_schema)
    qv = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    cv = assigned.select(F.col(id_col).alias("id_b"),
                         F.col(vec_col).alias("vec_b"), "list_id")
    cands = (
        probe_df.withColumnRenamed(id_col, "id_a")
        .join(cv, "list_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .join(qv, "id_a")
    )
    from ..functions import cosine_similarity
    from pyspark.sql import Window

    scored = (
        cands.join(cv.drop("list_id"), "id_b")
        .withColumn("cosine",
                    cosine_similarity(F.col("vec_a").cast("array<double>"),
                                      F.col("vec_b").cast("array<double>")))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias(id_col),
                F.col("id_b").alias("neighbor_id"), "cosine", "rank")
    )


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
                     n_bits: int, n_tables: int, seed: int = 42) -> DataFrame:
    """(id, table, bucket) rows for all n_tables hyperplane tables in ONE
    Arrow pass: a single (n_tables*n_bits, dim) matmul per batch, sign bits
    packed per table.  Table t's planes come from default_rng(seed+t) — the
    same buckets as n_tables separate `hyperplane_signatures` calls, at 1/n
    of the Python-stage passes."""
    if not 0 < n_bits <= 64:
        raise ValueError(f"n_bits must be in (0, 64], got {n_bits}")
    probe = df.select(vec_col).first()
    if probe is None or probe[0] is None:
        raise ValueError(f"lsh_bucket_table: empty input or NULL {vec_col}")
    dim = len(probe[0])
    planes = np.concatenate(
        [np.random.default_rng(seed + t).normal(size=(n_bits, dim))
         for t in range(n_tables)]
    )
    sc = df.sparkSession.sparkContext
    b_planes = sc.broadcast(planes)
    weights = np.arange(n_bits, dtype=np.uint64)

    out_schema = f"`{id_col}` long, table int, bucket long"

    def gen(batches):
        P = b_planes.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ P.T) > 0                    # (rows, n_tables*n_bits)
            signs = signs.reshape(len(pdf), n_tables, n_bits)
            bucket = (signs.astype(np.uint64)
                      << weights[None, None, :]).sum(axis=2)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            tables = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            yield pd.DataFrame({id_col: ids, "table": tables,
                                "bucket": bucket.reshape(-1).astype(np.int64)})

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def _lsh_candidates(df: DataFrame, id_col: str, vec_col: str,
                    n_bits: int, n_tables: int) -> DataFrame:
    """Distinct directed candidate pairs (id_a, id_b), id_a != id_b, from
    bucket self-joins over n_tables independent hyperplane tables — one
    signature pass and ONE (table, bucket) join, not n_tables of each."""
    sig = lsh_bucket_table(df, id_col, vec_col, n_bits, n_tables)
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
             n_bits: int = 12, n_tables: int = 4) -> DataFrame:
    """Self-join ANN: union candidates over n_tables independent hyperplane
    tables, exact-cosine rerank of candidates only.  Approximate (recall < 1
    by design); the scale path when queries == corpus and both are huge."""
    cands = _lsh_candidates(df, id_col, vec_col, n_bits, n_tables)

    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    from ..functions import cosine_similarity

    scored = (
        cands.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine",
                    cosine_similarity(F.col("vec_a").cast("array<double>"),
                                      F.col("vec_b").cast("array<double>")))
        .select("id_a", "id_b", "cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias(id_col), F.col("id_b").alias("neighbor_id"),
                "cosine", "rank")
    )
