"""Training-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_algorithms_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    exact_jaccard_pairs,
    minhash_lsh_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_dup_groups,
)
from streaming_algorithms_spark.operators.multimodal import (
    decode_and_resize,
    frame_sample_plan,
    media_features,
    synth_media_table,
)
from streaming_algorithms_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from streaming_algorithms_spark.operators.text import (
    fingerprint_overlap,
    rolling_fingerprints,
    text_profile,
)


@pytest.fixture(scope="module")
def docs(spark):
    """Corpus with exact dups, near dups, and distinct docs."""
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("runs far", "walks far")  # 1-word edit
    rows = []
    rng = np.random.default_rng(5)
    for i in range(40):
        words = [f"w{rng.integers(0, 200)}" for _ in range(30)]
        rows.append((i, " ".join(words)))
    rows += [(100, base), (101, base), (102, near), (103, base + " extra")]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(4).cache()


def test_exact_dedup(spark, docs):
    groups = exact_dedup_groups(docs, "doc_id", "text")
    dups = {r["keep_id"]: r["dup_count"] for r in groups.filter("dup_count > 1").collect()}
    assert dups == {100: 2}
    kept = exact_dedup(docs, "doc_id", "text")
    assert kept.count() == docs.count() - 1
    assert kept.filter("doc_id = 101").count() == 0
    assert kept.filter("doc_id = 100").count() == 1


def test_exact_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in exact_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    assert pairs[(100, 101)] == pytest.approx(1.0)  # exact dup
    assert (100, 102) in pairs and 0.3 < pairs[(100, 102)] < 1.0  # near dup
    assert (100, 103) in pairs  # superset doc
    # random docs share no 3-gram shingles
    assert all(a >= 100 for (a, b) in pairs)


def test_minhash_lsh_finds_near_dups(spark, docs):
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in minhash_lsh_dedup_pairs(
               docs, "doc_id", "text", threshold=0.5,
               num_hashes=128, bands=32).collect()}
    assert (100, 101) in got and got[(100, 101)] == pytest.approx(1.0)
    assert (100, 102) in got  # J ~ 0.66 found via banding
    # estimates near exact values
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in exact_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    for pair, est in got.items():
        if pair in exact:
            assert abs(est - exact[pair]) < 0.2


def test_minhash_signature_deterministic(spark, docs):
    a = {r["doc_id"]: tuple(r["signature"])
         for r in minhash_signatures(docs, "doc_id", "text", 64).collect()}
    b = {r["doc_id"]: tuple(r["signature"])
         for r in minhash_signatures(docs.repartition(7), "doc_id", "text", 64).collect()}
    assert a == b
    assert a[100] == a[101]  # identical text -> identical signature


def test_simhash(spark, docs):
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert h[100] == h[101]
    # near-dup hamming distance small
    ham = bin((h[100] ^ h[102]) & ((1 << 64) - 1)).count("1")
    assert ham <= 12
    groups = {r["keep_id"]: r["dup_count"]
              for r in simhash_dup_groups(docs, "doc_id", "text").collect()}
    assert groups.get(100) == 2


def test_text_profile(spark, docs):
    prof = {r["doc_id"]: r for r in text_profile(docs, "doc_id", "text").collect()}
    p = prof[100]
    assert p["n_tokens"] == 14
    assert p["lang_pred"] == "en"  # 'the' x2, 'and', 'over'
    assert p["punct_ratio"] == 0.0
    assert 0 < p["quality"] <= 1.0


def test_fingerprints_detect_containment(spark, docs):
    fps = rolling_fingerprints(docs, "doc_id", "text")
    assert fps.count() > 0
    overlaps = {(r["id_a"], r["id_b"]) for r in
                fingerprint_overlap(docs, "doc_id", "text", min_shared=3).collect()}
    assert (100, 101) in overlaps and (100, 103) in overlaps


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    ).repartition(4)
    got = brute_force_topk(df, df, "vec_id", "embedding", k=3).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm.astype(np.float64) @ norm.astype(np.float64).T
    for r in got:
        i = r["vec_id"]
        s = sims[i].copy()
        s[i] = -np.inf
        expect_order = np.lexsort((np.arange(60), -s))
        assert r["neighbor_id"] == expect_order[r["rank"] - 1]
        assert r["cosine"] == pytest.approx(s[expect_order[r["rank"] - 1]], abs=1e-5)


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(13)
    # clustered vectors so LSH buckets are meaningful
    centers = rng.normal(size=(8, 16)) * 4
    vecs = np.concatenate([c + rng.normal(size=(12, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs.astype(np.float32))],
        "vec_id long, embedding array<float>",
    )
    got = lsh_topk(df, "vec_id", "embedding", k=1, n_bits=8, n_tables=6).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    true_nn = sims.argmax(axis=1)
    hits = sum(1 for r in got if r["rank"] == 1 and true_nn[r["vec_id"]] == r["neighbor_id"])
    assert len(got) >= 90  # nearly every vector got a candidate
    assert hits / len(got) > 0.7  # recall of true top-1 among returned


def test_multimodal_plumbing(spark):
    media = synth_media_table(spark, 24)
    decoded = decode_and_resize(media, out_h=8, out_w=8)
    rows = decoded.collect()
    assert len(rows) == 24
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in rows)
    feats = {r["media_id"]: r for r in media_features(media).collect()}
    assert all(0 <= r["byte_entropy"] <= 8 for r in feats.values())
    plan = frame_sample_plan(media, every_ms=500)
    assert plan.count() > 24


def test_frame_plan_prunes_payload_from_parquet_scan(spark, tmp_path):
    """Column pruning must reach the scan: the metadata-only frame plan on a
    parquet media table reads ONLY media_id/duration_ms (ReadSchema check —
    same property keeps `html` unread in webpages sketch jobs)."""
    import io
    from contextlib import redirect_stdout

    path = str(tmp_path / "media_parquet")
    synth_media_table(spark, 24).write.parquet(path)
    plan = frame_sample_plan(spark.read.parquet(path), every_ms=500)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan.explain(True)
    phys = buf.getvalue().split("== Physical Plan ==")[-1]
    read_schema = [ln.split("ReadSchema:")[1] for ln in phys.splitlines()
                   if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0]
    assert "duration_ms" in read_schema[0]


def test_multimodal_strict_mode_raises(spark):
    media = synth_media_table(spark, 4)
    import pyspark.errors

    with pytest.raises(Exception) as ei:
        decode_and_resize(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "image decode" in str(ei.value)


def test_cuckoo_broadcast_probe(spark):
    from streaming_algorithms_spark.operators import cuckoo_build, cuckoo_might_contain

    dim = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    probe_df = spark.createDataFrame(
        [(f"k{i}",) for i in range(400, 900)], "key string"
    )
    cf = cuckoo_build(dim, "key", capacity=600)
    probed = cuckoo_might_contain(probe_df, "key", cf)
    hits = {r["key"] for r in probed.filter("might_contain").collect()}
    # no false negatives on the 100 overlapping keys
    assert all(f"k{i}" in hits for i in range(400, 500))
    # essentially no false positives on the 400 unseen keys
    assert len(hits - {f"k{i}" for i in range(400, 500)}) <= 2


def test_cuckoo_build_caps_driver_collect(spark):
    """A high-cardinality column must raise BEFORE collecting (the collect
    is LIMIT-bounded to max_keys+1 — driver memory stays O(max_keys) no
    matter how wide the column is)."""
    from streaming_algorithms_spark.operators import cuckoo_build

    wide = spark.range(5000).selectExpr("CAST(id AS STRING) AS key")
    with pytest.raises(ValueError, match="dimension-sized"):
        cuckoo_build(wide, "key", capacity=100, max_keys=1000)
    # raising the budget explicitly works
    cf = cuckoo_build(wide, "key", capacity=6000, max_keys=10_000)
    assert cf.contains_batch([b"42"]) == [True]


def test_ivf_topk_recall(spark):
    from streaming_algorithms_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(8, 16)) * 4
    vecs = np.concatenate([c + rng.normal(size=(12, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs.astype(np.float32))],
        "vec_id long, embedding array<float>",
    )
    got = ivf_topk(df, "vec_id", "embedding", k=1, n_lists=8, n_probe=2).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    true_nn = sims.argmax(axis=1)
    top1 = {r["vec_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert len(top1) >= 90
    hits = sum(1 for vid, nid in top1.items() if true_nn[vid] == nid)
    assert hits / len(top1) > 0.85  # probing the home cluster finds the NN


def test_hamming_pairs_exact_vs_allpairs_popcount(spark):
    """Pigeonhole band join must find EVERY pair within max_hamming (recall
    1, not probabilistic) and nothing beyond it."""
    from streaming_algorithms_spark.operators.dedup import hamming_pairs

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 1 << 63, 30, dtype=np.int64).tolist()
    # planted cluster: base and flips of 1..6 bits
    base = int(rng.integers(0, 1 << 63))
    planted = [base]
    for nbits, seed in ((1, 1), (2, 2), (3, 3), (4, 4), (6, 5)):
        r = np.random.default_rng(seed)
        v = base
        for bit in r.choice(63, nbits, replace=False):
            v ^= 1 << int(bit)
        planted.append(int(v))
    allv = vals + planted
    sig = spark.createDataFrame(
        [(i, v) for i, v in enumerate(allv)], "doc_id long, simhash long"
    ).repartition(4)
    for k in (2, 3):
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in hamming_pairs(sig, "doc_id", "simhash", k).collect()}
        arr = np.array(allv, np.int64).view(np.uint64)
        expect = {}
        for i in range(len(allv)):
            for j in range(i + 1, len(allv)):
                h = int(bin(int(arr[i] ^ arr[j])).count("1"))
                if h <= k:
                    expect[(i, j)] = h
        assert got == expect
        assert expect  # the planted cluster guarantees non-empty


def test_simhash_hamming_pairs_finds_near_dups(spark, docs):
    from streaming_algorithms_spark.operators.dedup import simhash_hamming_pairs

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_hamming_pairs(docs, "doc_id", "text",
                                          max_hamming=12).collect()}
    assert got.get((100, 101)) == 0          # exact dup -> hamming 0
    assert (100, 102) in got                 # 1-word edit -> small hamming


def test_embedding_near_dup_lsh_matches_bruteforce(spark):
    from streaming_algorithms_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_bruteforce,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(80, 32))
    # plant 10 near-duplicate pairs (tiny perturbation -> cosine ~0.999)
    dups = base[:10] + rng.normal(size=(10, 32)) * 0.02
    vecs = np.concatenate([base, dups]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(4)

    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs_bruteforce(
                 df, "vec_id", "embedding", threshold=0.95).collect()}
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_dup_pairs(
               df, "vec_id", "embedding", threshold=0.95).collect()}
    assert len(exact) >= 10          # the planted pairs qualify
    assert got == exact              # exact rerank: no FPs; LSH found all


def test_cross_set_near_dup_pairs_matches_bruteforce(spark):
    """Cross-set LSH pairs == numpy all-cross-pairs oracle: planted
    corpus<->eval near-dups all found (shared-hyperplane recall at
    cosine ~0.999), exact rerank admits no false positives, and no
    intra-set pair ever appears (the operator's defining property)."""
    from streaming_algorithms_spark.operators.similarity import (
        cross_set_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    corpus = rng.normal(size=(70, 32))
    # eval set: 8 rows are perturbed copies of corpus rows (planted
    # contamination), 12 are independent
    evals = np.concatenate([
        corpus[:8] + rng.normal(size=(8, 32)) * 0.02,
        rng.normal(size=(12, 32)),
    ])
    left = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(corpus.astype(np.float32))],
        "vec_id long, embedding array<float>").repartition(4)
    right = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(evals.astype(np.float32))],
        "vec_id long, embedding array<float>").repartition(3)

    c = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    e = evals / np.linalg.norm(evals, axis=1, keepdims=True)
    sims = c.astype(np.float32) @ e.astype(np.float32).T
    exact = {(i, j) for i, j in np.argwhere(sims >= 0.95)}
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in cross_set_near_dup_pairs(
               left, right, "vec_id", "embedding",
               threshold=0.95).collect()}
    assert len(exact) >= 8                    # every planted pair qualifies
    assert set(got) == exact                  # no FPs, LSH found all
    for (i, j), cos in got.items():
        assert abs(cos - float(sims[i, j])) < 1e-4


def test_embedding_lsh_max_bucket_size_caps_degenerate_cluster(spark):
    """A degenerate cluster of identical embeddings (zero/default model
    outputs) fills one bucket in EVERY table — m² candidate pairs the
    other tables can't rescue.  With max_bucket_size the cluster emits
    NO pairs while real planted near-dups (small buckets) survive; with
    the cap off, the m² pairs are all there (default semantics pinned)."""
    from streaming_algorithms_spark.operators.similarity import (
        cross_set_near_dup_pairs,
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 32))
    dups = base[:5] + rng.normal(size=(5, 32)) * 0.02   # ids 40..44
    clone = np.full(32, 0.7)                             # ids 45..74
    vecs = np.concatenate([base, dups, np.tile(clone, (30, 1))])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs.astype(np.float32))],
        "vec_id long, embedding array<float>").repartition(4)

    capped = {(r["id_a"], r["id_b"])
              for r in embedding_near_dup_pairs(
                  df, "vec_id", "embedding", threshold=0.95,
                  max_bucket_size=8).collect()}
    assert {(i, i + 40) for i in range(5)} <= capped   # planted pairs kept
    assert not any(a >= 45 and b >= 45 for a, b in capped)  # clones gone

    uncapped = {(r["id_a"], r["id_b"])
                for r in embedding_near_dup_pairs(
                    df, "vec_id", "embedding", threshold=0.95).collect()}
    assert {(a, b) for a in range(45, 75) for b in range(a + 1, 75)} \
        <= uncapped                                     # 30-clone clique

    # cross-set: a clone-heavy right side is capped per side too
    right = spark.createDataFrame(
        [(i, clone.tolist()) for i in range(20)]
        + [(100, (base[0] + 0.01 * rng.normal(size=32)).tolist())],
        "vec_id long, embedding array<double>")
    xs = {(r["id_a"], r["id_b"])
          for r in cross_set_near_dup_pairs(
              df, right, "vec_id", "embedding", threshold=0.95,
              max_bucket_size=8).collect()}
    assert (0, 100) in xs                               # real match kept
    assert not any(a >= 45 for a, b in xs)              # clone x clone gone

    # lsh_topk: the mega-bucket never assembles (no m x m matmul task);
    # clone rows living only in dropped buckets return no neighbors,
    # everything else keeps its top-1
    from streaming_algorithms_spark.operators.similarity import lsh_topk

    topk = lsh_topk(df, "vec_id", "embedding", k=1, n_bits=6, n_tables=6,
                    max_bucket_size=8)
    ids = {r["vec_id"] for r in topk.collect()}
    assert not ids & set(range(45, 75))                 # clones unanswered
    assert {i for i in range(5)} <= ids                 # planted side answered


def test_lsh_bucket_table_null_and_empty_inputs_degrade(spark):
    """NULL vectors produce no bucket rows and an empty input produces an
    empty table — composed callers (curate()'s semantic stages on a batch
    where every doc was an exact dup or had no embedding) must see zero
    candidates, not a crash."""
    from streaming_algorithms_spark.operators.similarity import (
        cross_set_near_dup_pairs,
        lsh_bucket_table,
    )

    schema = "vec_id long, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    out = lsh_bucket_table(empty, "vec_id", "embedding", 8, 4)
    assert out.columns == ["vec_id", "table", "bucket"]
    assert out.count() == 0

    nulls = spark.createDataFrame([(1, None), (2, None)], schema)
    assert lsh_bucket_table(nulls, "vec_id", "embedding", 8, 4).count() == 0

    mixed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])], schema)
    got = lsh_bucket_table(mixed, "vec_id", "embedding", 8, 4)
    assert set(r["vec_id"] for r in got.collect()) == {1, 3}

    left = spark.createDataFrame([(1, [1.0, 0.0])], schema)
    assert cross_set_near_dup_pairs(left, nulls, "vec_id", "embedding",
                                    threshold=0.9).count() == 0


def test_brute_force_topk_query_side_guard(spark):
    from streaming_algorithms_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        brute_force_topk(df, df, "vec_id", "embedding", k=1,
                         max_query_rows=5).collect()


def test_multimodal_real_codecs(spark):
    """BMP images and PCM16 WAV audio decode for REAL (pure-numpy codecs):
    the decoded pixels must equal the encoded source, and audio features
    must match a local numpy recomputation."""
    from streaming_algorithms_spark.operators.multimodal import (
        audio_features, decode_bmp, decode_wav, synth_media_table,
    )

    media = synth_media_table(spark, 24)
    payloads = {r["media_id"]: (r["kind"], bytes(r["payload"]))
                for r in media.select("media_id", "kind", "payload").collect()}

    imgs = media.filter("kind = 'image'")
    decoded = {r["media_id"]: r
               for r in decode_and_resize(imgs, out_h=8, out_w=8).collect()}
    assert len(decoded) == 8
    for mid, r in decoded.items():
        src = decode_bmp(payloads[mid][1])
        # nearest-neighbor: every output pixel is some source pixel; check
        # the (0,0) anchor exactly
        got = np.array(r["pixels"], np.uint8).reshape(8, 8, 3)
        assert (got[0, 0] == src[0, 0]).all()

    # strict mode decodes BMP fine but refuses opaque video payloads
    assert decode_and_resize(imgs, out_h=4, out_w=4, strict=True).count() == 8
    with pytest.raises(Exception):
        decode_and_resize(media.filter("kind = 'video'"),
                          out_h=4, out_w=4, strict=True).collect()

    feats = {r["media_id"]: r for r in
             audio_features(media.filter("kind = 'audio'")).collect()}
    assert len(feats) == 8
    for mid, r in feats.items():
        samples, rate = decode_wav(payloads[mid][1])
        x = samples.astype(np.float64)
        assert r["sample_rate"] == rate
        assert r["n_samples"] == samples.size
        assert r["rms"] == pytest.approx(float(np.sqrt((x * x).mean())), abs=1e-4)
        assert r["peak"] == int(np.abs(samples).max())


def test_winnowing_density_envelope_on_corpus(spark):
    """The [1/w, 4/(w+1)] winnowing density envelope holds on the real
    corpus (the oracle gate itself only asserts the unconditional
    1 <= n_fp <= n_windows invariant, since value-dedup breaks the
    positional lower bound on adversarial/periodic inputs)."""
    from streaming_algorithms_spark.operators.text import rolling_fingerprints

    k, w = 16, 8
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fps = {r["doc_id"]: r["n"] for r in
           rolling_fingerprints(docs, "doc_id", "text", k=k, window=w)
           .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    lens = {r["doc_id"]: r["nb"] for r in
            docs.select("doc_id", F.octet_length("text").alias("nb")).collect()}
    assert len(fps) == len(lens)
    for did, n_fp in fps.items():
        n_windows = max(lens[did] - k + 1 - (w - 1), 1)
        assert n_windows / w <= n_fp <= n_windows * 4.0 / (w + 1), did


def test_simhash_null_text_and_hamming0(spark):
    """Regressions: NULL text must not crash the vectorized simhash stage,
    and hamming_pairs(max_hamming=0) must not overflow the 64-bit band
    mask literal."""
    from streaming_algorithms_spark.operators.dedup import (
        hamming_pairs, simhash,
    )

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in
            simhash(df, "doc_id", "text").collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0] == rows[1]

    sig = spark.createDataFrame(
        [(0, 7), (1, 7), (2, -1)], "doc_id long, simhash long"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           hamming_pairs(sig, "doc_id", "simhash", max_hamming=0).collect()}
    assert got == {(0, 1)}


def test_minhash_pipeline_survives_short_docs(spark):
    """Docs with < n tokens have no word shingles (same domain as the SQL
    oracles' range()) — they must flow through signatures/LSH/rerank without
    crashing and never appear in emitted pairs."""
    from streaming_algorithms_spark.operators.dedup import (
        exact_jaccard_for_pairs, lsh_candidate_pairs, word_shingles,
    )

    df = spark.createDataFrame(
        [(0, "x y"), (1, "one"), (2, "a b c d e f g"), (3, "a b c d e f g")],
        "doc_id long, text string",
    )
    sh_ids = {r["doc_id"] for r in
              word_shingles(df, "doc_id", "text", 3).collect()}
    assert sh_ids == {2, 3}

    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, "doc_id", bands=8)
    exact = exact_jaccard_for_pairs(df, pairs, "doc_id", "text", n=3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    assert got.get((2, 3)) == 1.0
    assert all(a in (2, 3) and b in (2, 3) for a, b in got)


def test_fingerprint_overlap_hot_fingerprint_cap(spark):
    """Planted boilerplate shared by EVERY doc must not explode the pair
    stage: with max_doc_freq the boilerplate buckets are dropped, so docs
    sharing ONLY boilerplate produce no pair, while a genuinely overlapping
    pair (long unique shared chunk, doc-freq 2) is still found — and the
    capped pair set is a subset of the exact (uncapped) one."""
    rng = np.random.default_rng(9)
    boiler = " ".join(f"boiler{i:02d}" for i in range(12))
    rows = []
    for i in range(30):
        uniq = " ".join(f"u{i}x{j}q{rng.integers(10000)}" for j in range(20))
        rows.append((i, boiler + " " + uniq))
    shared = " ".join(f"sharedchunk{j:02d}" for j in range(25))
    rows += [(100, boiler + " " + shared + " tail one here"),
             (101, boiler + " " + shared + " other ending text")]
    docs2 = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    capped = {(r["id_a"], r["id_b"])
              for r in fingerprint_overlap(docs2, "doc_id", "text",
                                           min_shared=3, max_doc_freq=8).collect()}
    assert (100, 101) in capped
    assert capped == {(100, 101)}, capped  # boilerplate-only docs never pair
    exact = {(r["id_a"], r["id_b"])
             for r in fingerprint_overlap(docs2, "doc_id", "text",
                                          min_shared=3, max_doc_freq=None).collect()}
    assert capped <= exact
    # uncapped, the boilerplate DOES create cross-doc pairs — the cap is load-bearing
    assert len(exact) > len(capped)


def test_ivf_full_probe_exact_matches_bruteforce(spark):
    """n_probe=None (full probe) must reproduce the brute-force top-1 —
    including the (cosine desc, id asc) tie-break — making it the
    distributed exact path the gated ann_top1 query ships."""
    from streaming_algorithms_spark.operators.similarity import (
        brute_force_topk, ivf_topk,
    )

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(150, 24)).astype(np.float32)
    vecs[140] = vecs[3]  # exact duplicate -> a genuine cosine tie
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    bf = {r["vec_id"]: r["neighbor_id"]
          for r in brute_force_topk(df, df, "vec_id", "embedding", k=1).collect()}
    ivf = {r["vec_id"]: r["neighbor_id"]
           for r in ivf_topk(df, "vec_id", "embedding", k=1,
                             n_lists=6, n_probe=None).collect()}
    assert ivf == bf


def test_ivf_auto_policy_recall_stable_across_sizes(spark):
    """The sqrt(N) auto n_lists policy (+ distributed Lloyd refinement when
    the corpus exceeds the init sample) must hold recall steady at two
    corpus sizes with the SAME call — no hand-tuned n_lists."""
    from streaming_algorithms_spark.operators.similarity import (
        auto_n_lists, ivf_topk,
    )

    assert auto_n_lists(100) == 10
    assert auto_n_lists(10**12) == 4096  # clamped
    rng = np.random.default_rng(31)
    for n_per, min_recall in ((12, 0.85), (40, 0.85)):
        centers = rng.normal(size=(10, 16)) * 4
        vecs = np.concatenate(
            [c + rng.normal(size=(n_per, 16)) * 0.3 for c in centers]
        )
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs.astype(np.float32))],
            "vec_id long, embedding array<float>",
        )
        got = ivf_topk(df, "vec_id", "embedding", k=1,
                       n_lists=None, n_probe=3).collect()
        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = norm @ norm.T
        np.fill_diagonal(sims, -np.inf)
        true_nn = sims.argmax(axis=1)
        top1 = {r["vec_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
        hits = sum(1 for vid, nid in top1.items() if true_nn[vid] == nid)
        assert len(top1) >= 0.9 * len(vecs)
        assert hits / len(top1) > min_recall, (n_per, hits / len(top1))


def test_ivf_distributed_lloyd_refines_centroids(spark):
    """Force the above-sample path: init on a tiny sample, refine with
    distributed Lloyd — refined centroids must cut the mean quantization
    error vs the unrefined sample fit."""
    from streaming_algorithms_spark.operators.similarity import ivf_assign

    rng = np.random.default_rng(41)
    centers = rng.normal(size=(6, 12)) * 5
    vecs = np.concatenate([c + rng.normal(size=(80, 12)) * 0.4 for c in centers])
    order = rng.permutation(len(vecs))  # sample head must miss some clusters
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(vecs[order].astype(np.float32))],
        "vec_id long, embedding array<float>",
    ).repartition(4)

    def mean_sim(cent):
        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        return (norm @ cent.T).max(axis=1).mean()

    _, raw = ivf_assign(df, "vec_id", "embedding", n_lists=6, sample=24,
                        iters=4, dist_iters=0)
    _, refined = ivf_assign(df, "vec_id", "embedding", n_lists=6, sample=24,
                            iters=4, dist_iters=3)
    assert mean_sim(refined) >= mean_sim(raw) - 1e-9
    assert mean_sim(refined) > mean_sim(raw) + 1e-4  # genuinely moved


def test_deterministic_sample_portable_nested_stratified(spark, docs):
    """The md5-threshold sampler: (a) partitioning-invariant subset,
    (b) byte-identical to DuckDB evaluating the same predicate (engine
    portability — the oracle-gate property), (c) nested samples as the rate
    grows, (d) stratified rates land within binomial bounds, (e) duplicate
    keys sampled together."""
    import duckdb

    from streaming_algorithms_spark.operators.sampling import (
        deterministic_sample, hex_threshold, stratified_sample,
    )

    ids_a = {r["doc_id"] for r in
             deterministic_sample(docs, "text", 0.4, salt="s").collect()}
    ids_b = {r["doc_id"] for r in
             deterministic_sample(docs.repartition(7), "text", 0.4,
                                  salt="s").collect()}
    assert ids_a == ids_b  # partitioning-invariant

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    duck_ids = {r[0] for r in con.execute(
        f"SELECT doc_id FROM d WHERE md5('s' || text) < '{hex_threshold(0.4)}'"
    ).fetchall()}
    assert ids_a == duck_ids  # engine-portable: EXACT same subset

    small = {r["doc_id"] for r in
             deterministic_sample(docs, "text", 0.15, salt="s").collect()}
    assert small <= ids_a  # nested: growing the rate only adds rows

    # duplicate texts (100/101) are kept or dropped together
    assert (100 in ids_a) == (101 in ids_a)

    big = spark.createDataFrame(
        [(i, f"doc {i} unique", "en" if i % 3 else "de")
         for i in range(3000)],
        "doc_id long, text string, lang string",
    )
    st = stratified_sample(big, "lang", "text", {"en": 0.1},
                           default_rate=0.8, salt="t")
    kept = {r["lang"]: r["n"] for r in
            st.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en, n_de = 2000, 1000
    assert abs(kept.get("en", 0) / n_en - 0.1) < 4 * (0.1 * 0.9 / n_en) ** 0.5
    assert abs(kept.get("de", 0) / n_de - 0.8) < 4 * (0.8 * 0.2 / n_de) ** 0.5


def test_containment_asymmetric_and_fingerprint_scale_path(spark):
    """Planted contamination: an eval doc fully quoted inside a much larger
    train doc must score containment 1.0 (while symmetric Jaccard is tiny),
    and the linear-cost cross_fingerprint_overlap scale path must surface
    every exact-containment pair (its fingerprints are a subset of the
    shared k-grams) while boilerplate shared by all docs stays capped."""
    from streaming_algorithms_spark.operators.dedup import (
        exact_containment_pairs, exact_jaccard_pairs,
    )
    from streaming_algorithms_spark.operators.text import (
        cross_fingerprint_overlap,
    )

    rng = np.random.default_rng(13)
    quote = " ".join(f"quoted{j:03d}" for j in range(30))
    big_train = quote + " " + " ".join(
        f"trainpad{j}x{rng.integers(10**6)}" for j in range(300)
    )
    train_rows = [(0, big_train)] + [
        (i, " ".join(f"t{i}w{j}q{rng.integers(10**6)}" for j in range(40)))
        for i in range(1, 20)
    ]
    eval_rows = [(100, quote)] + [
        (100 + i, " ".join(f"e{i}w{j}q{rng.integers(10**6)}" for j in range(40)))
        for i in range(1, 20)
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")

    cont = {(r["train_id"], r["eval_id"]): r["containment"]
            for r in exact_containment_pairs(train, ev, "doc_id", "text",
                                             threshold=0.5).collect()}
    assert cont == {(0, 100): 1.0}
    # symmetric Jaccard on the union misses the quoted pair at this threshold
    jac = {(r["id_a"], r["id_b"])
           for r in exact_jaccard_pairs(train.unionByName(ev), "doc_id",
                                        "text", threshold=0.5).collect()}
    assert (0, 100) not in jac

    fp = {(r["train_id"], r["eval_id"])
          for r in cross_fingerprint_overlap(train, ev, "doc_id", "text",
                                             min_shared=3).collect()}
    assert (0, 100) in fp
    assert fp == {(0, 100)}  # unique-token docs create no spurious pairs


def test_weighted_sample_es_property_and_portability(spark):
    """Efraimidis–Spirakis: (a) deterministic + partitioning-invariant,
    (b) inclusion frequency tracks weight (k=1 winner across salts follows
    P(i) = w_i/sum(w), verified via a pure-numpy replication of the SAME
    md5 formula — which also proves engine portability of the math),
    (c) per-group k is respected and zero/NULL weights are excluded."""
    import hashlib
    import math

    rows = [(f"item{i}", float(wt), "g")
            for i, wt in enumerate([1, 1, 1, 1, 8, 8])]
    rows += [("zeroed", 0.0, "g"), ("nullw", None, "g")]
    df = spark.createDataFrame(rows, "key string, wt double, grp string")

    from streaming_algorithms_spark.operators.sampling import weighted_sample

    def local_winner(salt):
        best = None
        for key, wt, _ in rows:
            if not wt:
                continue
            u = int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16) / 16 ** 15
            e = -math.log(max(u, 1e-18)) / wt
            if best is None or e < best[0]:
                best = (e, key)
        return best[1]

    wins = {}
    for t in range(120):
        wins[local_winner(f"s{t}")] = wins.get(local_winner(f"s{t}"), 0) + 1
    heavy = sum(wins.get(f"item{i}", 0) for i in (4, 5))
    assert heavy > 0.65 * 120  # expected 16/20 = 0.8 of wins

    got = {r["key"] for r in
           weighted_sample(df, "key", "wt", k=3, group_cols=("grp",),
                           salt="s0").collect()}
    got_rep = {r["key"] for r in
               weighted_sample(df.repartition(5), "key", "wt", k=3,
                               group_cols=("grp",), salt="s0").collect()}
    assert got == got_rep and len(got) == 3
    assert "zeroed" not in got and "nullw" not in got
    # spark agrees with the pure-python replication for the k=1 winner
    one = weighted_sample(df, "key", "wt", k=1, group_cols=("grp",),
                          salt="s0").collect()[0]["key"]
    assert one == local_winner("s0")


def test_url_host_function(spark, webpages):
    from pyspark.sql import functions as F

    from streaming_algorithms_spark import functions as fn

    out = (webpages.limit(500)
           .select("url", fn.url_host("url").alias("host"),
                   fn.url_path("url").alias("path"))
           .collect())
    for r in out:
        # generator urls: https://host{h}.example.com/{lang}/p{uid}
        assert r["url"].startswith(f"https://{r['host']}/")
        assert r["host"].endswith(".example.com")
        assert r["url"].endswith(r["path"])
    # host is a usable skew key: few distinct hosts, zipf-dominated
    n_hosts = (webpages.select(fn.url_host("url").alias("h"))
               .distinct().count())
    assert 1 < n_hosts <= 200


def test_canonical_url_rules(spark):
    from streaming_algorithms_spark import functions as fn

    cases = [
        ("HTTP://Example.COM:80/a/b/?utm_source=x&id=7#frag",
         "http://example.com/a/b?id=7"),
        ("https://Host.net:443/", "https://host.net/"),
        ("https://host.net:8080//a//b/", "https://host.net:8080/a/b"),
        ("http://h.com", "http://h.com/"),
        ("http://h.com/?utm_a=1&UTM_b=2&gclid=z", "http://h.com/"),
        ("http://h.com/p?a=1&fbclid=x&b=2", "http://h.com/p?a=1&b=2"),
        ("https://h.com/p#only-frag", "https://h.com/p"),
        ("http://h.com:8080", "http://h.com:8080/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(fn.canonical_url("url")).collect()]
    assert got == [w for _, w in cases]


def test_canonical_url_schemeless_is_null(spark):
    from streaming_algorithms_spark import functions as fn

    df = spark.createDataFrame(
        [("/h.com/a",), ("//h.com/a",), ("not a url",), (None,)],
        "url string",
    )
    got = [r[0] for r in df.select(fn.canonical_url("url")).collect()]
    assert got == [None, None, None, None]


def test_pii_count_and_redact(spark):
    from pyspark.sql import functions as F

    from streaming_algorithms_spark import functions as fn

    cases = [
        ("mail me at a.b@x.org or c@y.co.uk thanks", 2,
         "mail me at [EMAIL] or [EMAIL] thanks"),
        ("call 555-123-4567 or 555.987.6543", 2, "call [PHONE] or [PHONE]"),
        ("host 10.0.0.7 and 192.168.1.255", 2, "host [IP] and [IP]"),
        # a phone-like substring inside an email local part counts ONCE
        ("user.555-123-4567@x.com", 1, "[EMAIL]"),
        ("version 1.2.3 is not an ip", 0, "version 1.2.3 is not an ip"),
        ("nothing here", 0, "nothing here"),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in cases], "t string")
    out = df.select(fn.pii_count("t").alias("n"),
                    fn.redact_pii(F.col("t")).alias("r")).collect()
    for (t, want_n, want_r), row in zip(cases, out):
        assert row["n"] == want_n, (t, row["n"])
        assert row["r"] == want_r, (t, row["r"])


def test_tfidf_top_terms_matches_numpy(spark):
    import math

    from streaming_algorithms_spark.operators.text import tfidf_top_terms

    rows = [(0, "apple banana apple rare"), (1, "banana banana cherry"),
            (2, "apple cherry cherry cherry unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["term"]): r["score"]
           for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()}

    # hand-derive: N=3; df: apple 2, banana 2, cherry 2, rare 1, unique 1
    def score(tf, dft):
        return round(tf * (math.log(4.0 / (dft + 1.0)) + 1.0), 6)

    # doc 0: apple tf2 df2 -> 2*(ln(4/3)+1); rare tf1 df1 -> ln(2)+1
    assert out[(0, "apple")] == score(2, 2)
    assert out[(0, "rare")] == score(1, 1)
    # doc 2 top-2: cherry tf3, then unique (rarer) beats apple (tf1 df2)
    assert out[(2, "cherry")] == score(3, 2)
    assert out[(2, "unique")] == score(1, 1)
    assert (2, "apple") not in out
    assert len(out) == 6


def test_split_assign_properties(spark):
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.operators.sampling import assign_splits

    df = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(3000)],
        "doc_id long, text string",
    )
    out = assign_splits(df, "text", {"train": 0.8, "val": 0.1, "test": 0.1},
                        salt="s")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # every row in exactly one split; fractions within a 4-sigma binomial band
    assert sum(counts.values()) == 3000
    assert abs(counts["train"] - 2400) <= 4 * (3000 * 0.8 * 0.2) ** 0.5
    assert abs(counts["val"] - 300) <= 4 * (3000 * 0.1 * 0.9) ** 0.5
    # deterministic: a second run with the same spec is identical
    again = assign_splits(df, "text", {"train": 0.8, "val": 0.1, "test": 0.1},
                          salt="s")
    assert out.exceptAll(again).count() == 0
    # different salt moves documents
    moved = assign_splits(df, "text", {"train": 0.8, "val": 0.1, "test": 0.1},
                          salt="other")
    assert out.exceptAll(moved).count() > 0

    import pytest

    with pytest.raises(ValueError):
        assign_splits(df, "text", {"a": 0.5, "b": 0.6})


def test_split_assign_null_keys_get_null_split(spark):
    from streaming_algorithms_spark.operators.sampling import assign_splits

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["split"] for r in
           assign_splits(df, "text", {"train": 0.9, "test": 0.1}).collect()}
    assert out[2] is None
    assert out[1] in ("train", "test") and out[3] in ("train", "test")


def test_sequence_packing_plan_invariants(spark):
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.operators.text import sequence_packing_plan

    df = spark.createDataFrame(
        [(i, " ".join(["tok"] * n)) for i, n in
         enumerate([5, 200, 1, 127, 128, 129, 300])],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            sequence_packing_plan(df, "doc_id", "text", seq_len=128).collect()}
    # contiguity: each doc starts where the previous ended
    offset = 0
    for i in range(7):
        r = rows[i]
        assert r["start_offset"] == offset
        assert r["start_seq"] == offset // 128
        assert r["start_pos"] == offset % 128
        offset += r["n_tokens"]
        assert r["end_seq"] == (offset - 1) // 128
    # doc 1 (200 tokens from offset 5) must span sequences 0..1
    assert rows[1]["start_seq"] == 0 and rows[1]["end_seq"] == 1
    # total sequences = ceil(total/128)
    assert (offset - 1) // 128 == rows[6]["end_seq"]


def test_repetition_profile_known_values(spark):
    from streaming_algorithms_spark.operators.text import repetition_profile

    rows = [
        (0, "a b a b a b a b"),        # 8 toks; 6 tri, 2 distinct; 7 bi, top 'a b' 4/7
        (1, "w x y z"),                 # no repetition: all tri/bi distinct
        (2, "q r"),                     # too short for 3-grams
        (3, "solo"),                    # too short for anything
        (4, None),                      # NULL text -> all metrics NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           repetition_profile(df, "doc_id", "text").collect()}
    assert out[0]["dup_3gram_frac"] == round(1 - 2 / 6, 6)
    assert out[0]["top_2gram_frac"] == round(4 / 7, 6)
    assert out[1]["dup_3gram_frac"] == 0.0
    assert out[1]["top_2gram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_3gram_frac"] is None
    assert out[2]["top_2gram_frac"] == 1.0
    assert out[3]["dup_3gram_frac"] is None and out[3]["top_2gram_frac"] is None
    assert (out[4]["n_tokens"] is None and out[4]["dup_3gram_frac"] is None
            and out[4]["top_2gram_frac"] is None)


def test_unigram_logprob_known_values(spark):
    import math

    from streaming_algorithms_spark.operators.text import unigram_logprob_score

    # corpus: 6 tokens total; a:3, b:2, c:1
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           unigram_logprob_score(df, "doc_id", "text").collect()}
    lp0 = (2 * math.log(3 / 6) + math.log(2 / 6)) / 3
    lp1 = (math.log(3 / 6) + math.log(2 / 6) + math.log(1 / 6)) / 3
    assert out[0]["logprob"] == round(lp0, 6)
    assert out[1]["logprob"] == round(lp1, 6)
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 3


def test_sequence_packing_partition_count_invariant(spark):
    """The two-pass range-partitioned cumsum must produce IDENTICAL
    coordinates at any n_parts (including 1, the degenerate single-range
    case) — the partition count is an execution knob, never a semantic
    one."""
    from streaming_algorithms_spark.operators.text import sequence_packing_plan

    rows = [(i, " ".join(["t"] * ((i * 37) % 90 + 1))) for i in range(60)]
    rows.append((60, None))
    rows.append((61, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def snap(n_parts):
        return sorted(
            tuple(r) for r in sequence_packing_plan(
                df, "doc_id", "text", seq_len=64, n_parts=n_parts).collect()
        )

    base = snap(1)
    assert snap(3) == base
    assert snap(7) == base
    assert snap(32) == base


def test_bpe_token_count_known_values_and_cross_engine(spark):
    """GPT-2 pre-tokenizer counts: contractions split off, digit runs and
    punctuation runs are separate pre-tokens, unicode letters covered by
    \\p{L}; Spark regexp_count and DuckDB regexp_extract_all agree on the
    restricted (lookaround-free) pattern."""
    import duckdb

    from streaming_algorithms_spark import functions as fn

    rows = [
        (0, "hello world"),          # 2
        (1, "don't stop"),           # don / 't / stop = 3
        (2, "abc123 x!?"),           # abc / 123 / x / !? = 4
        (3, "Ünïcode läuft"),        # 2 (unicode letters)
        (4, ""),                     # 0
        (5, "  spaced  out  "),      # 2
        (6, "we'll we've I'm I'd"),  # we/'ll/we/'ve/I/'m/I/'d = 8
        (7, "a\x0bb"),               # VT is whitespace in BOTH engines'
                                     # EXPLICIT class (Java \s has \x0B,
                                     # RE2's does not — the pattern spells
                                     # the class out so both count 2)
    ]
    expect = {0: 2, 1: 3, 2: 4, 3: 2, 4: 0, 5: 2, 6: 8, 7: 2}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", fn.bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got == expect

    con = duckdb.connect()
    import pandas as pd
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    # interpolate the SAME constant the operator and oracle use
    pat_sql = fn.BPE_SPLIT_PAT.replace("'", "''")
    duck = dict(con.execute(
        "SELECT doc_id, len(regexp_extract_all(text,"
        f" '{pat_sql}'))"
        " FROM t"
    ).fetchall())
    assert duck == expect
