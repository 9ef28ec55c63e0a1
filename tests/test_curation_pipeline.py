"""End-to-end curation pipeline (pipeline.py): planted-case funnel and
the archive-to-corpus path.

The planted corpus pins one document per drop reason plus controls, so
the funnel counts are exact expectations, not statistical ones.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from streaming_algorithms_spark.pipeline import curate, curate_from_warc

_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _planted_rows():
    # filler vocab is unique per doc so no unintended near-dup pairs
    def filler(tag, n=30):
        toks = [f"{tag}tok{i}" for i in range(n)]
        # sprinkle English stopwords for lang + quality stop ratio
        return ("the " + " ".join(toks[:10]) + " and of is "
                + " ".join(toks[10:]) + " the and")

    rows = []
    good = filler("exact")
    for i in range(3):  # exact duplicates: same content, distinct capture
        rows.append((f"https://ex.com/e{i}", _TS, good))
    base = [f"near{i}" for i in range(60)]
    n1 = "the " + " ".join(base) + " and of is one"
    n2 = "the " + " ".join(base) + " and of is two"
    rows.append(("https://ex.com/n1", _TS, n1))  # near-dup pair
    rows.append(("https://ex.com/n2", _TS, n2))
    # low quality: >5000 tokens -> len_ok 0.2, ~zero stopword ratio
    # -> quality ~0.38 < 0.5, while "the" keeps lang=en
    rows.append(("https://ex.com/q", _TS,
                 "the " + " ".join(f"fill{i}" for i in range(5999))))
    rows.append(("https://ex.com/r", _TS,  # repetitive: one dominating 2gram
                 "the " + " ".join(["rep"] * 50)))
    rows.append(("https://ex.com/l", _TS,  # German: lang filter
                 "der hund und die katze ist ein tier der die das und "
                 + " ".join(f"wort{i}" for i in range(20))))
    rows.append(("https://ex.com/nul", _TS, None))  # NULL text -> und lang
    for i in range(10):  # kept controls
        rows.append((f"https://ex.com/f{i}", _TS, filler(f"doc{i}")))
    return rows


@pytest.fixture(scope="module")
def planted_plan(spark):
    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    return curate(df, text_col="text", lang_allow=["en"], min_quality=0.5,
                  max_top_2gram_frac=0.9, max_dup_3gram_frac=0.6,
                  near_threshold=0.8, seq_len=64,
                  splits={"train": 1.0})


def test_funnel_counts_exact(planted_plan):
    funnel = {r["stage"]: (r["docs"], r["tokens"])
              for r in planted_plan.funnel().collect()}
    assert funnel["exact_duplicate"][0] == 2
    assert funnel["near_duplicate"][0] == 1
    assert funnel["lang"][0] == 2          # German + NULL text
    assert funnel["low_quality"][0] == 1
    assert funnel["repetitive"][0] == 1
    assert funnel["kept"][0] == 12         # 1 exact + 1 near survivor + 10
    assert sum(v[0] for v in funnel.values()) == 19
    assert funnel["kept"][1] > 0           # token totals ride along


def test_dedup_verdicts(planted_plan):
    ann = planted_plan.annotated
    from collections import Counter

    ex = [r["drop_reason"]
          for r in ann.filter(F.col("url").rlike("/e[0-9]$")).collect()]
    assert Counter(ex) == {"exact_duplicate": 2, None: 1}
    near = ann.filter(F.col("url").rlike("/n[12]$")).collect()
    assert Counter(r["drop_reason"] for r in near) == {"near_duplicate": 1,
                                                       None: 1}
    # both members carry the same duplicate-cluster label
    comps = {r["component"] for r in near}
    assert len(comps) == 1 and None not in comps


def test_kept_is_clean_and_split(planted_plan):
    kept = planted_plan.kept.collect()
    assert len(kept) == 12
    texts = [r["text"] for r in kept]
    assert len(set(texts)) == len(texts)  # no surviving duplicates
    assert all(r["split"] == "train" for r in kept)


def test_packing_is_contiguous(planted_plan):
    rows = sorted(planted_plan.train_packing.collect(),
                  key=lambda r: r["start_offset"])
    assert rows and rows[0]["start_offset"] == 0
    off = 0
    for r in rows:
        assert r["start_offset"] == off
        assert r["start_seq"] == off // 64
        assert r["end_seq"] == (off + r["n_tokens"] - 1) // 64
        off += r["n_tokens"]
    assert off == sum(r["n_tokens"] for r in rows)


def test_pipeline_plans_are_distributed(planted_plan):
    """Same structural guarantee the gated-query sweep enforces
    (test_plans_scale.py): no CollectLimit anywhere in the composed
    pipeline's plans — the funnel/kept/packing outputs are fully
    distributed at any corpus size."""
    for df in (planted_plan.annotated, planted_plan.kept,
               planted_plan.train_packing, planted_plan.funnel()):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CollectLimit" not in p, p


def test_deterministic_rerun(spark, planted_plan):
    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    again = curate(df, text_col="text", lang_allow=["en"], min_quality=0.5,
                   max_top_2gram_frac=0.9, max_dup_3gram_frac=0.6,
                   near_threshold=0.8, seq_len=64, splits={"train": 1.0})
    a = sorted(r["url"] for r in planted_plan.kept.collect())
    b = sorted(r["url"] for r in again.kept.collect())
    assert a == b


def test_null_and_empty_text_collapse_to_one_dropped_survivor(spark):
    """NULL-text docs must not bypass exact dedup (md5(NULL) would
    exempt them, leaving k docs that all share the hash-of-'' minhash
    signature — a C(k,2) LSH candidate clique), must score quality 0
    (quality_score(NULL)'s when-chain otherwise falls through to 1.0),
    and must never be elected over real documents."""
    rows = [(f"https://ex.com/null{i}", _TS, None) for i in range(4)]
    rows.append(("https://ex.com/empty", _TS, ""))
    rows += [(f"https://ex.com/real{i}", _TS,
              "the " + " ".join(f"r{i}tok{j}" for j in range(30))
              + " and of is") for i in range(3)]
    df = spark.createDataFrame(rows,
                               "url string, warc_ts timestamp, text string")
    plan = curate(df, text_col="text", min_quality=0.5, seq_len=64,
                  splits={"train": 1.0})
    ann = plan.annotated.collect()
    nocontent = [r for r in ann if r["text"] is None or r["text"] == ""]
    reasons = sorted((r["drop_reason"] for r in nocontent), key=str)
    # one no-content group: one survivor (dropped as low_quality),
    # four exact duplicates, zero near_duplicates (no clique)
    assert reasons == ["exact_duplicate"] * 4 + ["low_quality"]
    for r in ann:
        if r["text"] is None:
            assert r["quality"] == 0.0
    kept = plan.kept.collect()
    assert sorted(r["url"] for r in kept) == [
        f"https://ex.com/real{i}" for i in range(3)]


def test_explicit_id_col_used_verbatim(spark):
    rows = [(i * 100, f"https://ex.com/x{i}", _TS,
             "the " + " ".join(f"x{i}t{j}" for j in range(20)) + " and of")
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "myid long, url string, warc_ts timestamp, text string")
    plan = curate(df, text_col="text", id_col="myid", splits={"train": 1.0})
    ids = sorted(r["doc_id"] for r in plan.annotated.collect())
    assert ids == [0, 100, 200, 300]


def test_path_staging_is_resumable(spark, tmp_path):
    """A second curate() against the same completed staging path must
    reuse it (the documented resume workflow), not raise path-exists."""
    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    st = str(tmp_path / "stage_resume")
    kw = dict(text_col="text", splits={"train": 1.0}, seq_len=64)
    first = sorted(r["url"] for r in curate(df, stage=st, **kw).kept.collect())
    again = sorted(r["url"] for r in curate(df, stage=st, **kw).kept.collect())
    assert first == again


def test_path_staging_refuses_stale_and_heals_crashed(spark, tmp_path):
    """A completed staging table carries an input/params fingerprint:
    reuse with DIFFERENT input or extraction params is refused (silently
    reading the old corpus's extraction is the failure mode); a crashed
    stage (pending-state marker) self-heals via overwrite; a data dir NOT
    written by the protocol is never clobbered."""
    import json
    import os

    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    other = spark.createDataFrame(
        [("https://ex.com/z", _TS, "the zzz and of is")],
        "url string, warc_ts timestamp, text string")
    st = str(tmp_path / "stage_fp")
    kw = dict(text_col="text", splits={"train": 1.0}, seq_len=64)
    curate(df, stage=st, **kw).kept.collect()

    with pytest.raises(ValueError, match="different input or extraction"):
        curate(other, stage=st, **kw)

    # crashed stage: marker downgraded to pending (= crash between data
    # write and commit) -> the rerun overwrites and heals, even for new
    # input (a pending stage is a temp, nothing durable is lost)
    meta_path = os.path.join(st, "_STAGE_META.json")
    meta = json.load(open(meta_path))
    meta["state"] = "pending"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    kept = sorted(r["url"] for r in
                  curate(other, stage=st, **kw).kept.collect())
    assert kept == ["https://ex.com/z"]

    # a foreign dir (data, no marker): refused, not overwritten
    foreign = tmp_path / "not_a_stage"
    foreign.mkdir()
    (foreign / "valuable.parquet").write_text("do not clobber")
    with pytest.raises(ValueError, match="no _STAGE_META"):
        curate(df, stage=str(foreign), **kw)
    assert (foreign / "valuable.parquet").read_text() == "do not clobber"


def test_commit_seam_crash_leaves_commit_invisible(spark, tmp_path,
                                                   monkeypatch):
    """Fault injection through the ONE atomic-publish seam
    (commit.publish_file): a crash at the swap point must leave every
    protocol's commit invisible — the sketch-table batch stays
    uncommitted, the staging marker absent — and the retry path after the
    fault heals without manual cleanup.  This is the test double that
    proves the object-store swap really is one class."""
    from streaming_algorithms_spark import commit as commit_mod
    from streaming_algorithms_spark.sketch_table import SketchTable

    def crash(tmp, final):
        raise OSError("injected: crashed before atomic publish")

    # sketch table: partials parquet lands, _BATCH_META commit crashes ->
    # batch invisible; retry with the real seam commits it
    import numpy as np
    from pyspark.sql import functions as F

    def factory():
        from streaming_algorithms_spark.sketches.hll import HyperLogLog
        return HyperLogLog(12)

    def update(sk, pdf):
        sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))

    b = (spark.range(0, 300)
         .select(F.concat(F.lit("lang"), (F.col("id") % 3)).alias("lang"),
                 F.xxhash64("id").alias("_h")).repartition(2))
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    t.append(b, "day-0", factory, update)
    monkeypatch.setattr(commit_mod, "publish_file", crash)
    with pytest.raises(OSError, match="injected"):
        t.append(b, "day-1", factory, update)
    monkeypatch.undo()
    assert t.committed_batches() == ["day-0"]  # crashed append invisible

    # staging marker: parquet write completes, marker commit crashes ->
    # the stage is not "completed", rerun overwrites and commits
    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    st = str(tmp_path / "stage_crash")
    kw = dict(text_col="text", splits={"train": 1.0}, seq_len=64)
    monkeypatch.setattr(commit_mod, "publish_file", crash)
    with pytest.raises(OSError, match="injected"):
        curate(df, stage=st, **kw)
    monkeypatch.undo()
    import os
    assert not os.path.exists(os.path.join(st, "_STAGE_META.json"))
    assert len(curate(df, stage=st, **kw).kept.take(1)) == 1


def test_decontamination_drops_quoted_doc(spark):
    """A doc whose text an eval-set item quotes verbatim must drop as
    'contaminated'; everything else is unaffected (same kept set as the
    base fixture minus that doc)."""
    rows = _planted_rows()
    quoted = next(t for (u, _, t) in rows if u.endswith("/f0"))
    eval_df = spark.createDataFrame(
        [(quoted,), ("completely unrelated benchmark question",)],
        "text string")
    df = spark.createDataFrame(rows,
                               "url string, warc_ts timestamp, text string")
    plan = curate(df, text_col="text", lang_allow=["en"], min_quality=0.5,
                  max_top_2gram_frac=0.9, max_dup_3gram_frac=0.6,
                  near_threshold=0.8, seq_len=64, splits={"train": 1.0},
                  decontaminate_against=eval_df)
    ann = {r["url"]: r["drop_reason"]
           for r in plan.annotated.collect()}
    assert ann["https://ex.com/f0"] == "contaminated"
    funnel = {r["stage"]: r["docs"] for r in plan.funnel().collect()}
    assert funnel["contaminated"] == 1
    assert funnel["kept"] == 11  # base fixture's 12 minus the quoted doc


def test_staging_modes_equivalent(spark, tmp_path, planted_plan):
    """stage=True (persist) / stage=<path> (parquet) / stage=False are
    pure performance choices: identical kept sets.  The path mode's
    downstream plan reads the staging table, not the extraction map."""
    import os

    df = spark.createDataFrame(_planted_rows(),
                               "url string, warc_ts timestamp, text string")
    kw = dict(text_col="text", lang_allow=["en"], min_quality=0.5,
              max_top_2gram_frac=0.9, max_dup_3gram_frac=0.6,
              near_threshold=0.8, seq_len=64, splits={"train": 1.0})
    expected = sorted(r["url"] for r in planted_plan.kept.collect())
    st = str(tmp_path / "staged")
    for mode in (False, st):
        p = curate(df, stage=mode, **kw)
        assert sorted(r["url"] for r in p.kept.collect()) == expected
    assert any(f.endswith(".parquet")
               for f in os.listdir(os.path.join(st, "data")))
    staged = curate(df, stage=str(tmp_path / "staged2"), **kw)
    plan_str = (staged.annotated._jdf.queryExecution()
                .executedPlan().toString())
    # branches scan the staging table (the test's only parquet source),
    # not the extraction/select map (plan Location strings are elided,
    # so match the node type rather than the path)
    assert "Scan parquet" in plan_str


def test_curate_from_warc_archive(spark, webpages, tmp_path):
    """Archive-to-corpus path: cc_style WARC write -> read -> curate.
    The generator plants ~18% recrawls (same url+content, new capture),
    so exact dedup must fire; all counts reconcile."""
    from streaming_algorithms_spark.sources.warc import write_warc

    # deterministic ~10% slice keyed on url ONLY, so every capture of a
    # kept url (the generator's ~18% recrawls) stays in the slice and
    # exact dedup has guaranteed work
    src = webpages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0).cache()
    n = src.count()
    path = str(tmp_path / "warc")
    write_warc(src.repartition(4), path, cc_style=True)
    plan = curate_from_warc(spark, path)
    funnel = {r["stage"]: r["docs"] for r in plan.funnel().collect()}
    assert sum(funnel.values()) == n
    assert funnel.get("exact_duplicate", 0) > 0  # planted recrawls caught
    kept = plan.kept
    texts = [r["text"] for r in kept.select("text").collect()]
    assert len(set(texts)) == len(texts)
    assert funnel.get("kept", 0) == len(texts) > 0
    # extraction really ran: kept docs decode to non-empty text
    assert all(t for t in texts)
    src.unpersist()


def test_discovery_seam_list_units_double(spark, tmp_path, monkeypatch):
    """Discovery routes through the seam's SECOND function
    (commit.list_units): both stores' unit enumeration must call it (an
    object-store deployment swaps it for LIST-prefix), an
    eventually-consistent double that surfaces phantom/uncommitted
    entries changes nothing a reader treats as live (committedness is
    per-unit markers, not listing), and one that HIDES a committed unit
    hides it everywhere consistently."""
    import numpy as np
    from pyspark.sql import functions as F

    from streaming_algorithms_spark import commit as commit_mod
    from streaming_algorithms_spark.ivf_index import IvfIndex
    from streaming_algorithms_spark.sketch_table import SketchTable

    def factory():
        from streaming_algorithms_spark.sketches.hll import HyperLogLog
        return HyperLogLog(12)

    def update(sk, pdf):
        sk.add_hashes(pdf["_h"].to_numpy(np.int64).view(np.uint64))

    b = (spark.range(0, 200)
         .select(F.concat(F.lit("lang"), (F.col("id") % 3)).alias("lang"),
                 F.xxhash64("id").alias("_h")).repartition(2))
    t = SketchTable(spark, str(tmp_path / "tbl"), ["lang"])
    t.append(b, "day-0", factory, update)

    vecs = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.xxhash64("id", F.lit(i)) % 100).cast("double")
                  for i in range(4)]).alias("vec"))
    idx = IvfIndex(spark, str(tmp_path / "ivf"), "vec_id", "vec")
    idx.append(vecs, "day-0", n_lists=2)

    # 1) both stores actually enumerate through the seam
    calls = []
    real = commit_mod.list_units

    def recorder(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(commit_mod, "list_units", recorder)
    assert t.committed_batches() == ["day-0"]
    assert idx.committed_batches() == ["day-0"]
    idx.latest_quantizer()
    assert str(tmp_path / "tbl") in calls and str(tmp_path / "ivf") in calls

    # 2) phantom entries from an eventually-consistent listing are inert:
    # markers, not the listing, decide committedness
    def phantoms(path):
        return real(path) + ["batch-ghost", "compact-000099",
                             "quantizer-7", ".trash"]

    monkeypatch.setattr(commit_mod, "list_units", phantoms)
    assert t.committed_batches() == ["day-0"]
    assert t.live_units() == ["batch-day-0"]
    assert idx.committed_batches() == ["day-0"]
    assert idx.latest_quantizer()[0] == 0

    # 3) a listing that hides units hides them consistently (the reader
    # sees a coherent older state, never a half-visible one)
    monkeypatch.setattr(commit_mod, "list_units", lambda path: [])
    assert t.committed_batches() == []
    assert t.live_units() == []
    assert idx.committed_batches() == []


def _sem_rows():
    """Planted semantic-dedup corpus: every stage's interaction with the
    embedding pass pinned by one case.  Texts reuse the _planted_rows
    filler shape (lang=en, quality comfortably above the floor); vocab
    is unique per doc except the planted near-dup pair."""
    def filler(tag, n=30):
        toks = [f"{tag}tok{i}" for i in range(n)]
        return ("the " + " ".join(toks[:10]) + " and of is "
                + " ".join(toks[10:]) + " the and")

    def axis(i, dim=8):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    near_axis = axis(7)
    near_axis_jig = [0.001] + near_axis[1:]
    sem_a = axis(0)
    sem_b = [0.9999, 0.0141] + [0.0] * 6  # cosine ~0.9999 to sem_a
    rows = []
    # exact text pair (same embedding): loser is exact_duplicate, the
    # embedding stage never sees it
    ex = filler("exact")
    rows.append(("https://ex.com/e0", _TS, ex, axis(6)))
    rows.append(("https://ex.com/e1", _TS, ex, axis(6)))
    # text near-dup pair whose embeddings are ALSO near-identical: the
    # loser drops as near_duplicate (verdict order), the survivor is its
    # semantic cluster's only alive member -> kept
    base = [f"near{i}" for i in range(60)]
    rows.append(("https://ex.com/n1", _TS,
                 "the " + " ".join(base) + " and of is one", near_axis))
    rows.append(("https://ex.com/n2", _TS,
                 "the " + " ".join(base) + " and of is two", near_axis_jig))
    # the planted SEMANTIC pair: lexically disjoint (no minhash pair),
    # embeddings at cosine ~0.9999 -> one drops as semantic_duplicate
    rows.append(("https://ex.com/s1", _TS, filler("semA"), sem_a))
    rows.append(("https://ex.com/s2", _TS, filler("semB"), sem_b))
    # orthogonal-embedding controls: kept
    for i in range(3):
        rows.append((f"https://ex.com/k{i}", _TS, filler(f"ctl{i}"),
                     axis(i + 2)))
    # NULL embedding: exempt from the semantic stage, kept
    rows.append(("https://ex.com/nul", _TS, filler("nullemb"), None))
    return rows


@pytest.fixture(scope="module")
def semantic_plan(spark):
    df = spark.createDataFrame(
        _sem_rows(),
        "url string, warc_ts timestamp, text string, emb array<double>")
    return curate(df, text_col="text", embedding_col="emb",
                  near_threshold=0.8, semantic_threshold=0.95,
                  seq_len=64, splits={"train": 1.0})


def test_semantic_funnel_counts_exact(semantic_plan):
    funnel = {r["stage"]: r["docs"]
              for r in semantic_plan.funnel().collect()}
    assert funnel == {"exact_duplicate": 1, "near_duplicate": 1,
                      "semantic_duplicate": 1, "kept": 7}


def test_semantic_pair_election_and_cluster(semantic_plan):
    ann = semantic_plan.annotated
    pair = ann.filter(F.col("url").rlike("/s[12]$")).collect()
    dropped = [r for r in pair if r["drop_reason"] == "semantic_duplicate"]
    survived = [r for r in pair if r["drop_reason"] is None]
    assert len(dropped) == 1 and len(survived) == 1
    # both members carry the same semantic-cluster label
    assert dropped[0]["sem_component"] == survived[0]["sem_component"]
    assert survived[0]["sem_component"] is not None
    # quality-aware election: survivor is the (quality desc, id asc) max
    assert ((survived[0]["quality"], -survived[0]["doc_id"])
            >= (dropped[0]["quality"], -dropped[0]["doc_id"]))
    # exempt + control docs untouched by the semantic stage
    nul = ann.filter(F.col("url") == "https://ex.com/nul").collect()[0]
    assert nul["drop_reason"] is None and nul["sem_component"] is None
    ctl = ann.filter(F.col("url").rlike("/k[0-9]$")).collect()
    assert all(r["drop_reason"] is None for r in ctl)
    # verdict ORDER: the text near-dup loser stays near_duplicate even
    # though its embedding also matches its twin; the twin is kept
    near = {r["url"]: r["drop_reason"]
            for r in ann.filter(F.col("url").rlike("/n[12]$")).collect()}
    assert sorted(near.values(), key=str) == ["near_duplicate", "None"] or \
        sorted(v for v in near.values() if v) == ["near_duplicate"]
    assert list(near.values()).count(None) == 1


def test_semantic_stage_through_extraction_passthrough(spark):
    """The html-extraction path carries the embedding column through the
    Arrow map (passthrough), and the semantic verdict still lands."""
    def page(tag):
        body = "the " + " ".join(f"{tag}w{i}" for i in range(40)) \
               + " and of is the and"
        return f"<html><body><p>{body}</p></body></html>".encode()

    rows = [
        ("https://x.com/a", _TS, page("aa"), [1.0, 0.0, 0.0, 0.0]),
        ("https://x.com/b", _TS, page("bb"), [0.9999, 0.0141, 0.0, 0.0]),
        ("https://x.com/c", _TS, page("cc"), [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "emb array<double>")
    plan = curate(df, embedding_col="emb", splits={"train": 1.0})
    ann = plan.annotated.collect()
    reasons = sorted(str(r["drop_reason"]) for r in ann)
    assert reasons == ["None", "None", "semantic_duplicate"]
    sem = [r for r in ann if r["drop_reason"] == "semantic_duplicate"][0]
    assert sem["url"] in ("https://x.com/a", "https://x.com/b")
    assert all(r["text"] for r in ann)  # extraction really ran


def test_semantic_decontamination_drops_embedding_match(spark):
    """Both decontamination stages, one run: a doc quoted verbatim by an
    eval item drops as 'contaminated' (fingerprints), a doc whose
    EMBEDDING matches an eval embedding — lexically unrelated — drops as
    'contaminated_semantic', NULL embeddings on either side are exempt,
    and controls keep.  Counts are exact, not statistical."""
    def filler(tag, n=30):
        toks = [f"{tag}tok{i}" for i in range(n)]
        return ("the " + " ".join(toks[:10]) + " and of is "
                + " ".join(toks[10:]) + " the and")

    def axis(i, dim=8):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [
        # quoted verbatim by the eval set -> contaminated (fingerprints)
        ("https://ex.com/quoted", _TS, filler("quoted", 40), axis(0)),
        # embedding ~equals an eval embedding, text unrelated ->
        # contaminated_semantic
        ("https://ex.com/sem", _TS, filler("semonly"), axis(1)),
        # NULL corpus embedding: fingerprint stage still applies, the
        # semantic stage is blind to it -> kept
        ("https://ex.com/nul", _TS, filler("nullside"), None),
        # controls: orthogonal embeddings, unique vocab -> kept
        ("https://ex.com/k0", _TS, filler("ctl0"), axis(4)),
        ("https://ex.com/k1", _TS, filler("ctl1"), axis(5)),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, "
              "emb array<double>")
    eval_df = spark.createDataFrame(
        [(rows[0][2], None),                       # verbatim quote, no emb
         ("what is the capital of examplestan",    # semantic hit on /sem
          [0.0141, 0.9999] + [0.0] * 6),
         ("unrelated question", axis(7))],         # matches nothing
        "text string, emb array<double>")
    plan = curate(df, text_col="text", near_threshold=0.8, seq_len=64,
                  splits={"train": 1.0},
                  decontaminate_against=eval_df,
                  decontaminate_embedding_col="emb",
                  embedding_col="emb")
    ann = {r["url"]: r["drop_reason"] for r in plan.annotated.collect()}
    assert ann["https://ex.com/quoted"] == "contaminated"
    assert ann["https://ex.com/sem"] == "contaminated_semantic"
    assert ann["https://ex.com/nul"] is None
    assert ann["https://ex.com/k0"] is None and ann["https://ex.com/k1"] is None
    funnel = {r["stage"]: r["docs"] for r in plan.funnel().collect()}
    assert funnel == {"contaminated": 1, "contaminated_semantic": 1,
                      "kept": 3}


def test_semantic_decontamination_param_validation(spark):
    df = spark.createDataFrame(
        [("https://x.com/a", _TS, "the a and of is", [1.0, 0.0])],
        "url string, warc_ts timestamp, text string, emb array<double>")
    ev = spark.createDataFrame([("q", [1.0, 0.0])],
                               "text string, emb array<double>")
    with pytest.raises(ValueError, match="requires decontaminate_against"):
        curate(df, text_col="text", embedding_col="emb",
               decontaminate_embedding_col="emb")
    with pytest.raises(ValueError, match="embedding_col on the"):
        curate(df, text_col="text", decontaminate_against=ev,
               decontaminate_embedding_col="emb")
    with pytest.raises(ValueError, match="not a column of"):
        curate(df, text_col="text", embedding_col="emb",
               decontaminate_against=ev,
               decontaminate_embedding_col="nope")


def test_semantic_stages_noop_when_all_embeddings_null(spark):
    """A batch where NO doc carries an embedding must flow through both
    semantic stages (dedup + decontamination) as a no-op — zero
    candidates, not a crash — and the text stages still apply."""
    def filler(tag, n=30):
        toks = [f"{tag}tok{i}" for i in range(n)]
        return ("the " + " ".join(toks[:10]) + " and of is "
                + " ".join(toks[10:]) + " the and")

    ex = filler("exact")
    rows = [
        ("https://ex.com/e0", _TS, ex, None),
        ("https://ex.com/e1", _TS, ex, None),     # exact dup still drops
        ("https://ex.com/k0", _TS, filler("ctl0"), None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, "
              "emb array<double>")
    ev = spark.createDataFrame(
        [("benchmark question", [1.0, 0.0])],
        "text string, emb array<double>")
    plan = curate(df, text_col="text", embedding_col="emb", seq_len=64,
                  splits={"train": 1.0}, decontaminate_against=ev,
                  decontaminate_embedding_col="emb")
    funnel = {r["stage"]: r["docs"] for r in plan.funnel().collect()}
    assert funnel == {"exact_duplicate": 1, "kept": 2}
