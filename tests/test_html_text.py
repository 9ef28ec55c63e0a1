"""html -> text extraction: the input_hint per-row invariant
("extracted text per url stays byte-identical") plus extractor robustness."""

import os
import random
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_algorithms_spark.operators.html_text import (
    extract_text_series,
    render_page,
)


def test_roundtrip_adversarial_tokens():
    """Entity-looking tokens, tag-looking tokens, specials — all survive
    render -> extract byte-identically (one-pass entity decode is the
    load-bearing property: sequential replaces would double-decode)."""
    rng = random.Random(7)
    toks = ["key", "agg", "a", "x&y", "<p>", "&lt;", "&amp;", "w>",
            "&#38;", "tok&#x41;", "&bogus;", "plain", "<script>", "</main>"]
    cases = [""] + [
        " ".join(rng.choice(toks) for _ in range(rng.randint(1, 150)))
        for _ in range(300)
    ]
    out = extract_text_series(
        pd.Series([render_page(c, title=f"t{i}") for i, c in enumerate(cases)])
    )
    assert [o for o in out] == cases


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # whitespace-canonical text: single-space-joined non-space chunks drawn
    # from printable unicode (entities, tag fragments, specials included)
    _chunk = st.text(
        st.characters(blacklist_categories=("Zs", "Cc", "Cs", "Zl", "Zp")),
        min_size=1, max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_chunk, min_size=0, max_size=90))
    def test_roundtrip_hypothesis(chunks):
        text = " ".join(chunks)
        out = extract_text_series(pd.Series([render_page(text)])).iloc[0]
        assert out == text
except ImportError:  # pragma: no cover
    pass


def test_boilerplate_never_leaks_and_numrefs_present():
    html = render_page("alpha beta " * 50, title="Home of chrome & terms")
    s = html.decode()
    assert "<script" in s and "<style" in s and "<!--" in s and "&#" in s
    out = extract_text_series(pd.Series([html])).iloc[0]
    assert out == ("alpha beta " * 50).strip()
    for decoy in ("Home", "chrome", "terms", "margin", "About"):
        assert decoy not in out


def test_extractor_fallbacks():
    cases = pd.Series([
        None,                                              # null payload
        b"",                                               # empty
        b"<html><body>no <b>main</b> block</body></html>", # body fallback
        b"bare text, no tags at all",                      # whole-doc fallback
        b"<body><p>x</p><p>y</p><br>z</body>",             # block joins
        "already-a-string <main>scoped</main>",            # str not bytes
    ])
    out = extract_text_series(cases).tolist()
    assert out == ["", "", "no main block", "bare text, no tags at all",
                   "x y z", "scoped"]


def test_webpages_invariant_byte_identical(spark, webpages):
    """The input_hint invariant verbatim, on the flagship table: extracting
    the html column reproduces the text column byte-for-byte on every row."""
    from pyspark.sql import functions as F

    from streaming_algorithms_spark.operators.html_text import html_to_text

    src = webpages.select(
        F.monotonically_increasing_id().alias("rid"), "html", "text"
    ).cache()
    extracted = html_to_text(src, "rid", "html").withColumnRenamed(
        "text", "extracted"
    )
    joined = src.select("rid", "text").join(extracted, "rid")
    n = joined.count()
    assert n == webpages.count()
    mismatches = joined.filter(
        F.col("text").cast("binary") != F.col("extracted").cast("binary")
    ).count()
    assert mismatches == 0
    src.unpersist()


def test_render_html_operator_schema(spark):
    from streaming_algorithms_spark.operators.html_text import (
        html_to_text,
        render_html,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x & y")], "doc_id long, text string"
    )
    pages = render_html(df, "doc_id", "text")
    assert [f.simpleString() for f in pages.schema.fields] == [
        "doc_id:bigint", "html:binary"
    ]
    back = html_to_text(pages, "doc_id").orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in back] == [
        (1, "hello world"), (2, ""), (3, "x & y")
    ]
