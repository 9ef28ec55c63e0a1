"""Column-level helpers — pure Catalyst expressions (JVM-side, codegen'd).

Everything here stays inside WholeStageCodegen: no Python UDFs.  These are
the "scalar function" layer the reference lacks entirely (SURVEY §2.7) and
the building blocks of the text-quality / language-ID operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deliberately SQL-expressible so DuckDB oracles can replicate.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "zh": ["de5", "le5", "shi4", "zai4"],
}


def tokens(col) -> Column:
    """Whitespace tokenization (split on runs of whitespace, trimmed)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


# GPT-2-style BPE PRE-tokenizer pattern (Radford et al. 2019, the published
# gpt2 regex), restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): the original's trailing
# whitespace-run/lookahead alternatives are dropped (RE2 has no
# lookarounds), so this counts the CONTENT pre-tokens — contractions,
# optionally space-prefixed letter runs, digit runs, and punctuation runs —
# which is the sequence a BPE vocabulary would then merge over.  Both
# engines use leftmost-first alternation.  The whitespace class is spelled
# EXPLICITLY ([ \t\n\x0B\f\r]) because the engines' \s differ: Java
# includes vertical tab \x0B, RE2 does not — with \s a VT-bearing document
# would count one extra punctuation run on the DuckDB side.  Oracle SQL
# and tests interpolate THIS constant, so the three copies can't drift.
BPE_SPLIT_PAT = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                 r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+")


def bpe_token_count(col) -> Column:
    """Number of BPE pre-tokens (GPT-2 pre-tokenizer regex) — the
    token-budget estimator for pretraining pipelines, where whitespace
    token counts undercount what a subword tokenizer will emit
    (punctuation and contractions split off).  One codegen'd regexp_count
    pass; SQL-re-derivable (regexp_extract_all in DuckDB)."""
    return F.regexp_count(col, F.lit(BPE_SPLIT_PAT))


def char_count(col) -> Column:
    return F.length(col)


def avg_token_len(col) -> Column:
    # sum of token lengths == length of the text with ALL whitespace removed
    # (tokens are exactly the non-whitespace runs; the trim-split ['']
    # degenerate contributes 0 either way) — one codegen'd regexp_replace
    # instead of a per-token aggregate lambda, which evaluates INTERPRETED
    # per element (measured ~9x slower on the repetition n-gram path)
    return (F.length(F.regexp_replace(col, r"\s+", "")).cast("double")
            / F.size(tokens(col)))


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(col), F.lit(1))


def stopword_count(col, lang: str) -> Column:
    """Number of token OCCURRENCES equal to a stopword — one codegen'd
    regexp_extract_all pass.  The pattern anchors each alternative to the
    surrounding whitespace ((?<=\\s)|^ before, (?=\\s|$) after), which is
    exactly the run-between-whitespace token contract, so the count equals
    filter(tokens, isin(words)) — without the interpreted per-token lambda
    that made lang_id 5 filter passes per row."""
    import re

    words = STOPWORDS[lang]
    # re.escape: a future stopword containing a regex metachar ('e.g.')
    # must match literally, not silently corrupt the alternation
    pat = (r"(?:(?<=\s)|^)(?:" + "|".join(re.escape(w) for w in words)
           + r")(?=\s|$)")
    # regexp_count: no match-array materialization (size(regexp_extract_all)
    # allocates every matched string just to count them)
    return F.regexp_count(col, F.lit(pat))


def stopword_ratio(col, lang: str = "en") -> Column:
    return stopword_count(col, lang).cast("double") / F.greatest(token_count(col), F.lit(1))


def lang_id(col) -> Column:
    """Stopword-vote language ID: argmax over per-language stopword counts,
    ties broken by language code order, zero hits -> 'und'.  Deterministic
    and SQL-expressible (oracle in __spark_entry__.oracle_sql).

    Shape: one array of the 5 counts + array_position(array_max) — each
    count expression evaluated ONCE.  (The previous chained-when argmax
    re-embedded every earlier count inside each comparison — exponential
    expression duplication Catalyst did not eliminate; measured 2.2 s vs
    5 x 0.15 s for the individual counts at sf0.1.)  array_position
    returns the FIRST max, which is exactly the earlier-code tie-break."""
    langs = sorted(STOPWORDS)
    cnts = F.array(*[stopword_count(col, lg) for lg in langs])
    mx = F.array_max(cnts)
    best = F.element_at(
        F.array(*[F.lit(lg) for lg in langs]),
        F.array_position(cnts, mx).cast("int"),
    )
    return F.when(mx > 0, best).otherwise(F.lit("und"))


def quality_score(col) -> Column:
    """Composite text-quality heuristic in [0,1]: rewards moderate length,
    low punctuation, presence of stopwords — the usual pretraining-data
    filters, all JVM-side."""
    n_tok = token_count(col)
    len_ok = (
        F.when(n_tok < 5, F.lit(0.0))
        .when(n_tok > 5000, F.lit(0.2))
        .otherwise(F.lit(1.0))
    )
    punct_ok = F.when(punct_ratio(col) > 0.3, F.lit(0.0)).otherwise(F.lit(1.0))
    stop_ok = F.least(stopword_ratio(col) * F.lit(10.0), F.lit(1.0))
    return (len_ok * 0.4 + punct_ok * 0.3 + stop_ok * 0.3).cast("double")


def cosine_similarity(a, b) -> Column:
    """Cosine of two array<float/double> columns via zip_with/aggregate —
    stays JVM-side (no Python) for the brute-force ANN baseline."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def url_host(col) -> Column:
    """Host component of a url column — the north-rule skew key (Zipfian
    hosts).  Pure Catalyst (`parse_url`, codegen'd); NULL for malformed
    urls.  Typical use: ``hll_distinct(df, [url_host("url")...])`` or a
    salted host rollup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("HOST"))


def url_path(col) -> Column:
    """Path component of a url column (pure Catalyst)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("PATH"))


def canonical_url(col) -> Column:
    """Canonical form of a url — the standard exact-dedup key for web
    corpora.  Pure Catalyst (regex + higher-order filter, codegen'd), and
    every rule is re-derivable verbatim in ANSI-ish SQL (the
    url_canon_documents oracle re-implements it in DuckDB):

    1. fragment dropped;
    2. scheme and host lowercased;
    3. default ports stripped (http:80, https:443), others kept;
    4. duplicate slashes in the path collapsed, trailing slash dropped
       (root stays "/"; empty path becomes "/");
    5. tracking params removed (utm_*, gclid, fbclid), remaining params
       kept in original order; "?" dropped when nothing survives.

    Inputs without a scheme (relative paths, protocol-relative ``//host``
    forms) return NULL — the same contract as ``url_host``; a canonical
    key only exists for absolute urls.
    """
    c = F.col(col) if isinstance(col, str) else col
    s1 = F.regexp_replace(c, "#.*$", "")
    scheme = F.lower(F.regexp_extract(s1, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(s1, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    pathquery = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathquery, r"^([^?]*)", 1)
    query = F.regexp_extract(pathquery, r"\?(.*)$", 1)
    path_c = F.regexp_replace(path, "/{2,}", "/")
    path_c = F.regexp_replace(path_c, "/+$", "")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(r"^(?i)(utm_[^=]*|gclid|fbclid)="),
    )
    qjoin = F.array_join(params, "&")
    # no scheme => not an absolute url => NULL (same contract as url_host):
    # emitting a '://'-prefixed string would collapse distinct path-like
    # inputs into one dedup key and skip host lowercasing for
    # protocol-relative urls
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme, F.lit("://"), host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path_c,
            F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(F.lit("")),
        )
    )


# PII patterns (emails, NANP-style phones, IPv4) — kept to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, \b word boundaries.  No lookarounds (RE2
# has none).
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_count(col) -> Column:
    """Number of PII matches (emails + phones + IPv4) in a text column —
    pure Catalyst, codegen'd; the filter/quality signal for corpus
    curation."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0)))
    # redact emails before counting phones/IPs: an IP-like or phone-like
    # substring inside an email (user.555-123-4567@x.com) counts once
    no_email = F.regexp_replace(c, PII_EMAIL, "[EMAIL]")
    n = n + F.size(F.regexp_extract_all(no_email, F.lit(PII_PHONE), F.lit(0)))
    no_phone = F.regexp_replace(no_email, PII_PHONE, "[PHONE]")
    return n + F.size(F.regexp_extract_all(no_phone, F.lit(PII_IPV4), F.lit(0)))


def redact_pii(col) -> Column:
    """Replace emails/phones/IPv4 with typed placeholders, in that order
    (emails first so their local parts can't be re-matched as phones)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IPV4, "[IP]")
