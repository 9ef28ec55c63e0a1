"""HTML -> text extraction: the input-table invariant operator.

The north-rule input table carries ``(url, warc_ts, html:binary,
text:string, lang)`` with the per-row invariant *"extracted text per url
stays byte-identical to the reference pipeline"* (BASELINE.json
``input_hint``).  The reference repo (trink/streaming_algorithms) is a
sketch library and publishes no extractor, so the contract here is a
DETERMINISTIC rule-based extraction spec, applied identically everywhere:

1. strip ``<script>``/``<style>`` elements and HTML comments anywhere;
2. scope to the ``<main>`` element (fall back to ``<body>``, then the
   whole document) — nav/footer/head boilerplate never reaches the text;
3. closing block tags (``p div li h1-h6 tr``) and ``<br>`` become a
   single space, all remaining tags are dropped;
4. character references are decoded in ONE left-to-right pass: numeric
   (``&#101;`` / ``&#x65;``) and the core named set (``&amp; &lt; &gt;
   &quot; &apos; &nbsp;``); produced text is never rescanned, so
   double-escapes (``&amp;lt;``) decode to the literal entity;
5. whitespace is collapsed to single spaces and trimmed.

``render_page`` is the exact inverse for whitespace-canonical text
(single-spaced tokens, no leading/trailing space — the webpages/documents
corpora): rendering a page and extracting it back is byte-identical.
That roundtrip is the driver-gated invariant (q_html_extract_documents:
Spark renders then extracts, the DuckDB oracle reads ``text`` directly,
and per-row md5 equality proves byte identity end-to-end).

Scale shape: both operators are ``mapInPandas`` stages over ``(id,
payload)`` projections — the html/text columns stay columnar Arrow
batches, the regex pipeline is pandas ``.str`` (one compiled pattern per
pass over the whole batch, no per-row Python loop), and nothing shuffles:
extraction is embarrassingly parallel over input splits.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

_PARA_TOKENS = 40  # tokens per rendered <p>

# decoy content that must NEVER survive extraction (tests grep for it)
_BOILER_NAV = '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
_BOILER_COMMENT = "<!-- boilerplate chrome: not content -->"
_BOILER_SCRIPT = '<script type="text/javascript">var chrome = "not content";</script>'
_BOILER_STYLE = "<style>body { margin: 0; font: 16px serif; }</style>"
_BOILER_FOOTER = "<footer>&copy; 2025 example.com &middot; terms</footer>"


def _escape(tok: str) -> str:
    return tok.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_page(text: str, title: str = "") -> bytes:
    """Deterministic page renderer — the generator half of the roundtrip.

    Tokens (single-space-split) are grouped into ``_PARA_TOKENS``-token
    ``<p>`` blocks inside ``<main>``; ``& < >`` are entity-escaped and the
    first character of every paragraph is emitted as a NUMERIC reference
    (``&#NN;``) so extraction provably exercises both decode paths.  All
    chrome (head/style/script/nav/comment/footer) is outside ``<main>``.
    """
    toks = text.split(" ") if text else []
    paras = []
    for i in range(0, len(toks), _PARA_TOKENS):
        raw = " ".join(toks[i:i + _PARA_TOKENS])
        # first ORIGINAL char as a numeric reference (covers specials too:
        # '<' renders as &#60;), remainder entity-escaped — one decode pass
        # reconstructs raw exactly
        body = f"&#{ord(raw[0])};{_escape(raw[1:])}" if raw else ""
        paras.append(f'<p class="c{(i // _PARA_TOKENS) % 3}">{body}</p>')
    return (
        "<!DOCTYPE html>\n"
        f'<html lang="en"><head><meta charset="utf-8"/>'
        f"<title>{_escape(title)}</title>{_BOILER_STYLE}{_BOILER_SCRIPT}"
        f"</head><body>{_BOILER_NAV}{_BOILER_COMMENT}"
        f"<main>{''.join(paras)}</main>"
        f"{_BOILER_FOOTER}</body></html>"
    ).encode("utf-8")


_RE_DROP = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.S | re.I,
)
_RE_MAIN = re.compile(r"<main[^>]*>(.*?)</main\s*>", re.S | re.I)
_RE_BODY = re.compile(r"<body[^>]*>(.*?)</body\s*>", re.S | re.I)
_RE_BLOCK_END = re.compile(r"</(?:p|div|li|h[1-6]|tr)\s*>|<br\s*/?\s*>", re.I)
_RE_TAG = re.compile(r"<[^>]*>")
# ONE pass for all character references (numeric hex/dec + core named set):
# re.sub never rescans produced text, so "&amp;lt;" decodes to the literal
# "&lt;" — sequential per-entity replaces would double-decode it.
_RE_ENT = re.compile(r"&(?:#(?:x([0-9a-fA-F]{1,6})|([0-9]{1,7}))|([a-zA-Z]+));")
_RE_WS = re.compile(r"\s+")

_NAMED = {"lt": "<", "gt": ">", "quot": '"', "apos": "'",
          "nbsp": " ", "middot": "·", "copy": "©", "amp": "&"}


def _decode_entity(m: re.Match) -> str:
    if m.group(3) is not None:
        return _NAMED.get(m.group(3), m.group(0))  # unknown names pass through
    cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    return chr(cp) if 0 < cp < 0x110000 else ""


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of html bytes/str.

    Each step is ONE compiled-regex pass over the whole batch via
    pandas ``.str`` — no per-row Python function calls in the loop.
    """
    s = html.map(lambda b: b.decode("utf-8", "replace")
                 if isinstance(b, (bytes, bytearray)) else ("" if b is None else b))
    s = s.str.replace(_RE_DROP, "", regex=True)
    main = s.str.extract(_RE_MAIN, expand=False)
    body = s.str.extract(_RE_BODY, expand=False)
    s = main.fillna(body).fillna(s)
    s = s.str.replace(_RE_BLOCK_END, " ", regex=True)
    s = s.str.replace(_RE_TAG, "", regex=True)
    s = s.str.replace(_RE_ENT, _decode_entity, regex=True)
    return s.str.replace(_RE_WS, " ", regex=True).str.strip()


def render_html(df: DataFrame, id_col: str, text_col: str,
                title_col: str | None = None) -> DataFrame:
    """(id, html binary): render each row's text into a full page."""
    id_type = df.schema[id_col].dataType.simpleString()
    cols = [id_col, text_col] + ([title_col] if title_col else [])

    def gen(batches):
        for pdf in batches:
            titles = (pdf[title_col].astype(str)
                      if title_col else pd.Series([""] * len(pdf)))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "html": [render_page(t if isinstance(t, str) else "", ti)
                         for t, ti in zip(pdf[text_col], titles)],
            })

    return df.select(*cols).mapInPandas(gen, f"`{id_col}` {id_type}, html binary")


def html_to_text(df: DataFrame, id_col: str, html_col: str = "html") -> DataFrame:
    """(id, text string): the extraction operator.  Narrow projection in,
    no shuffle; at 100 TB this is a pure map over input splits with the
    html column read once and never crossing a shuffle boundary."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "text": extract_text_series(pdf[html_col]),
            })

    return df.select(id_col, html_col).mapInPandas(
        gen, f"`{id_col}` {id_type}, text string"
    )
