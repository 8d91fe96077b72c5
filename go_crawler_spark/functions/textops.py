"""Text & link extraction — the byte-identical contract with the reference.

The reference extracts text with bluemonday ``StrictPolicy()`` (strip every
tag, skip the content of script/style/title/... elements), collapses runs of
ASCII whitespace to a single space, HTML-unescapes, and trims
(reference: crawler/text_extractor.go:34-50).  Links come from plain regexes
over the raw HTML — NOT an HTML parser — with Go ``url.ResolveReference``
resolution (reference: crawler/link_extractor.go:12-14,31-77).

This module reproduces those semantics in pure Python (golden-tested against
the reference's own test strings: crawler/text_extractor_test.go:13-31,
crawler/link_extractor_test.go:20-210, crawler/crawler_integration_test.go:
23-41) and exposes them as **vectorized pandas UDFs** — the Arrow batch is
the only JVM<->Python boundary; there is no row-at-a-time Python UDF.

Exact-faithfulness notes
------------------------
* Go's regexp ``\\s`` is ASCII-only ``[\\t\\n\\f\\r ]`` and ``.`` does not
  match newlines; the Python regexes below mirror both.
* bluemonday escapes text on output and the reference unescapes afterwards;
  we replicate the full escape -> collapse -> unescape -> trim chain so even
  double-encoded entities (``&amp;#10;``) come out byte-identical.
* bluemonday's default skip-content set (frame frameset iframe noembed
  noframes noscript nostyle object script style **title**) means the page
  title never appears in the extracted text; the title is pulled separately
  by regex from the raw HTML.
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

from go_crawler_spark.functions.urlops import extract_links

# Go regexp `\s` == [\t\n\f\r ] (ASCII only; no \v, no unicode spaces).
_GO_WS_RUN = re.compile(r"[\t\n\f\r ]+")
# Reference: crawler/text_extractor.go:15 — `.` must not cross newlines.
_TITLE_RE = re.compile(r"<title.*?>(.*?)</title>", re.IGNORECASE)

# bluemonday NewPolicy()'s default skip-content element set.
_SKIP_CONTENT = frozenset(
    {
        "frame",
        "frameset",
        "iframe",
        "noembed",
        "noframes",
        "noscript",
        "nostyle",
        "object",
        "script",
        "style",
        "title",
    }
)


class _StrictTextCollector(HTMLParser):
    """Strip all tags, keep text, skip content of _SKIP_CONTENT elements.

    Mirrors bluemonday's sanitize loop: a single shared skip counter is
    incremented on any skip-set start tag and decremented on any skip-set
    end tag (content is emitted only while the counter is zero).
    """

    # Make title/iframe/... raw-text like the Go tokenizer so stray markup
    # inside them cannot terminate skipping early.
    CDATA_CONTENT_ELEMENTS = ("script", "style")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        # Self-closing tags never open a skip scope (no content).
        pass

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def _strip_tags_ref(content: str) -> str:
    """Reference implementation (html.parser state machine) — kept as the
    differential-test oracle for the fast scanner below."""
    p = _StrictTextCollector()
    try:
        p.feed(content)
        p.close()
    except Exception:
        pass
    return "".join(p.parts)


# One compiled scan over the document instead of html.parser's per-char
# state machine (~4x less CPU and far fewer small allocations — the
# allocation rate is what throttles multi-core scaling of the extract
# stage).  Alternatives mirror html.parser's tokenization: comments,
# marked sections, declarations/PIs, end tags, start tags (quoted attrs
# may contain '>'), bogus end tags.
_SCAN_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:-->|$)"
    r"|!\[[^>]*(?:\]>|$)"
    r"|![^>]*>?"
    r"|\?[^>]*>?"
    # end tags tolerate attr-like junk before '>' (html.parser accepts
    # '</div class="x">' as an end tag; requiring \s*> leaked raw markup
    # into the text and broke skip-scope closing)
    r"|(?P<closing>/)\s*(?P<ctag>[a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>"
    r"|(?P<tag>[a-zA-Z][-.a-zA-Z0-9:_]*)"
    # attrs LAZY so a trailing '/' is left for the selfclose group —
    # greedy attrs swallowed it, misreading '<object/>' as an OPENING
    # skip tag and silently dropping the rest of the document
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)(?P<selfclose>/?)>"
    r"|/[^a-zA-Z][^>]*>?"
    r")",
    re.DOTALL,
)
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}", re.IGNORECASE) for t in ("script", "style")
}


def _strip_tags(content: str) -> str:
    """bluemonday StrictPolicy().Sanitize minus the output escaping.

    Returns the concatenated text with entities decoded once (the Go
    tokenizer decodes text tokens; bluemonday re-escapes; we fold the
    re-escape into :func:`_finalize`).  Fast single-regex scan;
    equivalence with the html.parser path is locked by
    tests/test_textops_golden.py's differential test.
    """
    parts: list[str] = []
    skip_depth = 0
    pos = 0
    n = len(content)
    unescape = _html.unescape
    while pos < n:
        m = _SCAN_RE.search(content, pos)
        if m is None:
            if skip_depth == 0 and pos < n:
                tail = content[pos:]
                parts.append(unescape(tail) if "&" in tail else tail)
            break
        start = m.start()
        if skip_depth == 0 and start > pos:
            data = content[pos:start]
            parts.append(unescape(data) if "&" in data else data)
        pos = m.end()
        tag = m.group("tag")
        if tag is not None:
            tag = tag.lower()
            if m.group("selfclose") != "/":
                if tag in _SKIP_CONTENT:
                    skip_depth += 1
                cd = _CDATA_CLOSE.get(tag)
                if cd is not None:
                    # raw-text element: content never tokenizes
                    mc = cd.search(content, pos)
                    if mc is None:
                        break  # unterminated script/style swallows the rest
                    gt = content.find(">", mc.end())
                    pos = n if gt < 0 else gt + 1
                    if skip_depth > 0:
                        skip_depth -= 1
        else:
            ctag = m.group("ctag")
            if ctag is not None and ctag.lower() in _SKIP_CONTENT and skip_depth > 0:
                skip_depth -= 1
    return "".join(parts)


def _finalize(text: str) -> str:
    """escape -> collapse ASCII whitespace -> unescape -> trim.

    Identical order to text_extractor.go:38-45 so entities that decode to
    whitespace survive the collapse exactly like in Go.
    """
    text = _html.escape(text, quote=True)
    text = _GO_WS_RUN.sub(" ", text)
    text = _html.unescape(text)
    return text.strip()


def extract_text(content: str) -> str:
    """Byte-identical analogue of textExtractor.Process for the body text."""
    return _finalize(_strip_tags(content))


def extract_title(content: str) -> str:
    """First `<title.*?>(.*?)</title>` match, sanitized; '' if absent."""
    m = _TITLE_RE.search(content)
    if not m:
        return ""
    return _finalize(_strip_tags(m.group(1)))


# ---------------------------------------------------------------------------
# Vectorized Spark surface
# ---------------------------------------------------------------------------

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("nofollow", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)


def _decode(raw) -> str:  # noqa: ANN001
    if raw is None:
        return ""
    if isinstance(raw, (bytes, bytearray)):
        return bytes(raw).decode("utf-8", errors="replace")
    return str(raw)


@F.pandas_udf(EXTRACTED_SCHEMA)
def udf_extract_page(url: pd.Series, html_raw: pd.Series) -> pd.DataFrame:
    """One Arrow round-trip per batch: html -> (title, text, links).

    Parsing happens once per page; link resolution reuses the raw content
    so the fetch->extract stage is a single Python hop.
    """
    titles: list[str] = []
    texts: list[str] = []
    links_out: list[list[dict]] = []
    for u, raw in zip(url, html_raw):
        content = _decode(raw)
        titles.append(extract_title(content))
        texts.append(extract_text(content))
        follow, nofollow = extract_links(u or "", content)
        links_out.append(
            [{"url": l, "nofollow": False} for l in follow]
            + [{"url": l, "nofollow": True} for l in nofollow]
        )
    return pd.DataFrame({"title": titles, "text": texts, "links": links_out})


@F.pandas_udf(T.StringType())
def udf_extract_text(html_raw: pd.Series) -> pd.Series:
    return html_raw.map(lambda raw: extract_text(_decode(raw)))


@F.pandas_udf(T.StringType())
def udf_extract_title(html_raw: pd.Series) -> pd.Series:
    return html_raw.map(lambda raw: extract_title(_decode(raw)))
