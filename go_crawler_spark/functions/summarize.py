"""Search-result match summarizer (X6) + highlighter (X7).

Faithful Python port of the reference's snippet machinery:
* sentence splitting with the 3-rune sliding-window breaker
  (service/frontend/summarizer.go:119-177) — including its quirk that the
  third position also accepts ``IsSymbol(seq[0])`` (a reference behavior,
  reproduced deliberately so goldens match byte-for-byte);
* per-sentence match ratio, greedy budget packing with rune-slice
  truncation but byte-length accounting (summarizer.go:70-92 mixes
  ``len(string)`` bytes with ``[]rune`` slicing — reproduced);
* document-order reassembly with ``..`` gap ellipses (summarizer.go:36-56);
* ``<em>`` term highlighting with case-insensitive quoted-literal regexes
  (highlighter.go:17-42).

Golden-tested against summarizer_test.go / highlighter_test.go.  Exposed
as a vectorized pandas UDF for summarizing search hits at scale.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T


def _is_lower(ch: str) -> bool:
    return unicodedata.category(ch) == "Ll"


def _is_upper(ch: str) -> bool:
    return unicodedata.category(ch) == "Lu"


def _is_symbol(ch: str) -> bool:
    return unicodedata.category(ch).startswith("S")


def _is_number(ch: str) -> bool:
    return unicodedata.category(ch).startswith("N")


def _is_punct(ch: str) -> bool:
    return unicodedata.category(ch).startswith("P")


def _is_space(ch: str) -> bool:
    return ch in " \t\n\v\f\r\x85\xa0" or unicodedata.category(ch) == "Zs"


def _break_at_middle(seq: str) -> bool:
    """summarizer.go:153-157 — note IsSymbol(seq[0]) in the third clause."""
    a, b, c = seq
    return (
        (_is_lower(a) or _is_symbol(a) or _is_number(a) or _is_space(a))
        and b in ".!?"
        and (_is_punct(c) or _is_space(c) or _is_symbol(a) or _is_number(c) or _is_upper(c))
    )


def scan_sentences(content: str) -> list[str]:
    """Split into sentences exactly like the reference's scanSentence.

    Offset-based scan (no per-sentence re-slicing of the remainder —
    that copied O(remaining) bytes per sentence, quadratic on long
    pages inside the summarize UDF hot path)."""
    out: list[str] = []
    n = len(content)
    start = 0
    while start < n:
        if n - start < 3:
            out.append(content[start:])
            break
        emitted = False
        for i in range(start, n - 2):
            if _break_at_middle(content[i : i + 3]):
                out.append(content[start : i + 2])
                start = i + 2
                emitted = True
                break
        if not emitted:
            out.append(content[start:])  # atEOF: remainder is the last token
            break
    return out


def _match_ratio(sentence: str, terms: list[str]) -> float:
    words = sentence.split()
    if not words:
        return 0.0
    folded = {t.casefold() for t in terms}
    matched = sum(1 for w in words if w.casefold() in folded)
    return matched / len(words)


def match_summary(content: str, search_terms: str, max_summary_len: int = 256) -> str:
    """The reference's MatchSummary (summarizer.go:36-115)."""
    terms = search_terms.strip('"').split()
    matches = []
    for ordinal, sentence in enumerate(scan_sentences(content)):
        ratio = _match_ratio(sentence, terms)
        if ratio > 0:
            matches.append({"ordinal": ordinal, "text": sentence, "ratio": ratio})

    matches.sort(key=lambda m: -m["ratio"])  # stable, desc

    snippets = []
    remaining = max_summary_len
    for m in matches:
        if remaining <= 0:
            break
        if len(m["text"].encode("utf-8")) > remaining:
            # Go slices runes by a byte budget — reproduce the mix.
            m = dict(m, text=m["text"][:remaining] + "...")
        remaining -= len(m["text"].encode("utf-8"))
        snippets.append(m)
    snippets.sort(key=lambda m: m["ordinal"])

    buf: list[str] = []
    last_ordinal = -1
    for s in snippets:
        if last_ordinal != -1 and s["ordinal"] - last_ordinal != 1:
            buf.append("..")
        last_ordinal = s["ordinal"]
        buf.append(s["text"])
        if not s["text"].endswith("."):
            buf.append(".")
    return "".join(buf).strip()


def highlight(sentence: str, search_terms: str) -> str:
    """Wrap case-insensitive term matches in <em> tags (X7).

    Byte-parity with the reference's matchHighlighter.Highlight
    (service/frontend/highlighter.go:35-41), QUIRKS INCLUDED: terms are
    substring matches (not standalone words, despite the Go comment) and
    each term re-substitutes over the previous term's output, so a later
    term matching inside an inserted ``<em>`` tag nests markup exactly
    like the reference does.  Do not "fix" without breaking parity.
    """
    for token in search_terms.strip('"').split():
        sentence = re.sub(
            re.escape(token),
            lambda m: f"<em>{m.group(0)}</em>",
            sentence,
            flags=re.IGNORECASE,
        )
    return sentence


def udf_match_summary(search_terms: str, max_summary_len: int = 256):
    @F.pandas_udf(T.StringType())
    def _summarize(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: match_summary(t or "", search_terms, max_summary_len)
        )

    return _summarize


def udf_highlight(search_terms: str):
    @F.pandas_udf(T.StringType())
    def _hl(text: pd.Series) -> pd.Series:
        return text.map(lambda t: highlight(t or "", search_terms))

    return _hl
