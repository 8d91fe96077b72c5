"""C4 line-level cleaning (Raffel et al. 2020, arXiv:1910.10683 §2.2).

The C4 corpus applies its famous rule list to raw Common Crawl text
BEFORE any dedup or model-based filtering:

* keep only lines ending in a terminal punctuation mark;
* keep only lines with >= 5 words;
* drop any line containing the word "javascript" (cookie/JS-warning
  boilerplate);
* drop the whole page if it contains "lorem ipsum" or a curly brace
  ``{`` (code), or if fewer than 3 sentences survive cleaning.

Everything here is ONE zero-shuffle projection per document: the line
split, per-line predicates, rejoin, and sentence count are pure Column
expressions (``split`` / ``filter`` / ``array_join``), embarrassingly
parallel at 100 TB, whole-stage-codegen friendly, no Python anywhere.
Lambda bodies reference only their own arguments (the repo-wide
expression-safety invariant — see textstats._repetition_aggs), so the
optimizer may inline the expression without going quadratic.

The paper's final rule — three-sentence-span dedup across pages — is
the separate shuffling op this package already ships as
``dedup.duplicate_spans`` / ``duplicate_spans_cut`` (Lee et al. 2022
generalizes it); compose them for the full C4 treatment.

No counterpart in the Go reference; beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

__all__ = [
    "c4_kept_lines_col",
    "c4_clean_text_col",
    "c4_sentence_count_col",
    "c4_page_drop_col",
    "c4_clean",
]

# terminal punctuation, optionally followed by a closing quote — the
# C4 rule ("ending in a terminal punctuation mark (i.e. a period,
# exclamation mark, question mark, or end quotation mark)")
_TERMINAL_RE = r'[.!?]["”\']?$'


def c4_kept_lines_col(text: Column, min_words_per_line: int = 5) -> Column:
    """Array of surviving lines: trimmed, terminal-punctuated,
    >= ``min_words_per_line`` words, no "javascript"."""
    lines = F.transform(F.split(text, r"\n"), lambda l: F.trim(l))
    return F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL_RE)
        & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
           >= F.lit(min_words_per_line))
        & ~F.lower(l).contains("javascript"),
    )


def c4_clean_text_col(text: Column, min_words_per_line: int = 5) -> Column:
    """The cleaned page: surviving lines rejoined with newlines."""
    return F.array_join(c4_kept_lines_col(text, min_words_per_line), "\n")


def c4_sentence_count_col(cleaned: Column) -> Column:
    """Sentence count of cleaned text — number of terminal-punctuation
    runs (the paper splits heuristically; a run like "?!" is one
    sentence end)."""
    only_terminals = F.regexp_replace(cleaned, r"[.!?]+", "\x01")
    return F.length(only_terminals) - F.length(
        F.regexp_replace(only_terminals, "\x01", "")
    )


def c4_page_drop_col(
    text: Column, cleaned: Column, min_sentences: int = 3
) -> Column:
    """True when the PAGE is dropped: contains "lorem ipsum" (any
    case) or a curly brace, or fewer than ``min_sentences`` sentences
    survive line cleaning."""
    return (
        F.lower(text).contains("lorem ipsum")
        | text.contains("{")
        | (c4_sentence_count_col(cleaned) < F.lit(min_sentences))
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Apply the C4 rule list: returns surviving pages with ``text``
    REPLACED by the cleaned text, plus ``n_lines_kept`` and
    ``n_sentences`` audit columns.  One projection + one filter — zero
    shuffle, no UDF."""
    text = F.col(text_col)
    kept = c4_kept_lines_col(text, min_words_per_line)
    cleaned = F.array_join(kept, "\n")
    out_cols = [
        F.col(c) if c != text_col else cleaned.alias(text_col)
        for c in df.columns
    ]
    return (
        df.select(
            *out_cols,
            F.size(kept).alias("n_lines_kept"),
            c4_sentence_count_col(cleaned).alias("n_sentences"),
            c4_page_drop_col(text, cleaned, min_sentences).alias("_drop"),
        )
        .where(~F.col("_drop"))
        .drop("_drop")
    )
