"""URL-level corpus filtering (the RefinedWeb / Dolma first gate).

RefinedWeb (Penedo et al. 2023, arXiv:2306.01116, App. G) filters
Common Crawl BEFORE touching document text: a multi-million-entry
domain blocklist, plus a soft "banned word" score over the URL string
(weighted substring matches — one strong word or several weak ones
block), plus simple shape heuristics.  Filtering on the URL alone is
the cheapest gate in the whole pipeline — it prunes fetch, parse, and
every downstream stage — so it runs first and must never read the
page body.

Scale shape (all pure Column expressions; one equi-join for the
blocklist):

* BLOCKLIST — the published lists are ~4.6M domains: too big to regex,
  maybe too big to broadcast.  ``host_suffix_chain_col`` explodes each
  host into its dot-suffix chain (``a.b.co`` -> [a.b.co, b.co, co]) so
  subdomain coverage becomes an exact EQUI-join against the blocklist
  table — Spark picks broadcast vs shuffle by size, and AQE handles
  the skewed empty-host bucket.  No per-row Python, no regex scan of a
  4.6M-way alternation.
* WORD SCORE — a weighted sum of ``contains`` probes unrolled from a
  literal list (O(W) per URL, JVM whole-stage codegen); W is dozens,
  not millions — the heavy lifting belongs to the blocklist join.
* SHAPE — digit fraction and length bounds, pure arithmetic.

The word list here is a small representative default (the published
lists are distributed separately from the papers); callers pass their
own. No counterpart in the Go reference (its URL filters are
extension/scheme/privnet — SURVEY §2.2); beyond-reference LLM layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

__all__ = [
    "host_col",
    "host_suffix_chain_col",
    "url_word_score_col",
    "url_digit_frac_col",
    "blocklist_filter",
    "url_quality_filter",
    "DEFAULT_WORD_WEIGHTS",
]

# Representative default: strong words block alone (weight >= 1.0),
# weak words only in combination.  Production swaps in the full
# published lists via the word_weights argument.
DEFAULT_WORD_WEIGHTS: dict[str, float] = {
    "porn": 1.0,
    "xxx": 1.0,
    "sex": 1.0,
    "escort": 1.0,
    "casino": 1.0,
    "gambling": 1.0,
    "webcam": 0.5,
    "poker": 0.5,
    "adult": 0.5,
    "pills": 0.5,
    "viagra": 1.0,
    "torrent": 0.5,
}


from go_crawler_spark.functions.urlops import host_col  # noqa: E402

# host_col is re-exported: the gate and the crawler's frontier must
# share ONE host definition (urlops.host_col, NULL-safe) or the
# blocklist and the politeness scheduler could disagree on a URL.


def host_suffix_chain_col(host: Column) -> Column:
    """Dot-suffix chain of a host: ``a.b.co -> [a.b.co, b.co, co]``.
    Joining the EXPLODED chain against a blocklist keyed by domain
    covers "domain or any subdomain of it" with exact equi-semantics —
    the standard way to apply a multi-million-domain blocklist without
    a regex scan."""
    parts = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
    )


def url_word_score_col(
    url: Column | str, word_weights: dict[str, float] | None = None
) -> Column:
    """RefinedWeb's soft banned-word score: sum of weights over words
    contained in the lowercased URL.  Unrolled literal ``contains``
    probes — whole-stage-codegen friendly, no UDF."""
    weights = DEFAULT_WORD_WEIGHTS if word_weights is None else word_weights
    c = F.col(url) if isinstance(url, str) else url
    lo = F.lower(c)
    score = F.lit(0.0)
    for w, wt in sorted(weights.items()):
        score = score + F.when(lo.contains(w), F.lit(float(wt))).otherwise(
            F.lit(0.0)
        )
    return score


def url_digit_frac_col(url: Column | str) -> Column:
    """Fraction of digit characters in the URL (spammy URLs are
    digit-heavy); 0.0 for empty strings."""
    c = F.col(url) if isinstance(url, str) else url
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def blocklist_filter(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose URL host — or any parent domain of it — appears
    in ``blocklist`` (one ``domain`` string column).  Implemented as
    explode-suffixes -> equi-join -> anti-join on the original rows, so
    it scales to multi-million-entry lists; URLs with no parseable
    host are KEPT (the blocklist can't testify about them — downstream
    scheme/shape gates handle garbage)."""
    chain = df.select(
        F.col(url_col).alias("_u"),
        F.explode(host_suffix_chain_col(host_col(F.col(url_col)))).alias(
            "domain"
        ),
    )
    hits = chain.join(blocklist.select("domain"), "domain").select(
        F.col("_u").alias(url_col)
    ).distinct()
    return df.join(hits, url_col, "left_anti")


def url_quality_filter(
    df: DataFrame,
    blocklist: DataFrame | None = None,
    word_weights: dict[str, float] | None = None,
    score_threshold: float = 1.0,
    max_digit_frac: float = 0.5,
    max_len: int = 2048,
    url_col: str = "url",
) -> DataFrame:
    """The composed RefinedWeb URL gate: blocklist, banned-word score
    below ``score_threshold``, digit fraction and length bounds.
    Returns surviving rows unchanged (gates never mutate)."""
    out = df.where(
        (url_word_score_col(F.col(url_col), word_weights)
         < F.lit(float(score_threshold)))
        & (url_digit_frac_col(F.col(url_col)) <= F.lit(float(max_digit_frac)))
        & (F.length(F.col(url_col)) <= F.lit(max_len))
    )
    if blocklist is not None:
        out = blocklist_filter(out, blocklist, url_col=url_col)
    return out
