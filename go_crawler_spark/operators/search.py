"""Search over the documents table: tf-scored token match + PageRank (O1).

The reference's search path (service/frontend/frontend.go:224-275 →
indexer/store/es/es.go:163-189) issues an ES ``multi_match`` over
``[Title, Content]`` with type ``best_fields`` wrapped in a
``function_score`` whose script is ``_score + doc['PageRank'].value``.
The engine-core equivalent, all JVM-side:

* ``match`` — every query token must appear in the title OR in the text
  (field-local conjunction, ES ``best_fields`` + AND semantics);
  relevance = the better field's summed per-token term frequency
  (count of the token / tokens in the field) — two full matches rank by
  how densely they match, never by an arbitrary id.
* ``phrase`` — exact lowercased substring; relevance = occurrence count
  of the phrase normalized by text token count.

Ordering:
* ``scoring="pagerank"`` (frontend list order) — PageRank desc, then
  relevance desc;
* ``scoring="function_score"`` (ES parity) — ``relevance + pagerank``
  desc, the es.go:178 script verbatim.
Ties always break on url_hash for determinism.  Pagination is
offset/limit (frontend page size 10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.textstats import tokens_col


def _field_tf(toks: Column, q_tokens: list[str]) -> tuple[Column, Column]:
    """(all_tokens_present, summed term frequency) for one field."""
    n = F.size(toks)

    def eq(t: str):  # NB one-param lambda: a 2-param form becomes (elem, idx)
        return lambda x: x == F.lit(t)

    counts = [F.size(F.filter(toks, eq(t))) for t in q_tokens]
    matched = F.lit(True)
    for c in counts:
        matched = matched & (c > 0)
    total = None
    for c in counts:
        total = c if total is None else total + c
    tf = F.when(
        matched & (n > 0), (total if total is not None else F.lit(0)).cast("double") / n
    ).otherwise(0.0)
    return matched & (n > 0), tf


def search(
    documents: DataFrame,
    query: str,
    mode: str = "match",
    size: int = 10,
    offset: int = 0,
    text_col: str = "text",
    title_col: str = "title",
    rank_col: str = "pagerank",
    scoring: str = "pagerank",
) -> DataFrame:
    q_tokens = [t for t in query.lower().split() if t]
    if mode == "phrase":
        q = query.lower()
        text_lc = F.lower(F.col(text_col))
        matched = text_lc.contains(q)
        occurrences = (
            (F.length(text_lc) - F.length(F.replace(text_lc, F.lit(q), F.lit(""))))
            / F.lit(max(len(q), 1))
        )
        n_toks = F.size(tokens_col(text_col))
        score = F.when(
            matched & (n_toks > 0), occurrences / n_toks
        ).otherwise(0.0)
    else:
        text_ok, text_tf = _field_tf(tokens_col(text_col), q_tokens)
        if title_col in documents.columns:
            title_ok, title_tf = _field_tf(tokens_col(title_col), q_tokens)
        else:
            title_ok, title_tf = F.lit(False), F.lit(0.0)
        # best_fields: candidate if either field holds every token; the
        # better-matching field's tf is the relevance
        matched = text_ok | title_ok
        score = F.greatest(
            F.when(text_ok, text_tf).otherwise(0.0),
            F.when(title_ok, title_tf).otherwise(0.0),
        )
    scored = documents.where(matched).withColumn("score", score)
    if scoring == "function_score":
        # es.go:178: "_score + doc['PageRank'].value"
        final = F.col("score") + F.coalesce(F.col(rank_col), F.lit(0.0))
        ranked = scored.withColumn("final_score", final).orderBy(
            F.desc("final_score"), F.col("url_hash")
        )
    else:
        ranked = scored.orderBy(
            F.desc_nulls_last(rank_col), F.desc("score"), F.col("url_hash")
        )
    return ranked.offset(offset).limit(size) if offset else ranked.limit(size)
