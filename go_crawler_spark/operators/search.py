"""Search over the documents table: token match ranked by PageRank (O1).

The reference's search path (service/frontend/frontend.go:224-275 →
bleve/ES, ordered by -PageRank then -score, page size 10 with offset) is a
full-text engine; the engine-core equivalent is a tokenized match ranked
by ``(match_score, pagerank)`` with limit/offset pagination.

Match semantics:
* ``match``  — every query token must appear in the document tokens
  (bleve conjunction behavior for the default query),
* ``phrase`` — the exact lowercased phrase must appear as a substring.

score = fraction of distinct query tokens present (trivial tf-style
signal), descending, tie-broken by pagerank desc — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.textstats import tokens_col


def search(
    documents: DataFrame,
    query: str,
    mode: str = "match",
    size: int = 10,
    offset: int = 0,
    text_col: str = "text",
    rank_col: str = "pagerank",
) -> DataFrame:
    q_tokens = [t for t in query.lower().split() if t]
    toks = F.array_distinct(tokens_col(text_col))
    if mode == "phrase":
        matched = F.lower(F.col(text_col)).contains(query.lower())
        score = F.when(matched, F.lit(1.0)).otherwise(0.0)
    else:
        hits = F.size(
            F.array_intersect(toks, F.array(*[F.lit(t) for t in q_tokens]))
        )
        matched = hits == len(q_tokens)
        score = hits.cast("double") / F.lit(float(max(len(q_tokens), 1)))
    ranked = (
        documents.where(matched)
        .withColumn("score", score)
        .orderBy(
            F.desc_nulls_last(rank_col), F.desc("score"), F.col("url_hash")
        )
    )
    return ranked.offset(offset).limit(size) if offset else ranked.limit(size)
