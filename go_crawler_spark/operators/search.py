"""Search over the documents table: BM25 token match + PageRank (O1).

The reference's search path (service/frontend/frontend.go:224-275 →
indexer/store/es/es.go:163-189) issues an ES ``multi_match`` over
``[Title, Content]`` with type ``best_fields`` wrapped in a
``function_score`` whose script is ``_score + doc['PageRank'].value`` —
and ES's ``_score`` is Lucene BM25.  The engine-core equivalent, all
JVM-side:

* ``match`` — term combination per ``operator=``: ``"or"`` (the
  DEFAULT, ES `multi_match best_fields` parity — es.go:169-184 sets no
  operator and ES defaults to OR: a doc matches if ANY analyzed token
  matches in either field); ``"and"`` is the opt-in stricter
  field-local conjunction (ES ``operator: and``).  Relevance = the
  better field's
  score under ``relevance=``:
  - ``"bm25"`` (default, ES parity): Lucene BM25 —
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``; a rare-term match
    outranks a stopword-dense page, exactly the property plain tf
    inverts.  Corpus stats (N, per-field avgdl, per-token df) are ONE
    map-side-combined aggregate over the corpus, broadcast as a 1-row
    dimension — at 100 TB that is a single stats pass (or a maintained
    docfreq table passed via ``stats=``), never a per-document job.
  - ``"tf"``: summed per-token term frequency (the pre-BM25 behavior,
    kept as the cheap no-stats path).
* ``phrase`` — token-positional sequence match (bleve/ES
  ``match_phrase``, indexer/indexer.go:20-31): the query's token
  sequence must appear consecutively in the field's token stream, so
  ``"foo bar"`` does NOT match "foo barbell" but does match
  "foo, bar!" (punctuation the tokenizer strips); relevance =
  occurrence count / token count.

Ordering:
* ``scoring="pagerank"`` (frontend list order) — PageRank desc, then
  relevance desc;
* ``scoring="function_score"`` (ES parity) — ``relevance + pagerank``
  desc, the es.go:178 script verbatim.
Ties always break on url_hash for determinism.  Pagination is
offset/limit (frontend page size 10).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.textstats import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75


def _field_tf(
    toks: Column, q_tokens: list[str], operator: str = "and"
) -> tuple[Column, Column]:
    """(tokens_present, summed term frequency) for one field.

    ``operator="and"``: every token must appear; ``"or"``: any token
    suffices (ES ``match`` default operator)."""
    n = F.size(toks)

    def eq(t: str):  # NB one-param lambda: a 2-param form becomes (elem, idx)
        return lambda x: x == F.lit(t)

    counts = [F.size(F.filter(toks, eq(t))) for t in q_tokens]
    matched = F.lit(True) if operator == "and" else F.lit(False)
    for c in counts:
        matched = (matched & (c > 0)) if operator == "and" else (matched | (c > 0))
    total = None
    for c in counts:
        total = c if total is None else total + c
    tf = F.when(
        matched & (n > 0), (total if total is not None else F.lit(0)).cast("double") / n
    ).otherwise(0.0)
    return matched & (n > 0), tf


def corpus_stats(
    documents: DataFrame, q_tokens: list[str], fields: list[str]
) -> DataFrame:
    """BM25 corpus statistics as a 1-row broadcastable dimension.

    One aggregate pass (map-side partial combine) computing N, per-field
    avgdl, and per-(field, query-token) document frequency.  In a
    standing deployment this is maintained incrementally as a docfreq
    table; recomputing per ad-hoc query is one scan either way.
    """
    aggs = [F.count(F.lit(1)).alias("bm25_n")]
    for fld in fields:
        toks = tokens_col(fld)
        aggs.append(F.avg(F.size(toks)).alias(f"bm25_avgdl_{fld}"))
        for i, t in enumerate(q_tokens):
            aggs.append(
                F.sum(F.array_contains(toks, t).cast("long")).alias(
                    f"bm25_df_{fld}_{i}"
                )
            )
    return documents.agg(*aggs)


def docfreq_build(
    documents: DataFrame, fields: tuple[str, ...] = ("text",)
) -> tuple[DataFrame, DataFrame]:
    """The STANDING BM25 stats dimensions for a deployment that cannot
    rescan the corpus per query:

    * ``docfreq``: (field, token, df) — document frequency per distinct
      token per field (one exploded-distinct aggregation per field);
    * ``field_stats``: (field, n_docs, n_field, sum_dl) — corpus size,
      docs with the field present, and summed token length (avgdl =
      sum_dl / n_field — Lucene averages over docs that HAVE the field).

    Both are ordinary tables: store them in the lakehouse and refresh
    incrementally with ``docfreq_update`` as documents are indexed —
    never a per-query corpus pass.
    """
    spark = documents.sparkSession
    df_parts, st_parts = [], []
    for fld in fields:
        toks = tokens_col(fld)
        df_parts.append(
            documents.select(
                F.explode(F.array_distinct(toks)).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .select(F.lit(fld).alias("field"), "token", "df")
        )
        st_parts.append(
            documents.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count(F.size(toks)).alias("n_field"),
                F.coalesce(F.sum(F.size(toks)), F.lit(0)).alias("sum_dl"),
            ).select(F.lit(fld).alias("field"), "n_docs", "n_field", "sum_dl")
        )
    from functools import reduce

    return (
        reduce(DataFrame.unionByName, df_parts),
        reduce(DataFrame.unionByName, st_parts),
    )


def docfreq_update(
    docfreq: DataFrame,
    field_stats: DataFrame,
    new_docs: DataFrame,
    fields: tuple[str, ...] = ("text",),
) -> tuple[DataFrame, DataFrame]:
    """Incremental stats maintenance: fold newly indexed documents into
    the standing dimensions — O(new docs) work plus a merge on the
    (field, token) key, identical by construction to a full rebuild
    (both df and sum_dl are additive)."""
    nf, ns = docfreq_build(new_docs, fields)
    merged_df = (
        docfreq.unionByName(nf)
        .groupBy("field", "token")
        .agg(F.sum("df").alias("df"))
    )
    merged_st = (
        field_stats.unionByName(ns)
        .groupBy("field")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_field").alias("n_field"),
            F.sum("sum_dl").alias("sum_dl"),
        )
    )
    return merged_df, merged_st


def stats_for_query(
    docfreq: DataFrame,
    field_stats: DataFrame,
    q_tokens: list[str],
    fields: list[str],
) -> DataFrame:
    """The 1-row broadcastable stats frame ``search(..., stats=)``
    expects, built from the standing dimensions: a lookup of |q_tokens|
    keys in the docfreq table (partition-prunable on token) — no corpus
    scan anywhere."""
    sel = docfreq.where(
        F.col("field").isin(list(fields)) & F.col("token").isin(q_tokens)
    )
    aggs = []
    for fld in fields:
        for i, t in enumerate(q_tokens):
            aggs.append(
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("field") == fld) & (F.col("token") == t),
                            F.col("df"),
                        )
                    ),
                    F.lit(0),
                ).alias(f"bm25_df_{fld}_{i}")
            )
    df_row = sel.agg(*aggs)
    st_aggs = [F.max("n_docs").alias("bm25_n")]
    for fld in fields:
        st_aggs.append(
            F.max(
                F.when(
                    F.col("field") == fld,
                    F.col("sum_dl") / F.greatest(F.col("n_field"), F.lit(1)),
                )
            ).alias(f"bm25_avgdl_{fld}")
        )
    st_row = field_stats.agg(*st_aggs)
    return df_row.crossJoin(st_row)


def _field_bm25(
    toks: Column,
    q_tokens: list[str],
    fld: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    operator: str = "and",
) -> tuple[Column, Column]:
    """(tokens_present, BM25 score) for one field, reading the
    corpus-stats columns that ``corpus_stats`` broadcast onto the row.

    ``operator="or"`` is the ES/Lucene default: the field matches if ANY
    query term appears, and the score is the sum over the MATCHING
    terms' BM25 contributions (an absent term has tf=0 and contributes
    exactly 0, so the sum needs no special-casing).  ``"and"`` requires
    every term (ES ``operator: and`` / ``minimum_should_match: 100%``).
    """
    dl = F.size(toks).cast("double")
    avgdl = F.greatest(F.col(f"bm25_avgdl_{fld}"), F.lit(1e-9))
    n_docs = F.col("bm25_n").cast("double")

    def eq(t: str):  # NB one-param lambda: a 2-param form becomes (elem, idx)
        return lambda x: x == F.lit(t)

    conj = operator == "and"
    matched = dl > 0 if conj else F.lit(False)
    score = F.lit(0.0)
    for i, t in enumerate(q_tokens):
        tf = F.size(F.filter(toks, eq(t))).cast("double")
        df = F.col(f"bm25_df_{fld}_{i}").cast("double")
        # Lucene idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — always > 0
        idf = F.log((n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
        norm = (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
        )
        matched = (matched & (tf > 0)) if conj else (matched | (tf > 0))
        score = score + idf * norm
    matched = matched & (dl > 0)
    return matched, F.when(matched, score).otherwise(0.0)


def phrase_match(toks: Column, q_tokens: list[str]) -> tuple[Column, Column]:
    """Token-positional phrase match: (matched, occurrence count).

    The query token sequence must appear CONSECUTIVELY in the token
    stream (``match_phrase`` semantics) — all JVM-side: the token
    stream's m-grams (``kgrams_col`` zip_with shift-chains) are compared
    against the space-joined query phrase.  The join is bijective
    because the package tokenizer never emits tokens containing spaces.

    Expression-safe by construction (see ``kgrams_col``): the earlier
    per-start-position ``slice(toks, i, m)`` captured ``toks`` inside
    the lambda, re-running the tokenizer split once per position when
    callers pass the tokens EXPRESSION (as the search operator does).
    """
    from go_crawler_spark.functions.textstats import kgrams_col

    m = len(q_tokens)
    if m == 0:
        # an empty analyzed phrase matches nothing (ES match_none
        # semantics) — pinned explicitly: the positional formulations
        # disagree on this edge (per-slice compare matched everything)
        return F.lit(False), F.lit(0)
    # Bijectivity guard: the space-joined m-gram comparison is only
    # sound when no token can itself contain a space (true for the
    # package tokenizer); an external caller passing q_tokens=['a b']
    # would otherwise false-match the distinct sequence ['a','b'].
    if any(" " in t for t in q_tokens):
        raise ValueError(
            "phrase_match query tokens must not contain spaces "
            f"(got {q_tokens!r}) — pass analyzer output, not raw phrases"
        )
    n = F.size(toks)
    phrase = F.lit(" ".join(q_tokens))
    # cheap conjunctive guard first: a positional match implies every
    # token is present, so non-candidate docs (the vast majority in a
    # real corpus) never pay the O(n*m) positional scan
    guard = F.lit(True)
    for t in q_tokens:
        guard = guard & F.array_contains(toks, t)
    grams = F.when(guard & (n >= m), kgrams_col(toks, m)).otherwise(
        F.array().cast("array<string>")
    )
    occ = F.size(F.filter(grams, lambda g: g == phrase))
    return occ > 0, occ


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
    relevance: str = "bm25",
    stats: DataFrame | None = None,
    operator: str = "or",
) -> DataFrame:
    """See module docstring.  ``operator`` selects the term-combination
    rule for ``match`` mode: ``"or"`` (the DEFAULT — reference parity
    with the ES `multi_match best_fields` default operator,
    es.go:169-184 sets no operator and ES defaults to OR: a document
    matches if ANY analyzed token matches, scored as the max over
    fields of the sum of the matching terms' per-term BM25) or
    ``"and"`` (opt-in strict mode — every analyzed token must appear in
    the matching field)."""
    if operator not in ("and", "or"):
        raise ValueError(f"unknown operator {operator!r} (and | or)")
    # ES's analyzer tokenizes the query the same way as the fields; a
    # phrase query is its token sequence, not a raw substring.  Split on
    # [\W_]+ — exactly the complement of tokens_col's [\p{L}\p{N}] token
    # chars (NB \w alone would keep '_' and make such tokens unmatchable)
    q_tokens = [t for t in re.split(r"[\W_]+", query.lower()) if t]
    if mode == "phrase":
        toks = tokens_col(text_col)
        matched, occ = phrase_match(toks, q_tokens)
        n_toks = F.size(toks)
        score = F.when(
            matched & (n_toks > 0), occ.cast("double") / n_toks
        ).otherwise(0.0)
    elif relevance == "bm25":
        fields = [text_col] + ([title_col] if title_col in documents.columns else [])
        if stats is None:
            stats = corpus_stats(documents, q_tokens, fields)
        else:
            # caller-provided (standing) stats may cover fewer fields
            # than the schema offers — score only what the stats carry
            fields = [f for f in fields if f"bm25_avgdl_{f}" in stats.columns]
            if not fields:
                raise ValueError(
                    "stats= frame carries no bm25_avgdl_<field> column "
                    f"for any of the searchable fields"
                )
        documents = documents.crossJoin(F.broadcast(stats))
        if text_col in fields:
            text_ok, text_s = _field_bm25(
                tokens_col(text_col), q_tokens, text_col, operator=operator
            )
        else:
            text_ok, text_s = F.lit(False), F.lit(0.0)
        if title_col in fields:
            title_ok, title_s = _field_bm25(
                tokens_col(title_col), q_tokens, title_col, operator=operator
            )
        else:
            title_ok, title_s = F.lit(False), F.lit(0.0)
        # best_fields: candidate if either field holds every token; the
        # better-matching field's score is the relevance
        matched = text_ok | title_ok
        score = F.greatest(text_s, title_s)
    else:
        text_ok, text_tf = _field_tf(tokens_col(text_col), q_tokens, operator)
        if title_col in documents.columns:
            title_ok, title_tf = _field_tf(tokens_col(title_col), q_tokens, operator)
        else:
            title_ok, title_tf = F.lit(False), F.lit(0.0)
        matched = text_ok | title_ok
        score = F.greatest(
            F.when(text_ok, text_tf).otherwise(0.0),
            F.when(title_ok, title_tf).otherwise(0.0),
        )
    scored = documents.where(matched).withColumn("score", score)
    scored = scored.drop(
        *[c for c in scored.columns if c.startswith("bm25_")]
    )
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
