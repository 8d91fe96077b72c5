"""Bigram language-model perplexity scoring (CCNet-style quality
bucketing, Wenzek et al. 2020).

CCNet's defining quality signal is LM perplexity over each document
(they use a KenLM 5-gram; documents are then bucketed head/middle/tail
by perplexity percentile and the tail discarded or down-weighted).
This module is the Spark-native distributed form with an add-alpha
bigram model — the order is a fidelity simplification (no KenLM in a
JVM pipeline), the *pipeline shape* is the real thing: train counts on
a reference corpus, broadcast-or-join them onto the target corpus,
bucket by score percentile.

Scale shape, both phases pure Column expressions (no Python in either
hot path):

* TRAIN — tokenize + explode to (w1, w2) pairs, one groupBy shuffle
  each for bigram and unigram counts; map-side partial aggregation
  collapses Zipf-hot pairs ("of the") per-partition before the
  exchange.  At web scale the model tables are ~10^9 rows — written as
  parquet, bucketed by w1 for reuse.
* SCORE — explode the target corpus to bigram occurrences, equi-join
  the count tables (AQE skew-join splits the hot "of the" probe), then
  one groupBy(doc) mean.  Hot-key amplification is impossible: count
  tables carry one row per distinct bigram/unigram, so join output ==
  occurrence count.
* BUCKET — an exact percentile needs a global sort; ``lm_buckets``
  instead uses ``approx_percentile`` thresholds (t-digest, one
  reduce) + a broadcast of 2 scalars, the standard 100 TB trade.

Smoothing: add-alpha over the reference vocabulary,
``p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V)``; unseen w1 rows get
c = 0 from the left joins and degrade to the uniform 1/V floor, so
out-of-domain text scores high perplexity instead of crashing — the
behavior the CCNet filter depends on.

No counterpart in the Go reference (no LM anywhere); LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.textstats import tokens_col

__all__ = ["train_bigram_lm", "score_perplexity", "lm_buckets"]


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence, JVM-side: the token
    array zipped with its own tail (``slice`` + ``zip_with``), then
    exploded.  Single-token and empty docs contribute no rows."""
    toks = tokens_col(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(
        F.col(id_col).alias("_id"), F.explode(pairs).alias("_p")
    ).select("_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """Count model from a reference corpus: ``{"bigrams": (w1, w2, c),
    "unigrams": (w1, c), "vocab": 1-row (v)}`` — all lazy; persist or
    write them once when scoring more than one target corpus.

    ``unigrams`` counts w1 CONTEXT occurrences (bigram left sides), so
    ``sum_w2 c(w1, w2) == c(w1)`` holds exactly and the smoothed
    conditional sums to 1 over the vocabulary.  ``vocab`` counts
    distinct tokens (both sides), the V of the smoothing floor."""
    pairs = _bigram_pairs(df, text_col, id_col)
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # c(w1) == sum_w2 c(w1, w2) EXACTLY (both count the same bigram
    # occurrences, grouped differently — integer sums), so the context
    # counts re-aggregate the vocab-sized bigram table instead of
    # re-exploding the corpus: one corpus pass saved (r6, guide §2.3
    # "aggregate before you shuffle"); Catalyst's exchange reuse shares
    # the bigram aggregation between this and the score join.  The
    # vocab count keeps its own token explode — single-token documents
    # contribute vocabulary but no bigram, so it is NOT derivable from
    # the pair table.
    unigrams = bigrams.groupBy("w1").agg(F.sum("c").alias("c"))
    toks = df.select(F.explode(tokens_col(text_col)).alias("w"))
    vocab = toks.agg(F.count_distinct("w").alias("v"))
    return {"bigrams": bigrams, "unigrams": unigrams, "vocab": vocab}


def score_perplexity(
    df: DataFrame,
    model: dict[str, DataFrame],
    alpha: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram perplexity against a trained model:
    ``exp(-mean(ln p(w2|w1)))``, add-``alpha`` smoothed.  Docs with < 2
    tokens have no bigrams and score NULL (callers decide their fate —
    the corpus funnel's ``min_tokens`` gate normally removes them
    first).  Returns ``(id_col, n_bigrams, logprob, perplexity)``."""
    v = model["vocab"].select("v")
    pairs = _bigram_pairs(df, text_col, id_col)
    scored = (
        pairs.join(
            model["bigrams"].withColumnRenamed("c", "_cb"), ["w1", "w2"], "left"
        )
        .join(model["unigrams"].withColumnRenamed("c", "_cu"), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "_id",
            (
                F.log(
                    (F.coalesce(F.col("_cb"), F.lit(0)) + F.lit(alpha))
                    / (
                        F.coalesce(F.col("_cu"), F.lit(0))
                        + F.lit(alpha) * F.col("v")
                    )
                )
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("logprob"),
        F.round(F.exp(-F.avg("_lp")), 6).alias("perplexity"),
    )
    # docs with no bigrams re-enter with NULL scores (left join on ids)
    ids = df.select(F.col(id_col))
    return ids.join(per_doc, id_col, "left")


def lm_buckets(
    scored: DataFrame,
    head_frac: float = 0.33,
    tail_frac: float = 0.33,
    ppl_col: str = "perplexity",
) -> DataFrame:
    """CCNet's head/middle/tail split by perplexity percentile
    (LOW perplexity = head = best).  Thresholds via t-digest
    ``approx_percentile`` — one reduce, no global sort; NULL scores
    bucket as 'tail' (undefined quality never reaches 'head')."""
    qs = scored.agg(
        F.approx_percentile(ppl_col, F.lit(head_frac)).alias("_lo"),
        F.approx_percentile(ppl_col, F.lit(1.0 - tail_frac)).alias("_hi"),
    )
    return scored.crossJoin(F.broadcast(qs)).withColumn(
        "bucket",
        F.when(F.col(ppl_col).isNull(), "tail")
        .when(F.col(ppl_col) <= F.col("_lo"), "head")
        .when(F.col(ppl_col) > F.col("_hi"), "tail")
        .otherwise("middle"),
    ).drop("_lo", "_hi")
