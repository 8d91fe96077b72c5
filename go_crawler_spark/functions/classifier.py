"""Naive-Bayes document quality classifier (the GPT-3 / PaLM / CCNet
"quality classifier" pipeline stage).

GPT-3 (Brown et al. 2020, Appendix A) filtered Common Crawl with a
linear classifier trained to separate a trusted reference corpus
(WebText/Wikipedia/books, the positives) from raw crawl (negatives),
then kept documents stochastically by
``np.random.pareto(9) > 1 - document_score``.  This module is the
Spark-native distributed form with a multinomial Naive-Bayes model —
the model family is a fidelity simplification (no sklearn/fasttext in a
JVM pipeline), the *pipeline shape* is the real thing: train token
statistics on labeled corpora, broadcast-or-join them onto the target
corpus, score per document, gate by the published Pareto rule — made
deterministic so runs reproduce (hash-derived uniform instead of
``np.random``).

Scale shape, both phases pure Column expressions (no Python anywhere):

* TRAIN — tokenize + explode both corpora, ONE groupBy(token) shuffle
  producing per-class counts side by side (map-side partial agg
  collapses Zipf-hot tokens per partition before the exchange); totals
  and vocabulary are single-row aggregates broadcast into the
  log-likelihood-ratio table.  At web scale the LLR table is
  ~10^8 rows — write it as parquet once, reuse per target corpus.
* SCORE — explode the target corpus, ONE equi-join against the LLR
  table (hot tokens can't amplify: one row per distinct token), then
  one groupBy(doc) sum.  Unseen tokens degrade to the smoothing-floor
  LLR via the left join, never crash.
* GATE — a pure per-row expression: the Pareto draw is derived from
  ``unit_hash(id)`` (inverse-CDF transform), so membership depends only
  on the document — stable across cluster sizes and reruns, the same
  property ``sampling.py`` guarantees for splits.

No counterpart in the Go reference (no classifier anywhere); this is
the beyond-reference LLM-training-data layer (round brief).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.sampling import stage_seed, unit_hash
from go_crawler_spark.functions.textstats import tokens_col

__all__ = [
    "train_nb_quality",
    "score_nb_quality",
    "pareto_quality_gate",
]

# The gate's uniform is stage-salted (sampling.stage_seed): with one
# shared unit_hash stream, "kept" is exactly "u > t(score)" while
# "train" is "u < 0.98" — kept mid-score docs would pile into the
# val/test tail (0% of pareto-kept score-0.5 docs landed in train,
# measured before the fix).


def _token_occurrences(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) — one row per token OCCURRENCE (multinomial NB counts
    repeats; "spam spam spam" must weigh three times, not once)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(text_col)).alias("token"),
    )


def train_nb_quality(
    pos: DataFrame,
    neg: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Multinomial NB token model from a labeled pair of corpora:
    ``{"llr": (token, llr), "consts": 1-row (n_pos, n_neg, v,
    floor_llr, log_prior)}`` — all lazy; persist or write once when
    scoring more than one target corpus.

    ``llr(t) = ln p(t|pos) - ln p(t|neg)`` with add-``alpha`` smoothing
    over the JOINT vocabulary ``v`` (both classes share one V so the
    two conditionals are comparable):
    ``p(t|c) = (count_c(t) + alpha) / (total_c + alpha * v)``.
    ``floor_llr`` is the llr of a token seen in NEITHER class — the
    left-join fallback for tokens first appearing in the target corpus.
    ``log_prior = ln(n_pos_docs / n_neg_docs)``.
    """
    p_occ = _token_occurrences(pos, text_col, id_col)
    n_occ = _token_occurrences(neg, text_col, id_col)
    # fail fast on an empty class: ln(x/0) would otherwise surface as
    # all-NULL logits downstream (default mode) or a runtime division
    # error (ANSI) long after training "succeeded" — mirror the eager
    # validation in mixture_rates/gumbel_topk (r4 ADVICE).  limit(1)
    # probes stop at the first row, so this does not rescan the corpora;
    # the four probes union into ONE Spark job (r6 — four sequential
    # limit-count jobs were a fixed ~0.4s of every training build),
    # with the original check precedence preserved below.
    probe = pos.limit(1).select(F.lit("pos_docs").alias("_k"))
    for tag, frame in (
        ("pos_occ", p_occ), ("neg_docs", neg), ("neg_occ", n_occ)
    ):
        probe = probe.unionByName(
            frame.limit(1).select(F.lit(tag).alias("_k"))
        )
    present = {r["_k"] for r in probe.collect()}
    for cls, dk, ok in (
        ("pos", "pos_docs", "pos_occ"), ("neg", "neg_docs", "neg_occ")
    ):
        if dk not in present:
            raise ValueError(f"{cls} corpus has zero documents")
        if ok not in present:
            raise ValueError(
                f"{cls} corpus has zero token occurrences "
                f"(all-empty {text_col!r}?)"
            )
    # one shuffle: tag with class, count both classes in a single groupBy
    tagged = p_occ.select("token", F.lit(1).alias("_is_pos")).unionAll(
        n_occ.select("token", F.lit(0).alias("_is_pos"))
    )
    counts = tagged.groupBy("token").agg(
        F.sum("_is_pos").alias("c_pos"),
        F.sum(1 - F.col("_is_pos")).alias("c_neg"),
    )
    consts = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    ).crossJoin(
        F.broadcast(
            pos.select(F.count(F.lit(1)).alias("_dp")).crossJoin(
                neg.select(F.count(F.lit(1)).alias("_dn"))
            )
        )
    ).select(
        "n_pos",
        "n_neg",
        "v",
        (
            F.log(F.lit(alpha) / (F.col("n_pos") + F.lit(alpha) * F.col("v")))
            - F.log(F.lit(alpha) / (F.col("n_neg") + F.lit(alpha) * F.col("v")))
        ).alias("floor_llr"),
        F.log(F.col("_dp") / F.col("_dn")).alias("log_prior"),
    )
    llr = counts.crossJoin(F.broadcast(consts.select("n_pos", "n_neg", "v"))).select(
        "token",
        (
            F.log(
                (F.col("c_pos") + F.lit(alpha))
                / (F.col("n_pos") + F.lit(alpha) * F.col("v"))
            )
            - F.log(
                (F.col("c_neg") + F.lit(alpha))
                / (F.col("n_neg") + F.lit(alpha) * F.col("v"))
            )
        ).alias("llr"),
    )
    return {"llr": llr, "consts": consts}


def score_nb_quality(
    df: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document NB quality logit against a trained model:
    ``logit = log_prior + sum over token occurrences of llr(token)``,
    plus ``score = sigmoid(logit)`` (the [0,1] "document_score" the
    GPT-3 Pareto rule consumes).  Empty docs score the bare prior.
    Returns ``(id_col, n_tokens, logit, score)``."""
    consts = F.broadcast(model["consts"].select("floor_llr", "log_prior"))
    occ = _token_occurrences(df, text_col, id_col)
    scored = (
        occ.join(model["llr"], "token", "left")
        .crossJoin(consts)
        .select(
            "_id",
            F.coalesce(F.col("llr"), F.col("floor_llr")).alias("_llr"),
        )
    )
    per_doc = scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_llr").alias("_sum_llr"),
    )
    # empty docs re-enter with n_tokens=0 and the bare prior
    ids = df.select(F.col(id_col))
    return (
        ids.join(per_doc, id_col, "left")
        .crossJoin(consts)
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            (F.coalesce("_sum_llr", F.lit(0.0)) + F.col("log_prior")).alias(
                "logit"
            ),
        )
        .withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
    )


def pareto_gate_col(
    score: Column,
    id_key: Column,
    shape: float = 9.0,
    seed: int = 42,
    u: Column | None = None,
) -> Column:
    """The GPT-3 acceptance rule ``pareto(shape) > 1 - score`` as a
    deterministic Column: the Pareto draw is the inverse-CDF transform
    ``(1 - u)^(-1/shape) - 1`` of ``u = unit_hash(id)``, so a document's
    fate depends only on itself (reproducible across runs, cluster
    sizes, and corpus growth).  shape=9 is the published constant —
    high-score docs are near-always kept, low-score docs survive with
    small probability (keeps the tail diverse instead of a hard cut).
    Pass ``u`` to override the uniform source (cross-engine oracles use
    an md5-derived uniform DuckDB can reproduce)."""
    if u is None:
        u = unit_hash(id_key, seed=stage_seed(seed, "pareto"))
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / shape)) - F.lit(1.0)
    return pareto > (F.lit(1.0) - score)


def pareto_quality_gate(
    scored: DataFrame,
    shape: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "score",
    seed: int = 42,
) -> DataFrame:
    """Filter a ``score_nb_quality`` result by the deterministic Pareto
    rule; returns the kept rows unchanged."""
    if shape <= 0:
        raise ValueError(f"pareto shape must be > 0, got {shape}")
    return scored.where(
        pareto_gate_col(F.col(score_col), F.col(id_col), shape=shape, seed=seed)
    )
