"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

DSIR selects pretraining data that "looks like" a small target domain:
featurize every document into hashed n-gram counts, fit bag-of-words
distributions over the feature buckets for the target (p) and the raw
pool (q), weight each raw document by its log importance ratio
``log w(x) = sum over feature occurrences of (ln p[b] - ln q[b])``, and
resample without replacement via Gumbel top-k over the weights.  The
paper uses unigrams+bigrams hashed into 10k buckets — exactly what
``hashed_ngram_features`` produces.

Scale shape (every stage pure Column, no Python anywhere):

* FEATURIZE — tokens + bigrams built with ``zip_with``/``slice`` and
  exploded; the bucket id is ``hash(gram) mod B``.  Zero joins.
* FIT — one groupBy(bucket) count per corpus; the result is at most
  B rows (10k) — tiny, no matter the corpus size.  This is the trick
  that makes DSIR web-scale: the model state is O(B), not O(vocab).
* WEIGHT — the per-bucket log-ratio table is joined onto feature
  occurrences with an explicit ``F.broadcast`` (B rows always fits),
  then one groupBy(doc) sum — a single shuffle over slim (id, double)
  rows.
* RESAMPLE — Gumbel top-k: ``key = log_w + gumbel(unit_hash(id))``.
  The Gumbel draw is the inverse-CDF transform ``-ln(-ln u)`` of a
  hash-derived uniform, so selection is deterministic and
  partition-layout-independent; top-k is Spark's distributed
  TakeOrdered (per-partition heaps, no global sort materialized).

Hashing: production default ``xxhash64 pmod B``; pass
``hash_fn=dedup.md5_hash64_col`` for cross-engine oracle runs (DuckDB
computes the identical 60-bit md5 prefix, and it is non-negative so a
plain ``%`` agrees between engines).

No counterpart in the Go reference; beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.sampling import stage_seed, unit_hash
from go_crawler_spark.functions.textstats import tokens_col

__all__ = [
    "hashed_ngram_features",
    "fit_feature_dist",
    "importance_log_weights",
    "gumbel_topk",
]

# The Gumbel draw is stage-salted (sampling.stage_seed): its key is
# monotone in the uniform, so sharing split_col's stream would bias
# DSIR-selected docs into the top-u (val/test) hash region.


def _grams_col(text: Column) -> Column:
    """Unigrams ++ space-joined bigrams (the DSIR feature set).  The
    space joint is unambiguous: the tokenizer never emits tokens
    containing spaces (same bijectivity argument as search.phrase)."""
    toks = tokens_col(text)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def hashed_ngram_features(
    df: DataFrame,
    num_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """(id, bucket) — one row per n-gram OCCURRENCE, bucketed by
    ``hash(gram) mod num_buckets``.  Collisions are the point (the
    paper's hashing trick): B bounds the model state at any corpus
    size."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be > 0, got {num_buckets}")
    h = hash_fn if hash_fn is not None else F.xxhash64
    grams = _grams_col(F.col(text_col))
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(grams).alias("_g"),
    ).select(
        "_id", F.pmod(h(F.col("_g")), F.lit(num_buckets)).alias("bucket")
    )


def fit_feature_dist(feats: DataFrame) -> DataFrame:
    """Bucket occurrence counts ``(bucket, c)`` — at most B rows.
    Map-side partial aggregation collapses hot buckets per partition,
    so the exchange carries <= B rows per task regardless of skew."""
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def importance_log_weights(
    feats: DataFrame,
    target_dist: DataFrame,
    raw_dist: DataFrame,
    num_buckets: int,
    alpha: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``log_w = sum over the doc's feature occurrences of
    (ln p_hat[b] - ln q_hat[b])`` with add-``alpha`` smoothing over the
    B buckets, ``p_hat[b] = (c_p[b] + alpha) / (n_p + alpha * B)``.

    The ratio table is built by a full-outer join of the two O(B)
    dists (absent buckets coalesce to 0 and degrade to the smoothing
    floor) and broadcast onto the occurrences.  Returns
    ``(id_col, n_feats, log_w)``; docs with no features (empty text)
    contribute no row — they carry no evidence either way, so gate
    them upstream (the corpus funnel's min_tokens gate does).
    """
    p = target_dist.withColumnRenamed("c", "_cp")
    q = raw_dist.withColumnRenamed("c", "_cq")
    joined = p.join(q, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("_cp", F.lit(0)).alias("_cp"),
        F.coalesce("_cq", F.lit(0)).alias("_cq"),
    )
    consts = joined.agg(
        F.sum("_cp").alias("_np"), F.sum("_cq").alias("_nq")
    )
    ab = float(alpha) * num_buckets
    ratio = joined.crossJoin(F.broadcast(consts)).select(
        "bucket",
        (
            F.log((F.col("_cp") + F.lit(alpha)) / (F.col("_np") + F.lit(ab)))
            - F.log((F.col("_cq") + F.lit(alpha)) / (F.col("_nq") + F.lit(ab)))
        ).alias("_llr"),
    )
    # A bucket present in the scored batch but absent from BOTH fitted
    # dists has no ratio row; its true smoothed ratio is the closed-form
    # floor ln(alpha/(n_p+alpha*B)) - ln(alpha/(n_q+alpha*B)).  Coalesce
    # to it so persisted dists reused on a later batch don't silently
    # skip unseen buckets (which would bias log_w toward 0 while still
    # counting them in n_feats) — same guard as classifier.floor_llr.
    floor_llr = F.log(
        F.lit(float(alpha)) / (F.col("_np") + F.lit(ab))
    ) - F.log(F.lit(float(alpha)) / (F.col("_nq") + F.lit(ab)))
    per_doc = (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("_llr"), floor_llr)).alias("log_w"),
        )
    )
    return per_doc


def gumbel_topk(
    weighted: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    weight_col: str = "log_w",
    u: Column | None = None,
) -> DataFrame:
    """Importance resampling WITHOUT replacement as Gumbel top-k
    (the standard equivalence: argtop-k of ``log_w + Gumbel(0,1)`` is
    a weighted sample without replacement).  The Gumbel draw derives
    from a hash uniform — deterministic, rerun-stable, and independent
    of partition layout.  Pass ``u`` to override the uniform source
    (cross-engine oracles).  Adds a ``gumbel_key`` column; ties broken
    by id for full determinism."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    uu = (
        unit_hash(F.col(id_col), seed=stage_seed(seed, "gumbel"))
        if u is None
        else u
    )
    keyed = weighted.withColumn(
        "gumbel_key", F.col(weight_col) - F.log(-F.log(uu))
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.col(id_col)).limit(k)
