"""NB quality classifier (GPT-3 pipeline stage) and DSIR importance
resampling — known-answer cases, invariants, and determinism.
"""

import math

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import classifier

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def nb_model(spark):
    pos = spark.createDataFrame(
        [(1, "good great fine wonderful good"), (2, "great clear helpful text")],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(10, "spam scam junk junk"), (11, "scam click banner junk")],
        "doc_id long, text string",
    )
    m = classifier.train_nb_quality(pos, neg, alpha=0.5)
    m["llr"] = m["llr"].cache()
    m["consts"] = m["consts"].cache()
    return m


def test_nb_separates_known_classes(spark, nb_model):
    target = spark.createDataFrame(
        [(1, "good great text"), (2, "spam junk click"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in classifier.score_nb_quality(target, nb_model).collect()
    }
    assert rows[1].logit > 0 > rows[2].logit
    # equal-sized corpora: prior = ln(2/2) = 0
    consts = nb_model["consts"].collect()[0]
    assert consts.log_prior == pytest.approx(0.0)
    # all-unseen doc scores prior + 2 * floor_llr exactly
    assert rows[3].logit == pytest.approx(
        consts.log_prior + 2 * consts.floor_llr, rel=1e-12
    )
    # sigmoid bridge
    for r in rows.values():
        assert r.score == pytest.approx(1.0 / (1.0 + math.exp(-r.logit)))


def test_nb_llr_signs_and_occurrence_weighting(spark, nb_model):
    llr = {r.token: r.llr for r in nb_model["llr"].collect()}
    assert llr["good"] > 0 > llr["junk"]  # class-exclusive tokens
    target = spark.createDataFrame(
        [(1, "good"), (2, "good good good")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.logit
        for r in classifier.score_nb_quality(target, nb_model).collect()
    }
    # multinomial: three occurrences weigh three times one
    assert rows[2] == pytest.approx(3 * rows[1], rel=1e-9)


def test_nb_conditionals_sum_to_one(spark, nb_model):
    """Add-alpha over the joint vocab: sum_t p(t|c) == 1 per class."""
    consts = nb_model["consts"].collect()[0]
    alpha, v = 0.5, consts.v
    pos = spark.createDataFrame(
        [(1, "good great fine wonderful good"), (2, "great clear helpful text")],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(10, "spam scam junk junk"), (11, "scam click banner junk")],
        "doc_id long, text string",
    )
    m = classifier.train_nb_quality(pos, neg, alpha=alpha)
    counts = (
        m["llr"]
        .count()
    )
    assert counts == v  # one llr row per joint-vocab token
    # reconstruct the normalization directly from raw token counts
    from go_crawler_spark.functions.textstats import tokens_col

    c_pos = (
        pos.select(F.explode(tokens_col("text")).alias("t"))
        .groupBy("t").count().collect()
    )
    n_pos = sum(r["count"] for r in c_pos)
    total = sum((r["count"] + alpha) / (n_pos + alpha * v) for r in c_pos)
    total += (v - len(c_pos)) * alpha / (n_pos + alpha * v)
    assert total == pytest.approx(1.0, rel=1e-12)


def test_nb_empty_doc_scores_bare_prior(spark, nb_model):
    target = spark.createDataFrame([(7, "")], "doc_id long, text string")
    r = classifier.score_nb_quality(target, nb_model).collect()[0]
    consts = nb_model["consts"].collect()[0]
    assert r.n_tokens == 0
    assert r.logit == pytest.approx(consts.log_prior)


def test_pareto_gate_determinism_and_calibration(spark):
    n = 5000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.5).alias("score")
    )
    kept1 = classifier.pareto_quality_gate(base).count()
    kept2 = classifier.pareto_quality_gate(base).count()
    assert kept1 == kept2  # hash-derived draw: identical reruns
    # P(keep | score=0.5) = (1 + 0.5)^-9 ~= 0.026
    assert 0.015 < kept1 / n < 0.04
    # score=1.0 is always kept (pareto draw > 0 a.s.)
    sure = base.withColumn("score", F.lit(1.0))
    assert classifier.pareto_quality_gate(sure).count() == n
    with pytest.raises(ValueError):
        classifier.pareto_quality_gate(base, shape=0.0)


def test_pareto_gate_monotone_in_score(spark):
    """Higher score can only widen the kept set (same ids, same u)."""
    lo = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(0.3).alias("score")
    )
    hi = lo.withColumn("score", F.lit(0.9))
    kept_lo = {r.doc_id for r in classifier.pareto_quality_gate(lo).collect()}
    kept_hi = {r.doc_id for r in classifier.pareto_quality_gate(hi).collect()}
    assert kept_lo <= kept_hi


def test_nb_scores_on_testdata_nonvacuous(spark, documents):
    """Self-split train on real testdata: scores spread, all finite."""
    pos = documents.where(F.col("doc_id") % 5 == 0)
    neg = documents.where(F.col("doc_id") % 5 != 0)
    m = classifier.train_nb_quality(pos, neg)
    scored = classifier.score_nb_quality(documents, m).cache()
    try:
        assert scored.count() == documents.count()
        stats = scored.agg(
            F.min("logit").alias("lo"),
            F.max("logit").alias("hi"),
            F.count(F.when(F.col("logit").isNull(), 1)).alias("nulls"),
        ).collect()[0]
        assert stats.nulls == 0
        assert stats.lo < stats.hi  # non-degenerate spread
    finally:
        scored.unpersist()
