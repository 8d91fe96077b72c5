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


def test_dsir_features_count_unigrams_plus_bigrams(spark):
    from go_crawler_spark.functions import dsir

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    feats = dsir.hashed_ngram_features(df, num_buckets=64)
    per_doc = {r._id: r.n for r in feats.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # 3 unigrams + 2 bigrams; 1 + 0; empty -> no rows
    assert per_doc == {1: 5, 2: 1}
    buckets = feats.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert 0 <= buckets[0] and buckets[1] < 64
    with pytest.raises(ValueError):
        dsir.hashed_ngram_features(df, num_buckets=0)


def test_dsir_weights_prefer_target_like_docs(spark):
    from go_crawler_spark.functions import dsir

    target = spark.createDataFrame(
        [(100 + i, "physics energy quantum field theory") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "physics energy quantum field theory"),
         (2, "buy cheap pills online now fast"),
         (3, "energy field with some physics words mixed in")],
        "doc_id long, text string",
    )
    B = 512
    tf = dsir.hashed_ngram_features(target, B)
    rf = dsir.hashed_ngram_features(raw, B)
    w = dsir.importance_log_weights(
        dsir.hashed_ngram_features(raw, B),
        dsir.fit_feature_dist(tf), dsir.fit_feature_dist(rf), B,
    )
    rows = {r.doc_id: r for r in w.collect()}
    # the target-identical doc outranks both others outright
    assert rows[1].log_w > max(rows[2].log_w, rows[3].log_w)
    # log_w is a SUM over occurrences (the DSIR importance ratio), so
    # longer docs accumulate more mass; per-feature means recover the
    # mixed-beats-spam ordering
    mean = {k: r.log_w / r.n_feats for k, r in rows.items()}
    assert mean[1] > mean[3] > mean[2]
    assert all(abs(r.log_w) < 1e6 for r in rows.values())


def test_dsir_weight_is_sum_of_bucket_llrs(spark):
    """Closed-form check on a single-token corpus: one bucket, exact
    add-alpha arithmetic."""
    from go_crawler_spark.functions import dsir

    target = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    raw = spark.createDataFrame([(2, "x")], "doc_id long, text string")
    B, alpha = 16, 1.0
    tf = dsir.fit_feature_dist(dsir.hashed_ngram_features(target, B))
    rf = dsir.fit_feature_dist(dsir.hashed_ngram_features(raw, B))
    w = dsir.importance_log_weights(
        dsir.hashed_ngram_features(raw, B), tf, rf, B, alpha=alpha
    ).collect()[0]
    # target: 3 unigram "x" + 2 bigram "x x" occurrences = 5 in 1 or 2
    # buckets; raw: 1 occurrence of "x".  The raw doc's single feature
    # is the "x" bucket: p = (3+1)/(5+16), q = (1+1)/(1+16)
    expected = math.log((3 + alpha) / (5 + alpha * B)) - math.log(
        (1 + alpha) / (1 + alpha * B)
    )
    assert w.n_feats == 1
    assert w.log_w == pytest.approx(expected, rel=1e-12)


def test_dsir_unseen_bucket_degrades_to_floor_not_skipped(spark):
    """A bucket present in a LATER scored batch but absent from BOTH
    fitted dists must contribute the closed-form smoothing floor
    ln(alpha/(n_p+aB)) - ln(alpha/(n_q+aB)), not be silently skipped
    by F.sum while still counted in n_feats (r4 ADVICE)."""
    from go_crawler_spark.functions import dsir

    target = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    raw = spark.createDataFrame([(2, "x")], "doc_id long, text string")
    B, alpha = 16, 1.0
    tf = dsir.fit_feature_dist(dsir.hashed_ngram_features(target, B))
    rf = dsir.fit_feature_dist(dsir.hashed_ngram_features(raw, B))
    # "zzz" was seen by neither dist: its unigram bucket (and, unless it
    # collides, the bigram bucket) has no ratio row
    later = spark.createDataFrame([(9, "zzz")], "doc_id long, text string")
    w = dsir.importance_log_weights(
        dsir.hashed_ngram_features(later, B), tf, rf, B, alpha=alpha
    ).collect()[0]
    floor = math.log(alpha / (5 + alpha * B)) - math.log(
        alpha / (1 + alpha * B)
    )
    assert w.n_feats == 1
    assert w.log_w is not None
    assert w.log_w == pytest.approx(floor, rel=1e-12)


def test_dsir_gumbel_topk_deterministic_and_weight_biased(spark):
    from go_crawler_spark.functions import dsir

    n = 2000
    # half the docs get log_w = 3, half log_w = -3
    weighted = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("n_feats"),
        F.when(F.col("id") % 2 == 0, 3.0).otherwise(-3.0).alias("log_w"),
    )
    top1 = dsir.gumbel_topk(weighted, 200).collect()
    top2 = dsir.gumbel_topk(weighted, 200).collect()
    assert [r.doc_id for r in top1] == [r.doc_id for r in top2]
    hi = sum(1 for r in top1 if r.log_w == 3.0)
    # e^6 ~ 400x odds ratio: the top-200 should be nearly all heavy docs
    assert hi > 190
    # keys strictly ordered
    keys = [r.gumbel_key for r in top1]
    assert keys == sorted(keys, reverse=True)
    with pytest.raises(ValueError):
        dsir.gumbel_topk(weighted, 0)


def test_pareto_gate_independent_of_hash_split(spark):
    """The gate's uniform must be decorrelated from the split hash:
    among KEPT docs, the train fraction must match the split weight.
    (With one shared unit_hash stream, keep = u > t(score) while
    train = u < 0.9 — kept mid-score docs would crowd into val.)"""
    from go_crawler_spark.functions.sampling import hash_split

    n = 20000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.5).alias("score")
    )
    kept = classifier.pareto_quality_gate(base)
    split = hash_split(kept, {"train": 0.9, "val": 0.1}, key="doc_id")
    counts = {r.split: r.c for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    total = sum(counts.values())
    assert total > 200  # the gate kept a real sample
    assert 0.8 < counts.get("train", 0) / total < 0.97


def test_dsir_gumbel_independent_of_hash_split(spark):
    """Same property for DSIR selection: picked docs must split like
    the corpus, not pile into one hash region."""
    from go_crawler_spark.functions import dsir
    from go_crawler_spark.functions.sampling import hash_split

    n = 10000
    weighted = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(1).alias("n_feats"),
        F.lit(0.0).alias("log_w"),  # uniform weights: pure Gumbel order
    )
    picked = dsir.gumbel_topk(weighted, 2000)
    split = hash_split(picked, {"train": 0.9, "val": 0.1}, key="doc_id")
    counts = {r.split: r.c for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    frac = counts.get("train", 0) / 2000
    assert 0.85 < frac < 0.95


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
