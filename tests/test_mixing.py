"""Corpus mixing (Pile/LLaMA-style source weights + epochs)."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import mixing

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_census_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", "four five"), (3, "b", "six")],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in mixing.source_token_census(df).collect()}
    assert rows["a"].n_docs == 2 and rows["a"].n_tokens == 5
    assert rows["b"].n_docs == 1 and rows["b"].n_tokens == 1


def test_mixture_rates_normalize_cap_and_drop(spark):
    df = spark.createDataFrame(
        [(1, "big", "w " * 100), (2, "tiny", "w"), (3, "out", "w w")],
        "doc_id long, source string, text string",
    )
    census = mixing.source_token_census(df)
    rates = {
        r.source: r.rate
        for r in mixing.mixture_rates(
            census, {"big": 1.0, "tiny": 1.0}, token_budget=100
        ).collect()
    }
    # normalized weights 0.5/0.5: big gets 50/100 = 0.5, tiny 50/1 capped
    assert rates["big"] == pytest.approx(0.5)
    assert rates["tiny"] == pytest.approx(10.0)  # max_epochs cap
    assert "out" not in rates  # unweighted source dropped
    with pytest.raises(ValueError):
        mixing.mixture_rates(census, {"big": 1.0}, token_budget=0)
    with pytest.raises(ValueError):
        mixing.mixture_rates(census, {}, token_budget=10)


def test_mix_corpus_epochs_and_fractional_sampling(spark):
    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "up").otherwise("down").alias("source"),
        F.lit("ten tokens of text right here in this row now").alias("text"),
    )
    rates = spark.createDataFrame(
        [("up", 2.5), ("down", 0.5)], "source string, rate double"
    )
    mixed = mixing.mix_corpus(df, rates).cache()
    try:
        per_doc = {
            (r.doc_id): r.n
            for r in mixed.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        ups = [per_doc.get(i, 0) for i in range(0, n, 2)]
        downs = [per_doc.get(i, 0) for i in range(1, n, 2)]
        # rate 2.5: every doc 2 or 3 copies, ~half get the 3rd
        assert set(ups) <= {2, 3}
        assert 0.35 < sum(1 for u in ups if u == 3) / len(ups) < 0.65
        # rate 0.5: 0 or 1 copy, ~half survive
        assert set(downs) <= {0, 1}
        assert 0.35 < sum(downs) / len(downs) < 0.65
        # epoch numbering is 1..n_copies
        eps = mixed.where(F.col("doc_id") == 0).select("epoch").collect()
        assert sorted(r.epoch for r in eps) == list(
            range(1, per_doc[0] + 1))
        # deterministic rerun
        again = mixing.mix_corpus(df, rates)
        assert again.count() == mixed.count()
    finally:
        mixed.unpersist()


def test_mix_corpus_zero_shuffle_after_broadcast(spark, documents):
    rates = spark.createDataFrame(
        [(f"src{i}", 1.5) for i in range(20)], "source string, rate double"
    )
    plan = (
        mixing.mix_corpus(documents, rates)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchange is the broadcast of the tiny rates table
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan and "Arrow" not in plan
