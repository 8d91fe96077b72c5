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


def test_temperature_rates_goldens(spark):
    """mT5 alpha-scaling: p_s ∝ n_s^alpha.  alpha=0.5 over sizes
    100/400 gives weights 10/20 → p = 1/3, 2/3; alpha=1 is
    proportional sampling, which means EQUAL rates for every source."""
    df = spark.createDataFrame(
        [(1, "a", "w " * 100), (2, "b", "w " * 400)],
        "doc_id long, source string, text string",
    )
    census = mixing.source_token_census(df)
    r = {x.source: x.rate
         for x in mixing.temperature_rates(census, 300, alpha=0.5).collect()}
    assert r["a"] == pytest.approx(1.0)   # (1/3 * 300) / 100
    assert r["b"] == pytest.approx(0.5)   # (2/3 * 300) / 400
    r1 = {x.source: x.rate
          for x in mixing.temperature_rates(census, 250, alpha=1.0).collect()}
    assert r1["a"] == pytest.approx(r1["b"]) == pytest.approx(0.5)
    # epoch cap binds
    rc = {x.source: x.rate
          for x in mixing.temperature_rates(
              census, 300, alpha=0.5, max_epochs=0.6).collect()}
    assert rc["a"] == pytest.approx(0.6)
    with pytest.raises(ValueError):
        mixing.temperature_rates(census, 0)
    with pytest.raises(ValueError):
        mixing.temperature_rates(census, 10, alpha=0.0)


def test_unimax_rates_golden_and_budget(spark):
    """UniMax waterfill golden (hand-computed): sizes 100/1000/10000,
    budget 3000, cap 2 epochs → the tiny source saturates its cap
    (rate exactly 2.0), the freed budget re-spreads uniformly: 200 +
    1400 + 1400 tokens; the whole budget is spent."""
    df = spark.createDataFrame(
        [(1, "a", "w " * 100), (2, "b", "w " * 1000), (3, "c", "w " * 10000)],
        "doc_id long, source string, text string",
    )
    census = mixing.source_token_census(df)
    r = {x.source: x.rate
         for x in mixing.unimax_rates(census, 3000, max_epochs=2.0).collect()}
    assert r["a"] == 2.0                       # saturated: exactly the cap
    assert r["b"] == pytest.approx(1.4)        # 1400 / 1000
    assert r["c"] == pytest.approx(0.14)       # 1400 / 10000
    spent = 100 * r["a"] + 1000 * r["b"] + 10000 * r["c"]
    assert spent == pytest.approx(3000)


def test_unimax_differential_vs_bisection_waterfill(spark):
    """The closed-form prefix implementation must match an independent
    reference: waterfill by bisection on the uniform level t with
    b_s = min(cap_s, t) and sum(b_s) = B (when total caps cover B)."""
    import random

    rnd = random.Random(7)
    for trial in range(20):
        sizes = [rnd.randint(1, 500) * 10 for _ in range(rnd.randint(2, 8))]
        n_epochs = rnd.choice([1.0, 2.0, 4.0])
        total_cap = n_epochs * sum(sizes)
        budget = rnd.randint(1, int(total_cap))
        rows = [(i, f"s{i}", "w " * s) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        census = mixing.source_token_census(df)
        got = {x.source: x.rate
               for x in mixing.unimax_rates(
                   census, budget, max_epochs=n_epochs).collect()}
        # reference: bisection on the shared level t
        caps = {f"s{i}": n_epochs * s for i, s in enumerate(sizes)}
        lo, hi = 0.0, float(budget)
        for _ in range(200):
            t = (lo + hi) / 2
            if sum(min(c, t) for c in caps.values()) < budget:
                lo = t
            else:
                hi = t
        for i, s in enumerate(sizes):
            want = min(caps[f"s{i}"], hi) / s
            assert got[f"s{i}"] == pytest.approx(want, rel=1e-6), (
                trial, sizes, budget, n_epochs)
