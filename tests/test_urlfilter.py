"""RefinedWeb-style URL gate: suffix-chain blocklist + soft word score."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import urlfilter


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_host_and_suffix_chain(spark):
    df = _urls(spark, ["http://A.B.example.COM:8080/x?y=1"])
    row = df.select(
        urlfilter.host_col("url").alias("h"),
        urlfilter.host_suffix_chain_col(
            urlfilter.host_col(F.col("url"))
        ).alias("chain"),
    ).collect()[0]
    assert row.h == "a.b.example.com"
    assert row.chain == [
        "a.b.example.com", "b.example.com", "example.com", "com",
    ]


def test_blocklist_blocks_domain_and_subdomains_only(spark):
    bl = spark.createDataFrame([("badsite.example",)], "domain string")
    df = _urls(spark, [
        "http://badsite.example/page",          # exact -> blocked
        "http://cdn.badsite.example/asset",     # subdomain -> blocked
        "http://notbadsite.example/page",       # sibling -> kept (dot-aware)
        "http://goodsite.example/page",         # unrelated -> kept
        "not a url at all",                     # no host -> kept
    ])
    kept = {r.url for r in urlfilter.blocklist_filter(df, bl).collect()}
    assert kept == {
        "http://notbadsite.example/page",
        "http://goodsite.example/page",
        "not a url at all",
    }


def test_word_score_strong_and_weak_combination(spark):
    df = _urls(spark, [
        "http://ok.example/article",            # 0.0
        "http://ok.example/casino-night",       # 1.0 strong
        "http://ok.example/poker-webcam",       # 0.5 + 0.5
        "http://ok.example/poker-tips",         # 0.5 only
    ])
    rows = {r.url: r.s for r in df.select(
        "url", urlfilter.url_word_score_col("url").alias("s")).collect()}
    assert rows["http://ok.example/article"] == 0.0
    assert rows["http://ok.example/casino-night"] == 1.0
    assert rows["http://ok.example/poker-webcam"] == 1.0
    assert rows["http://ok.example/poker-tips"] == 0.5


def test_digit_frac_and_shape_gates(spark):
    df = _urls(spark, [
        "http://a.example/post",                 # clean
        "http://a.example/1234567890123456789",  # digit-heavy
        "http://a.example/" + "x" * 3000,        # too long
    ])
    kept = {r.url for r in urlfilter.url_quality_filter(df).collect()}
    assert kept == {"http://a.example/post"}
    fracs = {r.url: r.f for r in df.select(
        "url", urlfilter.url_digit_frac_col("url").alias("f")).collect()}
    assert fracs["http://a.example/post"] == pytest.approx(0.0)
    assert fracs["http://a.example/1234567890123456789"] > 0.5


def test_composed_gate_with_blocklist(spark):
    bl = spark.createDataFrame([("ads.tracker",)], "domain string")
    df = _urls(spark, [
        "http://news.example/story",
        "http://x.ads.tracker/pixel",
        "http://news.example/casino",
    ])
    kept = {r.url for r in urlfilter.url_quality_filter(df, bl).collect()}
    assert kept == {"http://news.example/story"}


def test_word_score_plan_is_python_free(spark):
    """The score is unrolled JVM contains probes — no Python stage."""
    df = _urls(spark, ["http://a.example/p"]).select(
        urlfilter.url_word_score_col("url").alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
