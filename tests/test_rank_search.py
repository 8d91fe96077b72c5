"""Ranker service (PageRank -> documents) + search (O1)."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark import fixtures
from go_crawler_spark.crawl import Crawler, CrawlConfig
from go_crawler_spark.operators.search import search
from go_crawler_spark.rank import rank_and_persist


@pytest.fixture(scope="module")
def ranked_crawler(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_rank"))
    pages = fixtures.synth_pages(spark, 120, n_hosts=4, skew=0.3, out_links=5)
    crawler = Crawler(
        spark, wh, pages, CrawlConfig(max_iterations=20, bloom_buckets=8)
    )
    crawler.run(seed_urls=fixtures.seed_urls(120, 4, 0.3))
    rank_and_persist(crawler)
    return crawler


def test_rank_scores_sum_to_one(spark, ranked_crawler):
    """Σ pagerank over ALL vertices = 1 (ranker_test.go:216 invariant)."""
    from go_crawler_spark.rank import rank

    res = rank(ranked_crawler)
    total = res.scores.agg(F.sum("score")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=0.001)
    assert res.final_sad < 0.001


def test_documents_carry_scores(spark, ranked_crawler):
    docs = ranked_crawler.read_documents()
    scored = docs.where(F.col("pagerank").isNotNull())
    assert scored.count() == docs.count()  # every indexed doc got a score
    assert scored.where(F.col("pagerank") <= 0).count() == 0


def test_search_match_and_ranking(spark, ranked_crawler):
    docs = ranked_crawler.read_documents()
    # every synthetic page contains "Welcome & enjoy"
    res = search(docs, "welcome enjoy", size=10).collect()
    assert len(res) == 10
    # ordered by pagerank desc
    ranks = [r.pagerank for r in res]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.score > 0 for r in res)  # tf relevance of a full match

    # pagination: offset skips the top results
    page2 = search(docs, "welcome enjoy", size=10, offset=10).collect()
    assert {r.url_hash for r in page2}.isdisjoint({r.url_hash for r in res})

    # phrase mode: exact substring
    none = search(docs, "definitely not present phrase", mode="phrase").collect()
    assert none == []


def test_search_conjunction_semantics(spark, ranked_crawler):
    """match mode requires ALL query tokens (bleve conjunction)."""
    docs = ranked_crawler.read_documents()
    hits = search(docs, "welcome zzzznonexistent", size=10).collect()
    assert hits == []


def test_search_tf_orders_full_matches(spark):
    """Two all-token matches must order by term frequency, not url_hash
    (the real relevance signal — VERDICT r1 item 7)."""
    docs = spark.createDataFrame(
        [
            # url_hash ascending would put the SPARSE doc first; tf must win
            (1, "http://a.test/", "other title", "crawl engine " + "filler " * 50, 0.1),
            (2, "http://b.test/", "other title", "crawl engine crawl engine crawl", 0.1),
            (3, "http://c.test/", "no match here", "nothing relevant", 0.9),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    res = search(docs, "crawl engine", size=10).collect()
    assert [r.url_hash for r in res] == [2, 1]  # dense match first
    assert res[0].score > res[1].score


def test_search_best_fields_title(spark):
    """A title-only full match is a hit (ES multi_match over Title+Content)."""
    docs = spark.createDataFrame(
        [(1, "http://a.test/", "spark crawler", "completely unrelated body", None)],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    res = search(docs, "spark crawler", size=10).collect()
    assert [r.url_hash for r in res] == [1]
    assert res[0].score > 0


def test_search_function_score_parity(spark):
    """scoring='function_score' reproduces es.go:178 `_score + PageRank`:
    enough relevance overtakes a higher-PageRank doc."""
    docs = spark.createDataFrame(
        [
            (1, "http://a.test/", "t", "crawl crawl crawl crawl", 0.05),
            (2, "http://b.test/", "t", "crawl " + "x " * 99, 0.3),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    fs = search(docs, "crawl", size=10, scoring="function_score").collect()
    assert [r.url_hash for r in fs] == [1, 2]  # 1.0+0.05 > 0.01+0.3
    pr = search(docs, "crawl", size=10).collect()
    assert [r.url_hash for r in pr] == [2, 1]  # pagerank ordering unchanged
