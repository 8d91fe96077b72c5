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
    """operator='and' (opt-in strict mode) requires ALL query tokens
    (bleve conjunction); the DEFAULT is OR (ES multi_match parity), so
    the same query still hits every page carrying 'welcome'."""
    docs = ranked_crawler.read_documents()
    hits = search(
        docs, "welcome zzzznonexistent", size=10, operator="and"
    ).collect()
    assert hits == []
    or_hits = search(docs, "welcome zzzznonexistent", size=10).collect()
    assert len(or_hits) > 0  # golden: the default operator is OR


def test_search_or_vs_and_operator(spark):
    """Pins the AND/OR operator difference (ES `multi_match best_fields`
    defaults to OR, es.go:169-184): under OR a single-term doc matches
    and ranks below a both-terms doc; under AND it is filtered out."""
    docs = spark.createDataFrame(
        [
            (1, "http://a.test/", "t", "alpha beta common words here", 0.0),
            (2, "http://b.test/", "t", "alpha only in this document", 0.0),
            (3, "http://c.test/", "t", "nothing relevant at all", 0.0),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    q = "alpha beta"
    and_hits = search(
        docs, q, size=10, scoring="function_score", operator="and"
    ).collect()
    or_hits = search(
        docs, q, size=10, scoring="function_score", operator="or"
    ).collect()
    # golden: OR is the DEFAULT operator (ES multi_match parity,
    # es.go:169-184 — round-5 behavioral change, see CHANGELOG.md)
    default_hits = search(docs, q, size=10, scoring="function_score").collect()
    assert [r.url_hash for r in default_hits] == [r.url_hash for r in or_hits]
    assert [r.url_hash for r in and_hits] == [1]  # conjunction drops doc 2
    # OR: both docs match; the both-terms doc outranks the single-term doc
    assert [r.url_hash for r in or_hits] == [1, 2]
    assert or_hits[0].score > or_hits[1].score > 0
    # the both-terms doc scores identically under either operator (the
    # matching-terms sum is the same when every term matches)
    assert and_hits[0].score == pytest.approx(or_hits[0].score)
    # tf relevance path honors the operator too
    or_tf = search(docs, q, size=10, relevance="tf", operator="or").collect()
    assert {r.url_hash for r in or_tf} == {1, 2}


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
            (2, "http://b.test/", "t", "crawl " + "x " * 99, 0.2),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    fs = search(docs, "crawl", size=10, scoring="function_score").collect()
    # doc1's BM25 (dense, short) + 0.05 beats doc2's (single hit, long) + 0.2
    assert [r.url_hash for r in fs] == [1, 2]
    pr = search(docs, "crawl", size=10).collect()
    assert [r.url_hash for r in pr] == [2, 1]  # pagerank ordering unchanged


def test_search_bm25_rare_term_beats_stopword_density(spark):
    """BM25 idf: a doc matching the RARE query token densely must outrank
    a doc stuffed with the COMMON query token — plain tf inverts this
    (VERDICT r2 item 5).  Query: 'spark the' over a corpus where 'the'
    appears everywhere and 'spark' in two docs."""
    filler = [
        (100 + i, f"http://f{i}.test/", "t", "the quick fox and the dog " * 3, 0.0)
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        [
            # doc1: one 'spark', many 'the' -> high tf on the stopword
            (1, "http://a.test/", "t", "spark " + "the the the the the the", 0.0),
            # doc2: dense on the rare term, single 'the'
            (2, "http://b.test/", "t", "spark spark spark engine the", 0.0),
        ]
        + filler,
        "url_hash long, url string, title string, text string, pagerank double",
    )
    from go_crawler_spark.operators.search import _field_tf
    from go_crawler_spark.functions.textstats import tokens_col

    bm = search(
        docs, "spark the", size=10, scoring="function_score", operator="and"
    ).collect()
    assert [r.url_hash for r in bm] == [2, 1]  # rare-term density wins
    # and plain tf really does invert it (the bug BM25 fixes)
    _, tf = _field_tf(tokens_col("text"), ["spark", "the"])
    tf_scores = {r.url_hash: r.s for r in docs.select("url_hash", tf.alias("s")).collect()}
    assert tf_scores[1] > tf_scores[2]


def test_search_phrase_token_positional(spark):
    """Phrase mode is a token-sequence match (match_phrase), not a
    substring test: 'foo bar' must NOT match 'foo barbell' but must match
    across punctuation the tokenizer strips (VERDICT r2 item 7)."""
    docs = spark.createDataFrame(
        [
            (1, "http://a.test/", "t", "say foo barbell lifts", 0.1),
            (2, "http://b.test/", "t", "they said foo, bar! indeed", 0.1),
            (3, "http://c.test/", "t", "foo alone and bar apart", 0.1),
            (4, "http://d.test/", "t", "foo bar foo bar twice", 0.1),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    res = search(docs, "foo bar", mode="phrase", size=10).collect()
    assert {r.url_hash for r in res} == {2, 4}
    scores = {r.url_hash: r.score for r in res}
    assert scores[4] > scores[2]  # two occurrences, shorter text


def test_docfreq_dimensions_match_inline_stats(spark):
    """A standing docfreq/field-stats dimension must reproduce the inline
    corpus_stats exactly, and incremental maintenance must equal a full
    rebuild — the no-corpus-rescan BM25 path."""
    from go_crawler_spark.operators.search import (
        corpus_stats,
        docfreq_build,
        docfreq_update,
        stats_for_query,
    )

    docs = spark.createDataFrame(
        [
            (1, "http://a/", "alpha beta", "spark engine crawls the web fast", 0.1),
            (2, "http://b/", "gamma", "the engine under the web is spark", 0.2),
            (3, "http://c/", "alpha spark", "completely unrelated words here", 0.3),
            (4, "http://d/", None, "spark spark spark", 0.0),
        ],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    q = ["spark", "engine"]
    fields = ["text", "title"]
    inline = corpus_stats(docs, q, fields).collect()[0].asDict()
    dfq, fst = docfreq_build(docs, tuple(fields))
    standing = stats_for_query(dfq, fst, q, fields).collect()[0].asDict()
    assert standing == inline

    # incremental: build on first half, fold in second half == full build
    half1, half2 = docs.where("url_hash <= 2"), docs.where("url_hash > 2")
    d1, s1 = docfreq_build(half1, tuple(fields))
    d2, s2 = docfreq_update(d1, s1, half2, tuple(fields))
    dful, sful = docfreq_build(docs, tuple(fields))
    key = lambda r: (r["field"], r.get("token", ""))
    assert sorted(map(lambda r: r.asDict(), d2.collect()), key=key) == sorted(
        map(lambda r: r.asDict(), dful.collect()), key=key
    )
    assert sorted(map(lambda r: r.asDict(), s2.collect()), key=key) == sorted(
        map(lambda r: r.asDict(), sful.collect()), key=key
    )

    # and search() accepts the standing stats verbatim
    a = search(docs, "spark engine", size=10, stats=stats_for_query(dfq, fst, q, fields)).collect()
    b = search(docs, "spark engine", size=10).collect()
    assert [(r.url_hash, r.score) for r in a] == [(r.url_hash, r.score) for r in b]


def test_search_query_tokenizer_matches_field_tokenizer(spark):
    """The query must be tokenized exactly like the fields: '_' is a
    separator in tokens_col, so a 'data_pipeline' query searches for the
    token sequence ['data','pipeline'] instead of an unmatchable
    underscore token (review r3 finding)."""
    docs = spark.createDataFrame(
        [(1, "http://a/", "t", "use the data_pipeline tool here", 0.1),
         (2, "http://b/", "t", "nothing relevant at all", 0.1)],
        "url_hash long, url string, title string, text string, pagerank double",
    )
    hits = search(docs, "data_pipeline", size=10).collect()
    assert [r.url_hash for r in hits] == [1]
    ph = search(docs, "data_pipeline", mode="phrase", size=10).collect()
    assert [r.url_hash for r in ph] == [1]


def test_resume_after_rank_preserves_scores(spark, tmp_path_factory):
    """rank_and_persist's checkpoint must qualify as the resume point so
    a later resume does not roll the documents table back past the
    score overwrite (review r3 finding)."""
    wh = str(tmp_path_factory.mktemp("wh_rank_resume"))
    pages = fixtures.synth_pages(spark, 60, n_hosts=3, skew=0.3, out_links=4)
    c = Crawler(spark, wh, pages, CrawlConfig(max_iterations=20, bloom_buckets=4))
    c.run(seed_urls=fixtures.seed_urls(60, 3, 0.3))  # runs to drain
    rank_and_persist(c)

    c2 = Crawler(spark, wh, pages, CrawlConfig(max_iterations=21, bloom_buckets=4))
    c2.run(resume=True)  # drained crawl: resumes and immediately re-drains
    docs = c2.read_documents()
    assert docs.where(F.col("pagerank").isNotNull()).count() == docs.count()


def test_phrase_match_empty_query_matches_nothing(spark):
    """An empty analyzed phrase is match_none (pinned: the old per-slice
    formulation matched every document)."""
    from go_crawler_spark.operators.search import phrase_match
    from go_crawler_spark.functions.textstats import tokens_col

    matched, occ = phrase_match(tokens_col("text"), [])
    df = spark.createDataFrame([("some text",)], ["text"])
    row = df.select(matched.alias("m"), occ.alias("o")).first()
    assert row.m is False and row.o == 0
