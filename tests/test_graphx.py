"""PageRank + SSSP goldens, ported verbatim from the reference suites.

PageRank: ranker/ranker_test.go:34-135,182-217 (per-vertex ±0.01, Σ=1±0.001).
SSSP: shortestpath/shortestpath_test.go:16-104 (9-vertex cost matrix).
"""

import pytest

from go_crawler_spark.graphx.pagerank import pagerank
from go_crawler_spark.graphx.sssp import sssp


def _run_pr(spark, vertices, edges):
    v = spark.createDataFrame([(x,) for x in vertices], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    return pagerank(v, e)


def _assert_scores(got, expected, tol=0.01):
    assert set(got) == set(expected)
    for k, exp in expected.items():
        assert got[k] == pytest.approx(exp, abs=tol), (k, got[k], exp)
    assert sum(got.values()) == pytest.approx(1.0, abs=0.001)


def test_pagerank_cycle(spark):
    """(A)->(B)->(C)->(A): even scores (TestSimpleGraphCase1)."""
    res = _run_pr(spark, "ABC", [("A", "B"), ("B", "C"), ("C", "A")])
    got = {r.id: r.score for r in res.scores.collect()}
    _assert_scores(got, {"A": 1 / 3, "B": 1 / 3, "C": 1 / 3})


def test_pagerank_case2(spark):
    res = _run_pr(
        spark, "ABC", [("A", "B"), ("B", "C"), ("C", "A"), ("C", "B")]
    )
    got = {r.id: r.score for r in res.scores.collect()}
    _assert_scores(got, {"A": 0.2145, "B": 0.3937, "C": 0.3879})


def test_pagerank_case3(spark):
    res = _run_pr(
        spark, "ABC", [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")]
    )
    got = {r.id: r.score for r in res.scores.collect()}
    _assert_scores(got, {"A": 0.2569, "B": 0.4860, "C": 0.2569})


def test_pagerank_dead_end(spark):
    """(A)->(B)->(C): C is a dead-end; residual redistribution."""
    res = _run_pr(spark, "ABC", [("A", "B"), ("B", "C")])
    got = {r.id: r.score for r in res.scores.collect()}
    _assert_scores(got, {"A": 0.1842, "B": 0.3411, "C": 0.4745})


def test_pagerank_convergence_seeded_graph(spark):
    """Deterministic random graph converges; Σ=1 (scaled-down analogue of
    TestConvergenceForLargeGraphs, 2k vertices instead of 100k)."""
    from go_crawler_spark.fixtures import _mix

    n = 2000
    edges = []
    for i in range(n):
        for j in range(_mix(i, 100) % 7):
            edges.append((str(i), str(_mix(i, 101, j) % n)))
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = pagerank(v, e)
    total = res.scores.groupBy().sum("score").collect()[0][0]
    assert total == pytest.approx(1.0, abs=0.001)
    assert res.final_sad < 0.001
    assert res.supersteps < 200


def test_pagerank_driver_matches_distributed(spark):
    """The r6 bounded driver fast path (numpy supersteps) must agree
    with the distributed aggregate-messages loop to well inside the
    6-decimal rounding every consumer applies — including dead ends,
    duplicate edges, unknown-endpoint edges and a fixed round count."""
    from go_crawler_spark.fixtures import _mix

    n = 300
    edges = []
    for i in range(n):
        for j in range(_mix(i, 100) % 5):
            edges.append((str(i), str(_mix(i, 101, j) % n)))
    edges += [("0", "1"), ("0", "1")]          # duplicate edges
    edges += [("7", "ghost"), ("ghost", "7")]  # unknown endpoints
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    for kwargs in ({"min_sad": 0.0, "max_supersteps": 12}, {}):
        drv = pagerank(v, e, **kwargs)
        dist = pagerank(v, e, driver_edge_threshold=0, **kwargs)
        assert drv.supersteps == dist.supersteps
        a = {r.id: round(r.score, 6) for r in drv.scores.collect()}
        b = {r.id: round(r.score, 6) for r in dist.scores.collect()}
        assert a == b
        # same column names and types (nullability flags may differ:
        # createDataFrame defaults nullable, literal arithmetic does not)
        assert [(f.name, f.dataType) for f in drv.scores.schema] == [
            (f.name, f.dataType)
            for f in dist.scores.select("id", "score").schema
        ]


COST_MAT = [
    [0, 4, 0, 0, 0, 0, 0, 8, 0],
    [4, 0, 8, 0, 0, 0, 0, 11, 0],
    [0, 8, 0, 7, 0, 4, 0, 0, 2],
    [0, 0, 7, 0, 9, 14, 0, 0, 0],
    [0, 0, 0, 9, 0, 10, 0, 0, 0],
    [0, 0, 4, 0, 10, 0, 2, 0, 0],
    [0, 0, 0, 14, 0, 2, 0, 1, 6],
    [8, 11, 0, 0, 0, 0, 1, 0, 7],
    [0, 0, 2, 0, 0, 0, 6, 7, 0],
]
EXPECTED = {  # dst -> (cost, path)
    "0": (0, ["0"]),
    "1": (4, ["0", "1"]),
    "2": (12, ["0", "1", "2"]),
    "3": (19, ["0", "1", "2", "3"]),
    "4": (21, ["0", "7", "6", "5", "4"]),
    "5": (11, ["0", "7", "6", "5"]),
    "6": (9, ["0", "7", "6"]),
    "7": (8, ["0", "7"]),
    "8": (14, ["0", "1", "2", "8"]),
}


def test_sssp_cost_matrix(spark):
    v = spark.createDataFrame([(str(i),) for i in range(9)], "id string")
    edges = [
        (str(i), str(j), w)
        for i, row in enumerate(COST_MAT)
        for j, w in enumerate(row)
        if w
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    res = sssp(v, e, "0")
    rows = {r.id: r for r in res.dists.collect()}
    prev = {r.id: r.prev for r in rows.values()}
    for dst, (exp_cost, exp_path) in EXPECTED.items():
        assert rows[dst].cost == exp_cost, dst
        # reconstruct path via prev pointers
        path, cur = [], dst
        while cur is not None:
            path.append(cur)
            cur = prev[cur]
        assert list(reversed(path)) == exp_path, dst
