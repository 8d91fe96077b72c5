"""Golden-web crawl through the REAL async-HTTP fetch path.

Spins up a local threading HTTP server standing in for the reference
integration test's two ``httptest`` servers (crawler_integration_test.go:
23-41); every golden-web host resolves to it, routing by Host header.
The crawl through ``http_fetch_fn`` must produce the exact link set,
documents, and edges the fetch-join path produces.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from go_crawler_spark import fixtures
from go_crawler_spark.crawl import Crawler, CrawlConfig
from go_crawler_spark.operators.httpfetch import http_fetch_fn

# (host, path) -> (status, content_type, body); everything else 404s,
# mirroring the fetch-join behavior where unknown URLs fetch nothing.
ROUTES = {
    ("srv1.test", "/"): (200, "application/xhtml", fixtures.GOLDEN_SERVER_RES),
    ("srv2.test", "/"): (200, "application/xhtml", fixtures.GOLDEN_SERVER_RES),
    # redirect chain: /old -> /hop (relative Location) -> /
    ("srv1.test", "/old"): (301, "/hop", None),
    ("srv1.test", "/hop"): (302, "http://srv1.test/", None),
    # a loop that must exhaust the redirect budget, not hang
    ("srv1.test", "/loop"): (301, "/loop", None),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        host = (self.headers.get("Host") or "").rsplit(":", 1)[0]
        hit = ROUTES.get((host, self.path))
        if hit is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        status, ctype, body = hit
        if body is None:  # redirect route: ctype carries the Location
            self.send_response(status)
            self.send_header("Location", ctype)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        data = body.encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def golden_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_golden_web_over_http(spark, tmp_warehouse, golden_server):
    port = golden_server

    def resolve(host, p):  # the test's DNS: every host is the local server
        return ("127.0.0.1", port)

    crawler = Crawler(
        spark,
        tmp_warehouse,
        pages=None,
        config=CrawlConfig(max_iterations=5, bloom_buckets=4),
        fetch_fn=http_fetch_fn(resolve=resolve, timeout_sec=10.0),
    )
    crawler.run(seed_urls=["http://srv1.test", "http://srv2.test"])

    frontier = {r.url: r.discovered_iter for r in crawler.read_frontier().collect()}
    assert set(frontier) == {
        "http://srv1.test",
        "http://srv2.test",
        "http://google.com/absolute/path",
        "http://google.com/relative",
        "http://google.com/ignore-me",
    }

    docs = {r.url: r for r in crawler.read_documents().collect()}
    assert set(docs) == {"http://srv1.test", "http://srv2.test"}
    for d in docs.values():
        assert d.title == fixtures.GOLDEN_EXPECTED_TITLE
        assert d.text == fixtures.GOLDEN_EXPECTED_TEXT

    by_hash = {r.url_hash: r.url for r in crawler.read_frontier().collect()}
    edges = {
        (by_hash[r.src_hash], by_hash[r.dst_hash])
        for r in crawler.read_edges().collect()
    }
    assert edges == {
        (s, d)
        for s in ("http://srv1.test", "http://srv2.test")
        for d in ("http://google.com/relative", "http://google.com/absolute/path")
    }


def test_http_fetch_per_host_cap_and_errors(spark, golden_server):
    """Concurrency caps hold and connection errors drop rows (not crash)."""
    port = golden_server

    def resolve(host, p):
        if host == "down.test":
            return ("127.0.0.1", 1)  # closed port -> refused
        return ("127.0.0.1", port)

    rows = [("http://srv1.test", i) for i in range(20)] + [
        ("http://down.test/x", 99)
    ]
    df = spark.createDataFrame(rows, "url string, rid int").coalesce(2)
    out = http_fetch_fn(resolve=resolve, per_host=2, timeout_sec=10.0)(df).collect()
    assert len(out) == 20  # down.test dropped, all srv1 fetched
    assert all(b"A title" in bytes(r.html) for r in out)


def test_http_fetch_follows_redirects(spark, golden_server):
    """3xx hops (relative and absolute Location) land on the final 200;
    a redirect loop exhausts the bounded budget and is dropped by the
    2xx post-filter instead of hanging (Go net/http follows redirects by
    default — link_fetcher.go's client — so must we)."""
    port = golden_server

    def resolve(host, p):
        return ("127.0.0.1", port)

    df = spark.createDataFrame(
        [("http://srv1.test/old",), ("http://srv1.test/loop",)], "url string"
    ).coalesce(1)
    out = http_fetch_fn(resolve=resolve, timeout_sec=10.0)(df).collect()
    assert len(out) == 1
    assert out[0].url == "http://srv1.test/old"  # frontier identity is the request URL
    assert out[0].status == 200
    assert b"A title" in bytes(out[0].html)


def test_https_defaults_to_port_443():
    """https URLs must resolve to port 443 and negotiate TLS — not open a
    plaintext socket to port 80 (which silently fails on every real
    https URL)."""
    import asyncio

    from go_crawler_spark.operators import httpfetch

    seen_ports = []

    def resolve(host, port):
        seen_ports.append(port)
        return ("127.0.0.1", 1)  # closed port: connect fails fast

    async def run():
        try:
            await httpfetch._get_one("https://secure.test/x", resolve, timeout=2.0)
        except Exception:
            pass  # refused — we only assert the resolved port + TLS intent

    asyncio.run(run())
    assert seen_ports == [443]


def test_redirect_to_private_target_blocked(spark, golden_server):
    """SSRF guard: a 3xx Location pointing at a private address (or a
    non-http scheme) must abort the fetch — the frontier's privnet
    filter never saw the redirect target, so the fetcher re-checks it."""
    port = golden_server
    ROUTES[("srv1.test", "/to-private")] = (302, "http://10.0.0.1/admin", None)
    ROUTES[("srv1.test", "/to-file")] = (302, "file:///etc/passwd", None)
    try:
        def resolve(host, p):
            return ("127.0.0.1", port)

        from go_crawler_spark.operators.httpfetch import privnet_url_guard

        df = spark.createDataFrame(
            [("http://srv1.test/to-private",), ("http://srv1.test/to-file",),
             ("http://srv1.test/old",)],
            "url string",
        ).coalesce(1)
        guard = privnet_url_guard(unresolved_private=False)  # named hosts ok
        out = http_fetch_fn(
            resolve=resolve, timeout_sec=10.0, url_allowed=guard
        )(df).collect()
        # private-IP and file: redirects dropped; the benign chain survives
        assert [r.url for r in out] == ["http://srv1.test/old"]
    finally:
        del ROUTES[("srv1.test", "/to-private")]
        del ROUTES[("srv1.test", "/to-file")]
