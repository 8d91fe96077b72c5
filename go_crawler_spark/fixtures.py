"""Deterministic synthetic web corpus (the ``pages`` table) + goldens.

No external data and no live network anywhere in this repo: the crawl
pipeline's "fetch" stage joins frontier URLs against this table (the
sandbox stand-in for a Common-Crawl-style Iceberg table of fetched pages).

Everything is a pure function of the row id (seed folded into a 64-bit
mix), so the corpus is byte-identical across runs, partition counts, and
cluster sizes — generation itself runs distributed via mapInPandas.

The ``text`` column carries the *expected* extracted text, composed
independently from the same parts used to render the HTML — it is the
oracle for the byte-identical extraction invariant, not a product of the
extractor under test.

Corpus properties (exercising every reference filter):
* one mega-host holding ``skew`` of all pages (politeness/skew fixture),
* links: same-host relative + absolute, cross-host, scheme-relative,
  fragments (dedup), rel=nofollow, excluded extensions (.png/.css/...),
  non-http schemes, private-network IPs — reference behaviors F1-F8,
* some rows with non-2xx status / non-html content type (F3/F4),
* entity-laden text (&amp; etc.) and <script>/<style>/<title> content
  that must NOT leak into extracted text.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from go_crawler_spark.tables import PAGES_SCHEMA

SEED = 42
BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _mix(*vals: int) -> int:
    """splitmix64-style deterministic mixer (public-domain construction)."""
    x = (SEED * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for v in vals:
        x = (x + v + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
    return x


def host_of(page_id: int, n_pages: int, n_hosts: int, skew: float) -> int:
    """Host assignment with one mega-host owning ``skew`` of the corpus."""
    if n_hosts == 1:
        return 0
    r = _mix(page_id, 1) % 1000
    if r < int(skew * 1000):
        return 0
    return 1 + _mix(page_id, 2) % (n_hosts - 1)


def url_of(page_id: int, n_pages: int, n_hosts: int, skew: float) -> str:
    h = host_of(page_id, n_pages, n_hosts, skew)
    return f"http://host{h}.test/p/{page_id}"


def _page_row(
    page_id: int, n_pages: int, n_hosts: int, skew: float, out_links: int
) -> dict:
    h = host_of(page_id, n_pages, n_hosts, skew)
    url = url_of(page_id, n_pages, n_hosts, skew)
    title = f"Page {page_id} &amp; friends"
    exp_title_text = f"Page {page_id} & friends"
    word = _WORDS[_mix(page_id, 3) % len(_WORDS)]

    body_parts: list[str] = []  # html fragments
    text_parts: list[str] = []  # expected extracted text pieces, in order
    body_parts.append("<h1>Welcome &amp; enjoy</h1>")
    text_parts.append("Welcome & enjoy")
    body_parts.append(f"<p>Host {h} page <b>{page_id}</b> says {word}</p>")
    text_parts.append(f"Host {h} page {page_id} says {word}")

    k = _mix(page_id, 4) % (out_links + 1)
    for j in range(k):
        target = _mix(page_id, 5, j) % n_pages
        t_host = host_of(target, n_pages, n_hosts, skew)
        t_url = url_of(target, n_pages, n_hosts, skew)
        anchor = f"see {target}"
        kind = _mix(page_id, 6, j) % 10
        if kind < 4 and t_host == h:
            href = f"/p/{target}"  # host-absolute
        elif kind < 6:
            href = f"//host{t_host}.test/p/{target}"  # scheme-relative
        else:
            href = t_url
        rel = ' rel="nofollow"' if _mix(page_id, 7, j) % 10 == 0 else ""
        frag = "#sec" if _mix(page_id, 8, j) % 7 == 0 else ""
        body_parts.append(f'<a href="{href}{frag}"{rel}>{anchor}</a>')
        text_parts.append(anchor)

    # Junk links every page: excluded ext, non-http, private net (dropped
    # by F1/F5/F2 — never crawled, never in extracted link sets).
    if _mix(page_id, 9) % 3 == 0:
        body_parts.append('<a href="/static/logo.png">logo</a>')
        text_parts.append("logo")
    if _mix(page_id, 10) % 5 == 0:
        body_parts.append('<a href="ftp://files.test/x">ftp</a>')
        text_parts.append("ftp")
    if _mix(page_id, 11) % 7 == 0:
        body_parts.append('<a href="http://192.168.1.10/admin">intranet</a>')
        text_parts.append("intranet")

    body = "\n".join(body_parts)
    html = (
        f"<html>\n<head>\n<title>{title}</title>\n"
        '<style>body { color: red; }</style>\n</head>\n'
        f"<body>\n{body}\n"
        '<script>var hidden = "should not appear";</script>\n'
        "</body>\n</html>\n"
    )
    expected_text = " ".join(text_parts)

    status = 200
    content_type = "text/html; charset=utf-8"
    m = _mix(page_id, 12) % 50
    if m == 0:
        status = 404
    elif m == 1:
        status = 503
    elif m == 2:
        content_type = "application/json"

    ts = BASE_TS + pd.Timedelta(seconds=int(_mix(page_id, 13) % 86400))
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": expected_text,
        "lang": "en",
        "status": status,
        "content_type": content_type,
    }


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 50,
    skew: float = 0.4,
    out_links: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_pages`` pages."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _page_row(int(i), n_pages, n_hosts, skew, out_links)
                for i in b["id"]
            ]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def seed_urls(n_pages: int, n_hosts: int = 50, skew: float = 0.4, n_seeds: int = 4) -> list[str]:
    """Deterministic crawl entry points spread across the id space."""
    return [
        url_of((i * n_pages) // n_seeds, n_pages, n_hosts, skew)
        for i in range(n_seeds)
    ]


# --------------------------------------------------------------------------
# Reference golden pages (verbatim HTML from the Go test suites) — a tiny
# 2-host web used by the pipeline-equivalence test.
# --------------------------------------------------------------------------

GOLDEN_SERVER_RES = """
\t<html>
\t<head>
\t  <title>A title</title>
\t  <base href="http://google.com/"/>
\t</head>
\t<body>
\t  <a href="./relative">I am a link relative to base</a>
\t  <a href="/absolute/path">I am an absolute link</a>
\t  <a href="//images/cart.png">I am using the same URL scheme as this page</a>
\t
\t  <!-- Link should be added to the index but without creating an edge to it -->
\t  <a href="ignore-me" rel="nofollow"/>
\t  <!-- The following links should be ignored -->
\t  <a href="file:///etc/passwd"></a>
\t  <a href="http://169.254.169.254/api/credentials">Link-local address</a>
\t</body>
\t</html>"""

GOLDEN_EXPECTED_TITLE = "A title"
GOLDEN_EXPECTED_TEXT = (
    "I am a link relative to base I am an absolute link "
    "I am using the same URL scheme as this page Link-local address"
)


def golden_pages(spark: SparkSession) -> DataFrame:
    """Two servers returning the integration-test page (crawler_integration_
    test.go:23-41), as rows of the pages table."""
    rows = [
        {
            "url": u,
            "warc_ts": BASE_TS,
            "html": GOLDEN_SERVER_RES.encode("utf-8"),
            "text": GOLDEN_EXPECTED_TEXT,
            "lang": "en",
            "status": 200,
            "content_type": "application/xhtml",
        }
        for u in ("http://srv1.test", "http://srv2.test")
    ]
    return spark.createDataFrame(pd.DataFrame(rows), PAGES_SCHEMA)
