"""Single-threaded pure-Python oracle of the reference crawl semantics.

Independent reimplementation of one "crawl pass" loop (BFS rounds) used to
verify the Spark engine's per-iteration frontier sets, final URL-seen set,
edge set, and extracted documents.  It reuses only the golden-tested pure
functions (extract_links / extract_text — themselves verified against the
reference's Go test vectors), not any Spark code.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from go_crawler_spark.functions.textops import extract_text, extract_title
from go_crawler_spark.functions.urlops import (
    EXCLUSION_RE,
    canonicalize_url,
    extract_links,
    is_private_host,
)


def _host(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


def oracle_crawl(pages: dict[str, dict], seeds: list[str], host_budget: int | None = None):
    """Returns (depth_by_url, edges, docs, per_iteration_fetched)."""
    seeds = [c for c in (canonicalize_url(s) for s in seeds) if c]
    depth: dict[str, int] = {s: 0 for s in seeds}
    current = sorted(set(seeds))
    edges: set[tuple[str, str]] = set()
    docs: dict[str, tuple[str, str]] = {}
    fetched_per_iter: list[set[str]] = []

    it = 0
    while current:
        it += 1
        if host_budget is not None:
            by_host: dict[str, int] = {}
            chosen = []
            # priority desc then url_hash — oracle approximates with sorted url
            for u in sorted(current):
                h = _host(u)
                if by_host.get(h, 0) < host_budget:
                    by_host[h] = by_host.get(h, 0) + 1
                    chosen.append(u)
            current = chosen
        fetched: set[str] = set()
        next_set: set[str] = set()
        for url in current:
            if EXCLUSION_RE.search(url) or is_private_host(_host(url)):
                continue
            row = pages.get(url)
            if row is None:
                continue
            if not (200 <= row.get("status", 200) <= 299):
                continue
            if "html" not in row.get("content_type", "text/html"):
                continue
            fetched.add(url)
            html = row["html"].decode("utf-8", errors="replace")
            docs[url] = (extract_title(html), extract_text(html))
            follow, nofollow = extract_links(url, html)
            for l in follow:
                edges.add((url, l))
            for l in follow + nofollow:
                if l not in depth:
                    depth[l] = it
                    next_set.add(l)
        fetched_per_iter.append(fetched)
        current = sorted(next_set)
    return depth, edges, docs, fetched_per_iter
