"""Async HTTP fetch operator — the real-network fetch stage.

The reference fetches per-URL with a worker pool over ``net/http``
(crawler/link_fetcher.go:28-67, pipeline/runners/fixed_worker_pool.go).
Here each Spark partition runs ONE asyncio event loop issuing HTTP/1.x
GETs over raw asyncio streams (stdlib-only: the runtime ships no aiohttp):

* a per-partition concurrency cap — the reference's pool size — bounds
  sockets per executor core;
* a per-host semaphore caps simultaneous connections to any one host,
  composing with the frontier's salted politeness partitioning (a host's
  URLs arrive grouped into few partitions, so the cap binds globally);
* fetch errors (refused / timeout / malformed) drop the row — exactly the
  fetch-join contract, where the caller computes failures as
  ``selected MINUS returned`` and marks the attempt.

Output schema = input columns + (html binary, status int, content_type
string), post-filtered by F3 (2xx) and F4 (Content-Type contains "html")
— link_fetcher.go:52-59 — so it is a drop-in replacement for
``fetch_join``:  ``Crawler(..., fetch_fn=http_fetch_fn(...))``.

``resolve(host, port) -> (connect_host, connect_port)`` stands in for
DNS/proxying; tests point every golden-web host at a local socket server.
"""

from __future__ import annotations

import asyncio
from typing import Callable, Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

_CRLF = b"\r\n"


async def _get_one(
    url: str,
    resolve: Callable[[str, int], tuple[str, int]] | None,
    timeout: float,
    max_redirects: int = 5,
    url_allowed: Callable[[str], bool] | None = None,
    sem_for: Callable[[str], "asyncio.Semaphore"] | None = None,
    pool: "asyncio.Semaphore | None" = None,
    max_body_bytes: int = 8 * 1024 * 1024,
) -> tuple[int, str, bytes]:
    """One GET, following up to ``max_redirects`` 3xx hops (the reference
    uses Go net/http's default client, which follows redirects — a site
    whose root 301s to www/ or a trailing slash must not crawl as a
    permanent failure).

    Every redirect TARGET is re-checked: non-http(s) schemes always
    abort, and ``url_allowed`` (the privnet/SSRF guard — the frontier's
    filters only ever saw the original URL, so an attacker-controlled
    Location header is the one way a private address could reach the
    socket layer) aborts the fetch, dropping the row as a failed attempt.
    """
    for _ in range(max_redirects + 1):
        # Politeness binds PER HOP: a redirect to another host must hold
        # THAT host's semaphore, or 64 tasks redirected from A to B open
        # 64 sockets to B.  Host cap acquired BEFORE the global pool slot
        # so tasks queued on a hot host don't pin pool permits and
        # collapse partition-wide concurrency to ~per_host.
        host = urlsplit(url).hostname or ""
        sem = sem_for(host) if sem_for else None
        if sem is not None and pool is not None:
            async with sem, pool:
                status, ctype, body, location = await _get_raw(
                    url, resolve, timeout, max_body_bytes
                )
        else:
            status, ctype, body, location = await _get_raw(
                url, resolve, timeout, max_body_bytes
            )
        if status in (301, 302, 303, 307, 308) and location:
            from urllib.parse import urljoin

            url = urljoin(url, location)  # re-resolve against request URL
            if urlsplit(url).scheme not in ("http", "https"):
                raise ValueError(f"redirect to non-http scheme: {url}")
            if url_allowed is not None and not url_allowed(url):
                raise ValueError(f"redirect target blocked by guard: {url}")
            continue
        return status, ctype, body
    return status, ctype, body  # redirect budget exhausted: surface last 3xx


def privnet_url_guard(
    dns: dict[str, str] | None = None,
    resolver: Callable[[str], str | None] | None = None,
    unresolved_private: bool = True,
) -> Callable[[str], bool]:
    """Build a ``url_allowed`` guard from the engine's privnet detector
    (urlops.is_private_host).  Defaults FAIL CLOSED on unresolvable
    hosts — the right posture for redirect targets, which are
    attacker-controlled."""
    from go_crawler_spark.functions.urlops import is_private_host

    def allowed(url: str) -> bool:
        host = urlsplit(url).hostname or ""
        return bool(host) and not is_private_host(
            host, dns=dns, unresolved_private=unresolved_private, resolver=resolver
        )

    return allowed


async def _get_raw(
    url: str,
    resolve: Callable[[str, int], tuple[str, int]] | None,
    timeout: float,
    max_body_bytes: int = 8 * 1024 * 1024,
) -> tuple[int, str, bytes, str]:
    parts = urlsplit(url)
    is_https = parts.scheme == "https"
    host, port = parts.hostname or "", parts.port or (443 if is_https else 80)
    chost, cport = resolve(host, port) if resolve else (host, port)
    ssl_ctx = None
    if is_https:
        import ssl

        ssl_ctx = ssl.create_default_context()
    reader, writer = await asyncio.wait_for(
        asyncio.open_connection(chost, cport, ssl=ssl_ctx, server_hostname=host or None)
        if ssl_ctx
        else asyncio.open_connection(chost, cport),
        timeout,
    )
    try:
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
            "Connection: close\r\nUser-Agent: gcs-crawler/1.0\r\nAccept: */*\r\n\r\n"
        )
        writer.write(req.encode("latin1"))
        await writer.drain()
        # Bounded chunked read: reader.read(-1) buffers an unbounded
        # response (a hostile multi-GB body OOMs the Python worker);
        # truncate at the cap — the html post-filter/extractor tolerate
        # truncated bodies the same as any partial fetch.
        chunks: list[bytes] = []
        budget = max_body_bytes  # headers + body; reads never exceed it
        while budget >= 0:
            chunk = await asyncio.wait_for(
                reader.read(min(256 * 1024, budget + 1)), timeout
            )
            if not chunk:
                break
            chunks.append(chunk)
            budget -= len(chunk)
        raw = b"".join(chunks)
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass
    head, sep, body = raw.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("malformed HTTP response")
    lines = head.split(_CRLF)
    status = int(lines[0].split()[1])
    ctype, chunked, clen, location = "", False, None, ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        k = k.strip().lower()
        if k == b"content-type":
            ctype = v.strip().decode("latin1")
        elif k == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
        elif k == b"content-length":
            try:
                clen = int(v.strip())
            except ValueError:
                pass
        elif k == b"location":
            location = v.strip().decode("latin1")
    if chunked:
        body = _dechunk(body)
    elif clen is not None:
        body = body[:clen]
    return status, ctype, body, location


def _dechunk(body: bytes) -> bytes:
    out, i = bytearray(), 0
    while i < len(body):
        j = body.find(_CRLF, i)
        if j < 0:
            break
        try:
            n = int(body[i:j].split(b";")[0], 16)
        except ValueError:
            break
        if n == 0:
            break
        out += body[j + 2 : j + 2 + n]
        i = j + 2 + n + 2
    return bytes(out)


async def _fetch_batch(
    urls: list[str],
    resolve,
    timeout: float,
    per_host: int,
    max_concurrency: int,
    url_allowed: Callable[[str], bool] | None = None,
    max_body_bytes: int = 8 * 1024 * 1024,
) -> list[tuple[int, str, bytes] | None]:
    pool = asyncio.Semaphore(max_concurrency)
    host_sems: dict[str, asyncio.Semaphore] = {}

    def sem_for(host: str) -> asyncio.Semaphore:
        return host_sems.setdefault(host, asyncio.Semaphore(per_host))

    async def one(u: str):
        # semaphores are acquired inside _get_one, per redirect hop, so
        # the per-host cap follows the CURRENT hop's host and a task
        # queued on a hot host holds no global pool permit
        try:
            return await _get_one(
                u, resolve, timeout,
                url_allowed=url_allowed, sem_for=sem_for, pool=pool,
                max_body_bytes=max_body_bytes,
            )
        except Exception:
            return None  # dropped: caller marks the attempt as failed

    return list(await asyncio.gather(*(one(u) for u in urls)))


def http_fetch_fn(
    resolve: Callable[[str, int], tuple[str, int]] | None = None,
    timeout_sec: float = 5.0,
    per_host: int = 2,
    max_concurrency: int = 64,
    url_allowed: Callable[[str], bool] | None = None,
    max_body_bytes: int = 8 * 1024 * 1024,
) -> Callable[[DataFrame], DataFrame]:
    """Build a fetch stage: selected frontier slice -> fetched rows.

    Drop-in for the synthetic join: same output contract as
    ``fetch_join`` (input cols + html/status/content_type, F3/F4
    filtered).

    ``url_allowed`` guards redirect targets; the DEFAULT is the
    IP-literal privnet guard (safe everywhere, blocks nothing the
    sandbox's named test hosts need) — pass
    ``privnet_url_guard(resolver=socket.gethostbyname)`` in production
    to fail closed on named private hosts too, or an explicit
    always-true callable to disable.
    """
    if url_allowed is None:
        url_allowed = privnet_url_guard(unresolved_private=False)

    def fetch(selected: DataFrame) -> DataFrame:
        in_fields = selected.schema.fields
        out_schema = T.StructType(
            list(in_fields)
            + [
                T.StructField("html", T.BinaryType()),
                T.StructField("status", T.IntegerType()),
                T.StructField("content_type", T.StringType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                urls = pdf["url"].tolist()
                res = asyncio.run(
                    _fetch_batch(
                        urls, resolve, timeout_sec, per_host,
                        max_concurrency, url_allowed, max_body_bytes,
                    )
                )
                ok = [i for i, r in enumerate(res) if r is not None]
                if not ok:
                    continue
                out = pdf.iloc[ok].copy()
                out["status"] = [res[i][0] for i in ok]
                out["content_type"] = [res[i][1] for i in ok]
                out["html"] = [res[i][2] for i in ok]
                yield out[[f.name for f in out_schema.fields]]

        fetched = selected.mapInPandas(run, out_schema)
        return fetched.where(
            F.col("status").between(200, 299) & F.col("content_type").contains("html")
        )

    return fetch
