"""Synthetic fetch stage: pre-fetch guards + join against the pages table.

The reference fetches per-URL over HTTP with a worker pool
(crawler/link_fetcher.go:28-67, pipeline/runners/fixed_worker_pool.go).
In this engine "fetch" is a distributed hash join of the selected frontier
slice against the Common-Crawl-style ``pages`` table on ``url_hash`` — the
no-live-network stand-in; on a real crawl this stage would be an async
HTTP mapInPandas over the same politeness-partitioned input.

Guards reproduced exactly:
* F1 extension exclusion  (link_fetcher.go:14,31-38) — native ``rlike``;
* F2 private-network SSRF (link_fetcher.go:41-43, privnet/privnet.go) —
  vectorized pandas UDF over the host column (unique-host memoized);
* F3 status in [200,299]  (link_fetcher.go:52-54) — native ``between``;
* F4 Content-Type contains "html" (link_fetcher.go:57-59) — native
  ``contains``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from go_crawler_spark.functions.urlops import is_private_host

def make_privnet_udf(
    unresolved_private: bool = False,
    dns: dict[str, str] | None = None,
    resolver=None,
):
    """Vectorized privnet check; memoizes per unique host within a batch.

    ``unresolved_private=True`` = reference fail-closed semantics
    (privnet.go:62-75: DNS resolution error drops the link).
    ``resolver`` is the live DNS hook (socket.gethostbyname in a real
    deployment) — without one, named hosts can only be judged by the
    static ``dns`` map.
    """
    return F.pandas_udf(
        lambda hosts: hosts.map(
            {
                h: is_private_host(h, dns, unresolved_private, resolver=resolver)
                for h in hosts.dropna().unique()
            }.get
        ).fillna(bool(unresolved_private)),
        T.BooleanType(),
    )


udf_is_private_host = make_privnet_udf()


def prefetch_filter(
    selected: DataFrame,
    unresolved_private: bool = False,
    dns: dict[str, str] | None = None,
    resolver=None,
) -> DataFrame:
    """F1 + F2 on the selected frontier slice (before the fetch join).

    Pass ``resolver=socket.gethostbyname`` (and/or a static ``dns`` map)
    in a real deployment so NAMED private hosts are caught too — with
    neither, only IP-literal URLs can be judged and named hosts follow
    ``unresolved_private`` (default fail-open for the no-DNS sandbox).
    """
    from go_crawler_spark.functions.urlops import excluded_extension_col

    out = selected.where(~excluded_extension_col("url"))
    priv = (
        udf_is_private_host
        if not (unresolved_private or dns or resolver)
        else make_privnet_udf(unresolved_private, dns, resolver)
    )
    return out.where(~priv(F.col("host")))


def fetch_join(selected: DataFrame, pages: DataFrame) -> DataFrame:
    """Inner-join frontier slice with pages on url_hash (+url tiebreak).

    ``pages`` must already carry ``url_hash``.  Returns fetch successes
    passing F3/F4; callers compute failures as selected MINUS returned.
    """
    page_cols = pages.select(
        "url_hash",
        F.col("url").alias("_page_url"),
        "html",
        F.coalesce(F.col("status"), F.lit(200)).alias("status"),
        F.coalesce(F.col("content_type"), F.lit("text/html")).alias("content_type"),
    )
    # SHUFFLE_HASH with the frontier slice as build side: when both
    # sides are hash-partitioned on url_hash (the Crawler guarantees it)
    # this runs with NO exchange and NO driver-side broadcast build — the
    # broadcast path serializes the whole slice through the driver every
    # iteration, a per-iteration serial cost that breaks N->4N scaling.
    # The 64-bit-collision tiebreak hides the url equality inside a CASE
    # WHEN: a bare `url == _page_url` would be extracted as an extra join
    # KEY, changing the partitioning requirement to (url, url_hash) and
    # re-shuffling the whole pages cache (html included) every iteration.
    same_url = F.when(F.col("url") == F.col("_page_url"), F.lit(True)).otherwise(
        F.lit(False)
    )
    fetched = (
        selected.hint("SHUFFLE_HASH").join(page_cols, "url_hash", "inner")
        .where(same_url)
        .drop("_page_url")
    )
    return fetched.where(
        F.col("status").between(200, 299) & F.col("content_type").contains("html")
    )
