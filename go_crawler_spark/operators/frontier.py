"""Frontier selection: staleness, priority, per-host politeness, robots.

The reference's per-pass selection is "all links with retrieved_at older
than now-ReIndexThreshold, in map-iteration (arbitrary) order"
(service/crawler/crawler.go:168, graph/store/cdb/cdb.go:27-29).  This
module keeps that staleness predicate (F9) and adds the scheduler the
north rule requires: priority ordering, per-host politeness budgets, and
robots.txt deny-lists — all expressed so the plan survives one mega-host
holding half the frontier.

Skew handling: a naive rank-then-filter over ``Window.partitionBy(host)``
would put the mega-host's entire frontier slice in ONE task.  Spark 4's
``WindowGroupLimit`` rewrite makes the ``row_number() <= k`` pattern run a
*partial* top-k on the map side before the exchange (visible in the plan
as ``WindowGroupLimit ... Partial``), so each task forwards at most
``budget`` rows per host — the same effect as manual salting, natively.
``politeness_select`` therefore uses a single window when the budget is a
plain constant, and falls back to an explicit two-phase salted top-k
(rank within (host, salt), then exact rank within host) when per-host
budget overrides defeat the rewrite.  ``tests/test_plans.py`` locks the
partial-top-k plan shape in.

Everything is pure Column expressions (no Python).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def due_filter(frontier: DataFrame, now: datetime, reindex_threshold_days: float = 7.0) -> DataFrame:
    """F9: never-crawled or last crawled before now - threshold
    (default 7d per reference main.go:76)."""
    cutoff = F.lit(now) - F.expr(
        f"INTERVAL {int(reindex_threshold_days * 86400)} SECONDS"
    )
    return frontier.where(
        F.col("retrieved_at").isNull() | (F.col("retrieved_at") < cutoff)
    )


def politeness_select(
    due: DataFrame,
    host_budgets: DataFrame | None = None,
    default_budget: int = 100,
    salt_buckets: int = 16,
    max_urls_per_iter: int | None = None,
    mode: str = "exact",
) -> DataFrame:
    """Top-``budget`` URLs per host by (priority desc, url_hash), skew-safe.

    ``host_budgets`` (host, budget_per_iter) overrides the default; it is
    a small dimension — broadcast it.

    ``mode="salted_quota"`` (host_budgets=None only): the budget is split
    into per-(host, salt) quotas — salt i of s gets ``b//s`` (+1 for the
    first ``b%s`` salts), so at most ``b`` rows per host survive, selected
    as each salt's priority top-k.  A mega-host's ranking then runs as
    ``salt_buckets`` parallel sorts instead of one task sorting the whole
    host (the "exact" global per-host top-k is inherently single-task for
    a host that owns a large share of the frontier — at 10^10-URL scale
    per-host work MUST shard, which is exactly the north rule's
    "salted-repartition-by-host").  The quota trades global priority
    order within a host for skew-freedom; the per-host budget bound and
    determinism are preserved.
    """
    if mode not in ("exact", "salted_quota"):
        # a typo'd mode must not silently fall back to the single-task
        # global top-k the caller explicitly opted out of
        raise ValueError(f"unknown politeness mode {mode!r} (exact | salted_quota)")
    if mode == "salted_quota" and host_budgets is not None:
        raise ValueError(
            "salted_quota does not support per-host budget overrides — "
            "use mode='exact', whose override path is already the "
            "skew-safe salted two-phase top-k"
        )
    df = due
    order = [F.col("priority").desc_nulls_last(), F.col("url_hash")]

    if mode == "salted_quota" and host_budgets is None:
        b = int(default_budget)
        # Never more salts than budget units: with s > b, salts >= b%s
        # would get quota 0, and since the salt is a pure function of
        # url_hash those URLs would be PERMANENTLY unselectable (the
        # drain condition could then end the crawl with due URLs left).
        s = max(1, min(int(salt_buckets), b))
        salt = F.pmod(F.col("url_hash"), F.lit(s)).cast("int")
        quota = F.lit(b // s) + (salt < F.lit(b % s)).cast("int")
        w = Window.partitionBy(F.col("host"), salt).orderBy(*order)
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota)
            .drop("_rn")
        )
        if max_urls_per_iter is not None:
            # Global cap, distributed: `orderBy().limit(k)` is a driver-side
            # top-k merge (TakeOrdered collects k rows) — at k in the
            # millions that's a serial driver stage.  The same salted-quota
            # construction bounds the total at <= k with per-salt parallel
            # top-(k/s) sorts.
            k = int(max_urls_per_iter)
            sg = max(1, min(int(salt_buckets), k))  # same zero-quota guard
            saltg = F.pmod(F.col("url_hash"), F.lit(sg)).cast("int")
            gq = F.lit(k // sg) + (saltg < F.lit(k % sg)).cast("int")
            wg = Window.partitionBy(saltg).orderBy(*order)
            df = (
                df.withColumn("_grn", F.row_number().over(wg))
                .where(F.col("_grn") <= gq)
                .drop("_grn")
            )
        return df

    if host_budgets is None:
        # Literal limit => Spark rewrites to WindowGroupLimit with a
        # map-side Partial pass: skew-safe with ONE shuffle.
        w = Window.partitionBy("host").orderBy(*order)
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= F.lit(default_budget))
            .drop("_rn")
        )
    else:
        # Column-valued budgets defeat the WindowGroupLimit rewrite, so
        # handle skew explicitly: salted partial top-k, then exact top-k
        # over the (<= salt_buckets * budget)-row survivors per host.
        df = df.join(F.broadcast(host_budgets), "host", "left")
        budget = F.coalesce(F.col("budget_per_iter"), F.lit(default_budget))
        df = df.withColumn("_budget", budget).drop("budget_per_iter")

        salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
        w1 = Window.partitionBy(F.col("host"), salt).orderBy(*order)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= F.col("_budget"))
            .drop("_rn1")
        )
        w2 = Window.partitionBy("host").orderBy(*order)
        df = (
            df.withColumn("_rn2", F.row_number().over(w2))
            .where(F.col("_rn2") <= F.col("_budget"))
            .drop("_rn2", "_budget")
        )

    if max_urls_per_iter is not None:
        # Global priority cap: TakeOrdered (top-k, not a full sort).
        df = df.orderBy(*order).limit(max_urls_per_iter)
    return df


def robots_filter(selected: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop URLs whose path starts with any disallowed prefix for its host.

    ``robots`` is (host, robots_disallow array<string>) — a small broadcast
    dimension.  Pure Column logic via ``exists`` over the prefix array.
    """
    if robots is None:
        return selected
    raw_path = F.parse_url(F.col("url"), F.lit("PATH"))
    path = F.when(
        raw_path.isNull() | (raw_path == ""), F.lit("/")
    ).otherwise(raw_path)
    joined = selected.join(F.broadcast(robots), "host", "left")
    denied = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.where(~denied).drop("robots_disallow")


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------


# RFC 9309 §2.4 allows imposing parse limits (Google caps robots.txt at
# 500 KiB).  A hostile body with e.g. 100k Disallow lines would bloat
# the broadcast dimension AND multiply robots_filter's per-URL prefix
# scan (the filter evaluates the URL path once per rule element) — cap
# the rules a single host can impose on the crawler.
MAX_ROBOTS_RULES = 1000


def parse_robots_txt(
    text: str, user_agent: str = "*", max_rules: int = MAX_ROBOTS_RULES
) -> list[str]:
    """Disallow prefixes for ``user_agent`` from a robots.txt body.

    RFC 9309-lite, matching ``robots_filter``'s prefix-drop semantics:
    groups are opened by one or more ``User-agent`` lines; the most
    specific group wins (an exact/substring agent match beats ``*``);
    empty ``Disallow:`` means allow-all and contributes nothing.  At
    most ``max_rules`` prefixes are returned (hostile-input bound; the
    FIRST rules win, matching top-down authoring convention).
    """
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    agents: list[str] = []
    disallows: list[str] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, disallows))
                agents, disallows = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key == "disallow":
            in_group_body = True
            if val:
                disallows.append(val)
        else:
            # ANY non-user-agent directive (Allow, Crawl-delay, Sitemap,
            # vendor extensions) ends the group's startgroupline section
            # (RFC 9309 §2.1) — otherwise a Crawl-delay between groups
            # would merge the next group's agents into this one
            in_group_body = True
    if agents:
        groups.append((agents, disallows))

    specific: list[str] | None = None
    wildcard: list[str] | None = None
    for g_agents, g_dis in groups:
        # One-directional match (RFC 9309: the group token identifies a
        # crawler; OUR token appearing inside an unrelated bot's longer
        # token must NOT claim that group — 'bot' vs 'badbot')
        if any(a != "*" and a in ua for a in g_agents):
            specific = g_dis if specific is None else specific + g_dis
        if "*" in g_agents:
            wildcard = g_dis if wildcard is None else wildcard + g_dis
    out = specific if specific is not None else (wildcard or [])
    return out[:max_rules]


def robots_table(spark, bodies: list[tuple[str, str]], user_agent: str = "*"):
    """(host, robots.txt body) pairs -> the (host, robots_disallow)
    dimension ``robots_filter`` consumes."""
    from go_crawler_spark.tables import ROBOTS_SCHEMA

    rows = [(h, parse_robots_txt(b, user_agent)) for h, b in bodies]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)
