"""Custom stateful streaming operator: per-host crawl accounting.

The reference tracks per-pass processed counts in mutable service state
(crawler/crawler.go:45-50, service/crawler/crawler.go:180-183).  The
streaming analogue is an ``applyInPandasWithState`` operator that keeps a
running per-host ledger (pages fetched, bytes, first/last seen) across
micro-batches — the building block for streaming politeness enforcement
(a budget becomes "emit only while state.count < budget").

State: one struct per host, updated from Arrow batches, expired via a
processing-time timeout so dormant hosts don't accumulate forever —
bounded-state discipline at 10^8 hosts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
import pyspark.sql.types as T

STATE_SCHEMA = "pages LONG, bytes LONG, first_ts TIMESTAMP, last_ts TIMESTAMP"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("pages_total", T.LongType()),
        T.StructField("bytes_total", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("batch_pages", T.LongType()),
    ]
)


def _update_host(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    if state.hasTimedOut:
        state.remove()
        return
    pages = bytes_ = 0
    first_ts = last_ts = None
    for pdf in pdfs:
        pages += len(pdf)
        bytes_ += int(pdf["n_bytes"].sum())
        ts_min, ts_max = pdf["warc_ts"].min(), pdf["warc_ts"].max()
        first_ts = ts_min if first_ts is None else min(first_ts, ts_min)
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    if state.exists:
        p0, b0, f0, l0 = state.get
        pages_total, bytes_total = p0 + pages, b0 + bytes_
        first_total = min(f0, first_ts) if first_ts is not None else f0
        last_total = max(l0, last_ts) if last_ts is not None else l0
    else:
        pages_total, bytes_total, first_total, last_total = pages, bytes_, first_ts, last_ts
    state.update((pages_total, bytes_total, first_total, last_total))
    state.setTimeoutDuration(60 * 60 * 1000)  # expire hosts idle for 1h
    yield pd.DataFrame(
        [
            {
                "host": host,
                "pages_total": pages_total,
                "bytes_total": bytes_total,
                "first_ts": first_total,
                "last_ts": last_total,
                "batch_pages": pages,
            }
        ]
    )


GATE_STATE_SCHEMA = "taken LONG"

GATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),  # per-host admission index
    ]
)


def politeness_gate_stream(
    pages_stream: DataFrame,
    default_budget: int,
    host_budgets: dict[str, int] | None = None,
    timeout_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """Streaming politeness enforcement: the per-host budget as a stateful
    admission gate.

    The batch engine's politeness (operators/frontier.politeness_select,
    the reference's per-pass host budget) becomes ``emit rows only while
    state.taken < budget``: each host's state holds how many URLs have
    been admitted so far; a micro-batch admits at most the remaining
    budget (deterministically, ordered by (warc_ts, url) within the
    batch) and everything past it is dropped.  ``seq`` is the dense
    per-host admission index WITHIN the current budget window, so
    downstream can verify the per-window budget was never exceeded.

    The processing-time timeout is the BUDGET WINDOW: when a host goes
    idle past ``timeout_ms`` its counter expires, which both bounds
    state at 10^8 hosts and refreshes the budget — "at most ``budget``
    URLs per host per ``timeout_ms`` of activity", the reference's
    per-pass politeness semantics (a new crawl pass re-budgets every
    host).  ``seq`` therefore restarts per window by design.

    Rows whose URL has no parseable host are dropped (a null group key
    would violate the non-null output schema).
    """
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.urlops import host_col

    budgets = dict(host_budgets or {})

    def _gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            state.remove()
            return
        budget = int(budgets.get(host, default_budget))
        taken = int(state.get[0]) if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        room = max(budget - taken, 0)
        if room and len(batch):
            # stable within-batch order: admission is deterministic
            batch = batch.sort_values(["warc_ts", "url"], kind="mergesort")
            adm = batch.iloc[:room]
            adm = adm.assign(
                seq=pd.array(range(taken, taken + len(adm)), dtype="int64")
            )
            taken += len(adm)
            out = adm[["host", "url", "warc_ts", "seq"]]
        else:
            out = pd.DataFrame(columns=["host", "url", "warc_ts", "seq"])
        state.update((taken,))
        state.setTimeoutDuration(timeout_ms)
        yield out

    prepared = pages_stream.select(
        host_col("url").alias("host"), F.col("url"), F.col("warc_ts")
    ).where(F.col("host").isNotNull() & (F.col("host") != ""))
    return prepared.groupBy("host").applyInPandasWithState(
        _gate,
        outputStructType=GATE_OUTPUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def host_ledger_stream(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> per-host running ledger (one row per host per batch)."""
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.urlops import host_col

    prepared = pages_stream.select(
        host_col("url").alias("host"),
        F.col("warc_ts"),
        F.length("html").cast("long").alias("n_bytes"),
    ).where(F.col("host").isNotNull() & (F.col("host") != ""))
    return prepared.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
