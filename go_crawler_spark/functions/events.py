"""Event-stream operators over the events table: sessionization.

Gap-based sessionization — the canonical clickstream/telemetry op a
training-data pipeline needs and the reference has no analogue for: an
event starts a new session when it is the user's first event or follows
the previous one by more than ``gap``.  Pure window arithmetic
(lag + running sum), one shuffle on the user key, no UDFs — at 100 TB
this is a single hash-partitioned pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_idx`` (0-based per user) and ``session_id``
    (user:idx) to every event.

    Comparisons run in integer microsecond deltas so any SQL engine
    reproduces the boundaries exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = int(gap_minutes) * 60 * 1_000_000
    # timestampdiff works for TIMESTAMP and TIMESTAMP_NTZ alike and is
    # timezone-independent (pure microsecond arithmetic)
    delta_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    new_session = (prev.isNull() | (delta_us > F.lit(gap_us))).cast("long")
    # running count of session starts - 1 == 0-based session index
    sess_idx = (
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    return events.withColumn("session_idx", sess_idx).withColumn(
        "session_id",
        F.concat_ws(":", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per session: bounds, event count, summed value."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )
