"""Snapshot table semantics: append, merge, time-travel, atomicity."""

from datetime import datetime, timezone

import pyspark.sql.functions as F

from go_crawler_spark import tables
from go_crawler_spark.lakehouse import Lakehouse

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2025, 1, 2, tzinfo=timezone.utc)
T2 = datetime(2025, 1, 3, tzinfo=timezone.utc)


def _seen(spark, rows):
    return spark.createDataFrame(rows, tables.URL_SEEN.schema)


def test_overwrite_read_empty(spark, tmp_warehouse):
    lake = Lakehouse(spark, tmp_warehouse)
    assert lake.read(tables.URL_SEEN).count() == 0
    lake.overwrite(tables.URL_SEEN, _seen(spark, [(1, "http://a", T0)]))
    assert lake.read(tables.URL_SEEN).count() == 1


def test_append_is_incremental(spark, tmp_warehouse):
    lake = Lakehouse(spark, tmp_warehouse)
    lake.overwrite(tables.URL_SEEN, _seen(spark, [(1, "http://a", T0)]))
    lake.append(tables.URL_SEEN, _seen(spark, [(2, "http://b", T1)]))
    got = {r.url_hash for r in lake.read(tables.URL_SEEN).collect()}
    assert got == {1, 2}


def test_merge_greatest_timestamp_wins(spark, tmp_warehouse):
    """Reference J1: ON CONFLICT keep GREATEST(retrieved_at) (cdb.go:14-18)."""
    lake = Lakehouse(spark, tmp_warehouse)
    lake.overwrite(tables.URL_SEEN, _seen(spark, [(1, "http://a", T1)]))
    # older update must NOT regress the timestamp
    lake.merge_upsert(
        tables.URL_SEEN, _seen(spark, [(1, "http://a", T0), (2, "http://b", T0)]),
        ["url_hash"], greatest_cols=["retrieved_at"],
    )
    got = {r.url_hash: r.retrieved_at for r in lake.read(tables.URL_SEEN).collect()}
    assert got[1].replace(tzinfo=timezone.utc) == T1  # kept newer
    assert got[2].replace(tzinfo=timezone.utc) == T0  # inserted


def test_merge_preserve_on_null(spark, tmp_warehouse):
    """Reference J4/S7: ES upsert preserves PageRank on re-index (es.go:128-154)."""
    lake = Lakehouse(spark, tmp_warehouse)
    docs = spark.createDataFrame(
        [(1, "http://a", "t1", "x1", T0, 0.5)], tables.DOCUMENTS.schema
    )
    lake.overwrite(tables.DOCUMENTS, docs)
    update = spark.createDataFrame(
        [(1, "http://a", "t2", "x2", T1, None)], tables.DOCUMENTS.schema
    )
    lake.merge_upsert(tables.DOCUMENTS, update, ["url_hash"], preserve_cols=["pagerank"])
    row = lake.read(tables.DOCUMENTS).collect()[0]
    assert row.title == "t2" and row.text == "x2"
    assert row.pagerank == 0.5  # preserved across reindex


def test_time_travel_and_rollback(spark, tmp_warehouse):
    lake = Lakehouse(spark, tmp_warehouse)
    s1 = lake.overwrite(tables.URL_SEEN, _seen(spark, [(1, "http://a", T0)]))
    s2 = lake.append(tables.URL_SEEN, _seen(spark, [(2, "http://b", T1)]))
    assert lake.read(tables.URL_SEEN, snapshot_id=s1).count() == 1
    assert lake.read(tables.URL_SEEN, snapshot_id=s2).count() == 2
    lake.set_current_snapshot("url_seen", s1)  # resume pins old snapshot
    assert lake.read(tables.URL_SEEN).count() == 1


def test_delete_where(spark, tmp_warehouse):
    lake = Lakehouse(spark, tmp_warehouse)
    lake.overwrite(
        tables.URL_SEEN, _seen(spark, [(1, "http://a", T0), (2, "http://b", T2)])
    )
    lake.delete_where(tables.URL_SEEN, F.col("retrieved_at") < F.lit(T1))
    got = [r.url_hash for r in lake.read(tables.URL_SEEN).collect()]
    assert got == [2]
