"""Incremental snapshot-over-snapshot dedup (new batch vs accepted index)."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import incremental

BASE = "the quick brown fox jumps over the lazy dog and runs far away home"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact(spark):
    accepted = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
    idx = incremental.exact_hash_index(accepted)
    new = _docs(spark, [
        (10, "alpha beta gamma"),   # exact dup of accepted -> dropped
        (11, "fresh new text"),     # novel -> kept
        (12, "fresh new text"),     # in-batch dup of 11 -> dropped
        (13, "delta epsilon"),      # dup of accepted -> dropped
    ])
    kept = {r.doc_id for r in incremental.incremental_exact_dedup(new, idx).collect()}
    assert kept == {11}
    # schema passes through unchanged
    assert incremental.incremental_exact_dedup(new, idx).columns == new.columns


def test_incremental_minhash_matches_and_dedup(spark):
    near = BASE.replace("lazy", "sleepy")
    accepted = _docs(spark, [(1, BASE), (2, "an entirely different document "
                                            "about bucketed lakehouse compaction")])
    idx = incremental.minhash_index(accepted, shingle_k=3,
                                    jaccard_threshold=0.5)
    new = _docs(spark, [
        (10, near),                       # near-dup of accepted 1
        (11, "completely novel words about streaming politeness budgets"),
    ])
    matches = incremental.incremental_minhash_matches(
        new, idx, shingle_k=3, jaccard_threshold=0.5)
    got = [(r.new_id, r.old_id) for r in matches.collect()]
    assert got == [(10, 1)]
    assert all(r.jaccard >= 0.5 for r in matches.collect())

    kept = {r.doc_id
            for r in incremental.incremental_near_dedup(
                new, idx, shingle_k=3, jaccard_threshold=0.5).collect()}
    assert kept == {11}


def test_incremental_minhash_work_scales_with_batch_not_corpus(spark):
    """The probe is asymmetric: candidate generation joins the NEW
    band keys against the index — no old-old pairs are ever formed."""
    accepted = _docs(spark, [(i, f"{BASE} variant {i} with words {i*7}")
                             for i in range(50)])
    idx = incremental.minhash_index(accepted, shingle_k=3)
    new = _docs(spark, [(1000, "one single novel probe document here")])
    matches = incremental.incremental_minhash_matches(new, idx, shingle_k=3)
    assert matches.count() == 0
    plan = matches._jdf.queryExecution().executedPlan().toString()
    # the verify stage joins on new_id/old_id keys, never a cartesian
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_index_parameter_mismatch_is_callers_burden_documented(spark):
    """Banding params are the index's identity: a mismatched probe is
    not detected (band hashes simply never collide) — pin the documented
    behavior so it stays deliberate."""
    accepted = _docs(spark, [(1, BASE)])
    idx = incremental.minhash_index(accepted, shingle_k=3, num_hashes=64)
    new = _docs(spark, [(10, BASE)])  # identical text!
    # probing with different shingle_k misses even the identical doc
    m = incremental.incremental_minhash_matches(new, idx, shingle_k=5)
    assert m.count() == 0


def test_streaming_incremental_exact_matches_batch(spark, tmp_path):
    """The stream-static anti-join drops exactly what the batch op
    drops (new-vs-accepted half), per micro-batch."""
    from go_crawler_spark.streaming.corpus import streaming_incremental_exact

    accepted = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
    idx = incremental.exact_hash_index(accepted)
    new = _docs(spark, [
        (10, "alpha beta gamma"),   # accepted dup -> dropped
        (11, "fresh new text"),     # novel -> kept
        (12, "delta epsilon"),      # accepted dup -> dropped
        (13, "another novel doc"),  # novel -> kept
    ])
    src = str(tmp_path / "inc_stream")
    new.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(new.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_incremental_exact(stream, idx)
    q = (out.writeStream.format("memory").queryName("inc_exact")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.table("inc_exact").collect()}
    assert got == {11, 13}
    # schema passes through unchanged
    assert spark.table("inc_exact").columns == new.columns


# ---------------------------------------------------------------------------
# Persistent DedupIndexStore (VERDICT r4 item 6)
# ---------------------------------------------------------------------------


def test_dedup_index_store_three_snapshot_chain(spark, tmp_path):
    """build -> write -> reload -> probe -> append, three snapshots, with
    a RESTART (fresh store object over the same warehouse) between each:
    exact dups and near-dups of ANY earlier snapshot are dropped, and
    the indexes grow append-only."""
    root = str(tmp_path / "wh")
    near1 = BASE.replace("lazy", "sleepy")
    near2 = BASE.replace("quick", "rapid")

    s1 = incremental.DedupIndexStore(
        spark, root, shingle_k=3, jaccard_threshold=0.5
    )
    snap1 = _docs(spark, [(1, BASE), (2, "bucketed lakehouse compaction notes")])
    kept1 = {r.doc_id for r in s1.accept_snapshot(snap1).collect()}
    assert kept1 == {1, 2}

    # restart: new store object, same warehouse dir
    s2 = incremental.DedupIndexStore(
        spark, root, shingle_k=3, jaccard_threshold=0.5
    )
    snap2 = _docs(spark, [
        (10, BASE),          # exact dup of snapshot-1 doc 1
        (11, near1),         # near-dup of snapshot-1 doc 1
        (12, "totally novel second snapshot document words"),
    ])
    kept2 = {r.doc_id for r in s2.accept_snapshot(snap2).collect()}
    assert kept2 == {12}

    s3 = incremental.DedupIndexStore(
        spark, root, shingle_k=3, jaccard_threshold=0.5
    )
    snap3 = _docs(spark, [
        (20, near2),  # near-dup of a SNAPSHOT-1 doc (two restarts ago)
        (21, "totally novel second snapshot document words"),  # exact dup of 12
        (22, "genuinely fresh third snapshot material here"),
    ])
    kept3 = {r.doc_id for r in s3.accept_snapshot(snap3).collect()}
    assert kept3 == {22}

    # the indexes hold exactly the survivors (1, 2, 12, 22)
    assert s3.lake.read(s3.shingles_spec).count() == 4
    assert s3.exact_index().count() == 4
    # append-only: three snapshots committed per table
    m = s3.lake._read_manifest("dedup_exact_index")
    assert len(m["snapshots"]) == 3


def test_dedup_index_store_param_mismatch_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "wh")
    incremental.DedupIndexStore(spark, root, shingle_k=3)
    with pytest.raises(ValueError, match="banding parameters"):
        incremental.DedupIndexStore(spark, root, shingle_k=5)


def test_dedup_index_store_probe_prunes_exact_buckets(spark, tmp_path):
    """The exact-index probe reads only the manifest dirs for the
    buckets the batch's hashes can hit (Iceberg partition-pruning
    contract) — with a 1-doc probe, strictly fewer than num_buckets
    bucket dirs are even listed."""
    root = str(tmp_path / "wh")
    store = incremental.DedupIndexStore(
        spark, root, shingle_k=3, num_buckets=8
    )
    snap1 = _docs(
        spark, [(i, f"{BASE} variant {i} number {i * 13}") for i in range(40)]
    )
    store.accept_snapshot(snap1)

    from go_crawler_spark.functions.dedup import text_hash_cols

    probe_rows = _docs(spark, [(100, "one single probe document")])
    h1, h2 = text_hash_cols("text")
    keyed = probe_rows.withColumn("_h1", h1).withColumn("_h2", h2)
    pruned = store.exact_index(probe=keyed)
    full = store.exact_index()
    # the pruned read sees a strict subset of the index rows (the other
    # buckets' dirs are never even listed — manifest-level pruning)
    assert pruned.count() < full.count()
    # manifest-level check: the 1-doc probe touches exactly 1 bucket
    assert len(store._touched_buckets(keyed, "_h1")) == 1
    # and correctness: the pruned read still answers the probe exactly
    joined = keyed.join(
        pruned.select(F.col("h1").alias("_h1"), F.col("h2").alias("_h2")),
        ["_h1", "_h2"],
        "left_anti",
    )
    assert joined.count() == 1  # novel doc survives the pruned anti-join
