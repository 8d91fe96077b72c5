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
