"""Distributed BPE training — classic golden + differential vs the
single-threaded reference trainer."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import bpe

SF = "/root/testdata/sf0.001"


def test_classic_sennrich_golden(spark):
    """The paper's canonical example: {low:5, lower:2, newest:6,
    widest:3}.  (e,s)/(es,t)/(est,</w>) tie at 9 — our pinned
    tie-break (count desc, pair asc) resolves them in that order."""
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]
    ref = bpe.train_bpe_reference(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 5
    )
    assert merges == ref


def test_differential_vs_reference_on_testdata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    wc = bpe.word_counts(docs)
    counts = {r.word: r.cnt for r in wc.collect()}
    k = 12
    got = bpe.train_bpe(wc, num_merges=k, from_word_counts=True)
    want = bpe.train_bpe_reference(counts, k)
    assert got == want
    assert len(got) == k  # real corpus: never runs dry this early


def test_fuse_is_left_to_right_greedy(spark):
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    wc = bpe.word_counts(df)
    vocab = bpe._initial_symbols(wc)
    fused = vocab.select(
        bpe._fuse_col(F.col("syms"), "a", "a").alias("s")
    ).collect()[0].s
    assert fused == ["aa", "a", "</w>"]


def test_encode_golden_and_counts(spark):
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
              ("lo", "w")]
    df = spark.createDataFrame(
        [(1, "lowest low"), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe.bpe_encode(df, merges).collect()}
    assert rows[1].bpe_tokens == ["low", "est</w>", "low", "</w>"]
    assert rows[1].n_bpe_tokens == 4
    assert rows[2].bpe_tokens == [] and rows[2].n_bpe_tokens == 0


def test_early_stop_and_validation(spark):
    # every word unique, every pair count 1 -> nothing worth merging
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe.train_bpe(df, num_merges=5) == []
    with pytest.raises(ValueError):
        bpe.train_bpe(df, num_merges=0)


def test_encode_memoized_bit_identical_to_uncached(spark):
    """The distinct-word memo cache (VERDICT r4 item 3) must not change
    a single token: memoize=True and memoize=False produce identical
    encodings over a corpus with heavy word repetition (the cache-hit
    path) and unique tails (the miss path)."""
    df = spark.createDataFrame(
        [(i, f"lower lowest newest wider unique{i} lowest lower") for i in range(30)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(df, num_merges=12)
    a = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(df, merges).collect()}
    b = {r.doc_id: r.bpe_tokens
         for r in bpe.bpe_encode(df, merges, memoize=False).collect()}
    assert a == b
