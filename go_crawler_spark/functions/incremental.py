"""Incremental (snapshot-over-snapshot) deduplication.

A production corpus is not built once: every new crawl snapshot must be
deduplicated AGAINST EVERYTHING ALREADY ACCEPTED (Common Crawl dumps
overlap heavily month to month; RefinedWeb and Dolma both dedup each
dump against the accumulated corpus).  Re-running the full self-join
over old ∪ new every snapshot is O((N+n)²)-ish work for an O(n·N/B)
question — the right shape is a persisted INDEX the new batch probes:

* **exact**: the index is the distinct 128-bit text-hash set of every
  accepted document (two 64-bit columns — the same
  ``dedup.text_hash_cols`` pair the whole package keys on).  A new
  batch dedups within itself, then LEFT-ANTI-joins the index.  One
  equi-join; the index is O(corpus) rows of 16 bytes.
* **near (MinHash-LSH)**: the index stores each accepted doc's LSH
  band keys (ids only) and its hashed shingle set.  A new batch is
  banded the same way and equi-joins the band index — an ASYMMETRIC
  probe, never a self-join over old ∪ new — then candidate pairs are
  verified with exact Jaccard on the re-joined shingle sets, exactly
  like ``dedup.minhash_near_dups``.  Work scales with the NEW batch
  (times band collision rate), not with the accumulated corpus.

Both index builders return plain DataFrames meant to be WRITTEN (the
lakehouse/Iceberg table is the state store, as with the crawl's
URL-seen set); the next snapshot's index is the append-only union of
the old index and the new survivors' entries.  In-batch duplicates are
handled by the
standard intra-batch ops first (``exact_dedup`` /
``minhash_near_dups``) — this module owns only the new-vs-accepted
half.

No counterpart in the Go reference (its crawler re-visits URLs but
never dedups content); beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.dedup import (
    choose_bands,
    exact_dedup,
    jaccard_col,
    lsh_bands,
    minhash_prepared,
    text_hash_cols,
)

__all__ = [
    "exact_hash_index",
    "anti_join_exact_index",
    "incremental_exact_dedup",
    "minhash_index",
    "incremental_minhash_matches",
    "incremental_near_dedup",
]


def exact_hash_index(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The accepted corpus's distinct (h1, h2) text-hash set (id-free
    by design: the index answers "is this text known", never "whose")."""
    h1, h2 = text_hash_cols(text_col)
    return df.select(h1.alias("h1"), h2.alias("h2")).distinct()


def anti_join_exact_index(
    df: DataFrame, index: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop rows whose text hash is in the accepted index — the ONE
    shared new-vs-accepted kernel (batch incremental_exact_dedup and
    streaming.corpus.streaming_incremental_exact both call this, so
    batch and stream cannot drift).  Returns surviving rows unchanged;
    works on batch AND streaming frames (stream-static left-anti)."""
    h1, h2 = text_hash_cols(text_col)
    keyed = df.withColumn("_h1", h1).withColumn("_h2", h2)
    return (
        keyed.join(
            index.select(
                F.col("h1").alias("_h1"), F.col("h2").alias("_h2")
            ),
            ["_h1", "_h2"],
            "left_anti",
        )
        .drop("_h1", "_h2")
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """New-batch exact survivors: dedup within the batch (min-id wins,
    the package rule), then drop every doc whose text hash is already
    in the accepted index.  Returns surviving rows unchanged."""
    batch = exact_dedup(new_df, text_col, id_col)
    return anti_join_exact_index(batch, index, text_col)


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> dict[str, DataFrame]:
    """Build the accepted-corpus MinHash index:
    ``{"bands": (id, band_idx, band_hash), "shingles": (id, _sh)}``.
    Banding parameters are part of the index's identity — probe with
    the SAME (num_hashes, bands, shingle_k) or the band keys are
    meaningless."""
    if bands is None:
        bands = choose_bands(num_hashes, jaccard_threshold)
    prepared = minhash_prepared(df, text_col, id_col, num_hashes, shingle_k)
    banded = lsh_bands(
        prepared.select("id", "minhash_sig"), "minhash_sig", bands, num_hashes
    ).select("id", "band_idx", "band_hash")
    return {"bands": banded, "shingles": prepared.select("id", "_sh")}


def incremental_minhash_matches(
    new_df: DataFrame,
    index: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """(new_id, old_id, jaccard) for every new doc near-duplicating an
    indexed doc: band the new batch, equi-join the band index
    (asymmetric probe — ids only ride the shuffle), dedup candidate
    pairs, verify with exact Jaccard on the re-joined shingle sets."""
    if bands is None:
        bands = choose_bands(num_hashes, jaccard_threshold)
    prepared = minhash_prepared(new_df, text_col, id_col, num_hashes, shingle_k)
    new_banded = lsh_bands(
        prepared.select("id", "minhash_sig"), "minhash_sig", bands, num_hashes
    ).select(
        F.col("id").alias("new_id"), "band_idx", "band_hash"
    )
    cand = (
        new_banded.join(
            index["bands"].select(
                F.col("id").alias("old_id"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("new_id", "old_id")
        .dropDuplicates(["new_id", "old_id"])
    )
    verified = (
        cand.join(
            prepared.select(F.col("id").alias("new_id"), F.col("_sh").alias("sh_n")),
            "new_id",
        )
        .join(
            index["shingles"].select(
                F.col("id").alias("old_id"), F.col("_sh").alias("sh_o")
            ),
            "old_id",
        )
        .withColumn("jaccard", jaccard_col(F.col("sh_n"), F.col("sh_o")))
    )
    return verified.where(F.col("jaccard") >= jaccard_threshold).select(
        "new_id", "old_id", "jaccard"
    )


def incremental_near_dedup(
    new_df: DataFrame,
    index: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """New-batch rows that near-duplicate NOTHING in the accepted
    index (in-batch near-dups are the intra-batch ops' job)."""
    matches = incremental_minhash_matches(
        new_df, index, text_col, id_col,
        num_hashes, bands, shingle_k, jaccard_threshold,
    )
    return new_df.join(
        matches.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
