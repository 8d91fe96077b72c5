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
    "DedupIndexStore",
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


# ---------------------------------------------------------------------------
# Persistent index store (VERDICT r4 item 6)
# ---------------------------------------------------------------------------

import json as _json
import os as _os

import pyspark.sql.types as T

from go_crawler_spark.lakehouse import Lakehouse, TableSpec, bucket_col

_EXACT_SCHEMA = T.StructType(
    [T.StructField("h1", T.LongType()), T.StructField("h2", T.LongType())]
)
_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)
_SHINGLES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("_sh", T.ArrayType(T.LongType())),
    ]
)


class DedupIndexStore:
    """The incremental-dedup indexes as PERSISTED lakehouse tables.

    ``exact_hash_index`` / ``minhash_index`` return plain DataFrames
    "meant to be written"; this class is the thing that writes them —
    the same snapshot-versioned bucketed tables the crawl's URL-seen
    state uses (lakehouse.py), so a dedup chain survives process
    restarts and each snapshot's work appends O(new-batch) index rows
    (Iceberg fast-append), never rewriting the accumulated index.

    Tables (all bucketed, so probes prune at the MANIFEST level):

    * ``dedup_exact_index``     (h1, h2)                 bucket(h1)
    * ``dedup_minhash_bands``   (id, band_idx, band_hash) bucket(band_hash)
    * ``dedup_minhash_shingles``(id, _sh)                 bucket(id)

    Banding parameters are part of the index's identity (probing with a
    different (num_hashes, bands, shingle_k) would produce meaningless
    band keys), so they are persisted in ``dedup_index_params.json`` at
    the warehouse root on first open and VALIDATED on every reopen — a
    mismatched reopen fails loudly instead of silently missing dups.
    """

    PARAMS_FILE = "dedup_index_params.json"

    def __init__(
        self,
        spark,
        root: str,
        num_hashes: int = 64,
        bands: int | None = None,
        shingle_k: int = 5,
        jaccard_threshold: float = 0.8,
        num_buckets: int = 32,
    ):
        if bands is None:
            bands = choose_bands(num_hashes, jaccard_threshold)
        params = {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
            "jaccard_threshold": jaccard_threshold,
            "num_buckets": num_buckets,
        }
        _os.makedirs(root, exist_ok=True)
        ppath = _os.path.join(root, self.PARAMS_FILE)
        if _os.path.exists(ppath):
            with open(ppath) as f:
                persisted = _json.load(f)
            if persisted != params:
                raise ValueError(
                    f"dedup index at {root} was built with {persisted}; "
                    f"reopened with {params} — banding parameters are part "
                    "of the index identity, probe with the original ones"
                )
        else:
            tmp = ppath + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(params, f)
            _os.replace(tmp, ppath)
        self.params = params
        self.lake = Lakehouse(spark, root)
        nb = num_buckets
        self.exact_spec = TableSpec(
            "dedup_exact_index", _EXACT_SCHEMA
        ).with_buckets("h1", nb)
        self.bands_spec = TableSpec(
            "dedup_minhash_bands", _BANDS_SCHEMA
        ).with_buckets("band_hash", nb)
        self.shingles_spec = TableSpec(
            "dedup_minhash_shingles", _SHINGLES_SCHEMA
        ).with_buckets("id", nb)

    # -- reads (probe side) -------------------------------------------------

    def _touched_buckets(self, df: DataFrame, col: str) -> list[int]:
        """The ≤num_buckets distinct index buckets the probe batch can
        possibly hit — a bounded collect (same pattern as the lakehouse
        merge path), turning the index read into a manifest-level prune.
        ``bucket_col`` is the table's own row→bucket transform, so the
        probe column's buckets line up with the manifest's dirs."""
        n = self.params["num_buckets"]
        rows = df.select(bucket_col(col, n).alias("_b")).distinct().collect()
        return sorted(r._b for r in rows)

    def exact_index(self, probe: DataFrame | None = None) -> DataFrame:
        """The accepted (h1, h2) set; pass ``probe`` (a frame carrying
        ``_h1`` per anti_join_exact_index's keying — any frame with an
        ``h1``-hashable column named ``_h1``) to prune the read to the
        buckets the probe can hit."""
        if probe is None:
            return self.lake.read(self.exact_spec)
        bl = self._touched_buckets(probe, "_h1")
        return self.lake.read(self.exact_spec, buckets=bl)

    def minhash_indexes(self) -> dict[str, DataFrame]:
        return {
            "bands": self.lake.read(self.bands_spec),
            "shingles": self.lake.read(self.shingles_spec),
        }

    # -- the per-snapshot accept --------------------------------------------

    def accept_snapshot(
        self,
        new_df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Dedup ``new_df`` against everything previously accepted, then
        append the SURVIVORS' index entries — the per-snapshot step of
        the RefinedWeb/Dolma dump-over-dump chain.

        Shape: (1) in-batch exact dedup + anti-join the exact index
        (pruned to the batch's hash buckets); (2) MinHash-probe the band
        index asymmetrically and drop near-dup matches; (3) fast-append
        the survivors' (h1,h2), band keys, and shingle sets.  The
        survivors frame is persisted for the duration (it feeds three
        appends + the return), then handed back still-cached — work is
        O(new batch), never O(accumulated corpus).

        In-batch NEAR-dups are deliberately not resolved here (the
        intra-batch ops own that — see module docstring); two mutual
        near-dups arriving in ONE snapshot both enter the index, exactly
        like a fresh corpus before its intra-corpus near-dedup pass.

        The three appends are each atomic (lakehouse manifest swap) but
        not jointly transactional: a crash between them can leave a doc
        exact-indexed but not band-indexed.  Exact dedup stays correct
        (re-accepting the same snapshot idempotently re-drops its docs),
        but the orphaned docs' band entries stay missing — near-dups of
        them in LATER snapshots would be missed until the entries are
        rebuilt (``minhash_index`` over the crashed batch's survivors,
        then two appends).  With a real Iceberg catalog the three
        appends become one multi-table commit and the window vanishes.
        """
        p = self.params
        h1, h2 = text_hash_cols(text_col)
        batch = exact_dedup(new_df, text_col, id_col)
        # Persist the keyed batch for the duration of the accept: its
        # lineage (the exact-dedup shuffle + per-text hashing) otherwise
        # recomputes for each consumer — the touched-bucket collect, the
        # anti-join, and the near-dedup probe each trigger it.
        keyed = (
            batch.withColumn("_h1", h1).withColumn("_h2", h2).persist()
        )
        exact_idx = self.exact_index(probe=keyed)
        fresh = (
            keyed.join(
                exact_idx.select(
                    F.col("h1").alias("_h1"), F.col("h2").alias("_h2")
                ),
                ["_h1", "_h2"],
                "left_anti",
            )
            .drop("_h1", "_h2")
        )
        survivors = incremental_near_dedup(
            fresh,
            self.minhash_indexes(),
            text_col,
            id_col,
            p["num_hashes"],
            p["bands"],
            p["shingle_k"],
            p["jaccard_threshold"],
        ).persist()
        try:
            self.lake.append(
                self.exact_spec, exact_hash_index(survivors, text_col)
            )
            entries = minhash_index(
                survivors,
                text_col,
                id_col,
                p["num_hashes"],
                p["bands"],
                p["shingle_k"],
                p["jaccard_threshold"],
            )
            self.lake.append(self.bands_spec, entries["bands"])
            self.lake.append(self.shingles_spec, entries["shingles"])
        except Exception:
            survivors.unpersist()
            raise
        finally:
            # survivors' cache is populated by the first append above,
            # so the upstream keyed batch is no longer needed either way
            keyed.unpersist()
        return survivors
