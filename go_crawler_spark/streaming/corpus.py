"""Streaming corpus preparation: the streamable prefix of
``functions/corpus.prepare_training_corpus`` on a document stream.

What streams and what cannot — stated explicitly, because the split is
the design:

* **quality gate + Gopher repetition cuts (+ optional C4 cleaning and
  Gopher table-A1 verdict) + hash split** — stateless pure-Column
  expressions, identical plans to batch (the gate is literally
  ``corpus.apply_heuristic_gate``), applied per micro-batch;
* **exact dedup** — bounded state: ``dropDuplicatesWithinWatermark`` on
  the same 128-bit text-hash pair as ``dedup.exact_dedup``
  (``dedup.text_hash_cols``, one shared definition), so state expires
  with the watermark.  First-arrival wins (a stream has no global
  min-id view; under one delivery order this equals the batch survivor
  set by hash);
* **MinHash near-dup** — deliberately NOT here: banded LSH is a
  self-join across the whole corpus.  Run the batch funnel's near-dup
  stage periodically over the accumulated table, the same cadence
  pattern as the reference's hourly ranker pass
  (service/ranker/ranker.go:123-126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from go_crawler_spark.functions import sampling
from go_crawler_spark.functions.corpus import CorpusConfig
from go_crawler_spark.functions.dedup import (
    dedup_survivors_from_pairs,
    minhash_near_dups,
    text_hash_cols,
)


def streaming_quality_gate(
    docs_stream: DataFrame,
    config: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
) -> DataFrame:
    """Quality + repetition gate on a streaming documents frame —
    stateless, so it composes with any downstream sink/trigger.  Keeps
    the input schema.  Delegates to ``corpus.apply_heuristic_gate`` —
    the SAME code the batch funnel runs (including the optional C4
    cleaning and Gopher table-A1 verdict, both stateless), so batch
    and stream cannot drift."""
    from go_crawler_spark.functions.corpus import apply_heuristic_gate

    _, filtered = apply_heuristic_gate(docs_stream, config, text_col=text_col)
    return filtered


def streaming_corpus_prepare(
    docs_stream: DataFrame,
    config: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Gate -> exact dedup -> split, streaming end-to-end.

    ``watermark=(ts_col, delay)`` bounds the dedup state via
    ``dropDuplicatesWithinWatermark``: state for a hash is evicted once
    the watermark passes its event time + delay, after which a
    re-arrival of the same text is re-admitted.  (A plain watermarked
    ``dropDuplicates`` on the hash subset would NOT bound state — Spark
    only evicts dedup state when the event-time column is among the
    dedup keys — and would silently drop late documents instead of
    deduping them.)  ``None`` keeps state for the life of the query —
    exact, but unbounded, so only for finite backfills.
    """
    gated = streaming_quality_gate(docs_stream, config, text_col)
    h1, h2 = text_hash_cols(text_col)
    hashed = gated.withColumn("_h1", h1).withColumn("_h2", h2)
    if watermark is not None:
        ts_col, delay = watermark
        deduped = hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["_h1", "_h2"]
        )
    else:
        deduped = hashed.dropDuplicates(["_h1", "_h2"])
    deduped = deduped.drop("_h1", "_h2")
    if config.split_weights:
        deduped = deduped.withColumn(
            "split", sampling.split_col(config.split_weights, id_col, config.seed)
        )
    return deduped


def periodic_near_dup_pass(
    accumulated: DataFrame,
    config: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The non-streamable funnel suffix, run at batch cadence over the
    ACCUMULATED stream survivors (the reference's hourly-ranker cadence
    pattern, service/ranker/ranker.go:123-126): banded MinHash-LSH
    near-dup + component-min-id survivor selection.  Composing
    ``streaming_corpus_prepare`` (gate -> exact dedup -> split, per
    micro-batch) with this pass over its sink table reproduces the full
    batch funnel ``prepare_training_corpus(...)["corpus"]`` — the
    ``split`` column assigned by the stream stays valid because the
    hash split is subset-stable (a pure function of ``id_col``).  The
    parity is pinned by test_sources_streaming's composition test."""
    pairs = minhash_near_dups(
        accumulated,
        text_col=text_col,
        id_col=id_col,
        num_hashes=config.minhash_num_hashes,
        bands=config.minhash_bands,
        shingle_k=config.minhash_shingle_k,
        jaccard_threshold=config.minhash_threshold,
        spread_partitions=config.spread_partitions,
    )
    return dedup_survivors_from_pairs(accumulated, pairs, id_col)


def streaming_incremental_exact(
    docs_stream: DataFrame,
    accepted_index: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-over-snapshot exact dedup ON THE STREAM: drop every
    arriving doc whose 128-bit text hash is already in the accepted
    corpus's index (``incremental.exact_hash_index``, a STATIC frame —
    the previous snapshot's persisted table).  Stream-static left-anti
    equi-join: per micro-batch work scales with the batch, state-free
    (the index is the state, owned by the lakehouse, re-read per
    restart).  Composes before/after ``streaming_corpus_prepare`` —
    in-batch dedup stays that function's watermark-bounded job; this
    handles only the new-vs-accepted half, mirroring
    ``incremental.incremental_exact_dedup`` exactly — structurally:
    both call the ONE shared ``incremental.anti_join_exact_index``
    kernel, so they cannot drift."""
    from go_crawler_spark.functions.incremental import anti_join_exact_index

    return anti_join_exact_index(docs_stream, accepted_index, text_col)
