"""End-to-end training-corpus preparation.

The composition a 100 TB pipeline runs over raw crawled documents before
tokenizer/LM training, in the standard order (C4/Gopher filtering, then
exact dedup, then near dedup, then split) — cheap zero-shuffle column
filters first, so the shuffling dedup stages see the smallest possible
corpus:

1. quality gate  — token count, quality score, optional language
                   allow-list (``textstats.with_text_stats``) and the
                   Gopher repetition cuts (``textstats._with_repetition``),
                   all pure Column expressions, zero shuffle;
2. exact dedup   — min-id survivor per 128-bit text hash
                   (``dedup.exact_dedup``), one shuffle;
3. near dedup    — MinHash-LSH pair graph collapsed to connected
                   components, one survivor per cluster
                   (``dedup.minhash_near_dups`` +
                   ``dedup.dedup_survivors_from_pairs``);
4. split         — deterministic, subset-stable train/val/test hash
                   split (``sampling.hash_split``), zero shuffle.

Every stage is lazy: ``prepare_training_corpus`` returns the per-stage
DataFrames without triggering a job, and ``corpus_report`` (one action
per stage, caller opts in) counts the funnel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions import sampling
from go_crawler_spark.functions.dedup import (
    dedup_survivors_from_pairs,
    exact_dedup,
    minhash_near_dups,
)
from go_crawler_spark.functions.textstats import with_text_stats


@dataclass(frozen=True)
class CorpusConfig:
    """Thresholds for :func:`prepare_training_corpus`.

    Defaults follow the published filters: Gopher (Rae et al. 2021,
    table A1) cuts documents whose most frequent 2-gram covers > 0.20 of
    characters or whose duplicate 5-grams cover > 0.15; the quality and
    length gates use this package's ``quality_score`` scale.

    Known divergence: ``dup5gram_char_frac`` counts count*len over EVERY
    occurrence of a duplicated 5-gram (overlapping occurrences each
    contribute their full length, so the fraction can exceed 1.0),
    which is STRICTER than the Gopher/DataTrove definition (each covered
    character counted once).  The oracle and tests encode the same rule,
    so the engine is internally consistent, but highly repetitive
    documents are cut slightly more aggressively than by the published
    filter.  See ``textstats.repetition_stats``.
    """

    min_tokens: int = 10
    min_quality: float = 0.3
    langs: tuple[str, ...] | None = None  # None = keep every language
    max_top2gram_frac: float = 0.20
    max_dup5gram_frac: float = 0.15
    minhash_threshold: float = 0.8
    minhash_shingle_k: int = 5
    minhash_num_hashes: int = 64
    minhash_bands: int | None = None
    split_weights: dict[str, float] | None = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    seed: int = 42
    # Truncate the exact-deduped frame (lazy localCheckpoint): the
    # exact-dedup semi-join, the near-dup pair join and the survivor
    # anti-join each re-derive their input, so without truncation the
    # quality/repetition filter chain is recomputed up to 4x per action.
    # Unlike persist(), localCheckpoint blocks are reclaimed by the
    # ContextCleaner when the frame goes out of scope, so repeated
    # invocations (bench/correctness harnesses) cannot leak pinned
    # cache entries.  Off by default — at 100 TB write the stage to a
    # table instead of materializing it in the block managers.
    persist_intermediate: bool = False
    # Repartition width for the minhash signature stage.  None (default)
    # trusts the input layout, honoring minhash_near_dups' contract that
    # a well-partitioned 100 TB scan must never be down-partitioned or
    # re-shuffled; set (e.g. to defaultParallelism) only for few-file
    # inputs whose signatures would otherwise compute in a handful of
    # tasks.
    spread_partitions: int | None = None
    # SemDeDup stage (runs only when prepare_training_corpus is given an
    # embeddings frame): cosine threshold for the within-cluster drop and
    # the centroid count.  0.4 matches the package's embedding near-dup
    # threshold for the synthetic testdata; the paper uses ~0.95+ on real
    # OpenCLIP embeddings.
    semantic_threshold: float = 0.4
    semantic_num_centroids: int = 8
    # LM perplexity gate (CCNet's defining filter): drop the worst
    # lm_tail_frac of surviving docs by bigram perplexity, AFTER dedup
    # (the published order — dedup first so boilerplate copies don't
    # distort the percentile).  None (default) = stage off.  The model
    # trains on a reference corpus when one is passed to
    # prepare_training_corpus, else on the survivors themselves.
    lm_tail_frac: float | None = None
    lm_alpha: float = 0.1
    # NB quality-classifier gate (GPT-3's Common-Crawl filter): runs
    # right after the heuristic gate, BEFORE dedup (the published
    # order — Brown et al. 2020 classify raw CC, then fuzzy-dedup the
    # survivors).  None (default) = stage off; set the Pareto shape
    # (GPT-3 uses 9) and pass classifier_positive to
    # prepare_training_corpus.
    classifier_pareto_shape: float | None = None
    classifier_alpha: float = 0.5
    # DSIR selection (Xie et al. 2023): final sized selection from the
    # cleaned pool by Gumbel top-k over importance weights against a
    # target-domain corpus.  None (default) = stage off; set the kept
    # count and pass dsir_target to prepare_training_corpus.
    dsir_k: int | None = None
    dsir_num_buckets: int = 10_000
    # C4 line-level cleaning (Raffel et al. 2020): rewrite text by the
    # line rules and drop pages by the page rules BEFORE any other
    # stage (the published order — C4 cleans raw CC first).  Off by
    # default: it rewrites the text column, so downstream hashes change.
    c4_clean: bool = False
    # Gopher table-A1 quality verdict (non-repetition half) as an
    # additional heuristic-gate predicate.
    gopher_quality: bool = False
    # Gopher table-A1 duplicate-line/paragraph rules (rows 1-4) as an
    # additional heuristic-gate predicate.  NULL verdicts (empty docs)
    # pass the cut like the other repetition gates (min_tokens owns
    # dropping them).
    gopher_dup_structure: bool = False


def quality_condition(config: CorpusConfig) -> Column:
    """The quality-gate predicate over ``with_text_stats(repetition=True)``
    columns — shared by the batch funnel and the streaming gate so the
    two can never drift.

    Repetition fractions are NULL for docs too short to define them
    (< 5 tokens); NULL must PASS the cut — otherwise ``NULL <= max`` is
    NULL and ``where()`` would silently drop short docs the configured
    ``min_tokens`` gate meant to keep.
    """
    cond = (
        (F.col("n_tokens") >= config.min_tokens)
        & (F.col("quality_score") >= config.min_quality)
        & F.coalesce(
            F.col("top2gram_char_frac") <= config.max_top2gram_frac, F.lit(True)
        )
        & F.coalesce(
            F.col("dup5gram_char_frac") <= config.max_dup5gram_frac, F.lit(True)
        )
    )
    if config.langs is not None:
        cond = cond & F.col("lang_guess").isin(*config.langs)
    return cond


def apply_heuristic_gate(
    df: DataFrame,
    config: CorpusConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The stateless gate prefix — optional C4 line cleaning, stats
    annotation, and the quality/repetition(/Gopher-table-A1) predicate
    — shared VERBATIM by the batch funnel and the streaming gate so the
    two can never drift.  Returns ``(annotated, filtered)``; every
    stage is a pure-Column projection/filter, so it runs identically on
    batch and streaming frames."""
    if config.c4_clean:
        from go_crawler_spark.functions.c4 import c4_clean as _c4

        df = _c4(df, text_col=text_col, id_col=id_col).drop(
            "n_lines_kept", "n_sentences"
        )
    annotated = with_text_stats(df, text_col, repetition=True)
    gate = quality_condition(config)
    if config.gopher_quality:
        from go_crawler_spark.functions.textstats import gopher_quality_stats

        annotated = gopher_quality_stats(annotated, text_col=text_col)
        gate = gate & F.col("gopher_quality_pass")
    if config.gopher_dup_structure:
        from go_crawler_spark.functions.textstats import gopher_dup_structure

        annotated = gopher_dup_structure(
            annotated, text_col=text_col, id_col=id_col
        )
        gate = gate & F.coalesce(
            F.col("gopher_dup_structure_pass"), F.lit(True)
        )
    # Pushdown barrier (r6, guide §2.1 order-of-operations): the gate
    # references the annotated stats columns, and predicate pushdown
    # would substitute their DEFINITIONS into the filter and sink it to
    # the scan — re-evaluating the tokenizer split once per reference
    # (lambda-bearing expressions are excluded from Catalyst's
    # subexpression elimination, the kgrams_col hazard) and, worse,
    # BELOW any spreading exchange, so the whole inlined gate ran in
    # the one scan task of a single-file input (measured 5.7s -> ~1s at
    # sf0.1).  Wrapping the gate in a CASE WHEN on a constant-true
    # NON-DETERMINISTIC guard makes the predicate one non-splittable,
    # non-pushable conjunct: the Filter stays above the stats
    # projections and reads attributes, so every stat (and the split)
    # evaluates exactly once per row at full parallelism.  A bare
    # `gate & guard` does NOT work — Catalyst splits conjunctions and
    # pushes the deterministic half anyway.  Semantics are unchanged:
    # spark_partition_id() >= 0 is always true.
    guarded = F.when(F.spark_partition_id() >= 0, gate)
    return annotated, annotated.where(guarded).select(*df.columns)


def prepare_training_corpus(
    df: DataFrame,
    config: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    lm_reference: DataFrame | None = None,
    classifier_positive: DataFrame | None = None,
    dsir_target: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run the full preparation funnel; returns the per-stage frames
    ``{"annotated", "filtered", "deduped", "corpus"}`` (all lazy).

    ``annotated`` carries every stats column; later stages keep the
    original ``df`` schema (plus ``split`` on ``corpus`` when
    ``config.split_weights`` is set).

    When ``embeddings`` is given (``(emb_id_col, emb_col)`` keyed by the
    same ids as ``df``), a SemDeDup pass (``semdedup.semantic_dedup``)
    runs AFTER the text-level near-dup stage — the published order:
    MinHash removes lexical near-copies cheaply, semantic dedup then
    collapses paraphrases MinHash cannot see — and the result is exposed
    as a ``"semantic"`` stage feeding the split.  Embeddings for
    already-dropped docs are pruned by a semi-join first, so the
    pairwise stage only ever sees surviving ids.

    When ``config.lm_tail_frac`` is set, a CCNet-style LM perplexity
    gate runs after dedup (and after SemDeDup when active): a bigram
    model trains on ``lm_reference`` if given (CCNet's trusted-corpus
    setup) else on the survivors, each doc is scored, and the worst
    ``lm_tail_frac`` by perplexity — plus docs with no bigrams (NULL
    score, undefined quality) — are dropped; exposed as the
    ``"lm_filtered"`` stage.

    When ``config.classifier_pareto_shape`` is set (GPT-3's CC filter,
    Brown et al. 2020 App. A), an NB quality classifier trains with
    ``classifier_positive`` as the trusted reference and the
    heuristically-filtered pool itself as negatives, and gates docs by
    the deterministic ``pareto(shape) > 1 - score`` rule BEFORE dedup
    (the published order); exposed as ``"classifier_kept"``.

    When ``config.dsir_k`` is set (DSIR, Xie et al. 2023), the LAST
    selection stage picks ``dsir_k`` docs from the cleaned pool by
    Gumbel top-k over hashed-ngram importance weights against
    ``dsir_target``; exposed as ``"dsir_selected"``.
    """
    annotated, filtered = apply_heuristic_gate(
        df, config, text_col=text_col, id_col=id_col
    )
    if config.classifier_pareto_shape is not None and config.persist_intermediate:
        # the classifier consumes `filtered` three times (negatives,
        # scoring target, semi-join) and exact_dedup re-derives it —
        # same recompute hazard persist_intermediate already covers for
        # the exact stage (lazy checkpoint: see CorpusConfig)
        filtered = filtered.localCheckpoint(eager=False)

    classifier_stage: DataFrame | None = None
    if config.classifier_pareto_shape is not None:
        if classifier_positive is None:
            raise ValueError(
                "classifier_pareto_shape is set but no classifier_positive "
                "reference corpus was passed"
            )
        from go_crawler_spark.functions import classifier as _clf

        model = _clf.train_nb_quality(
            classifier_positive,
            filtered,
            alpha=config.classifier_alpha,
            text_col=text_col,
            id_col=id_col,
        )
        scored = _clf.score_nb_quality(
            filtered, model, text_col=text_col, id_col=id_col
        )
        keep_ids = _clf.pareto_quality_gate(
            scored,
            shape=config.classifier_pareto_shape,
            id_col=id_col,
            seed=config.seed,
        ).select(id_col)
        classifier_stage = filtered.join(keep_ids, id_col, "leftsemi")

    pool = classifier_stage if classifier_stage is not None else filtered
    exact = exact_dedup(pool, text_col, id_col)
    if config.persist_intermediate:
        exact = exact.localCheckpoint(eager=False)
    pairs = minhash_near_dups(
        exact,
        text_col=text_col,
        id_col=id_col,
        num_hashes=config.minhash_num_hashes,
        bands=config.minhash_bands,
        shingle_k=config.minhash_shingle_k,
        jaccard_threshold=config.minhash_threshold,
        spread_partitions=config.spread_partitions,
    )
    deduped = dedup_survivors_from_pairs(exact, pairs, id_col)

    stages: dict[str, DataFrame] = {
        "annotated": annotated,
        "filtered": filtered,
        "deduped": deduped,
    }
    if classifier_stage is not None:
        stages["classifier_kept"] = classifier_stage

    final = deduped
    if embeddings is not None:
        from go_crawler_spark.functions.semdedup import semantic_dedup

        surviving_embs = embeddings.join(
            deduped.select(F.col(id_col).alias(emb_id_col)),
            emb_id_col,
            "leftsemi",
        )
        kept_ids = semantic_dedup(
            surviving_embs,
            num_centroids=config.semantic_num_centroids,
            cosine_threshold=config.semantic_threshold,
            emb_col=emb_col,
            id_col=emb_id_col,
        ).select(F.col(emb_id_col).alias(id_col))
        final = deduped.join(kept_ids, id_col, "leftsemi")
        stages["semantic"] = final

    if config.lm_tail_frac is not None:
        from go_crawler_spark.functions import lm

        model = lm.train_bigram_lm(
            lm_reference if lm_reference is not None else final,
            text_col=text_col,
            id_col=id_col,
        )
        scored = lm.score_perplexity(
            final, model, alpha=config.lm_alpha,
            text_col=text_col, id_col=id_col,
        )
        cut = scored.agg(
            F.approx_percentile(
                "perplexity", F.lit(1.0 - config.lm_tail_frac)
            ).alias("_hi")
        )
        keep_ids = (
            scored.crossJoin(F.broadcast(cut))
            .where(F.col("perplexity") <= F.col("_hi"))  # NULL drops
            .select(id_col)
        )
        final = final.join(keep_ids, id_col, "leftsemi")
        stages["lm_filtered"] = final

    if config.dsir_k is not None:
        if dsir_target is None:
            raise ValueError(
                "dsir_k is set but no dsir_target corpus was passed"
            )
        from go_crawler_spark.functions import dsir as _dsir

        pool_feats = _dsir.hashed_ngram_features(
            final, config.dsir_num_buckets, text_col=text_col, id_col=id_col
        )
        target_feats = _dsir.hashed_ngram_features(
            dsir_target, config.dsir_num_buckets, text_col=text_col,
            id_col=id_col,
        )
        weights = _dsir.importance_log_weights(
            pool_feats,
            _dsir.fit_feature_dist(target_feats),
            _dsir.fit_feature_dist(pool_feats),
            num_buckets=config.dsir_num_buckets,
            id_col=id_col,
        )
        picked = _dsir.gumbel_topk(
            weights, config.dsir_k, seed=config.seed, id_col=id_col
        ).select(id_col)
        final = final.join(picked, id_col, "leftsemi")
        stages["dsir_selected"] = final

    corpus = final
    if config.split_weights:
        corpus = sampling.hash_split(
            final, config.split_weights, key=id_col, seed=config.seed
        )
    stages["corpus"] = corpus
    return stages


def corpus_report(stages: dict[str, DataFrame]) -> dict[str, int]:
    """Count the funnel (one action per stage — caller opts in; at scale
    run it on the written parquet footers instead)."""
    return {name: frame.count() for name, frame in stages.items()}
