"""Deduplication operators for web-scale corpora.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup
— the standard toolkit for 100 TB training-data pipelines, expressed so
each stage is one shuffle on a key Catalyst can reason about:

* exact       — hash-groupBy on xxhash64(text); one shuffle.
* minhash LSH — signatures are pure Column expressions (xxhash64 with k
                salts inside `transform`, JVM-side); banding turns
                near-dup search into an equi-join on (band_idx, band_hash)
                — no pairwise O(n²) anywhere; candidate pairs verified
                with exact shingle-Jaccard (array_intersect/union).
* simhash     — vectorized Arrow UDF (numpy bit-packing) producing a
                64-bit signature; hamming-≤k candidates via 4-piece
                pigeonhole banding (any pair within hamming 3 shares at
                least one exact 16-bit piece).
* embedding   — random-hyperplane LSH (seeded numpy) + exact cosine
                verification with `F.aggregate`/`zip_with` (JVM-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from go_crawler_spark.functions.textstats import shingles_col, tokens_col

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def text_hash_cols(text_col: Column | str) -> tuple[Column, Column]:
    """The canonical 128-bit exact-identity key: two independent
    ``xxhash64`` values of the text.  THE single definition — batch
    exact dedup, duplicate-group reporting, and streaming dedup all key
    on this pair, so equivalence between them is structural, not
    copy-discipline."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.xxhash64(c), F.xxhash64(c, F.lit(1))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every byte-identical text.

    Groups on TWO independent 64-bit hashes (128 combined bits): at the
    10^10-document design point single-64-bit collisions are expected
    (birthday bound ~ C(n,2)/2^64) and each would silently drop a unique
    document; 128 bits pushes that to ~2^-128 per pair while the shuffle
    still carries only (hashes, id) — never the text."""
    h1, h2 = text_hash_cols(text_col)
    w = df.select(h1.alias("_h1"), h2.alias("_h2"), F.col(id_col))
    keep = w.groupBy("_h1", "_h2").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, min_id) for groups with >1 member (same
    double-hash grouping as exact_dedup; text_hash reports the first)."""
    h1, h2 = text_hash_cols(text_col)
    return (
        df.groupBy(h1.alias("text_hash"), h2.alias("_h2"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_id"))
        .where(F.col("n_dups") > 1)
        .drop("_h2")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_col(text: Column | str, num_hashes: int = 64, shingle_k: int = 5) -> Column:
    """array<long> of ``num_hashes`` min-hashes over word shingles.

    The expensive string hash runs ONCE per shingle; each of the
    ``num_hashes`` permutations re-mixes that 8-byte value with
    ``xxhash64(h, salt_i)`` — all JVM-side, no Python.
    """
    hs = F.transform(shingles_col(text, shingle_k), lambda s: F.xxhash64(s))
    return minhash_from_hashes(hs, num_hashes)


def minhash_from_hashes(hashed_shingles: Column, num_hashes: int = 64) -> Column:
    """Signature from an already-hashed shingle array (array<long>).

    ONE streaming ``aggregate`` over the shingle hashes updates all
    ``num_hashes`` permutation minima per element (the simhash-vote
    shape): the input array is a DIRECT child, evaluated once per row.
    The merge lambda DOES reference the outer ``salts`` column — the
    O(m x num_hashes) cost guarantee therefore relies on ``salts``
    being a foldable literal ``sequence(lit, lit)`` that Catalyst
    constant-folds to an array literal BEFORE HOF evaluation (a literal
    re-"evaluated" per element is free).  Any edit that makes the salt
    expression non-foldable (e.g. deriving it from a column) would
    silently reintroduce the per-element re-evaluation hazard described
    in ``kgrams_col`` — keep salts a literal.  (The previous
    formulation — one ``transform`` per permutation — re-evaluated the
    shingle-hash array ``num_hashes`` times per row whenever it was not
    behind a checkpoint barrier; see ``kgrams_col`` for the general
    expression-safety invariant.)  Per-permutation salts are the
    constant-folded ``sequence(0, n-1)``; signature values are
    bit-identical to the per-transform formulation.

    Empty input hashes to an all-NULL signature (parity with
    ``array_min`` over an empty array).
    """
    salts = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    sig = F.aggregate(
        hashed_shingles,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(salts, lambda i: F.xxhash64(h, i)),
            lambda a, b: F.least(a, b),
        ),
    )
    empty = F.array_repeat(F.lit(None).cast("long"), num_hashes)
    return F.when(F.size(hashed_shingles) > 0, sig).otherwise(empty).alias(
        "minhash_sig"
    )


def _minhash_sql(hashes_name: str, num_hashes: int) -> str:
    """SQL text of :func:`minhash_from_hashes` over the column named
    ``hashes_name`` — the identical expression tree (same salts, init
    and empty-input shape; differential-tested), built in one parse
    instead of the Column API's per-lambda py4j round-trips (the
    textstats._rep_aggs_sql device; signature construction is on the
    build path of four driver-green queries)."""
    sig = f"""aggregate(
      {hashes_name},
      array_repeat(CAST({2**63 - 1} AS BIGINT), {num_hashes}),
      (acc, h) -> zip_with(
        acc,
        transform(sequence(0, {num_hashes - 1}), i -> xxhash64(h, i)),
        (a, b) -> least(a, b)))"""
    return (
        f"CASE WHEN size({hashes_name}) > 0 THEN {sig} "
        f"ELSE array_repeat(CAST(NULL AS BIGINT), {num_hashes}) END"
    )


def lsh_bands(
    df: DataFrame,
    sig_col: str = "minhash_sig",
    bands: int = 16,
    num_hashes: int | None = None,
) -> DataFrame:
    """Explode a signature into (band_idx, band_hash) rows for bucketing.

    Pass ``num_hashes`` (the signature length) to validate divisibility:
    a non-divisor band count truncates fractional rows per slice, so
    some signature positions would enter NO band — silently voiding the
    recall guarantee."""
    if num_hashes is not None and num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide the signature length {num_hashes} "
            "(fractional band slices drop minhash positions)"
        )
    n = bands
    rows_per_band = F.size(F.col(sig_col)) / n
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(
                            F.col(sig_col),
                            (b * rows_per_band + 1).cast("int"),
                            rows_per_band.cast("int"),
                        ),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("band_hash"),
        ),
    )
    return df.withColumn("_band", F.explode(band_structs)).select(
        "*", F.col("_band.band_idx").alias("band_idx"),
        F.col("_band.band_hash").alias("band_hash")
    ).drop("_band")


def jaccard_col(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(0.0)


def choose_bands(num_hashes: int, threshold: float, target_recall: float = 0.999) -> int:
    """Pick the band count whose (b, r) curve guarantees ``target_recall``
    for pairs at ``threshold`` jaccard, with maximum selectivity.

    Candidate probability at similarity j is 1 - (1 - j^r)^b with
    r = num_hashes / b rows per band.  Larger r = fewer junk candidates;
    we take the largest r (fewest bands) that still meets the recall
    target at the threshold — recall for j > threshold is strictly
    higher, and sub-threshold candidates are removed by exact verify.
    """
    for r in range(num_hashes, 0, -1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        recall = 1.0 - (1.0 - threshold**r) ** b
        if recall >= target_recall:
            return b
    return num_hashes


def minhash_prepared(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, _sh hashed-shingle array, minhash_sig) — the signature
    preparation EVERY MinHash consumer shares (the intra-corpus
    self-join and the incremental new-vs-index probe must band
    identically or candidates are meaningless).

    Shingle-hash once per document; signature + shingle set derive from
    it.  The lazy localCheckpoint makes "once" literal: the plan is
    consumed by multiple subtrees (band join sides, payload re-joins)
    which would otherwise each re-run the expensive
    tokenize+shingle+hash stage from the scan."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(
                shingles_col(text_col, shingle_k), lambda s: F.xxhash64(s)
            ).alias("_sh"),
        )
        .withColumn(
            # SQL-parsed constructor (== minhash_from_hashes, see
            # _minhash_sql): cheaper query build, identical tree
            "minhash_sig",
            F.expr(_minhash_sql("_sh", num_hashes)).alias("minhash_sig"),
        )
        .localCheckpoint(eager=False)
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    spread_partitions: int | None = None,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact shingle Jaccard.

    ``bands=None`` auto-selects the banding from the threshold via
    ``choose_bands`` (recall >= 99.9% at the threshold, certain above).
    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    ``spread_partitions``: repartition the input to this count before the
    heavy signature stage.  Callers with a SMALL corpus (one parquet
    split would hash on a single core) pass the cluster parallelism; the
    default None trusts the input layout — a well-partitioned 100 TB
    scan must never be down-partitioned or re-shuffled here.
    """
    if bands is None:
        bands = choose_bands(num_hashes, jaccard_threshold)
    if spread_partitions:
        df = df.repartition(spread_partitions, id_col)
    prepared = minhash_prepared(df, text_col, id_col, num_hashes, shingle_k)
    # Banding carries ONLY (id, band_idx, band_hash): the shingle arrays
    # never ride through the bands-fold explosion or the self-join shuffle
    # (they'd be shipped ``bands``x otherwise — the 100 TB killer).
    banded = lsh_bands(
        prepared.select("id", "minhash_sig"), "minhash_sig", bands, num_hashes
    ).select("id", "band_idx", "band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Re-join the (hashed) shingle sets onto the deduped candidate pairs
    # only, then verify with exact Jaccard. Jaccard over xxhash64-mapped
    # shingles equals Jaccard over the shingles themselves (injective map
    # up to 64-bit collisions).
    sh = prepared.select("id", "_sh")
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
    )
    return (
        verified.where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) pairs."""
    sh = df.select(F.col(id_col).alias("id"), shingles_col(text_col, shingle_k).alias("sh"))
    return (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", jaccard_col(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Exact substring dedup: duplicated n-token spans (Lee et al. 2022)
# ---------------------------------------------------------------------------


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    toks: Column | None = None,
) -> DataFrame:
    """Exact substring dedup ("Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022, the suffix-array ExactSubstr op,
    re-expressed relationally): every n-token window whose text occurs
    ``>= min_count`` times corpus-wide (within- or cross-document) marks
    its positions as duplicated, and overlapping/adjacent marks merge
    into maximal spans — the ranges a training pipeline would cut.

    Returns ``(id_col, span_start, span_end, span_len)`` with 1-based
    token-index spans, one row per maximal duplicated span per document.

    Scale shape (the 100 TB path): the corpus-wide occurrence count
    groups on a 128-bit double ``xxhash64`` of the window text — the
    shuffle carries ``(h1, h2, id, pos)``, never the window text (same
    collision budget as :func:`exact_dedup`: a single-64-bit scheme would
    mark false spans at ~10^12 windows).  The hit-set is recovered with a
    left-semi join against the (already aggregated, one-row-per-gram)
    duplicate keys, so a mega-hot window — a boilerplate footer repeated
    10^6 times — never amplifies rows.  The interval merge is one
    ``(id)``-partitioned window over hit positions only.  Three shuffles
    total, each on a key Catalyst can reason about; no pairwise
    comparison and no suffix array materialization anywhere.
    """
    hashed = _window_hashes(df, text_col, id_col, n, toks)
    dups = (
        hashed.groupBy("_h1", "_h2")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h1", "_h2")
    )
    hits = hashed.join(dups, ["_h1", "_h2"], "left_semi").select("id", "pos")
    return _merge_hit_spans(hits, n, id_col)


def _window_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    toks: Column | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """``(id, pos, _h1, _h2)`` — the 128-bit hash of every n-token
    window (1-based ``pos``).  The shared window stage of exact
    substring dedup and benchmark decontamination.  ``checkpoint``
    (lazy localCheckpoint) makes multi-consumer plans run the expensive
    scan+tokenize+window+hash stage once (same pattern as
    ``minhash_near_dups``' prepared frame)."""
    t = tokens_col(text_col) if toks is None else toks
    base = df.select(F.col(id_col).alias("id"), t.alias("_t"))
    nt = F.size(F.col("_t"))
    idx = F.when(nt >= n, F.sequence(F.lit(1), nt - (n - 1)))
    hashed = (
        base.select("id", "_t", F.explode(idx).alias("pos"))
        .select(
            "id",
            "pos",
            F.concat_ws(" ", F.slice("_t", F.col("pos"), n)).alias("_g"),
        )
        .select(
            "id",
            "pos",
            F.xxhash64("_g").alias("_h1"),
            F.xxhash64("_g", F.lit(1)).alias("_h2"),
        )
    )
    return hashed.localCheckpoint(eager=False) if checkpoint else hashed


def _merge_hit_spans(hits: DataFrame, n: int, id_col: str) -> DataFrame:
    """Merge duplicated window start positions ``(id, pos)`` into
    maximal ``(id_col, span_start, span_end, span_len)`` spans — one
    ``(id)``-partitioned window over hit positions only."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_max = F.max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1))
    # contiguous/overlapping iff pos <= prev_end + 1 = prev_max_pos + n
    # (all windows are length n); NULL prev_max (first hit) opens a group.
    newgrp = F.when(F.col("pos") <= prev_max + n, F.lit(0)).otherwise(F.lit(1))
    spans = (
        hits.withColumn("_new", newgrp)
        .withColumn("_grp", F.sum("_new").over(w))
        .groupBy("id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
    )
    return spans.select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
    )


def contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM n-gram
    overlap rule): maximal spans of corpus documents whose n-token
    windows appear ANYWHERE in ``benchmark`` — the ranges to cut (via
    :func:`cut_duplicate_spans`) or to flag a document for removal
    before training on data the eval set leaked into.

    Default ``n=13`` follows GPT-3's 13-gram filter.  Scale shape: the
    benchmark side reduces to DISTINCT 128-bit window hashes (tiny next
    to the corpus — a few eval suites vs 10^10 documents), the corpus
    windows left-semi join against it (AQE broadcasts the small side),
    and the interval merge touches hit positions only.  The window
    stage is NOT checkpointed here — each side has exactly one
    consumer.
    """
    corpus_w = _window_hashes(df, text_col, id_col, n, checkpoint=False)
    # the benchmark needs no id column — only its distinct window hashes
    bench = benchmark.withColumn("__bid", F.lit(0))
    bench_w = (
        _window_hashes(
            bench, bench_text_col or text_col, "__bid", n, checkpoint=False
        )
        .select("_h1", "_h2")
        .distinct()
    )
    hits = corpus_w.join(bench_w, ["_h1", "_h2"], "left_semi").select("id", "pos")
    return _merge_hit_spans(hits, n, id_col)


def contamination_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """PaLM-style overlap-FRACTION decontamination (Chowdhery et al.
    2022, §"Memorization" / app. dataset-contamination rule): a document
    is contaminated when at least ``threshold`` of its n-token windows
    appear anywhere in ``benchmark`` (PaLM publishes 70% of 8-grams).
    Complements :func:`contaminated_spans` (the GPT-3 13-gram SPAN
    rule): spans localize a leak for surgical cutting; the fraction
    grades WHOLE-document leakage, so a doc quoting one benchmark item
    survives while a near-copy is dropped.  Returns
    ``(id_col, n_windows, n_hits, overlap_frac, contaminated)`` for
    every document with at least ``n`` tokens.

    Scale shape: the benchmark side reduces to DISTINCT 128-bit window
    hashes (tiny next to the corpus); per-doc window totals and hit
    counts are two groupBy(id) aggregates over the SAME lazily
    checkpointed window frame (the scan+tokenize+hash stage runs once
    for both consumers); hot benchmark grams cannot amplify rows — the
    semi-join emits at most one row per corpus window.
    """
    corpus_w = _window_hashes(df, text_col, id_col, n)  # 2 consumers
    totals = corpus_w.groupBy("id").agg(F.count("*").alias("n_windows"))
    bench = benchmark.withColumn("__bid", F.lit(0))
    bench_w = (
        _window_hashes(
            bench, bench_text_col or text_col, "__bid", n, checkpoint=False
        )
        .select("_h1", "_h2")
        .distinct()
    )
    hits = (
        corpus_w.join(bench_w, ["_h1", "_h2"], "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        totals.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
        .withColumn(
            "overlap_frac", F.round(F.col("n_hits") / F.col("n_windows"), 6)
        )
        .withColumn(
            "contaminated", F.col("overlap_frac") >= F.lit(float(threshold))
        )
    )


def cut_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: Column | None = None,
) -> DataFrame:
    """The CUT step of exact substring dedup (Lee et al. 2022): remove
    every token covered by a duplicated span (from
    :func:`duplicate_ngram_spans`, same tokenizer) and re-join the
    survivors.  Returns ``(id_col, clean_text, n_cut_tokens)`` for EVERY
    input document (docs without spans pass through unchanged).

    Scale shape: spans aggregate to one small array per affected doc
    (maximal spans are disjoint, so there are at most tokens/n of them),
    ONE left join brings them to the text, and the cut itself is a pure
    per-row filter over (token, index) pairs — lambdas reference only
    their own arguments plus the per-row spans attribute, so the scan
    stays linear under optimizer inlining (see ``kgrams_col``).
    """
    sp = spans.groupBy(F.col(id_col).alias("id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    t = tokens_col(text_col) if toks is None else toks
    base = df.select(F.col(id_col).alias("id"), t.alias("_t")).join(
        sp, "id", "left"
    )
    n = F.size(F.col("_t"))
    idxed = F.when(
        n > 0,
        F.zip_with(
            F.col("_t"),
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda w, i: F.struct(w.alias("w"), i.alias("i")),
        ),
    ).otherwise(F.array().cast("array<struct<w:string,i:int>>"))
    spans_arr = F.coalesce(F.col("_spans"), F.array())
    # the survivor filter is MATERIALIZED once ("_kept"): the final
    # select reads it twice (re-join + size), and as a raw expression
    # each reference would re-run the filter+zip chain per row — the
    # same no-CSE-for-lambdas hazard documented at kgrams_col.
    # CollapseProject keeps the boundary (non-cheap alias, two refs).
    # A/B at sf0.1: no measurable change (the spans join dominates
    # there); kept because the double-eval grows with document length.
    kept = base.withColumn(
        "_kept",
        F.filter(
            idxed,
            lambda x: ~F.exists(
                spans_arr,
                lambda s: (x["i"] >= s["span_start"]) & (x["i"] <= s["span_end"]),
            ),
        ),
    )
    return kept.select(
        F.col("id").alias(id_col),
        F.array_join(
            F.transform(F.col("_kept"), lambda x: x["w"]), " "
        ).alias("clean_text"),
        (n - F.size("_kept")).alias("n_cut_tokens"),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> survivors
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every id in ``pairs``; component = the min id
    reachable through the pair graph (min-label propagation + pointer
    jumping).

    Dedup ends with "keep one doc per duplicate CLUSTER", not per pair —
    transitively: A~B, B~C must collapse to one survivor even if A~C was
    never emitted.  Each round does (1) a neighbor-min hop over the edge
    list and (2) a pointer-jump (label <- label-of-label, path halving),
    so rounds = O(log diameter) — a 10^6-long chain converges in ~25
    rounds, not 10^6.  Two shuffle-joins per round over ids-only frames,
    flat localCheckpoint plans like PageRank's superstep loop.
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    # Adaptive join strategy (guide §3.1, the PageRank device): the
    # label/neighbor-min/parent frames are ids-only — two longs per row,
    # bounded by 2x the edge count — so when the MEASURED edge count is
    # small they broadcast comfortably and each round's three joins run
    # exchange-free (the per-round exchange floor dominates on near-dup
    # graphs, which are tiny relative to the corpus).  Large pair
    # graphs keep the shuffle joins — broadcasting billions of labels
    # would OOM the driver.  The count materializes the lazy edges
    # checkpoint, which round 1 would have paid anyway.
    bcast = (
        (lambda df: F.broadcast(df))
        if edges.count() <= 2_000_000
        else (lambda df: df)
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                bcast(labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("nl")
                )),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_label"))
        )
        # carry the pre-round label through the hop + jump so the
        # convergence test below is a scan of the round's checkpointed
        # blocks, not a third shuffle-join per round (r6: was new⋈old)
        cand = labels.join(
            bcast(nbr_min.withColumnRenamed("src", "id")), "id", "left"
        ).select(
            "id",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label <- label(label) — halves remaining path
        # length every round (labels are node ids, so the lookup is a
        # self-join on the same frame)
        parent = cand.select(
            F.col("id").alias("label"), F.col("label").alias("_pl")
        )
        new_labels = (
            cand.join(bcast(parent), "label", "left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("label"), F.coalesce(F.col("_pl"), F.col("label"))
                ).alias("label"),
            )
            # LAZY: the changed-count below is the materializing action,
            # so each round runs ONE job (hop+jump+count) instead of an
            # eager-checkpoint job followed by a count job (r6)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silent non-convergence would mean WRONG components (a long
        # chain split into several "clusters") — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pair-graph diameter too large) — raise max_iter or switch "
            "to large-star/small-star"
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_survivors_from_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Cluster-level dedup: keep the min-id member of every connected
    near-dup component plus every unpaired document."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash — TWO independent implementations over the same JVM token hashes
# (xxhash64 default).  Their signature equality on any corpus is the
# operator's oracle (implementation diversity — DuckDB cannot express
# xxhash64):
#   * simhash_col        — JVM hashes + Arrow-batched numpy bit voting
#   * simhash_col_native — pure Column (aggregate/zip_with bit voting),
#     zero Python in the plan
# A third, cross-ENGINE oracle uses ``hash_fn=md5_hash64_col``: a 60-bit
# md5 prefix both Spark and DuckDB compute identically, making the full
# simhash/banding/hamming pipeline SQL-checkable (the driver entry); the
# xxhash64 production default is held to the same algorithm by the
# dual-implementation differential test.
# ---------------------------------------------------------------------------


def md5_hash64_col(c: Column) -> Column:
    """60-bit hash from the md5 hex prefix — the cross-engine hash:
    DuckDB computes the identical value as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``.  Slower than xxhash64
    (full md5 + string slice) — oracle/testing use, not the hot path."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def token_hashes_col(toks: Column, hash_fn=None) -> Column:
    """Per-token 64-bit hashes, JVM-side (no Python hashing anywhere)."""
    h = hash_fn if hash_fn is not None else F.xxhash64
    return F.transform(toks, lambda t: h(t))


@F.pandas_udf(T.LongType())
def udf_simhash_votes(hashes: pd.Series) -> pd.Series:
    """numpy bit voting over precomputed token-hash arrays."""
    out = np.zeros(len(hashes), dtype=np.int64)
    bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, hs_l in enumerate(hashes):
        if hs_l is None or len(hs_l) == 0:
            out[i] = 0
            continue
        hs = np.asarray(hs_l, dtype=np.int64).view(np.uint64)
        votes = ((hs[:, None] & bit_masks[None, :]) != 0).sum(axis=0)
        sig = np.where(votes * 2 >= len(hs), bit_masks, np.uint64(0)).sum(dtype=np.uint64)
        out[i] = np.int64(sig)
    return pd.Series(out)


def simhash_col(text: Column | str, hash_fn=None) -> Column:
    return udf_simhash_votes(
        token_hashes_col(tokens_col(text), hash_fn)
    ).alias("simhash")


def simhash_col_native(text: Column | str, hash_fn=None) -> Column:
    """Pure-Column SimHash: same xxhash64 token hashes, bit voting as one
    ``aggregate`` pass with a 64-wide ``zip_with`` accumulator — the whole
    signature stays inside codegen.  Must equal ``simhash_col`` bit-for-bit
    (vote tie rule ``2*votes >= n``); the differential test holds the two
    implementations to that."""
    hs = token_hashes_col(tokens_col(text), hash_fn)
    n = F.size(hs)
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    votes = F.aggregate(
        hs,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftrightunsigned(h, k).bitwiseAND(F.lit(1).cast("long"))
                    for k in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    sig = None
    for k in range(64):
        bit_val = F.lit(-(1 << 63) if k == 63 else (1 << k)).cast("long")
        term = F.when(F.get(votes, k) * 2 >= n, bit_val).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term  # bits disjoint: + == OR
    return F.when(n > 0, sig).otherwise(F.lit(0).cast("long")).alias("simhash")


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    spread_partitions: int | None = None,
    hash_fn=None,
) -> DataFrame:
    """Pairs within hamming distance ``max_hamming`` of 64-bit SimHash.

    Pigeonhole banding: split the 64 bits into ``max_hamming + 1``
    pieces — any pair with hamming <= max_hamming must agree exactly on
    at least one piece (pigeonhole), so candidates come from an
    equi-join on (piece_idx, piece); exact hamming verification via
    bit_count(xor) (JVM-side).  Piece count derived from ``max_hamming``
    keeps the guarantee complete for every threshold (a fixed 4-piece
    split is only complete for hamming <= 3).
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63]")
    if spread_partitions:  # see minhash_near_dups: small-input opt-in only
        df = df.repartition(spread_partitions, id_col)
    n_pieces = max_hamming + 1
    base, rem = divmod(64, n_pieces)
    piece_specs = []  # (shift, width)
    shift = 0
    for p in range(n_pieces):
        width = base + (1 if p < rem else 0)
        piece_specs.append((shift, width))
        shift += width
    # lazy checkpoint: the signature feeds both sides of the band
    # self-join — without it the pandas bit-vote runs twice per doc
    sig = df.select(
        F.col(id_col).alias("id"), simhash_col(text_col, hash_fn)
    ).localCheckpoint(eager=False)
    pieces = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("piece_idx"),
                        (
                            F.col("simhash")
                            if w >= 64
                            else F.shiftrightunsigned(F.col("simhash"), s)
                            .bitwiseAND(F.lit((1 << w) - 1))
                        ).alias("piece"),
                    )
                    for p, (s, w) in enumerate(piece_specs)
                ]
            )
        ).alias("pp"),
    ).select("id", "simhash", F.col("pp.piece_idx").alias("piece_idx"), F.col("pp.piece").alias("piece"))
    a, b = pieces.alias("a"), pieces.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.piece_idx") == F.col("b.piece_idx"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (random-hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------


def cosine_col(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two array<float> columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(0.0)


def hyperplane_signature_udf(dim: int, num_planes: int = 16, seed: int = 42):
    """Pandas UDF: embedding -> int bit-signature of hyperplane sides."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)

    @F.pandas_udf(T.LongType())
    def sig(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # n x dim
        bits = (mat @ planes) > 0  # n x planes
        weights = (1 << np.arange(num_planes)).astype(np.int64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return sig


def hyperplane_bands_udf(
    dim: int, num_bands: int = 8, planes_per_band: int = 16, seed: int = 42
):
    """Pandas UDF: embedding -> array<long> of per-band bit-signatures.

    AND/OR construction: each band is the AND of ``planes_per_band``
    hyperplane sides (one 16-bit signature); candidacy is the OR over
    ``num_bands`` independent bands.  One n x (bands*r) matmul per batch.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_bands * planes_per_band)).astype(np.float32)
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # n x dim
        bits = (mat @ planes) > 0  # n x (bands*r)
        sigs = (bits.reshape(len(mat), num_bands, planes_per_band) * weights).sum(
            axis=2
        )  # n x bands
        return pd.Series(list(sigs.astype(np.int64)))

    return sig


def choose_hyperplane_bands(
    cosine_threshold: float,
    planes_per_band: int = 16,
    target_recall: float = 0.95,
    max_bands: int = 64,
) -> int:
    """Bands needed so a pair AT the cosine threshold is a candidate with
    probability >= ``target_recall`` (higher-cosine pairs recall higher).

    Per-plane collision probability for cosine c is 1 - acos(c)/pi
    (Goemans-Williamson / Charikar SimHash bound); a band matches with
    p^r; recall over b bands is 1 - (1-p^r)^b.
    """
    import math

    c = min(max(cosine_threshold, -1.0), 1.0)
    p = 1.0 - math.acos(c) / math.pi
    pr = p**planes_per_band
    if pr >= 1.0:
        return 1
    if pr <= 0.0:
        return max_bands
    b = math.ceil(math.log(max(1.0 - target_recall, 1e-12)) / math.log(1.0 - pr))
    return max(1, min(b, max_bands))


def embedding_near_dups(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    num_bands: int | None = None,
    planes_per_band: int = 16,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    Multi-band hyperplane LSH: equi-join on (band_idx, band_sig) proposes
    candidates (ids only ride the join — embeddings re-join onto the
    deduped pair set), exact cosine verifies.  A single wide signature
    would put a dup-heavy corpus into few buckets (quadratic within-bucket
    join); r-bit bands keep every band's bucket count at 2^r while the
    OR over bands holds recall (>= ``target_recall`` at the threshold via
    ``choose_hyperplane_bands`` when ``num_bands=None``).
    """
    if dim is None:
        probe = df.select(emb_col).first()
        if probe is None:  # empty input: zero pairs, not a TypeError
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(probe[0])
    if num_bands is None:
        num_bands = choose_hyperplane_bands(cosine_threshold, planes_per_band)
    sig = hyperplane_bands_udf(dim, num_bands, planes_per_band)
    # lazy checkpoint: consumed by both self-join sides + the payload
    # re-join — the hyperplane projection must run once per vector
    s = (
        df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
        .withColumn("bands", sig(F.col("emb")))
        .localCheckpoint(eager=False)
    )
    banded = s.select(
        "id", F.posexplode("bands").alias("band_idx", "band_sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    emb = s.select("id", "emb")
    verified = (
        cand.join(emb.select(F.col("id").alias("id_a"), F.col("emb").alias("emb_a")), "id_a")
        .join(emb.select(F.col("id").alias("id_b"), F.col("emb").alias("emb_b")), "id_b")
        .select(
            "id_a", "id_b", cosine_col(F.col("emb_a"), F.col("emb_b")).alias("cosine")
        )
    )
    return verified.where(F.col("cosine") >= cosine_threshold)


# -- paragraph-level dedup (CCNet) ------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    hash_fn=None,
) -> DataFrame:
    """CCNet-style cross-document paragraph dedup (Wenzek et al. 2020,
    "CCNet: Extracting high quality monolingual datasets from web crawl
    data" — their per-shard duplicate-paragraph removal, the step that
    strips boilerplate headers/footers/nav text repeated across pages).

    Rule: split each document on ``sep``; a paragraph is KEPT iff its
    normalized form (lowercased, non-letters stripped) is empty —
    whitespace/markup structure is never dropped — or this occurrence is
    the corpus-wide first by ``(doc_id, position)``.  Documents are
    reassembled from surviving paragraphs in original order.  Returns
    ``(id_col, text_clean, n_removed, n_paras)``.

    Scale shape (the boilerplate paragraph IS the hot key — a footer can
    appear 10^9 times at 100 TB):

    * winner selection is groupBy(hash).min(struct(id, pos)) — map-side
      partial aggregation collapses the hot key per-partition BEFORE the
      exchange, unlike a row_number window which would funnel every
      occurrence into one partition;
    * the join back is one-winner-row-per-key, so join output == input
      row count (no amplification); AQE skew-join splits the probe side
      of a hot hash if needed;
    * document reassembly is the only other shuffle (by id).

    No counterpart in the Go reference (its dedup is page-level by URL);
    this operator exists for the LLM-corpus layer.  Production default
    ``xxhash64``; pass ``hash_fn=md5_hash64_col`` for cross-engine
    oracle runs.
    """
    h_fn = hash_fn if hash_fn is not None else F.xxhash64
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
    )
    normed = paras.withColumn(
        "_norm", F.regexp_replace(F.lower(F.col("_para")), r"[^\p{L}]+", "")
    ).withColumn("_h", F.when(F.length("_norm") > 0, h_fn(F.col("_norm"))))
    winners = (
        normed.where(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.min(F.struct("_id", "_pos")).alias("_w"))
    )
    tagged = normed.join(winners, "_h", "left").withColumn(
        "_kept",
        F.col("_h").isNull()
        | ((F.col("_w._id") == F.col("_id")) & (F.col("_w._pos") == F.col("_pos"))),
    )
    return tagged.groupBy(F.col("_id").alias(id_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("_pos", "_para"))
                    )
                ),
                lambda s: s["_para"],
            ),
            sep,
        ).alias("text_clean"),
        F.sum(F.when(F.col("_kept"), 0).otherwise(1)).alias("n_removed"),
        F.count(F.lit(1)).alias("n_paras"),
    )


def boilerplate_lines(
    df: DataFrame,
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    hash_fn=None,
) -> DataFrame:
    """Frequency-thresholded boilerplate removal (the Dolma/OSCAR line-
    dedup rule, Soldaini et al. 2024 — cf. CCNet's keep-first variant,
    :func:`paragraph_dedup`): a line is boilerplate when it appears in
    at least ``min_doc_frac`` of all documents (and at least
    ``min_docs`` absolute), and EVERY occurrence is removed — including
    the first, which keep-first dedup preserves; nav bars, cookie
    banners and footers should survive in zero documents.  Empty
    normalized lines are structure and never dropped.  Returns
    ``(id_col, text_clean, n_removed, n_lines)`` for every input row.

    Scale shape (shares :func:`paragraph_dedup`'s analysis): the
    doc-frequency census is groupBy(line-hash).count(DISTINCT doc) with
    map-side partial aggregation collapsing the hot boilerplate key
    per-partition; the boilerplate table is one row per OFFENDING hash
    (tiny — lines above a corpus-wide frequency floor), so the join
    back is broadcast-friendly and never amplifies; reassembly is the
    only other shuffle (by id).
    """
    if not 0 < min_doc_frac <= 1:
        raise ValueError(f"min_doc_frac must be in (0, 1], got {min_doc_frac}")
    h_fn = hash_fn if hash_fn is not None else F.xxhash64
    n_docs = df.count()  # one scalar: the census denominator
    floor = max(int(n_docs * min_doc_frac), min_docs)
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    )
    normed = lines.withColumn(
        "_norm", F.regexp_replace(F.lower(F.col("_line")), r"[^\p{L}]+", "")
    ).withColumn("_h", F.when(F.length("_norm") > 0, h_fn(F.col("_norm"))))
    offenders = (
        normed.where(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.countDistinct("_id").alias("_df"))
        .where(F.col("_df") >= floor)
        .select("_h")
    )
    tagged = normed.join(F.broadcast(offenders), "_h", "left_anti").select(
        "_id", "_pos", "_line"
    )
    n_lines = df.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), sep)).cast("long").alias("_n"),
    )
    out = tagged.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_kept_n"),
    )
    return (
        n_lines.join(out, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (F.col("_n") - F.coalesce("_kept_n", F.lit(0))).alias("n_removed"),
            F.col("_n").alias("n_lines"),
        )
    )
