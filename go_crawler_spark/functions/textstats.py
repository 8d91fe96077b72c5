"""Text analysis for large-scale training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting
over a ``documents(text)`` table.  Everything here is a pure Column
expression (JVM-side, whole-stage-codegen'd) — no Python in the hot path,
so the operators scale linearly with executors at 100 TB.

These extend the reference's text processing (which stops at extraction,
crawler/text_extractor.go) with the analysis stages a web-text corpus
pipeline needs before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# ---------------------------------------------------------------------------
# Tokenization + counting
# ---------------------------------------------------------------------------


def tokens_col(text: Column | str) -> Column:
    """Lowercased unicode-word tokens (letters+digits runs)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), r"[^\p{L}\p{N}]+")
    return F.filter(toks, lambda t: t != "")


def _toks_or(text: Column | str, toks: Column | None) -> Column:
    """Use a precomputed tokens column when given (single-pass path)."""
    return tokens_col(text) if toks is None else toks


def token_count_col(text: Column | str) -> Column:
    """Whitespace-ish word count (JVM-side)."""
    return F.size(tokens_col(text))


def bpe_token_estimate_col(text: Column | str) -> Column:
    """BPE-ish token estimate: word pieces + standalone punctuation.

    A cheap, deterministic proxy for tokenizer counts: every ~4-char chunk
    of a word is one piece, plus each punctuation mark.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = F.regexp_count(c, F.lit(r"\w+"))
    word_chars = F.length(F.regexp_replace(c, r"[^\w]", ""))
    punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    # pieces ≈ words + extra pieces for words longer than 4 chars
    extra = F.greatest(
        F.lit(0).cast("long"), (word_chars - words * 4) / F.lit(4)
    ).cast("long")
    return (words + extra + punct).alias("bpe_tokens")


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / alpha ratios)
# ---------------------------------------------------------------------------

_EN_STOPWORDS = [
    "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "had", "by", "not", "but",
]


def quality_features(text: Column | str, toks: Column | None = None) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    toks = _toks_or(c, toks)
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in _EN_STOPWORDS]))
    )
    alpha_chars = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
    punct_chars = F.regexp_count(c, F.lit(r"[^\w\s]"))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)  # noqa: E731
    # mean word length over the TOKENS (summed token chars / n_tokens):
    # dividing raw text length by token count counts whitespace/punct/
    # markup as word length — separator-heavy text then overshoots the
    # 12-char plausibility bound and is misclassified
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_word_len": safe(tok_chars, n_tokens),
        "alpha_ratio": safe(alpha_chars, n_chars),
        "punct_ratio": safe(punct_chars, n_chars),
        "stopword_ratio": safe(stop_hits, F.least(n_tokens, F.lit(len(_EN_STOPWORDS)))),
    }


def quality_score_col(text: Column | str, toks: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic (length, alpha, punct, stopwords).

    Deliberately simple and fully declarative; the point is the shape
    (per-row scoring that Catalyst fuses into the scan), not the model.
    """
    return _quality_score_expr(quality_features(text, toks=toks))


def _quality_score_expr(f: dict[str, Column]) -> Column:
    """Score from already-computed feature columns (single-pass path)."""
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    alpha_term = f["alpha_ratio"]
    punct_term = F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 2, F.lit(1.0))
    word_len_ok = F.when(
        (f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 12), 1.0
    ).otherwise(0.3)
    return (
        (length_term * 0.3 + alpha_term * 0.25 + punct_term * 0.15
         + stop_term * 0.2 + word_len_ok * 0.1)
    ).alias("quality_score")


# ---------------------------------------------------------------------------
# Language identification (stopword-hit heuristic, pure Columns)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "was", "for",
           "with", "are", "this", "have", "from", "not", "they"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein",
           "eine", "von", "den", "im", "für", "auf", "des", "sich"],
    "fr": ["le", "la", "les", "et", "est", "je", "pas", "pour", "que", "une",
           "des", "dans", "qui", "sur", "avec", "au", "ce"],
    "es": ["el", "la", "los", "las", "y", "es", "no", "por", "que", "una",
           "en", "un", "para", "con", "se", "su", "del"],
    "it": ["il", "la", "che", "e", "è", "non", "per", "una", "sono", "mi",
           "si", "lo", "di", "un", "con", "del", "al"],
}


def lang_id_col(text: Column | str, toks: Column | None = None) -> Column:
    """Best-guess language by distinct-stopword hits; 'und' if no hits."""
    toks = F.array_distinct(_toks_or(text, toks))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reverse-order when-chain; earlier langs win ties deterministically
    for lang in reversed(list(_LANG_STOPWORDS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr.alias("lang_guess")


# ---------------------------------------------------------------------------
# Document fingerprinting (shingle rolling-hash)
# ---------------------------------------------------------------------------


def kgrams_col(toks: Column, k: int) -> Column:
    """Non-distinct word k-grams (space-joined), built ONLY from
    ``zip_with`` shift-chains.

    Expression-safety invariant (load-bearing for performance): no
    lambda body here references an outer expression — captured arrays
    appear only as DIRECT children of higher-order functions, which
    Spark evaluates once per ROW.  A formulation like
    ``transform(seq, i -> slice(toks, i, k))`` re-evaluates ``toks``
    once per ELEMENT; that is harmless while ``toks`` is a column
    attribute, but the optimizer (predicate pushdown, CollapseProject)
    may substitute the attribute with its defining expression — e.g.
    the tokenizer's regexp split — turning a linear scan into
    O(tokens x split-cost) per row (measured 350x slower at sf0.1 when
    a corpus filter was pushed into the stats projection).
    """
    m = F.size(toks)
    g = toks
    for j in range(1, k):
        # zip pads the shorter (shifted) side with NULL; F.concat
        # propagates the NULL so padded tails drop in the final slice.
        g = F.zip_with(
            g,
            F.slice(toks, j + 1, F.greatest(m - j, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.slice(g, 1, F.greatest(m - (k - 1), F.lit(0)))


def shingles_col(text: Column | str, k: int = 5, toks: Column | None = None) -> Column:
    """Distinct word k-gram shingles (the dedup/similarity unit).
    Built with :func:`kgrams_col`, so it stays linear even when the
    optimizer inlines it into a filter or join condition."""
    toks = _toks_or(text, toks)
    n = F.size(toks)
    return F.when(n >= k, F.array_distinct(kgrams_col(toks, k))).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def fingerprint_col(
    text: Column | str, k: int = 5, toks: Column | None = None, hash_fn=None
) -> Column:
    """64-bit document fingerprint: min rolling-hash over k-gram shingles.

    Equal fingerprints ⇒ very likely near-identical prefix content; used
    as a cheap first-pass cluster key before exact/minhash dedup.
    ``hash_fn`` defaults to ``F.xxhash64``; pass
    ``dedup.md5_hash64_col`` for the cross-engine (DuckDB-checkable)
    variant — same algorithm, different hash.
    """
    h = hash_fn if hash_fn is not None else F.xxhash64
    sh = shingles_col(text, k, toks=toks)
    return F.array_min(F.transform(sh, lambda s: h(s))).alias("fingerprint")


# ---------------------------------------------------------------------------
# Repetition filters (Gopher, Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------


def _repetition_aggs(sorted_grams: Column) -> Column:
    """``struct<top:long, dup:long>`` — characters covered by the most
    frequent gram / by all grams occurring >= 2 times — via ONE
    streaming run-length pass over the sorted gram array
    (``F.aggregate``: O(1) per element, lambda touches only its own
    arguments, so it stays linear even if the optimizer inlines the
    whole expression into a filter).  The '' sentinel never collides:
    grams of non-empty tokens are non-empty."""

    def fin_top(acc: Column) -> Column:
        return F.greatest(acc["top"], acc["run"] * F.length(acc["prev"]))

    def fin_dup(acc: Column) -> Column:
        return acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0).cast("long"))

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["top"]).otherwise(fin_top(acc)).alias("top"),
            F.when(same, acc["dup"]).otherwise(fin_dup(acc)).alias("dup"),
        )

    return F.aggregate(
        sorted_grams,
        init,
        merge,
        lambda acc: F.struct(fin_top(acc).alias("top"), fin_dup(acc).alias("dup")),
    )


def _rep_aggs_sql(sorted_arr_sql: str) -> str:
    """SQL text of :func:`_repetition_aggs` over ``sorted_arr_sql``.

    Generates the IDENTICAL Catalyst expression tree (same struct
    fields, same CASE/greatest/cast shapes — cross-checked against the
    Column formulation's explain output and the DuckDB oracles), but as
    ONE ``F.expr`` parse instead of dozens of py4j round-trips per
    lambda: building the nine-level Gopher projection through the
    Column API cost ~1.9s of driver time per query construction,
    ~50ms through the SQL parser.  The Column-based
    :func:`_repetition_aggs` stays as the reference formulation (tests
    compare the two paths)."""
    run_chars = "acc.run * CAST(length(acc.prev) AS BIGINT)"
    fin_top = f"greatest(acc.top, {run_chars})"
    fin_dup = (
        f"acc.dup + CASE WHEN acc.run >= 2 THEN {run_chars}"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return f"""aggregate(
      {sorted_arr_sql},
      named_struct('prev', '', 'run', CAST(0 AS BIGINT),
                   'top', CAST(0 AS BIGINT), 'dup', CAST(0 AS BIGINT)),
      (acc, x) -> named_struct(
        'prev', x,
        'run', CASE WHEN x = acc.prev THEN acc.run + 1
                    ELSE CAST(1 AS BIGINT) END,
        'top', CASE WHEN x = acc.prev THEN acc.top ELSE {fin_top} END,
        'dup', CASE WHEN x = acc.prev THEN acc.dup ELSE {fin_dup} END),
      acc -> named_struct('top', {fin_top}, 'dup', {fin_dup}))"""


def _kgrams_sql(toks_name: str, k: int) -> str:
    """SQL text of :func:`kgrams_col` over the column ``toks_name`` —
    the same zip_with shift-chain (expression-safety invariant intact:
    captured arrays are direct HOF children), one parse instead of
    k lambda conversions."""
    g = toks_name
    for j in range(1, k):
        g = (
            f"zip_with({g}, slice({toks_name}, {j + 1}, "
            f"greatest(size({toks_name}) - {j}, 0)), "
            "(x, y) -> concat(x, ' ', y))"
        )
    return f"slice({g}, 1, greatest(size({toks_name}) - {k - 1}, 0))"


def _with_repetition(
    out: DataFrame,
    text_col: str,
    toks_name: str,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Attach ``top{top_n}gram_char_frac`` / ``dup{dup_n}gram_char_frac``
    (NULL for documents with fewer than max(top_n, dup_n) tokens; see
    :func:`repetition_stats`).  Requires a materialized tokens column.

    Shape for 100 TB: per-document sort + one streaming aggregate —
    O(m log m) per row, ZERO shuffle (no groupBy on gram text),
    embarrassingly parallel, and safe against optimizer inlining (see
    :func:`kgrams_col`)."""
    nchars = F.length(F.col(text_col))
    toks = F.col(toks_name)
    ok = F.size(toks) >= max(top_n, dup_n)
    # SQL-parsed construction (see _rep_aggs_sql): identical expression
    # tree to _repetition_aggs(array_sort(kgrams_col(...))), built in
    # one parse instead of dozens of py4j lambda conversions
    top_chars = F.expr(
        _rep_aggs_sql(f"array_sort({_kgrams_sql(toks_name, top_n)})")
    )["top"]
    dup_chars = F.expr(
        _rep_aggs_sql(f"array_sort({_kgrams_sql(toks_name, dup_n)})")
    )["dup"]
    return out.withColumn(
        f"top{top_n}gram_char_frac", F.when(ok, F.round(top_chars / nchars, 6))
    ).withColumn(
        f"dup{dup_n}gram_char_frac", F.when(ok, F.round(dup_chars / nchars, 6))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
    toks: Column | None = None,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1):

    * ``top{top_n}gram_char_frac`` — characters covered by the single
      most frequent word ``top_n``-gram (count x gram char length),
      over total document characters;
    * ``dup{dup_n}gram_char_frac`` — characters covered by all
      ``dup_n``-grams occurring more than once (every occurrence
      counted), over total document characters.

    Divergence from Gopher/DataTrove: the dup fraction sums count*len
    over every occurrence, so characters covered by two overlapping
    duplicated grams are counted twice and the fraction can exceed 1.0
    — stricter than the published filter, which counts each covered
    character once (merged intervals).  This engine's oracle and
    corpus-funnel thresholds encode the occurrence-sum rule, so results
    are internally consistent; see ``corpus.CorpusConfig`` for the
    downstream effect.

    Documents with fewer than ``dup_n`` tokens are dropped (no gram of
    either size is defined for them).  Both fractions are rounded to 6
    decimals.  Ties on the top gram cannot affect the output (the max is
    taken over covered-chars directly).
    """
    t = _toks_or(text_col, toks)
    base = df.select(F.col(id_col), F.col(text_col), t.alias("_t")).where(
        F.size("_t") >= max(top_n, dup_n)
    )
    out = _with_repetition(base, text_col, "_t", top_n, dup_n)
    return out.select(
        id_col, f"top{top_n}gram_char_frac", f"dup{dup_n}gram_char_frac"
    )


def gopher_repetition_full(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    toks: Column | None = None,
) -> DataFrame:
    """The COMPLETE Gopher repetition filter set (Rae et al. 2021,
    table A1): ``top{n}gram_char_frac`` for n in 2-4 (characters covered
    by the single most frequent n-gram) and ``dup{n}gram_char_frac`` for
    n in 5-10 (characters covered by all n-grams occurring >= 2 times,
    occurrence-sum rule as in :func:`repetition_stats`) — nine columns
    in one zero-shuffle, Python-free projection chain.  Per-column NULL
    when the document has fewer than n tokens (that n-gram size is
    undefined for it); documents are never dropped.

    Gram construction is CHAINED (r5): the raw NULL-padded n-gram array
    ``g_n`` is materialized as a column once per level and the next
    level is one ``zip_with`` over it (``g_{n+1} = zip(g_n, shift)``),
    so building all levels costs 9 zip passes instead of the 45 a
    per-n :func:`kgrams_col` rebuild pays — Catalyst cannot share those
    itself (lambda-bearing expressions are excluded from subexpression
    elimination) and cannot collapse the chain back into a rebuild
    (each ``g_n`` alias is referenced twice — by its aggregate and by
    the next level — and CollapseProject never duplicates non-cheap
    multi-referenced aliases).  A/B at sf0.1: x2.08 over the per-n
    rebuild, bit-identical output (BASELINE.md).  Every level keeps the
    expression-safety invariant of :func:`kgrams_col` — captured arrays
    appear only as direct HOF children, never inside a lambda body.
    Still O(m log m) per (row, n), embarrassingly parallel."""
    t = _toks_or(text_col, toks)
    ns = sorted(set(top_ns) | set(dup_ns))
    if any(n < 1 for n in ns):
        raise ValueError(f"n-gram sizes must be >= 1, got {ns}")
    out = (
        df.select(F.col(id_col), F.col(text_col).alias("_txt"), t.alias("_t"))
        .withColumn("_m", F.size("_t"))
        .withColumn("_nc", F.length("_txt"))
        .drop("_txt")
        .withColumn("_g", F.col("_t"))  # level 1: the tokens themselves
    )
    m = F.col("_m")
    # Every level is built as ONE F.expr parse (see _rep_aggs_sql): the
    # Column-API construction of this nine-level chain cost ~1.9s of
    # driver-side py4j per query build; the parsed trees are identical.
    if 1 in ns:  # unigrams: the token array itself, no NULL tail to slice
        out = out.withColumn("_agg1", F.expr(_rep_aggs_sql("array_sort(_g)")))
    for n in range(2, max(ns, default=1) + 1):
        # zip pads the shorter (shifted) side with NULL; concat
        # propagates it, so g_n carries a NULL tail of n-1 entries that
        # the per-level slice below drops (same shape as kgrams_col).
        out = out.withColumn(
            "_g",
            F.expr(
                f"zip_with(_g, slice(_t, {n}, greatest(_m - {n - 1}, 0)), "
                "(x, y) -> concat(x, ' ', y))"
            ),
        )
        if n in ns:
            out = out.withColumn(
                f"_agg{n}",
                F.expr(_rep_aggs_sql(
                    f"array_sort(slice(_g, 1, greatest(_m - {n - 1}, 0)))"
                )),
            )
    cols = [F.col(id_col)]
    nchars = F.col("_nc")
    for n in top_ns:
        cols.append(
            F.when(m >= n, F.round(F.col(f"_agg{n}")["top"] / nchars, 6)).alias(
                f"top{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        cols.append(
            F.when(m >= n, F.round(F.col(f"_agg{n}")["dup"] / nchars, 6)).alias(
                f"dup{n}gram_char_frac"
            )
        )
    return out.select(*cols)


def merged_dup_coverage_col(toks: Column, n: int = 5) -> Column:
    """Characters covered by duplicated word ``n``-grams, each character
    counted ONCE (merged intervals) — the published Gopher/DataTrove
    rule, vs :func:`_repetition_aggs`'s stricter occurrence-sum.

    Intervals live in the space-joined token stream (`` ".join(toks)``):
    gram ``i`` spans ``[start_i, start_i + len(gram_i))`` where
    ``start_{i+1} = start_i + len(tok_i) + 1``; the union of duplicated
    spans is one forward pass keeping the last covered end.  Returns the
    covered-character count (long); divide by the caller's denominator.

    This is the REFERENCE formulation (one self-contained Column); its
    multi-referenced subtrees re-evaluate under interpreted HOF eval, so
    the production path is :func:`repetition_stats_merged`, which stages
    the same intermediates as materialized columns (x2.76 at sf0.1,
    bit-identical).

    Zero shuffle, expression-safe (every lambda touches only its own
    arguments; captured arrays are direct HOF children), O(m log m):

    1. sort ``struct(gram, idx)`` by gram — duplicated occurrences are
       sorted-neighbors, so a zip against the array's own shift marks
       them without a counting pass;
    2. re-sort ``struct(idx, flag)`` by idx — the scatter back to
       document order;
    3. one O(1)-accumulator ``aggregate`` over
       ``struct(flag, toklen, gramlen)`` tracks (pos, last_end,
       covered) — no array appends, so accumulators stay scalar even
       for pathological 10^5-token documents.
    """
    m = F.size(toks)
    ng = F.greatest(m - (n - 1), F.lit(0))
    grams = kgrams_col(toks, n)
    tagged = F.array_sort(
        F.zip_with(
            grams,
            F.sequence(F.lit(0), ng - 1),
            lambda g, i: F.struct(g.alias("g"), i.alias("i")),
        )
    )
    # neighbor-equality against the array's own shift (NULL-padded tail
    # never equals a real gram, so edges resolve to false via coalesce)
    nxt = F.slice(tagged, 2, F.greatest(ng - 1, F.lit(0)))
    with_next = F.zip_with(
        tagged,
        nxt,
        lambda a, b: F.struct(
            a["g"].alias("g"),
            a["i"].alias("i"),
            F.coalesce(a["g"] == b["g"], F.lit(False)).alias("eq_next"),
        ),
    )
    prv = F.slice(with_next, 1, F.greatest(ng - 1, F.lit(0)))
    flags_sorted = F.zip_with(
        F.slice(with_next, 1, ng),
        F.concat(F.array(F.lit(None).cast("struct<g:string,i:int,eq_next:boolean>")), prv),
        lambda a, p: F.struct(
            a["i"].alias("i"),
            (a["eq_next"] | F.coalesce(p["eq_next"], F.lit(False))).alias("dup"),
        ),
    )
    flags = F.transform(F.array_sort(flags_sorted), lambda s: s["dup"])
    toklens = F.transform(toks, lambda t: F.length(t))
    gramlens = F.transform(grams, lambda g: F.length(g))
    data = F.zip_with(
        F.zip_with(
            flags,
            F.slice(toklens, 1, ng),
            lambda fl, tl: F.struct(fl.alias("dup"), tl.alias("tl")),
        ),
        gramlens,
        lambda a, gl: F.struct(a["dup"].alias("dup"), a["tl"].alias("tl"), gl.alias("gl")),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("last_end"),
        F.lit(0).cast("long").alias("covered"),
    )

    def step(acc: Column, x: Column) -> Column:
        end = acc["pos"] + x["gl"].cast("long")
        add = F.when(
            x["dup"],
            F.greatest(end - F.greatest(acc["pos"], acc["last_end"]), F.lit(0).cast("long")),
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            (acc["pos"] + x["tl"].cast("long") + 1).alias("pos"),
            F.when(x["dup"], F.greatest(acc["last_end"], end))
            .otherwise(acc["last_end"])
            .alias("last_end"),
            (acc["covered"] + add).alias("covered"),
        )

    return F.aggregate(data, init, step, lambda acc: acc["covered"])


def repetition_stats_merged(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_n: int = 5,
    toks: Column | None = None,
) -> DataFrame:
    """Published-filter variant of the dup fraction (ADVICE r3 item 1):
    ``dup{n}gram_char_frac_merged`` counts each covered character once,
    so the fraction is always in [0, 1].  The denominator is the
    space-joined token stream length (the space the intervals live in),
    making 1.0 exactly reachable for a fully-duplicated document.
    Documents with fewer than ``dup_n`` tokens are dropped, as in
    :func:`repetition_stats`.

    STAGED construction (r5): the intermediate arrays of
    :func:`merged_dup_coverage_col` — grams, the sorted (gram, idx)
    structs, the neighbor-flagged structs, the re-sort — are
    materialized as chained columns, each evaluated exactly once.  In
    the single-expression reference formulation the multi-referenced
    subtrees are re-evaluated (the sorted struct array 4x, the gram
    array 5x) because lambda-bearing expressions are excluded from
    Catalyst's subexpression elimination; as materialized aliases they
    are referenced as attributes, and CollapseProject keeps each
    boundary (non-cheap aliases referenced more than once are never
    inlined).  A/B at sf0.1: x2.76 over the reference formulation,
    bit-identical output (BASELINE.md)."""
    n = dup_n
    t = _toks_or(text_col, toks)
    base = df.select(F.col(id_col), t.alias("_t")).where(F.size("_t") >= n)
    # Every staged column below is built as ONE F.expr parse (the
    # _rep_aggs_sql device): the Column-API construction of this chain
    # cost ~0.7s of driver-side py4j per query build; the parsed trees
    # are identical to the Column formulation, which remains in
    # :func:`merged_dup_coverage_col` as the tested reference.
    ng = f"greatest(size(_t) - {n - 1}, 0)"
    out = base.withColumn("_grams", F.expr(_kgrams_sql("_t", n)))
    # sorted (gram, original-index) structs: duplicated occurrences are
    # sorted-neighbors (step 1 of merged_dup_coverage_col)
    out = out.withColumn(
        "_tagged",
        F.expr(
            f"array_sort(zip_with(_grams, sequence(0, {ng} - 1), "
            "(g, i) -> named_struct('g', g, 'i', i)))"
        ),
    )
    # neighbor-equality against the array's own shift
    out = out.withColumn(
        "_wn",
        F.expr(
            f"zip_with(_tagged, slice(_tagged, 2, greatest({ng} - 1, 0)), "
            "(a, b) -> named_struct('g', a.g, 'i', a.i, "
            "'eq_next', coalesce(a.g = b.g, false)))"
        ),
    )
    # dup flag = equal to either sorted-neighbor; carry the original idx
    out = out.withColumn(
        "_fs",
        F.expr(
            f"zip_with(slice(_wn, 1, {ng}), "
            "concat(array(CAST(NULL AS "
            "struct<g:string,i:int,eq_next:boolean>)), "
            f"slice(_wn, 1, greatest({ng} - 1, 0))), "
            "(a, p) -> named_struct('i', a.i, "
            "'dup', a.eq_next OR coalesce(p.eq_next, false)))"
        ),
    )
    # scatter back to document order (step 2), then the single
    # O(1)-accumulator interval-union pass (step 3)
    out = out.withColumn(
        "_flags", F.expr("transform(array_sort(_fs), s -> s.dup)")
    )
    data = (
        f"zip_with(zip_with(_flags, slice(transform(_t, x -> length(x)), 1, {ng}), "
        "(fl, tl) -> named_struct('dup', fl, 'tl', tl)), "
        "transform(_grams, g -> length(g)), "
        "(a, gl) -> named_struct('dup', a.dup, 'tl', a.tl, 'gl', gl))"
    )
    end = "acc.pos + CAST(x.gl AS BIGINT)"
    covered = F.expr(f"""aggregate(
      {data},
      named_struct('pos', CAST(0 AS BIGINT), 'last_end', CAST(0 AS BIGINT),
                   'covered', CAST(0 AS BIGINT)),
      (acc, x) -> named_struct(
        'pos', acc.pos + CAST(x.tl AS BIGINT) + 1,
        'last_end', CASE WHEN x.dup
                         THEN greatest(acc.last_end, {end})
                         ELSE acc.last_end END,
        'covered', acc.covered + CASE WHEN x.dup
          THEN greatest({end} - greatest(acc.pos, acc.last_end),
                        CAST(0 AS BIGINT))
          ELSE CAST(0 AS BIGINT) END),
      acc -> acc.covered)""")
    stream_len = F.expr(
        "aggregate(_t, CAST(0 AS BIGINT), "
        "(acc, x) -> acc + CAST(length(x) AS BIGINT))"
        " + CAST(size(_t) AS BIGINT) - 1"
    )
    return out.select(
        id_col,
        F.round(covered / stream_len, 6).alias(f"dup{n}gram_char_frac_merged"),
    )


def gopher_dup_structure(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The LINE/PARAGRAPH half of Gopher's repetition filter (Rae et
    al. 2021, table A1 rows 1-4) — within-document duplicate structure,
    completing the table alongside :func:`gopher_repetition_full` (the
    n-gram rows) and :func:`gopher_quality_stats` (the quality half):

    * ``dup_line_frac`` / ``dup_para_frac`` — occurrences of a line
      (paragraph) identical to one seen earlier in the document, over
      the element count — published threshold 0.30;
    * ``dup_line_char_frac`` / ``dup_para_char_frac`` — characters in
      those repeated occurrences, over total document characters —
      published threshold 0.20;
    * ``gopher_dup_structure_pass`` — AND of the four rules.

    Splitting mirrors the reference implementation (DataTrove's
    GopherRepetitionFilter): lines split on newline RUNS (``\\n+``),
    paragraphs on blank-line runs (``\\n{2,}``); "duplicate" means an
    exact repeat, occurrences after the first.  Fractions (and the
    verdict) are NULL for empty documents (no characters to cover).

    Shape for 100 TB: array_sort + one sorted-neighbor zip per row
    (an occurrence is a repeat iff it equals its sorted predecessor) —
    ZERO shuffle, no Python, O(k log k) over a document's k lines.
    Intermediates are staged as materialized columns (the
    :func:`repetition_stats_merged` pattern) so no lambda-bearing
    subtree is re-evaluated, and captured arrays appear only as direct
    HOF children (the :func:`kgrams_col` expression-safety invariant).

    Returns the input columns ANNOTATED with the five new columns
    (the :func:`gopher_quality_stats` contract), so it slots into the
    shared heuristic gate (``CorpusConfig.gopher_dup_structure``) and
    streams (pure projections only).
    """
    out = (
        df.withColumn("_nc", F.length(F.col(text_col)))
        .withColumn("_ls", F.array_sort(F.split(F.col(text_col), r"\n+")))
        .withColumn("_ps", F.array_sort(F.split(F.col(text_col), r"\n{2,}")))
    )

    def dup_lens(sorted_name: str) -> Column:
        # length of each repeated occurrence (equal to its sorted
        # predecessor), NULL otherwise — positionally over elements 2..k
        s = F.col(sorted_name)
        m1 = F.greatest(F.size(s) - 1, F.lit(0))
        return F.zip_with(
            F.slice(s, 2, m1),
            F.slice(s, 1, m1),
            lambda a, b: F.when(a == b, F.length(a)),
        )

    out = (
        out.withColumn("_ld", dup_lens("_ls"))
        .withColumn("_pd", dup_lens("_ps"))
    )

    def frac_cols(dup_name: str, arr_name: str, kind: str) -> list[Column]:
        d = F.col(dup_name)
        n_dup = F.size(F.filter(d, lambda x: x.isNotNull()))
        chars = F.aggregate(
            d,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(x.cast("long"), F.lit(0)),
        )
        nonempty = F.col("_nc") > 0
        return [
            F.when(
                nonempty, F.round(n_dup / F.size(F.col(arr_name)), 6)
            ).alias(f"dup_{kind}_frac"),
            F.when(nonempty, F.round(chars / F.col("_nc"), 6)).alias(
                f"dup_{kind}_char_frac"
            ),
        ]

    out = out.select(
        *df.columns,
        *frac_cols("_ld", "_ls", "line"),
        *frac_cols("_pd", "_ps", "para"),
    )
    return out.withColumn(
        "gopher_dup_structure_pass",
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_para_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("dup_para_char_frac") <= 0.20),
    )


# ---------------------------------------------------------------------------
# Gopher table-A1 QUALITY rules (the non-repetition half; Rae et al.
# 2021).  The repetition half is gopher_repetition_full above.
# ---------------------------------------------------------------------------

# the paper's exact stop-word list for the "contains >= 2 of" rule
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach the Gopher table-A1 quality signals and the composed
    ``gopher_quality_pass`` verdict — ONE zero-shuffle projection, no
    Python (same plan contract as :func:`gopher_repetition_full`).

    Signals and published thresholds:

    * ``n_words`` in [50, 100000] — whitespace words, the paper's unit;
    * ``gopher_mean_word_len`` in [3, 10] (whitespace-word semantics,
      NULL for empty docs — deliberately NOT the ``mean_word_len``
      with_text_stats emits, whose tokenizer semantics and 0.0-on-empty
      policy differ; distinct names keep the two from shadowing each
      other when both annotate one frame);
    * ``hash_word_ratio`` (# occurrences / words) <= 0.1 and
      ``ellipsis_word_ratio`` (``...``/``…`` occurrences / words)
      <= 0.1 — the paper applies the 0.1 symbol-to-word bound to EACH
      symbol type ("for either the hash symbol or the ellipsis"), so
      the two ratios are computed and thresholded separately (a doc
      fails if either exceeds 0.1);
    * ``bullet_line_frac`` <= 0.10 ("90% of lines do not start with a
      bullet"; bullets here: ``•``, ``-``, ``*`` — a DELIBERATE
      extension beyond the paper's bullet-point character onto the
      ASCII markdown list markers scraped web text actually uses);
    * ``ellipsis_line_frac`` <= 0.30 (lines ending in ``...``/``…``);
    * ``alpha_word_frac`` >= 0.80 (words containing >= 1 letter);
    * ``n_stop_hits`` >= 2 distinct hits in the paper's 8-word stop
      list (membership tested on the package tokenizer's tokens so
      trailing punctuation can't mask a hit).

    Empty documents get NULL ratio signals and fail the verdict (the
    word-count bound already excludes them).  Documents are annotated,
    never dropped — callers filter on the verdict.
    """
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w),
    )
    nonzero = n_words > 0
    mean_word_len = F.when(
        nonzero, total_chars.cast("double") / n_words
    )
    n_hash = F.regexp_count(text, F.lit("#"))
    n_ellipsis = F.regexp_count(text, F.lit(r"\.\.\.|…"))
    hash_ratio = F.when(nonzero, n_hash.cast("double") / n_words)
    ellipsis_ratio = F.when(nonzero, n_ellipsis.cast("double") / n_words)
    lines = F.transform(F.split(text, r"\n"), lambda l: F.trim(l))
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("•")
                | l.startswith("-")
                | l.startswith("*"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
        ).cast("double")
        / n_lines
    )
    alpha_frac = F.when(
        nonzero,
        F.size(F.filter(words, lambda w: w.rlike(r"\p{L}"))).cast("double")
        / n_words,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens_col(text_col)),
            F.array(*[F.lit(w) for w in _GOPHER_STOPS]),
        )
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("gopher_mean_word_len", F.round(mean_word_len, 6))
        .withColumn("hash_word_ratio", F.round(hash_ratio, 6))
        .withColumn("ellipsis_word_ratio", F.round(ellipsis_ratio, 6))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
        .withColumn("n_stop_hits", stop_hits)
    )
    passed = (
        F.col("n_words").between(50, 100_000)
        & F.col("gopher_mean_word_len").between(3.0, 10.0)
        & (F.col("hash_word_ratio") <= 0.1)
        & (F.col("ellipsis_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.10)
        & (F.col("ellipsis_line_frac") <= 0.30)
        & (F.col("alpha_word_frac") >= 0.80)
        & (F.col("n_stop_hits") >= 2)
    )
    return out.withColumn(
        "gopher_quality_pass", F.coalesce(passed, F.lit(False))
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF
    (``tf * (ln((N + 1) / (df + 1)) + 1)``) — the classic keyword /
    topic-signal extraction a corpus-analysis layer ships.

    Scale shape: ONE (doc, term) groupBy for term frequencies (map-side
    combine absorbs Zipf-hot terms), document frequencies derived from
    the SAME aggregate (a distinct (doc, term) row is one df vote —
    no second corpus pass), one equi-join of the O(vocab) idf table,
    and a per-doc rank window (WindowGroupLimit pushes the top-k
    partial map-side).  Ties break by term ascending — deterministic.
    Returns ``(id_col, term, tf, score, rank)``."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # consumed by df-counts AND the join
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    idf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.log((F.col("_n") + 1).cast("double") / (F.col("_df") + 1))
            + F.lit(1.0)
        ).alias("_idf"),
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", "tf", (F.col("tf") * F.col("_idf")).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def vocab_counts(
    df: DataFrame, text_col: str = "text", toks: Column | None = None
) -> DataFrame:
    """(token, cnt) corpus vocabulary counts — the heavy-hitters pass a
    tokenizer-training pipeline runs first.  explode → groupBy benefits
    from map-side partial aggregation: the shuffle carries one partial
    count per (task, distinct token), not one row per token occurrence."""
    return (
        df.select(F.explode(_toks_or(text_col, toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def with_text_stats(
    df: DataFrame, text_col: str = "text", repetition: bool = False
) -> DataFrame:
    """Attach all stats columns to a documents DataFrame.

    Single-pass: the tokenizer (the expensive regexp split) is
    materialized ONCE as ``_toks`` and every feature derives from it —
    Catalyst's CollapseProject keeps non-cheap multi-referenced aliases
    in their own projection, so the split runs once per row, not once
    per feature.

    ``repetition=True`` additionally attaches the Gopher repetition
    fractions (:func:`_with_repetition`; NULL for documents too short to
    define them).
    """
    out = df.withColumn("_toks", tokens_col(text_col))
    toks = F.col("_toks")
    feats = quality_features(text_col, toks=toks)
    for name, col in feats.items():
        out = out.withColumn(name, col)
    score = _quality_score_expr({name: F.col(name) for name in feats})
    out = (
        out.withColumn("bpe_tokens", bpe_token_estimate_col(text_col))
        .withColumn("quality_score", score)
        .withColumn("lang_guess", lang_id_col(text_col, toks=toks))
        .withColumn("fingerprint", fingerprint_col(text_col, toks=toks))
    )
    if repetition:
        out = _with_repetition(out, text_col, "_toks")
    return out.drop("_toks")
