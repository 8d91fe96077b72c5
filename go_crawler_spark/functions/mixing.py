"""Deterministic corpus mixing by source (the Pile / LLaMA recipe).

Pretraining corpora are MIXTURES: each source (web, books, code, wiki)
gets a target weight, and high-quality sources are *up-sampled* by
repeating them for more than one epoch (The Pile, Gao et al. 2021,
arXiv:2101.00027 — e.g. Wikipedia at 3 epochs; LLaMA, Touvron et al.
2023, table 1 publishes exactly such weight/epoch pairs).  Given
per-source target weights and a total token budget, this module
computes per-source sampling RATES (rate = weight * budget /
source_tokens; a rate > 1 means repetition) and materializes the mixed
corpus deterministically:

* each document appears ``floor(rate)`` times whole, and one more time
  with probability ``frac(rate)`` — decided by ``unit_hash(id)``, so
  membership is reproducible, partition-independent, and subset-stable
  (the guarantees everything in ``sampling.py`` carries);
* repetitions are materialized as an ``epoch`` column via
  ``explode(sequence(...))`` — a pure Column expression, zero shuffle;
  downstream shuffles (the trainer's global shuffle) see distinct
  (id, epoch) rows.

Scale shape: ONE groupBy(source) for the token census (a handful of
rows — broadcast back onto the corpus), then a zero-shuffle
explode+filter projection.  No Python anywhere.

No counterpart in the Go reference; beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from go_crawler_spark.functions.sampling import stage_seed, unit_hash
from go_crawler_spark.functions.textstats import token_count_col

__all__ = [
    "source_token_census",
    "mixture_rates",
    "temperature_rates",
    "unimax_rates",
    "mix_corpus",
]

# The fractional-copy gate is stage-salted (sampling.stage_seed):
# "u < frac(rate)" on split_col's own stream would skew fractionally
# kept docs toward the low-u (train) hash region.


def source_token_census(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, n_tokens) — one small groupBy; map-side partial
    aggregation means the exchange carries one row per (task, source)."""
    return df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col(text_col)).alias("n_tokens"),
    )


def mixture_rates(
    census: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    max_epochs: float = 10.0,
) -> DataFrame:
    """Per-source sampling rate table: ``rate = weight_norm *
    token_budget / n_tokens``, capped at ``max_epochs`` (unbounded
    repetition of a tiny source degrades training — the published
    mixtures stay in low single digits).  Sources absent from
    ``weights`` get rate 0 (dropped).  Weights are normalized so they
    need not sum to 1.  Returns ``(source, rate)`` — tiny, meant to be
    broadcast.

    Sources with zero (or NULL) counted tokens are DROPPED, not rated:
    under ANSI SQL the division would raise, and a NULL rate would
    slip through the ``least`` cap as max_epochs — a garbage source
    silently up-sampled 10x (both verified on Spark 4)."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    # An inner join would silently drop a weights key naming a source
    # absent from the census (e.g. a typo) — the caller would believe
    # the source is represented; validate eagerly instead (r4 ADVICE).
    # ONE bounded collect pays the census plan exactly once (it may be
    # an expensive corpus-wide aggregate) and serves both the validation
    # and the rate math — the census is O(#sources) rows by construction
    # and the result is a tiny broadcast-shaped table either way.
    rows = census.select(source_col, "n_tokens").collect()
    census_sources = {r[0] for r in rows}
    unmatched = sorted(set(weights) - census_sources)
    if unmatched:
        raise ValueError(
            f"weights name sources absent from the census: {unmatched}; "
            f"census has {sorted(census_sources)}"
        )
    norm = {s: float(w) / total_w for s, w in weights.items()}
    rates = sorted(
        (
            r[0],
            min(
                norm[r[0]] * float(token_budget) / float(r[1]),
                float(max_epochs),
            ),
        )
        for r in rows
        if r[0] in norm and r[1] is not None and r[1] > 0
    )
    return census.sparkSession.createDataFrame(
        rates, f"{source_col} string, rate double"
    )


def _census_rows(
    census: DataFrame, source_col: str
) -> list[tuple[str, float]]:
    """One bounded collect of (source, n_tokens>0) — the census is
    O(#sources) rows by construction; zero/NULL-token sources are
    dropped exactly as in :func:`mixture_rates`."""
    rows = census.select(source_col, "n_tokens").collect()
    return [(r[0], float(r[1])) for r in rows if r[1] is not None and r[1] > 0]


def temperature_rates(
    census: DataFrame,
    token_budget: int,
    alpha: float = 0.3,
    source_col: str = "source",
    max_epochs: float = 10.0,
) -> DataFrame:
    """Temperature-based mixture rates (T5/mT5, Raffel et al. 2020
    §3.4.3 / Xue et al. 2021 §3.2): sampling probability
    ``p_s ∝ n_s^alpha`` — ``alpha=1`` is proportional (no re-balancing),
    ``alpha→0`` approaches uniform across sources; mT5 publishes
    ``alpha=0.3``.  ``rate_s = min(p_s * budget / n_s, max_epochs)``,
    composing with :func:`mix_corpus` exactly like
    :func:`mixture_rates` (which takes EXPLICIT weights; this derives
    them from corpus sizes).  The cap means the budget is an upper
    bound when tiny sources saturate, as in the published recipes.

    Driver-side closed form over the collected census (O(#sources)
    rows, the :func:`mixture_rates` pattern) — zero extra jobs.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    sized = _census_rows(census, source_col)
    if not sized:
        raise ValueError("census has no source with positive n_tokens")
    z = sum(n ** alpha for _, n in sized)
    rates = sorted(
        (s, min(n ** alpha / z * float(token_budget) / n, float(max_epochs)))
        for s, n in sized
    )
    return census.sparkSession.createDataFrame(
        rates, f"{source_col} string, rate double"
    )


def unimax_rates(
    census: DataFrame,
    token_budget: int,
    max_epochs: float = 2.0,
    source_col: str = "source",
) -> DataFrame:
    """UniMax mixture rates (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute the token budget as UNIFORMLY as possible
    across sources, subject to a per-source epoch cap — the published
    greedy waterfill.  Ascending by size, each source gets
    ``min(cap_s, remaining / sources_left)`` where
    ``cap_s = max_epochs * n_s``; small sources saturate their cap and
    the freed budget re-spreads over the rest.  ``rate_s = b_s / n_s``
    (so every saturated source sits exactly at ``max_epochs``).

    Driver-side over the collected census (O(#sources log #sources)).
    Computed in CLOSED FORM over the binding prefix: the set of
    cap-saturated sources is provably a prefix of the ascending size
    order (caps grow with size while the uniform share grows as capped
    sources leave the pool), so ``k`` = the longest prefix where
    ``cap_i <= (B - Σ_{j<i} cap_j) / (L - i + 1)``; prefix sources
    sit exactly at ``max_epochs`` and the rest share
    ``(B - Σ_{j<=k} cap_j) / (L - k)`` tokens each — algebraically
    identical to the paper's sequential greedy (once no cap binds the
    uniform share is constant), and float-identical to the SQL-window
    oracle (same operation order).  The differential test checks it
    against an independent waterfill-by-bisection reference.  Composes
    with :func:`mix_corpus` like the other rate tables.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    sized = sorted(_census_rows(census, source_col), key=lambda x: (x[1], x[0]))
    if not sized:
        raise ValueError("census has no source with positive n_tokens")
    big_b, n_src = float(token_budget), len(sized)
    caps = [float(max_epochs) * n for _, n in sized]
    k, cumcap_k, cum = 0, 0.0, 0.0
    for i, cap in enumerate(caps, start=1):
        if cap <= (big_b - cum) / (n_src - i + 1):
            cum += cap
            k, cumcap_k = i, cum
        else:
            break
    share = (big_b - cumcap_k) / (n_src - k) if k < n_src else 0.0
    rates = sorted(
        (s, float(max_epochs) if i <= k else share / n)
        for i, (s, n) in enumerate(sized, start=1)
    )
    return census.sparkSession.createDataFrame(
        rates, f"{source_col} string, rate double"
    )


def mix_corpus(
    df: DataFrame,
    rates: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    u: Column | None = None,
) -> DataFrame:
    """Materialize the mixture: every row of ``df`` whose source has
    rate r appears ``floor(r)`` times plus one more iff
    ``unit_hash(id, seed) < frac(r)``, with an ``epoch`` column
    (1-based) distinguishing the copies.  The rates table is broadcast;
    the expansion is ``explode(sequence(1, n_copies))`` — zero shuffle,
    no Python.  Pass ``u`` to override the uniform source (cross-engine
    oracles use an md5-derived uniform DuckDB can reproduce)."""
    n_whole = F.floor("rate").cast("int")
    frac = F.col("rate") - F.floor("rate")
    uu = (
        unit_hash(F.col(id_col), seed=stage_seed(seed, "mix"))
        if u is None
        else u
    )
    extra = (uu < frac).cast("int")
    return (
        df.join(F.broadcast(rates), source_col, "inner")
        .withColumn("_n", n_whole + extra)
        .where(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("rate", "_n")
    )
