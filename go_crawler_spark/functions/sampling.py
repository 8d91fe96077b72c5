"""Deterministic corpus splitting and stratified sampling.

Training pipelines need train/val/test splits that are (a) reproducible
across runs AND cluster sizes, (b) disjoint and exhaustive, and (c)
stable under corpus growth — a document's membership must depend only on
the document itself, never on partition layout, row order, or which
other rows happen to be present (``df.sample()`` guarantees none of
these: its seed is applied per-partition).

Everything here derives membership from ``xxhash64(key, seed)`` alone —
a pure Column expression, zero shuffle, embarrassingly parallel at
100 TB — so re-running a grown corpus keeps every previously-assigned
document in the same split (the property incremental training-data
builds rely on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def unit_hash(key: Column | str, seed: int = 42) -> Column:
    """Uniform [0, 1) double derived from ``xxhash64(key, seed)``.

    Uses the top 53 bits so the value is an exact dyadic double —
    identical on every platform and Spark version.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.xxhash64(c, F.lit(seed))
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(float(1 << 53))


def stage_seed(seed: int, stage: str) -> int:
    """Decorrelate a stage's uniform stream from every other stage's.

    Any operator that SELECTS rows by comparing ``unit_hash(key, seed)``
    against a threshold must not share its stream with ``split_col``
    (or any other selector on the same key): selection then becomes a
    deterministic function of split membership — e.g. a 0.5-fraction
    sample followed by a 0.9/0.1 split leaves val EMPTY, because both
    tests read the identical u.  Deriving the stage's seed as
    ``seed ⊕ crc32(stage)`` gives an independent xxhash64 stream per
    stage name while staying a pure function of (seed, stage) —
    reproducible everywhere, no state.

    ``split_col``/``hash_split`` keep the BARE seed (the canonical
    assignment stream everything else decorrelates from).
    """
    import zlib

    return seed ^ zlib.crc32(stage.encode("utf-8"))


def sample_fraction(
    df: DataFrame, fraction: float, key: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic ``fraction``-sample: keeps rows with
    ``unit_hash(key) < fraction``.  Subset-stable: sampling a superset
    keeps exactly the sampled rows of every subset.  The stream is
    stage-salted (:func:`stage_seed`) so sampled rows still split like
    the corpus under a downstream ``hash_split``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(unit_hash(key, stage_seed(seed, "sample")) < F.lit(fraction))


def split_col(
    weights: dict[str, float], key: Column | str = "doc_id", seed: int = 42
) -> Column:
    """Named-split assignment column (e.g. ``{"train": .98, "val": .01,
    "test": .01}``).  Weights must sum to 1 (±1e-9); the last split
    absorbs the floating-point remainder so the assignment is total.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative weight in {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = unit_hash(key, seed)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    return (last if expr is None else expr.otherwise(last)).alias("split")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column assigning every row to exactly one named
    split — disjoint, exhaustive, deterministic, subset-stable."""
    return df.withColumn("split", split_col(weights, key, seed))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language re-balancing:
    ``{"en": 0.3, "de": 1.0}``).  Strata absent from ``fractions`` get
    ``default_fraction``.  Same hash as :func:`sample_fraction`, so a
    stratum at fraction 1.0 keeps exactly its rows and lowering a
    fraction only ever removes rows (nested samples).  Stage-salted
    like :func:`sample_fraction` (and sharing ITS stream, preserving
    the nesting property between the two)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    u = unit_hash(key, stage_seed(seed, "sample"))
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        frac = F.when(cond, F.lit(v)) if frac is None else frac.when(cond, F.lit(v))
    frac = F.lit(default_fraction) if frac is None else frac.otherwise(
        F.lit(default_fraction)
    )
    return df.where(u < frac)
