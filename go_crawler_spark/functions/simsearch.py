"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:

* ``brute_force_topk`` — exact cosine top-k.  The dot product is a pure
  Column expression (zip_with/aggregate, JVM-side); top-k is
  TakeOrdered (no full sort).  Baseline + small-query-set path.
* ``ivf_topk`` — IVF-style approximate search: vectors are assigned to
  their nearest of C centroids once (vectorized Arrow UDF, one numpy
  matmul per batch); queries probe only ``nprobe`` nearest lists.  At
  scale the assignment is the partition key, so a query touches
  nprobe/C of the data — the standard recall/throughput dial.

Centroid selection is deterministic (seeded reservoir of input rows +
a few k-means refinement sweeps in numpy on a driver sample).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F
import pyspark.sql.types as T

from go_crawler_spark.functions.dedup import cosine_col


def _query_lit(query: list[float]):
    return F.array(*[F.lit(float(x)) for x in query])


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector: (id, cosine) desc."""
    q = _query_lit(query)
    scored = df.select(
        F.col(id_col),
        cosine_col(F.col(emb_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def brute_force_topk_multi(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_emb_col: str = "q_emb",
) -> DataFrame:
    """Top-k per query via broadcast cross-join + per-query window top-k."""
    joined = df.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_col(
            F.col(emb_col).cast("array<double>"), F.col(q_emb_col).cast("array<double>")
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------


def train_centroids(
    df: DataFrame,
    num_centroids: int = 16,
    emb_col: str = "embedding",
    sample_rows: int = 10_000,
    sweeps: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """k-means on a deterministic driver sample (C x dim, L2-normalized).

    The sample is the top-``sample_rows`` by a hash of the vector bytes
    (TakeOrdered): deterministic across partition layouts and unbiased
    w.r.t. data order — a bare ``limit()`` takes whichever partitions
    answer first, fitting centroids to the earliest slice only."""
    import pyspark.sql.functions as F

    sample_df = (
        df.select(F.col(emb_col).alias("_e"))
        .withColumn("_h", F.xxhash64(F.col("_e").cast("array<string>")))
        .orderBy("_h")
        .limit(sample_rows)
    )
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float32) for r in sample_df.select("_e").collect()]
    )
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(num_centroids, len(sample)), replace=False)]
    for _ in range(sweeps):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-9)
    return cents


def assign_udf(centroids: np.ndarray):
    cents = centroids.astype(np.float32)

    @F.pandas_udf(T.IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float32)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-9)
        return pd.Series((mat @ cents.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> DataFrame:
    """Attach the IVF list id (at scale: write partitioned by ``list_id``)."""
    return df.withColumn("list_id", assign_udf(centroids)(F.col(emb_col)))


def probe_lists_udf(centroids: np.ndarray, nprobe: int):
    cents = centroids.astype(np.float32)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float32)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-9)
        idx = np.argsort(-(mat @ cents.T), axis=1)[:, :nprobe]
        return pd.Series(list(idx.astype(np.int32)))

    return probes


def ivf_knn_join(
    indexed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_emb_col: str = "q_emb",
) -> DataFrame:
    """Distributed k-NN JOIN: top-k neighbors for EVERY query vector,
    when the query set is itself too large to broadcast (embedding
    dedup, retrieval eval — the training-pipeline workhorse).

    Each query explodes to its ``nprobe`` nearest lists and equi-joins
    the indexed side on ``list_id`` — both sides shuffle by list, so a
    query compares against nprobe/C of the corpus instead of all of it,
    and no pair is generated twice (an item lives in exactly one list).
    Per-query top-k is a partial row_number window (WindowGroupLimit
    pushes the k-cutoff map-side).  With ``nprobe == C`` the result is
    EXACTLY the brute-force join — the differential oracle pytest holds
    it to.  At extreme skew (a list holding most vectors) re-salt within
    the hot list the same way frontier politeness does.
    """
    probed = queries.select(
        F.col(q_id_col),
        F.col(q_emb_col),
        F.explode(
            probe_lists_udf(centroids, nprobe)(F.col(q_emb_col))
        ).alias("list_id"),
    )
    joined = probed.join(indexed, "list_id").select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_col(
            F.col(emb_col).cast("array<double>"), F.col(q_emb_col).cast("array<double>")
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return joined.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan only the ``nprobe`` nearest inverted lists.

    The list_id filter is a partition-prunable predicate — at 100 TB this
    reads nprobe/C of the corpus instead of all of it.
    """
    q = np.asarray(query, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-9)
    probe = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    subset = indexed.where(F.col("list_id").isin([int(p) for p in probe]))
    return brute_force_topk(subset, query, k, emb_col, id_col)
