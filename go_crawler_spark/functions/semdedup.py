"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

Beyond-reference LLM-training-data operator: cluster document
embeddings, then within each cluster flag an item as a semantic
duplicate when another item of the same cluster is (a) within the
cosine threshold of it and (b) earlier in the keep-order.  Following
the paper's released implementation, the keep-order prefers items with
LOW cosine similarity to their centroid (keep the cluster's "edge"
examples, drop the interchangeable core), ties broken by id — and the
duplicate test is against ALL earlier items, not just kept ones (the
paper's upper-triangular ``max`` over the sorted within-cluster
similarity matrix), so the rule is closed-form rather than sequential
and both engines can express it.

Scale shape (LAION-scale per the paper: n ~ 10^10, k ~ 5*10^4):

* cluster assignment — the JVM path here broadcast-cross-joins the
  centroid table (slim ``(id, cid, cos)`` projection drops the
  embedding BEFORE the argmax aggregation, so the xC row amplification
  never carries vector payloads across an exchange; map-side partial
  ``max_by`` collapses to one row per id pre-shuffle).  Exact-parity
  path for oracle-checked runs at small C.  At production C (10^4+),
  use :func:`go_crawler_spark.functions.simsearch.assign_udf` — a
  zero-shuffle Arrow-batched matmul — and feed the result to
  :func:`semantic_dedup_assigned`.
* within-cluster pairwise — one shuffle of (id, cluster, cos_c,
  embedding) by cluster; the quadratic is bounded per cluster because
  k grows with n (the paper holds cluster size roughly constant).  A
  pathological mega-cluster is the same skew problem as the frontier's
  mega-host: AQE skew-join splits it, or pre-split by salting the
  cluster id and accepting intra-salt-only dedup within the hot
  cluster.
* survivor selection — a left-semi join (dropped ids) + left-anti join
  back; ids only, no payload amplification.

No counterpart in the Go reference (grep: no embedding/semantic dedup
anywhere); this module exists for the 100 TB training-corpus story and
composes with functions/corpus.prepare_training_corpus the same way
the MinHash pass does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_crawler_spark.functions.dedup import cosine_col

__all__ = [
    "centroids_by_id",
    "assign_clusters",
    "assign_clusters_udf",
    "semantic_dedup_assigned",
    "semantic_dedup",
]


def centroids_by_id(
    df: DataFrame,
    num_centroids: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic centroid table: the embeddings of the
    ``num_centroids`` lowest ids, as ``(cid int, cemb array<double>)``.

    This is the oracle-expressible selection rule (both engines sort by
    id and take C rows — no RNG, no iteration).  For quality-optimal
    centroids use :func:`simsearch.train_centroids` (k-means on a
    deterministic sample) and build the centroid table from its output;
    the dedup semantics downstream are identical.
    """
    w = df.select(
        F.col(id_col).alias("cid"),
        F.col(emb_col).cast("array<double>").alias("cemb"),
    ).orderBy("cid").limit(num_centroids)
    # tiny by construction (C rows) — safe to materialize as a broadcast
    return w


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Attach ``(cluster_id, cos_c)`` — argmax-cosine centroid and the
    (6-decimal-rounded) similarity to it.

    JVM-exact path: cosine in float64 via ``cosine_col`` so the values
    hash-match DuckDB's ``list_cosine_similarity`` after rounding; ties
    broken toward the lowest centroid id.  The slim ``(id, cid, cos)``
    projection drops the embedding before the xC rows reach the
    ``max_by`` aggregation, and the broadcast keeps all C scores of an
    id in one partition so partial aggregation collapses them map-side.
    """
    scored = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(emb_col).cast("array<double>").alias("_emb"),
        )
        .crossJoin(F.broadcast(centroids))
        .select(
            "_id",
            "cid",
            F.round(cosine_col(F.col("_emb"), F.col("cemb")), 6).alias("cos"),
        )
    )
    best = scored.groupBy("_id").agg(
        F.max_by(
            F.struct(F.col("cid"), F.col("cos")),
            # max over (cos asc, -cid asc) == highest cosine, lowest cid
            F.struct(F.col("cos"), (-F.col("cid")).alias("_nc")),
        ).alias("_b")
    )
    best = best.select(
        F.col("_id"),
        F.col("_b.cid").alias("cluster_id"),
        F.col("_b.cos").alias("cos_c"),
    )
    return df.join(best, df[id_col] == best["_id"]).drop("_id")


def assign_clusters_udf(
    df: DataFrame,
    centroids: DataFrame | np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Large-C assignment path: attach ``(cluster_id, cos_c)`` via a
    zero-shuffle Arrow-batched matmul instead of the broadcast cross
    join.

    At production C (10^4+ centroids, the paper's k ~ 5*10^4) the JVM
    path's xC row amplification — even payload-free — costs C scored
    rows per item; a whole-batch ``(n x dim) @ (dim x C)`` matmul costs
    the same FLOPs with zero intermediate rows and no exchange.  Bitwise
    parity with :func:`assign_clusters` on the survivor rule: float64
    accumulation, the same 6-decimal rounding BEFORE the argmax, and
    argmax's first-max tie-break == lowest centroid id (the centroid
    table is sorted by cid).  Pinned by
    test_pipeline_functions.py::test_semdedup_udf_assignment_parity.

    ``centroids``: the ``(cid, cemb)`` table from
    :func:`centroids_by_id` (collected here — C rows by construction),
    or a raw ``(C x dim)`` ndarray whose row index is the cluster id
    (e.g. from ``simsearch.train_centroids``).
    """
    if isinstance(centroids, DataFrame):
        rows = centroids.orderBy("cid").collect()
        cids = np.asarray([r["cid"] for r in rows], dtype=np.int64)
        cents = np.stack(
            [np.asarray(r["cemb"], dtype=np.float64) for r in rows]
        )
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        cids = np.arange(len(cents), dtype=np.int64)
    cnorm = np.linalg.norm(cents, axis=1)

    out_t = T.StructType(
        [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("cos_c", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def assign(emb: pd.Series) -> pd.DataFrame:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mnorm = np.linalg.norm(mat, axis=1)
        denom = np.outer(mnorm, cnorm)
        cos = np.divide(
            mat @ cents.T,
            denom,
            out=np.zeros((len(mat), len(cents))),
            where=denom > 0,
        )
        cos = np.round(cos, 6)  # round BEFORE argmax: ties match the JVM rule
        idx = cos.argmax(axis=1)
        return pd.DataFrame(
            {
                "cluster_id": cids[idx],
                "cos_c": cos[np.arange(len(mat)), idx],
            }
        )

    return (
        df.withColumn("_a", assign(F.col(emb_col)))
        .select("*", "_a.cluster_id", "_a.cos_c")
        .drop("_a")
    )


def semantic_dedup_assigned(
    assigned: DataFrame,
    cosine_threshold: float = 0.4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    return_dropped: bool = False,
) -> DataFrame:
    """Survivors of SemDeDup given rows already carrying
    ``(cluster_id, cos_c)`` (from :func:`assign_clusters` or the
    large-C ``assign_udf`` path).

    Drop rule (paper's upper-triangular max): drop ``a`` iff some ``b``
    in the same cluster has ``cos(a, b) >= threshold`` and ``b``
    precedes ``a`` in keep-order ``(cos_c ASC, id ASC)`` — i.e. the
    farthest-from-centroid member of each near-dup group survives.
    """
    base = assigned.localCheckpoint(eager=False)  # 3 consumers below
    # Adaptive pairwise join strategy (r6, guide §3.1): the within-
    # cluster pair predicate equi-joins on cluster_id, whose cardinality
    # is the CENTROID count — a shuffle join therefore runs on at most C
    # active tasks however large the cluster is.  When the measured
    # assigned-row count is small the slim b-side (ids + unit vectors)
    # broadcasts and the quadratic stage becomes a broadcast hash join
    # with the order/cosine predicate as residual: no exchange, and the
    # a-side keeps its input parallelism instead of collapsing to C
    # partitions.  The count scans the checkpoint blocks the three
    # consumers materialize anyway; big corpora keep the shuffle join.
    n_assigned = base.count()
    # Pre-normalize ONCE per row: the pairwise stage then pays a plain
    # dot product instead of dot + two norms — a 3x flop cut on the
    # quadratic (within-cluster) stage.  cos(a,b) == dot(a/|a|, b/|b|)
    # exactly up to float round-off far below the 6-decimal rounding;
    # zero vectors normalize to zeros so their pair cosine stays 0.0,
    # matching cosine_col's guard.
    d_emb = F.col(emb_col).cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(d_emb, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # expression-safety: nrm enters as a DIRECT child of array_repeat
    # (evaluated once per row); the zip_with lambda touches only its own
    # arguments — never `transform(d_emb, x -> x / nrm)`, which would
    # re-evaluate the O(dim) norm per ELEMENT (see kgrams_col).
    unit = F.zip_with(
        d_emb,
        F.array_repeat(nrm, F.size(d_emb)),
        lambda x, n: F.when(n > 0, x / n).otherwise(x * 0.0),
    )
    slim = base.select(
        "cluster_id", "cos_c", F.col(id_col), unit.alias("_unit")
    )
    cols = ["cluster_id", "cos_c", id_col, "_unit"]
    a = slim.select(*cols).alias("a")
    b = slim.select(*cols).alias("b")
    earlier = (F.col("b.cos_c") < F.col("a.cos_c")) | (
        (F.col("b.cos_c") == F.col("a.cos_c"))
        & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
    )
    near = (
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("a._unit"), F.col("b._unit"), lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        >= cosine_threshold
    )
    b_side = F.broadcast(b) if n_assigned <= 200_000 else b
    dropped = a.join(
        b_side,
        (F.col("a.cluster_id") == F.col("b.cluster_id")) & earlier & near,
        "leftsemi",
    ).select(F.col(f"a.{id_col}").alias(id_col))
    how = "leftsemi" if return_dropped else "left_anti"
    return base.join(dropped, id_col, how)


def semantic_dedup(
    df: DataFrame,
    num_centroids: int = 8,
    cosine_threshold: float = 0.4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    return_dropped: bool = False,
) -> DataFrame:
    """End-to-end SemDeDup: centroid table -> cluster assignment ->
    within-cluster near-dup drop.  Returns the surviving rows with
    ``cluster_id`` and ``cos_c`` attached (or the dropped rows when
    ``return_dropped``)."""
    if centroids is None:
        centroids = centroids_by_id(df, num_centroids, emb_col, id_col)
    assigned = assign_clusters(df, centroids, emb_col, id_col)
    return semantic_dedup_assigned(
        assigned, cosine_threshold, emb_col, id_col, return_dropped
    )
