"""Single-source shortest path (parallel Bellman-Ford) on DataFrames.

Re-expression of the reference's BSP SSSP (shortestpath/shortestpath.go:
121-168): every superstep, vertices that improved broadcast
``cost + edge_weight`` to neighbors; each vertex keeps the min incoming
cost; halt when no vertex improves.  Golden-tested against the reference's
9-vertex cost-matrix cases (shortestpath/shortestpath_test.go:16-104).

The "active vertex set" trick (only improved vertices send) is expressed
by driving each iteration from the ``improved`` DataFrame — the message
volume shrinks as the wavefront passes, exactly like vote-to-halt.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


@dataclass
class SSSPResult:
    dists: DataFrame  # (id, cost, prev)
    supersteps: int


def sssp(
    vertices: DataFrame,
    edges: DataFrame,
    source: str,
    max_supersteps: int = 100,
    checkpoint_interval: int = 5,
) -> SSSPResult:
    """vertices: (id); edges: (src, dst, weight) non-negative int weights."""
    spark = vertices.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst", "weight").repartition(shuffle_parts, "src").persist()

    dists = (
        vertices.select("id")
        .dropDuplicates(["id"])
        .select(
            "id",
            F.when(F.col("id") == source, F.lit(0).cast("long"))
            .otherwise(F.lit(None))
            .alias("cost"),
            F.lit(None).cast("string").alias("prev"),
        )
        .persist()
    )
    improved = dists.where(F.col("cost").isNotNull())
    pinned = dists  # the handle actually persisted (unpersist on a
    # projection like dists.drop(...) is a silent no-op — cache leak)
    superstep = 0
    while superstep < max_supersteps:
        superstep += 1
        msgs = (
            e.join(improved.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("cost") + F.col("weight")).alias("new_cost"),
                F.col("src").alias("via"),
            )
            .groupBy("id")
            .agg(F.min_by(F.struct("new_cost", "via"), "new_cost").alias("m"))
            .select("id", F.col("m.new_cost").alias("new_cost"), F.col("m.via").alias("via"))
        )
        joined = dists.join(msgs, "id", "left")
        better = F.col("new_cost").isNotNull() & (
            F.col("cost").isNull() | (F.col("new_cost") < F.col("cost"))
        )
        new_dists = joined.select(
            "id",
            F.when(better, F.col("new_cost")).otherwise(F.col("cost")).alias("cost"),
            F.when(better, F.col("via")).otherwise(F.col("prev")).alias("prev"),
            better.alias("_improved"),
        )
        # Cut lineage every few supersteps (see pagerank.py).
        if superstep % checkpoint_interval == 0:
            new_dists = new_dists.localCheckpoint(eager=True)
        else:
            new_dists = new_dists.persist()
        n_improved = new_dists.where(F.col("_improved")).count()
        pinned.unpersist()  # materialized above: the old copy is dead
        pinned = new_dists
        dists = new_dists.drop("_improved")
        if n_improved == 0:
            break
        improved = new_dists.where(F.col("_improved")).select("id", "cost")
    e.unpersist()
    return SSSPResult(dists, superstep)
