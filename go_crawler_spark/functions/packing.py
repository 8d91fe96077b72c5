"""Deterministic sequence packing (the GPT-style concat-and-chunk).

LM pretraining consumes fixed-length token sequences, not documents:
the corpus is laid out in one deterministic order, token counts are
accumulated, and the stream is cut into ``seq_len``-sized chunks — each
document lands at a global token offset, possibly straddling a chunk
boundary (GPT-2/3 pack exactly this way, with document separators).
This module computes each document's ``(global_offset, first_chunk,
last_chunk)`` assignment — the shuffle-free metadata a writer needs to
emit packed sequences — without ever materializing the concatenation.

The core is a **distributed prefix sum**, the textbook two-phase shape
(local scan + broadcast of per-partition totals), because the naive
``sum() OVER (ORDER BY key)`` window collapses Spark onto a SINGLE
partition (an unpartitioned global-order window is explicitly the thing
that does not survive 100 TB):

1. every doc gets a deterministic position key ``(bucket, u, id)`` —
   bucket = top bits of the same hash that orders within buckets, so
   bucket order == global order and the layout is reproducible and
   partition-independent;
2. cumulative token counts run in PARALLEL per bucket
   (``Window.partitionBy(bucket)`` — B independent scans);
3. per-bucket totals (B rows) are summed into bucket base offsets with
   a tiny single-partition window — O(B), not O(corpus) — and
   broadcast back.

The DuckDB oracle states the same result as the naive global window —
the two-phase decomposition must be bit-identical to it, which is
exactly what the driver entry checks.

No counterpart in the Go reference; beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from go_crawler_spark.functions.sampling import unit_hash
from go_crawler_spark.functions.textstats import token_count_col, tokens_col

__all__ = ["pack_assignments", "pack_sequences", "take_token_budget"]


def pack_assignments(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    seed: int = 42,
    sep_tokens: int = 1,
    u=None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Documents are laid out in ``unit_hash`` order (the deterministic
    corpus shuffle trainers want), each occupying ``n_tokens +
    sep_tokens`` positions (the separator the GPT recipe inserts
    between documents).  Returns ``(id_col, n_tokens, offset,
    first_chunk, last_chunk)`` where ``offset`` is the document's first
    token's global position and chunks are ``seq_len``-sized.

    ``u`` overrides the ordering uniform (cross-engine oracles pass an
    md5-derived one); ``num_buckets`` sizes the parallel scan — any
    value yields the SAME assignment, it only changes parallelism.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be > 0, got {num_buckets}")
    uu = unit_hash(F.col(id_col), seed=seed) if u is None else u
    base = df.select(
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
        uu.alias("_u"),
    ).withColumn(
        # top bits of the SAME uniform that orders within the bucket:
        # bucket boundaries respect the global (_u, id) order
        "_bucket",
        F.least(
            F.floor(F.col("_u") * num_buckets).cast("int"),
            F.lit(num_buckets - 1),
        ),
    ).withColumn("_sz", F.col("n_tokens") + F.lit(sep_tokens))

    # phase 1: parallel per-bucket scan (exclusive prefix sum)
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy("_u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = base.withColumn(
        "_local_end", F.sum("_sz").over(w_local)
    )

    # phase 2: O(B) bucket base offsets — tiny window, broadcast back
    totals = scanned.groupBy("_bucket").agg(F.sum("_sz").alias("_tot"))
    w_base = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    bases = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_base), F.lit(0))
    ).select("_bucket", "_base")

    out = (
        scanned.join(F.broadcast(bases), "_bucket")
        .withColumn(
            "offset", F.col("_base") + F.col("_local_end") - F.col("_sz")
        )
        .withColumn("first_chunk", F.floor(F.col("offset") / seq_len))
        .withColumn(
            # last token of the doc itself (separator excluded); empty
            # docs occupy only their separator and live in one chunk
            "last_chunk",
            F.floor(
                (
                    F.col("offset")
                    + F.greatest(F.col("n_tokens") - 1, F.lit(0))
                ) / seq_len
            ),
        )
    )
    return out.select(id_col, "n_tokens", "offset", "first_chunk", "last_chunk")


def take_token_budget(
    df: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    seed: int = 42,
    u=None,
) -> DataFrame:
    """Deterministically take the largest prefix of the
    ``unit_hash``-ordered corpus whose token sum does not exceed
    ``token_budget`` — "give me exactly ~N tokens of this corpus", the
    final sizing cut every training recipe applies after mixing.
    Whole documents only: the straddling document is EXCLUDED, so the
    taken sum is within one document of the budget and never over.

    Returns the input columns plus ``n_tokens`` and ``offset`` (the
    document's first token's global position — audit columns that make
    the cut reproducible and checkable).

    NOT subset-stable (unlike ``sampling.py``): the prefix depends on
    every other document's size, so adding or removing corpus rows
    reshuffles membership near the boundary.  That is inherent to an
    exact-budget cut — use ``sample_fraction`` when subset stability
    matters more than the budget.

    Scale shape: delegates the global offsets to
    :func:`pack_assignments`'s two-phase distributed prefix sum
    (``sep_tokens=0`` — no separator in a sizing cut), then one
    equi-join on ``id_col`` recovers the kept rows.  The naive
    ``sum() OVER (ORDER BY u)`` global window it refuses is the oracle.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    asn = pack_assignments(
        df,
        seq_len=1,  # chunks unused; 1 keeps the kernel's contract valid
        text_col=text_col,
        id_col=id_col,
        num_buckets=num_buckets,
        seed=seed,
        sep_tokens=0,
        u=u,
    )
    kept = asn.where(
        F.col("offset") + F.col("n_tokens") <= F.lit(int(token_budget))
    ).select(id_col, "n_tokens", "offset")
    return df.join(kept, id_col)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    seed: int = 42,
    sep_token: str = "</s>",
    u=None,
) -> DataFrame:
    """Materialize the packed training sequences themselves:
    ``(chunk_id, tokens array<string>)`` with every chunk exactly
    ``seq_len`` tokens — documents laid out per
    :func:`pack_assignments` (same uniform, same separator accounting,
    one ``sep_token`` after each document), the trailing partial chunk
    DROPPED (the GPT recipe: training consumes full sequences only).

    Scale shape: the assignment phases as above, then ONE shuffle
    keyed by ``chunk_id`` — each group is exactly ``seq_len`` tokens,
    so groups are uniform and skew-free by construction; within-chunk
    order is restored by sorting the collected (position, token)
    structs per group (an O(seq_len log seq_len) per-chunk sort, never
    a global one)."""
    # checkpoint: `assigned` is consumed by BOTH the token explode and
    # the total-length aggregate — without it the two-window assignment
    # DAG (and the tokenize) would run twice per action
    assigned = pack_assignments(
        df, seq_len, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, seed=seed, sep_tokens=1, u=u,
    ).localCheckpoint(eager=False)
    docs = df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
    placed = assigned.join(docs, id_col).select(
        F.col(id_col),
        "offset",
        F.concat(F.col("_toks"), F.array(F.lit(sep_token))).alias("_toks"),
    )
    toks = placed.select(
        "offset", F.posexplode("_toks").alias("_i", "tok")
    ).select((F.col("offset") + F.col("_i")).alias("_p"), "tok")
    # stream length from the slim assignment frame (n_tokens + 1 sep
    # each), not from re-tokenizing the corpus
    total = assigned.agg(
        F.sum(F.col("n_tokens") + F.lit(1)).alias("_n")
    )
    chunks = (
        toks.withColumn("chunk_id", F.floor(F.col("_p") / seq_len))
        .crossJoin(F.broadcast(total))
        .where(F.col("chunk_id") < F.floor(F.col("_n") / seq_len))
        .groupBy("chunk_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ).alias("tokens")
        )
    )
    return chunks
