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


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every byte-identical text."""
    h = F.xxhash64(F.col(text_col)).alias("_th")
    w = df.select(h, F.col(id_col))
    keep = w.groupBy("_th").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, min_id) for groups with >1 member."""
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_id"))
        .where(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_col(text: Column | str, num_hashes: int = 64, shingle_k: int = 5) -> Column:
    """array<long> of ``num_hashes`` min-hashes over word shingles.

    Each permutation is xxhash64(shingle, salt_i) — all JVM-side.
    """
    sh = shingles_col(text, shingle_k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    ).alias("minhash_sig")


def lsh_bands(df: DataFrame, sig_col: str = "minhash_sig", bands: int = 16) -> DataFrame:
    """Explode a signature into (band_idx, band_hash) rows for bucketing."""
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


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    prepared = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_col(text_col, num_hashes, shingle_k),
        shingles_col(text_col, shingle_k).alias("_sh"),
    )
    banded = lsh_bands(prepared, "minhash_sig", bands).select(
        "id", "band_idx", "band_hash", "_sh"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
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
# SimHash (vectorized Arrow UDF)
# ---------------------------------------------------------------------------


def _token_hash64(tok: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


@F.pandas_udf(T.LongType())
def udf_simhash(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash of a token array column (numpy bit voting)."""
    cache: dict[str, int] = {}
    out = np.zeros(len(tokens), dtype=np.int64)
    bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        hs = np.fromiter(
            (cache.setdefault(t, _token_hash64(t)) for t in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        votes = ((hs[:, None] & bit_masks[None, :]) != 0).sum(axis=0)
        sig = np.where(votes * 2 >= len(toks), bit_masks, np.uint64(0)).sum(dtype=np.uint64)
        out[i] = np.int64(sig)
    return pd.Series(out)


def simhash_col(text: Column | str) -> Column:
    return udf_simhash(tokens_col(text)).alias("simhash")


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within hamming distance ``max_hamming`` of 64-bit SimHash.

    Pigeonhole banding: split into 4 x 16-bit pieces; any pair with
    hamming <= 3 matches on at least one piece -> equi-join, then exact
    hamming verification via bit_count(xor) (JVM-side).
    """
    sig = df.select(F.col(id_col).alias("id"), simhash_col(text_col))
    pieces = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("piece_idx"),
                        F.shiftright(F.col("simhash"), p * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("piece"),
                    )
                    for p in range(4)
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


def embedding_near_dups(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    num_planes: int = 16,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    LSH bucket join on the hyperplane signature (vectors this similar
    almost surely share the exact signature), then exact cosine verify.
    """
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    sig = hyperplane_signature_udf(dim, num_planes)
    s = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb")).withColumn(
        "bucket", sig(F.col("emb"))
    )
    a, b = s.alias("a"), s.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_col(F.col("a.emb"), F.col("b.emb")).alias("cosine"),
    )
    return cand.where(F.col("cosine") >= cosine_threshold)
