"""Deterministic sampling/splitting and the corpus-preparation funnel."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import sampling
from go_crawler_spark.functions.corpus import (
    CorpusConfig,
    corpus_report,
    prepare_training_corpus,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_unit_hash_range_and_determinism(spark, documents):
    u = documents.select(sampling.unit_hash("doc_id").alias("u"))
    row = u.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0 and row.n == 500
    a = sorted(r.u for r in u.collect())
    b = sorted(r.u for r in u.collect())
    assert a == b


def test_hash_split_disjoint_exhaustive_deterministic(spark, documents):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = sampling.hash_split(documents, w).select("doc_id", "split")
    counts = {r.split: r.cnt for r in s1.groupBy("split").agg(
        F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 500          # exhaustive (split never NULL)
    assert set(counts) <= set(w)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    s2 = sampling.hash_split(documents, w).select("doc_id", "split")
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_hash_split_subset_stable(spark, documents):
    """Membership depends only on (key, seed): splitting a filtered
    subset assigns every row the same split as in the full corpus."""
    w = {"train": 0.7, "val": 0.3}
    full = {r.doc_id: r.split for r in sampling.hash_split(documents, w)
            .select("doc_id", "split").collect()}
    sub = sampling.hash_split(documents.where(F.col("doc_id") < 100), w)
    for r in sub.select("doc_id", "split").collect():
        assert full[r.doc_id] == r.split


def test_sample_fraction_nested_and_calibrated(spark, documents):
    small = sampling.sample_fraction(documents, 0.3)
    big = sampling.sample_fraction(documents, 0.6)
    small_ids = {r.doc_id for r in small.select("doc_id").collect()}
    big_ids = {r.doc_id for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids                  # nested samples
    assert 0.15 * 500 <= len(small_ids) <= 0.45 * 500
    assert 0.45 * 500 <= len(big_ids) <= 0.75 * 500


def test_stratified_sample_keeps_full_strata_and_drops_default(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(df, {"en": 1.0, "de": 0.4}, "lang")
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    assert got["en"] == 100                      # fraction 1.0 keeps all
    assert 10 <= got.get("de", 0) < 100
    none_listed = sampling.stratified_sample(df, {"fr": 1.0}, "lang")
    assert none_listed.count() == 0              # default_fraction=0


def test_sampling_validation_errors(spark, documents):
    with pytest.raises(ValueError):
        sampling.sample_fraction(documents, 1.5)
    with pytest.raises(ValueError):
        sampling.split_col({"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        sampling.split_col({"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError):
        sampling.split_col({})
    with pytest.raises(ValueError):
        sampling.stratified_sample(documents, {"en": 2.0}, "lang")


def _w(i, j):  # distinct filler token
    return f"w{i}x{j}"


def test_prepare_training_corpus_funnel(spark):
    """Planted junk is removed at the intended stage."""
    base = " ".join(_w(0, j) for j in range(60))
    near = base.replace(_w(0, 30), "zz")         # one token differs
    rows = [
        (0, base),
        (1, base),                               # exact dup of 0
        (2, near),                               # near dup of 0
        (3, " ".join(_w(3, j) for j in range(60))),
        (4, "too short"),                        # < min_tokens
        (5, " ".join(["spam"] * 40)),            # repetitive (Gopher cut)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CorpusConfig(min_tokens=10, min_quality=0.0, split_weights=None)
    stages = prepare_training_corpus(df, cfg)
    report = corpus_report(stages)
    assert report == {"annotated": 6, "filtered": 4, "deduped": 2, "corpus": 2}
    ids = sorted(r.doc_id for r in stages["corpus"].select("doc_id").collect())
    assert ids == [0, 3]
    assert stages["corpus"].columns == ["doc_id", "text"]


def test_prepare_training_corpus_split_and_lang(spark, documents):
    cfg = CorpusConfig(
        min_tokens=5, min_quality=0.0,
        split_weights={"train": 0.9, "val": 0.1},
    )
    stages = prepare_training_corpus(documents, cfg)
    corpus = stages["corpus"]
    assert "split" in corpus.columns
    n = corpus.count()
    assert 0 < n <= 500
    assert corpus.where(F.col("split").isNull()).count() == 0
    # language allow-list only ever shrinks the corpus
    cfg_en = CorpusConfig(min_tokens=5, min_quality=0.0, langs=("en",),
                          split_weights=None)
    n_en = prepare_training_corpus(documents, cfg_en)["corpus"].count()
    assert n_en <= n


def test_short_docs_survive_when_min_tokens_allows(spark):
    """Repetition fractions are NULL below 5 tokens; NULL must PASS the
    Gopher cuts so min_tokens stays the only length gate."""
    rows = [(1, "tiny doc here"), (2, " ".join(f"w{j}" for j in range(20)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CorpusConfig(min_tokens=3, min_quality=0.0, split_weights=None)
    ids = sorted(r.doc_id for r in prepare_training_corpus(df, cfg)["corpus"]
                 .select("doc_id").collect())
    assert ids == [1, 2]


def test_prepare_training_corpus_semantic_stage(spark, documents):
    """With an embeddings frame the funnel gains a SemDeDup stage after
    the text-level near-dup pass, and its result equals composing
    semantic_dedup over the deduped survivors by hand."""
    from go_crawler_spark.functions import semdedup

    embs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cfg = CorpusConfig(min_tokens=5, min_quality=0.0,
                       semantic_threshold=0.4, semantic_num_centroids=8,
                       split_weights={"train": 0.9, "val": 0.1})
    stages = prepare_training_corpus(documents, cfg, embeddings=embs)

    dedup_ids = {r.doc_id for r in stages["deduped"].select("doc_id").collect()}
    sem_ids = {r.doc_id for r in stages["semantic"].select("doc_id").collect()}
    assert sem_ids < dedup_ids  # proper subset: the stage is non-vacuous

    manual = semdedup.semantic_dedup(
        embs.join(stages["deduped"].select(F.col("doc_id").alias("vec_id")),
                  "vec_id", "leftsemi"),
        num_centroids=8, cosine_threshold=0.4,
    )
    assert sem_ids == {r.vec_id for r in manual.collect()}

    # the split runs over the semantic survivors, schema unchanged + split
    corpus = stages["corpus"]
    assert corpus.count() == len(sem_ids)
    assert set(corpus.columns) == set(documents.columns) | {"split"}


def test_semdedup_udf_assignment_parity(spark):
    """The large-C Arrow matmul assignment path must agree with the JVM
    broadcast-argmax path — both on (cluster_id, cos_c) per id and on
    the final survivor set."""
    from go_crawler_spark.functions import semdedup

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = semdedup.centroids_by_id(df, num_centroids=8)

    jvm = semdedup.assign_clusters(df, cents).select(
        "vec_id", "cluster_id", "cos_c"
    )
    udf = semdedup.assign_clusters_udf(df, cents).select(
        "vec_id", "cluster_id", "cos_c"
    )
    jvm_map = {r.vec_id: (r.cluster_id, round(r.cos_c, 6)) for r in jvm.collect()}
    udf_map = {r.vec_id: (r.cluster_id, round(r.cos_c, 6)) for r in udf.collect()}
    assert jvm_map == udf_map

    got = semdedup.semantic_dedup_assigned(
        semdedup.assign_clusters_udf(df, cents), cosine_threshold=0.4
    )
    want = semdedup.semantic_dedup(df, num_centroids=8, cosine_threshold=0.4)
    assert {r.vec_id for r in got.collect()} == {r.vec_id for r in want.collect()}

    # ndarray centroid input: row index becomes the cluster id
    import numpy as np
    cent_rows = cents.orderBy("cid").collect()
    arr = np.stack([np.asarray(r.cemb) for r in cent_rows])
    via_arr = semdedup.assign_clusters_udf(df, arr)
    by_arr = {r.vec_id: r.cluster_id for r in via_arr.collect()}
    cid_to_idx = {r.cid: i for i, r in enumerate(cent_rows)}
    assert by_arr == {v: cid_to_idx[c] for v, (c, _) in jvm_map.items()}


def test_prepare_training_corpus_lm_gate(spark, documents):
    """lm_tail_frac drops roughly that fraction of survivors, the
    dropped docs score strictly worse on average, and a trusted
    reference corpus changes the model (CCNet setup) without changing
    the gate mechanics."""
    from go_crawler_spark.functions import lm

    cfg = CorpusConfig(min_tokens=5, min_quality=0.0, split_weights=None,
                       lm_tail_frac=0.3)
    stages = prepare_training_corpus(documents, cfg)
    n_dedup = stages["deduped"].count()
    kept = stages["lm_filtered"]
    n_kept = kept.count()
    assert 0.55 * n_dedup <= n_kept <= 0.75 * n_dedup  # ~70% survive

    model = lm.train_bigram_lm(stages["deduped"])
    scored = lm.score_perplexity(stages["deduped"], model)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    ppl = {r.doc_id: r.perplexity for r in scored.collect()}
    kept_mean = sum(ppl[d] for d in kept_ids) / len(kept_ids)
    dropped = [p for d, p in ppl.items() if d not in kept_ids and p is not None]
    assert dropped and kept_mean < sum(dropped) / len(dropped)
    assert stages["corpus"].count() == n_kept

    # reference-corpus training path runs end to end
    ref = documents.limit(100)
    n_ref = prepare_training_corpus(
        documents, cfg, lm_reference=ref
    )["lm_filtered"].count()
    assert 0 < n_ref <= n_dedup


def test_prepare_training_corpus_classifier_gate(spark, documents):
    """GPT-3's classifier stage: trains against a trusted positive
    slice, gates with the deterministic Pareto rule BEFORE dedup, and
    the config validates its required reference."""
    import pyspark.sql.functions as F

    pos = documents.where(F.col("doc_id") % 5 == 0)
    cfg = CorpusConfig(min_tokens=5, min_quality=0.0, split_weights=None,
                       classifier_pareto_shape=9.0)
    stages = prepare_training_corpus(documents, cfg, classifier_positive=pos)
    n_filtered = stages["filtered"].count()
    n_kept = stages["classifier_kept"].count()
    # the gate actually cuts (self-trained scores hover near the prior,
    # so pareto(9) keeps few) and never grows the pool
    assert 0 < n_kept < n_filtered
    # downstream stages consume the gated pool
    assert stages["deduped"].count() <= n_kept
    # reruns are identical (hash-derived draw)
    again = prepare_training_corpus(documents, cfg, classifier_positive=pos)
    assert again["classifier_kept"].count() == n_kept

    with pytest.raises(ValueError):
        prepare_training_corpus(documents, cfg)  # no positive reference


def test_prepare_training_corpus_dsir_stage(spark, documents):
    """DSIR selection: exactly k docs picked from the cleaned pool,
    a subset of the prior stage, deterministic across reruns."""
    import pyspark.sql.functions as F

    target = documents.where(F.col("lang") == "en")
    cfg = CorpusConfig(min_tokens=5, min_quality=0.0, split_weights=None,
                       dsir_k=50, dsir_num_buckets=1024)
    stages = prepare_training_corpus(documents, cfg, dsir_target=target)
    picked = stages["dsir_selected"]
    ids = sorted(r.doc_id for r in picked.select("doc_id").collect())
    assert len(ids) == 50
    dedup_ids = {r.doc_id for r in stages["deduped"].select("doc_id").collect()}
    assert set(ids) <= dedup_ids
    assert stages["corpus"].count() == 50
    again = prepare_training_corpus(documents, cfg, dsir_target=target)
    ids2 = sorted(r.doc_id
                  for r in again["dsir_selected"].select("doc_id").collect())
    assert ids == ids2

    with pytest.raises(ValueError):
        prepare_training_corpus(documents, cfg)  # no target corpus
