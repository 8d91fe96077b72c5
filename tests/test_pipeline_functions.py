"""Training-data pipeline operators: dedup, simsearch, textstats, multimodal.

Runs against the driver's sf0.001 testdata (documents/embeddings) plus
small constructed cases with known answers.
"""

import pandas as pd
import numpy as np
import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import dedup, multimodal, simsearch, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_known_case(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique text")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup.exact_dedup(df).collect()}
    assert kept == {1, 3}
    groups = dedup.duplicate_groups(df).collect()
    assert len(groups) == 1 and groups[0].n_dups == 2 and groups[0].min_id == 1


def test_minhash_near_dups_known_case(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("lazy", "sleepy")  # 1-word change -> high jaccard
    other = "completely different content about spark distributed query engines at scale"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = dedup.minhash_near_dups(df, jaccard_threshold=0.3, shingle_k=3).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_minhash_permutations_are_distinct(spark):
    """Regression: the per-permutation salt must actually vary.

    A two-parameter transform lambda binds the second arg to the ARRAY
    INDEX (not the salt), collapsing all permutations into one; the
    signature then has one distinct value and LSH recall degenerates to
    the raw jaccard.  A healthy 64-permutation signature over >=8
    shingles has many distinct values, and two ~0.5-jaccard docs agree
    on roughly jaccard*64 positions (binomial; [10, 54] is >6 sigma)."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("lazy", "sleepy")
    df = spark.createDataFrame([(1, base), (2, near)], "doc_id long, text string")
    sig = df.select(
        "doc_id",
        dedup.minhash_signature_col("text", num_hashes=64, shingle_k=3).alias("sig"),
    )
    rows = {r.doc_id: r.sig for r in sig.collect()}
    assert len(set(rows[1])) > 8, "permutations collapsed to one value"
    agree = sum(a == b for a, b in zip(rows[1], rows[2]))
    assert 10 <= agree <= 54


def test_minhash_choose_bands_curve():
    # threshold 0.8 with 64 hashes: r=4/b=16 meets 99.9% recall
    assert dedup.choose_bands(64, 0.8) == 16
    # low thresholds force r=1 (recall ~1 at j=0.3 needs 64 bands)
    assert dedup.choose_bands(64, 0.3) == 64
    # recall at the threshold is >= target for the chosen banding
    for t in (0.3, 0.5, 0.8, 0.9):
        b = dedup.choose_bands(64, t)
        r = 64 // b
        assert 1 - (1 - t**r) ** b >= 0.999


def test_simhash_wide_hamming_pigeonhole(spark):
    """max_hamming > 3 must still find every pair (piece count derives
    from the threshold).  With max_hamming=63 every pair is a candidate,
    so the result must equal the exact all-pairs hamming computation."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "the quick brown fox jumps over the sleepy dog " * 3),
        (3, "unrelated words entirely here about lakehouse tables"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    sigs = {
        r.doc_id: r.simhash
        for r in df.select("doc_id", dedup.simhash_col("text")).collect()
    }

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    expected = {
        (a, b): hamming(sigs[a], sigs[b])
        for a in sigs
        for b in sigs
        if a < b
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_dups(df, max_hamming=63).collect()
    }
    assert got == expected
    # and a mid-range threshold returns exactly the pairs within it
    t = 20
    got20 = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_dups(df, max_hamming=t).collect()
    }
    assert got20 == {k: v for k, v in expected.items() if v <= t}


def test_simhash_near_dups_known_case(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("dog ", "dog! ", 1)
    other = "unrelated words entirely here about lakehouse tables and bloom filters"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = dedup.simhash_near_dups(df, max_hamming=3).collect()
    ids = {(p.id_a, p.id_b) for p in pairs}
    assert (1, 2) in ids
    assert (1, 3) not in ids and (2, 3) not in ids


def test_embedding_near_dups_and_cosine(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    v_near = [0.999, 0.04, 0.0, 0.0]
    v_far = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, v), (2, v_near), (3, v_far)], "vec_id long, embedding array<float>"
    )
    pairs = dedup.embedding_near_dups(df, dim=4, cosine_threshold=0.99).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_embedding_multiband_recall_and_bucket_bound(spark):
    """Multi-band AND/OR LSH: near-threshold recall must beat a single
    16-plane band, while band selectivity stays at 2^r granularity (a
    clustered corpus must not collapse into a handful of buckets)."""
    rng = np.random.default_rng(7)
    dim, thr = 32, 0.95
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    rows, true_pairs = [], set()
    for i in range(40):  # clustered: pairs straddling the threshold
        noise = rng.standard_normal(dim)
        noise -= noise @ base * base
        noise /= np.linalg.norm(noise)
        target = 0.955 + 0.02 * rng.random()
        v = target * base + np.sqrt(1 - target**2) * noise
        rows.append((i, [float(x) for x in v]))
    for j in range(40, 80):  # background
        v = rng.standard_normal(dim)
        rows.append((j, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # ground truth: exact all-pairs cosine
    mat = np.stack([np.array(r[1]) for r in rows])
    sims = mat @ mat.T
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if sims[i, j] >= thr:
                true_pairs.add((i, j))
    assert len(true_pairs) >= 40  # the cluster is dense

    found = {
        (p.id_a, p.id_b)
        for p in dedup.embedding_near_dups(
            df, dim=dim, cosine_threshold=thr
        ).collect()
    }
    assert found <= true_pairs  # exact verify: no false positives
    recall = len(found) / len(true_pairs)
    single = {
        (p.id_a, p.id_b)
        for p in dedup.embedding_near_dups(
            df, dim=dim, num_bands=1, planes_per_band=16, cosine_threshold=thr
        ).collect()
    }
    assert recall >= 0.9
    assert recall > len(single) / len(true_pairs)  # OR over bands helps

    # selectivity: every band keys on a full r-bit signature, so two
    # orthogonal background vectors almost never share a bucket
    b = dedup.choose_hyperplane_bands(thr, 16)
    sig = dedup.hyperplane_bands_udf(dim, b, 16)
    banded = (
        df.select(F.posexplode(sig(F.col("embedding"))).alias("band_idx", "band_sig"))
        .groupBy("band_idx", "band_sig")
        .count()
    )
    max_bucket = banded.agg(F.max("count")).first()[0]
    assert max_bucket <= 45  # ~ cluster size; background never merges in


def test_brute_force_topk_oracle(spark, embeddings):
    """Exact cosine top-k must match a numpy oracle on real testdata."""
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    q = mat[0].tolist()

    got = simsearch.brute_force_topk(embeddings, q, k=5).collect()

    qn = np.array(q) / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ qn) / np.where(norms > 0, norms, 1)
    order = np.lexsort((ids, -cos))[:5]
    assert [r.vec_id for r in got] == ids[order].tolist()
    for r, i in zip(got, order):
        assert r.cosine == pytest.approx(cos[i], abs=1e-9)


def test_ivf_recall(spark, embeddings):
    cents = simsearch.train_centroids(embeddings, num_centroids=8)
    indexed = simsearch.ivf_index(embeddings, cents).cache()
    q = embeddings.select("embedding").first()[0]
    exact = [r.vec_id for r in simsearch.brute_force_topk(embeddings, list(q), k=10).collect()]
    approx = [r.vec_id for r in simsearch.ivf_topk(indexed, cents, list(q), k=10, nprobe=4).collect()]
    # recall@10 with half the lists probed should be high on 500 vecs
    assert len(set(exact) & set(approx)) >= 6
    # and the probed subset is genuinely smaller than the corpus
    assert indexed.where(F.col("list_id").isin([0])).count() < embeddings.count()


def test_textstats_on_documents(spark, documents):
    stats = textstats.with_text_stats(documents.limit(50))
    rows = stats.collect()
    for r in rows:
        assert r.n_tokens >= 0 and 0.0 <= r.quality_score <= 1.0
        assert r.lang_guess is not None


def test_lang_id_known_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog are in the house and they have food"),
            (2, "der Hund und die Katze sind nicht im Haus mit der Maus"),
            (3, "le chat et le chien sont dans la maison pour la nuit"),
            (4, "el perro y el gato no son una casa para el invierno"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", textstats.lang_id_col("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_fingerprint_deterministic_and_discriminative(spark):
    df = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot golf"),
         (2, "alpha bravo charlie delta echo foxtrot golf"),
         (3, "completely different words on this row here")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in df.select("doc_id", textstats.fingerprint_col("text").alias("fp")).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 60)
    assert media.count() == 60
    feats = multimodal.image_features(media).collect()
    assert len(feats) == 20  # every 3rd row is an image
    for f_ in feats:
        assert f_.n_bytes > 0 and 0 < f_.byte_entropy <= 8.0
        assert f_.thumb is not None
    # deterministic: same seed -> same phash
    feats2 = multimodal.image_features(multimodal.synth_media(spark, 60)).collect()
    assert {f_.media_id: f_.phash for f_ in feats} == {f_.media_id: f_.phash for f_ in feats2}

    frames = multimodal.sample_frames(media, every_ms=500)
    assert frames.where(F.col("frame_idx") == 0).count() == frames.select("media_id").distinct().count()

    # compressed codecs stay gated: a JPEG payload under fake=False raises
    jpeg = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 0, "kind": "image", "payload": b"\xff\xd8\xff",
              "mime": "image/jpeg", "width": 1, "height": 1, "duration_ms": None}]
        ),
        schema=multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        multimodal.image_features(jpeg, fake=False).collect()


def test_ppm_decode_roundtrip_and_errors():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    # header comments + multi-whitespace are legal PPM
    buf = b"P6\n# a comment\n7  5\n# another\n255\n" + px.tobytes()
    assert (multimodal.decode_ppm(buf) == px).all()
    with pytest.raises(ValueError, match="P6 magic"):
        multimodal.decode_ppm(b"P5\n1 1\n255\nx")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_ppm(b"P6\n2 2\n255\n" + b"\0" * 11)
    with pytest.raises(ValueError, match="maxval"):
        multimodal.decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)


def test_image_features_real_ppm_golden(spark):
    """Hand-computed golden for the REAL decode path: a 2x2 PPM with
    grays (20, 100 / 255, 0).  Nearest-neighbor resize to 8x8 repeats
    each pixel into a 4x4 block; median of the 64 thumb values is 60,
    so bits = [gray > 60] give phash 0x0F0F0F0FF0F0F0F0; the four
    equiprobable gray values make the pixel entropy exactly 2 bits."""
    px = np.array(
        [[[10, 20, 30], [200, 100, 0]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    buf = multimodal.encode_ppm(px)
    media = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 7, "kind": "image", "payload": buf,
              "mime": multimodal.PPM_MIME, "width": 2, "height": 2,
              "duration_ms": None}]
        ),
        schema=multimodal.MEDIA_SCHEMA,
    )
    [r] = multimodal.image_features(media, fake=False).collect()
    assert r.media_id == 7
    assert r.n_bytes == len(buf) == 11 + 12
    assert r.phash == 0x0F0F0F0FF0F0F0F0
    assert r.byte_entropy == pytest.approx(2.0)
    want_thumb = np.repeat(np.repeat(
        np.array([[20, 100], [255, 0]], dtype=np.uint8), 4, axis=0), 4, axis=1)
    assert bytes(r.thumb) == want_thumb.tobytes()


def test_image_features_real_vs_fake_end_to_end(spark):
    """fake=False runs end-to-end over synth_media's real PPM payloads
    (distributed, Arrow-batched) and is deterministic."""
    media = multimodal.synth_media(spark, 30)
    real = {r.media_id: r for r in multimodal.image_features(media, fake=False).collect()}
    assert len(real) == 10
    # independent scalar reference per image
    rows = {r.media_id: bytes(r.payload) for r in media.where(F.col("kind") == "image").collect()}
    for mid, buf in rows.items():
        rgb = multimodal.decode_ppm(buf).astype(np.int64)
        h, w = rgb.shape[:2]
        gray = (rgb.sum(axis=2) // 3).astype(np.uint8)
        ti = np.arange(8)
        thumb = gray[(ti * h) // 8][:, (ti * w) // 8]
        bits = (thumb.ravel() > np.median(thumb))[:64]
        wts = np.uint64(1) << np.arange(64, dtype=np.uint64)
        assert real[mid].phash == int(np.int64((bits * wts).sum(dtype=np.uint64)))
        assert bytes(real[mid].thumb) == thumb.tobytes()
        c = np.bincount(gray.ravel(), minlength=256)
        p = c[c > 0] / gray.size
        assert real[mid].byte_entropy == pytest.approx(float(-(p * np.log2(p)).sum()))


def test_multimodal_vectorized_matches_scalar_reference(spark):
    """The batched numpy kernels must reproduce the per-row definition
    exactly (decode/resize/phash/entropy + frame sampling), including
    variable-length and empty payloads."""
    import pandas as pd

    rows = []
    rng = np.random.default_rng(7)
    for i, size in enumerate([0, 5, 100, 256, 300, 256, 17, 256]):
        rows.append(
            {
                "media_id": i,
                "kind": "image" if i % 2 == 0 else "video",
                "payload": rng.integers(0, 256, size=size, dtype=np.uint8).tobytes(),
                "mime": "x",
                "width": 16,
                "height": 16,
                "duration_ms": int(size * 13) if i % 2 else None,
            }
        )
    media = spark.createDataFrame(pd.DataFrame(rows), schema=multimodal.MEDIA_SCHEMA)

    got = {r.media_id: r for r in multimodal.image_features(media).collect()}
    assert set(got) == {0, 2, 4, 6}
    for mid, r in got.items():
        buf = rows[mid]["payload"]
        arr = np.frombuffer(buf[:256].ljust(256, b"\0"), dtype=np.uint8).reshape(16, 16)
        thumb = arr[::2, ::2]
        bits = (thumb > np.median(thumb)).ravel()[:64]
        w = np.uint64(1) << np.arange(64, dtype=np.uint64)
        want_phash = int((bits * w).sum(dtype=np.uint64).astype(np.int64))
        if buf:
            c = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
            p = c[c > 0] / len(buf)
            want_ent = float(-(p * np.log2(p)).sum())
        else:
            want_ent = 0.0
        assert r.n_bytes == len(buf)
        assert r.phash == want_phash
        assert abs(r.byte_entropy - want_ent) < 1e-9
        assert r.thumb == thumb.tobytes()

    frames = multimodal.sample_frames(media, every_ms=400).collect()
    want_frames = []
    for row in rows:
        if row["kind"] != "video":
            continue
        buf, dur = row["payload"], int(row["duration_ms"] or 0)
        for j, ts in enumerate(range(0, dur, 400)):
            lo = (j * 16) % max(len(buf) - 16, 1)
            want_frames.append((row["media_id"], j, ts, buf[lo : lo + 16]))
    got_frames = sorted(
        (r.media_id, r.frame_idx, r.frame_ts_ms, bytes(r.frame)) for r in frames
    )
    assert got_frames == sorted(want_frames) and got_frames


def test_simhash_dual_implementations_agree(spark, documents):
    """Implementation-diversity oracle for SimHash (DuckDB cannot express
    xxhash64): the Arrow/numpy bit-vote and the pure-Column aggregate
    bit-vote must produce identical signatures over the real corpus and
    over edge cases (empty / null text)."""
    both = documents.select(
        dedup.simhash_col("text").alias("a"),
        dedup.simhash_col_native("text").alias("b"),
    )
    assert both.where(F.col("a") != F.col("b")).count() == 0
    assert both.where(F.col("a") == 0).count() == 0  # non-vacuous

    edge = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one"), (4, "a b c d e f g")],
        "doc_id long, text string",
    )
    rows = edge.select(
        "doc_id",
        dedup.simhash_col("text").alias("a"),
        dedup.simhash_col_native("text").alias("b"),
    ).collect()
    for r in rows:
        assert r.a == r.b, r
    assert rows[0].a == 0 and rows[1].a == 0


def test_ivf_knn_join_exact_at_full_probe_and_recall(spark, embeddings):
    """The distributed k-NN join: with nprobe == C it must EQUAL the
    brute-force join row-for-row (differential oracle); with nprobe < C
    it keeps recall while touching only nprobe/C of the corpus."""
    C = 8
    cents = simsearch.train_centroids(embeddings, num_centroids=C)
    indexed = simsearch.ivf_index(embeddings, cents).cache()
    queries = embeddings.limit(6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    exact = simsearch.brute_force_topk_multi(embeddings, queries, k=5).collect()
    full = simsearch.ivf_knn_join(indexed, queries, cents, k=5, nprobe=C).collect()
    key = lambda rows: sorted((r.q_id, r.rank, r.vec_id, round(r.cosine, 9)) for r in rows)
    assert key(full) == key(exact)

    approx = simsearch.ivf_knn_join(indexed, queries, cents, k=5, nprobe=3).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r.q_id, set()).add(r.vec_id)
    by_q_approx = {}
    for r in approx:
        by_q_approx.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [
        len(by_q_exact[q] & by_q_approx.get(q, set())) / len(by_q_exact[q])
        for q in by_q_exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # probing 3/8 of the lists
    # every query's own vector is its top hit at full probe
    own = {r.q_id for r in full if r.rank == 1 and r.vec_id == r.q_id}
    assert own == set(by_q_exact)


def test_connected_components_and_survivors(spark):
    """Transitive clustering: A~B, B~C collapse to one component even
    with no A~C pair; survivors = min id per cluster + unpaired docs."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (21, 20), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup.dedup_survivors_from_pairs(docs, pairs).collect()}
    assert kept == {1, 10, 20, 99}


def test_sessionize_gap_boundaries(spark):
    """Events exactly at the gap stay in-session; one microsecond past
    it starts a new session; indexes are per-user."""
    from datetime import datetime, timedelta

    from go_crawler_spark.functions.events import session_stats, sessionize

    t0 = datetime(2024, 1, 1)
    gap = timedelta(minutes=30)
    rows = [
        (0, t0, 1, "a", 1.0, None),
        (1, t0 + gap, 1, "a", 2.0, None),                       # == gap: same session
        (2, t0 + gap + gap + timedelta(microseconds=1), 1, "a", 4.0, None),  # > gap: new
        (3, t0, 2, "a", 8.0, None),                              # other user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r.event_id: (r.user_id, r.session_idx)
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {0: (1, 0), 1: (1, 0), 2: (1, 1), 3: (2, 0)}
    st = {
        (r.user_id, r.session_idx): (r.n_events, r.total_value)
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert st == {(1, 0): (2, 3.0), (1, 1): (1, 4.0), (2, 0): (1, 8.0)}


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than max_iter rounds must fail loudly, never
    return silently-wrong split clusters (review r3 finding)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 0, -1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=1)
    # with enough rounds the same chain converges to one cluster
    comp = {r.id: r.component for r in dedup.connected_components(chain).collect()}
    assert set(comp.values()) == {1}


def test_review4_guards(spark):
    """Round-3 review batch 4: input-validation and edge-case guards."""
    # non-divisor band count must raise, not silently drop positions
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        dedup.minhash_near_dups(df, num_hashes=64, bands=24)
    # empty embeddings input -> zero pairs, not a TypeError
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert dedup.embedding_near_dups(empty).count() == 0
    # unknown politeness mode must raise
    from go_crawler_spark.operators.frontier import politeness_select

    fr = spark.createDataFrame(
        [(1, "http://h/x", "h", 1.0, 0, None, None)],
        "url_hash long, url string, host string, priority double, "
        "discovered_iter int, retrieved_at timestamp, last_attempt timestamp",
    )
    with pytest.raises(ValueError, match="unknown politeness mode"):
        politeness_select(fr, None, 1, 4, None, mode="salted-quota")
    # token-based mean word length: 1-char words average 1.0, not ~2.0
    feats = textstats.quality_features(F.lit("a b a b a b"))
    row = spark.range(1).select(feats["mean_word_len"].alias("m")).collect()[0]
    assert row.m == 1.0


def test_duplicate_ngram_spans_known_case(spark):
    """Hand-computed Lee-et-al exact-substring spans: cross-doc shares,
    within-doc repeats, gap-split spans, and too-short docs."""
    rows = [
        ("A", "a b c d e f g"),            # shares "a b c d" prefix with B
        ("B", "x a b c d y z"),
        ("C", "p q r p q r p q"),          # within-doc repetition only
        ("D", "u v w"),                    # no duplicated window
        ("E", "u v"),                      # shorter than n: no windows
        ("F", "a b c z1 z2 z3 z4 a b c"),  # two disjoint spans
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in dedup.duplicate_ngram_spans(df, n=3).collect()
    )
    assert got == [
        ("A", 1, 4, 4),
        ("B", 2, 5, 4),
        ("C", 1, 8, 8),
        ("F", 1, 3, 3),
        ("F", 8, 10, 3),
    ]


def test_duplicate_ngram_spans_min_count(spark):
    """min_count=3 requires a third occurrence before a span is marked."""
    rows = [("A", "a b c d"), ("B", "z a b c"), ("C", "a b c q")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got3 = dedup.duplicate_ngram_spans(df, n=3, min_count=3).collect()
    assert sorted((r.doc_id, r.span_start) for r in got3) == [
        ("A", 1), ("B", 2), ("C", 1),
    ]
    got4 = dedup.duplicate_ngram_spans(df, n=4, min_count=2).collect()
    assert got4 == []  # no shared 4-token window


def test_repetition_stats_known_case(spark):
    """Gopher repetition fractions, hand-computed."""
    rows = [
        ("d1", "the cat the cat runs"),       # top 2-gram "the cat" x2
        ("d2", "a b c d e a b c d e"),        # duplicated 5-gram
        ("d3", "x y z"),                      # < 5 tokens: dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.top2gram_char_frac, r.dup5gram_char_frac)
        for r in textstats.repetition_stats(df).collect()
    }
    assert set(got) == {"d1", "d2"}
    # d1: nchars=20; "the cat" twice -> 14/20; single 5-gram window -> 0
    assert got["d1"] == (0.7, 0.0)
    # d2: nchars=19; top 2-gram 2*3=6 chars; "a b c d e" twice -> 18/19
    assert got["d2"] == (round(6 / 19, 6), round(18 / 19, 6))


def test_repetition_stats_nonvacuous_on_fixture(spark, documents):
    out = textstats.repetition_stats(documents)
    assert out.count() > 0
    row = out.agg(F.max("top2gram_char_frac").alias("m")).collect()[0]
    assert 0.0 < row.m <= 1.0


def test_cut_duplicate_spans_known_case(spark):
    """Cut removes exactly the span-covered tokens; untouched docs pass
    through; a fully-duplicated doc cuts to empty."""
    rows = [
        ("A", "a b c d e f g"),
        ("B", "x a b c d y z"),
        ("C", "u v w"),                    # no spans: passthrough
        ("D", "p q r p q r"),              # fully covered (within-doc dup)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = dedup.duplicate_ngram_spans(df, n=3)
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in dedup.cut_duplicate_spans(df, spans).collect()
    }
    # A: span [1,4] ("a b c d") cut -> "e f g"
    assert got["A"] == ("e f g", 4)
    # B: span [2,5] cut -> "x y z"
    assert got["B"] == ("x y z", 4)
    assert got["C"] == ("u v w", 0)
    # D: windows "p q r","q r p","r p q","p q r" -> all positions dup
    assert got["D"] == ("", 6)


def test_contaminated_spans_known_case(spark):
    """GPT-3-style decontamination: only windows present in the
    benchmark mark spans; within-corpus duplication alone does not."""
    corpus = spark.createDataFrame(
        [
            ("c1", "a b c d e f g h"),    # tokens 2-5 leak from benchmark
            ("c2", "x y z w v u"),        # clean
            ("c3", "p q r s p q r s"),    # repeated internally, not in bench
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("b1", "zz b c d e qq"), ("b2", "irrelevant words only")],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in dedup.contaminated_spans(corpus, bench, n=4).collect()
    )
    # bench 4-gram "b c d e" occurs at corpus c1 pos 2 -> span [2,5]
    assert got == [("c1", 2, 5, 4)]
    # composing with the cut step removes exactly the leaked range
    cut = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in dedup.cut_duplicate_spans(
            corpus, dedup.contaminated_spans(corpus, bench, n=4)
        ).collect()
    }
    assert cut["c1"] == ("a f g h", 4)
    assert cut["c2"] == ("x y z w v u", 0)


def test_contamination_overlap_known_case(spark):
    """PaLM overlap-fraction rule: the fraction of a doc's n-grams seen
    in the benchmark decides whole-doc contamination — a doc quoting
    one item stays, a near-copy drops."""
    corpus = spark.createDataFrame(
        [
            ("c1", "a b c d e"),           # near-copy of bench b1
            ("c2", "a b c x y z w"),       # one leaked 3-gram of 5
            ("c3", "p q r s t"),           # clean
            ("c4", "u v"),                 # < n tokens: no windows, absent
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("b1", "zz a b c d e qq")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r
        for r in dedup.contamination_overlap(
            corpus, bench, n=3, threshold=0.7
        ).collect()
    }
    # c1 windows: abc bcd cde — all three in bench -> frac 1.0
    assert (got["c1"].n_windows, got["c1"].n_hits) == (3, 3)
    assert got["c1"].overlap_frac == 1.0 and got["c1"].contaminated is True
    # c2 windows: abc bcx cxy xyz yzw — only abc leaks -> 0.2
    assert (got["c2"].n_windows, got["c2"].n_hits) == (5, 1)
    assert got["c2"].overlap_frac == 0.2 and got["c2"].contaminated is False
    assert got["c3"].n_hits == 0 and got["c3"].contaminated is False
    assert "c4" not in got


def test_pii_scrub_known_cases(spark):
    from go_crawler_spark.functions import scrub

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org thanks"),
        (2, "server 192.168.1.254 and 8.8.8.8 are up"),
        (3, "ssn 123-45-6789 but not 1234-56-789 or 123-456-789"),
        (4, "no pii here, just 300.1.2.3 (invalid octet) and a@b"),
        (5, "combo a.b@c.io at 10.0.0.1 ssn 000-00-0000"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in scrub.scrub_documents(df).collect()}
    assert got[1].redacted_text == "mail me at <EMAIL> thanks"
    assert (got[1].email_count, got[1].n_redacted) == (1, 1)
    assert got[2].redacted_text == "server <IP> and <IP> are up"
    assert got[2].ipv4_count == 2
    assert got[3].redacted_text == "ssn <SSN> but not 1234-56-789 or 123-456-789"
    assert got[3].ssn_count == 1
    # 300.1.2.3: 300 is not a valid octet -> "30" + "0.1.2.3"? No: \b(...)
    # requires a full dotted quad of valid octets starting at a word
    # boundary, so nothing matches; a@b has no TLD
    assert got[4].n_redacted == 0
    assert got[4].redacted_text == rows[3][1]
    assert got[5].redacted_text == "combo <EMAIL> at <IP> ssn <SSN>"
    assert got[5].n_redacted == 3


# ---------------------------------------------------------------------------
# SemDeDup (semantic dedup over embedding clusters)
# ---------------------------------------------------------------------------


def test_semdedup_known_case(spark):
    """Hand-checkable golden: exact-dup vectors collapse to one per
    group, and at a looser threshold the farthest-from-centroid member
    survives (the paper's keep rule)."""
    from go_crawler_spark.functions import semdedup

    rows = [
        (0, [1.0, 0.0]),  # centroid 0
        (1, [0.0, 1.0]),  # centroid 1
        (2, [1.0, 0.0]),  # exact dup of 0 -> cluster 0
        (3, [1.0, 0.0]),  # exact dup of 0 -> cluster 0
        (4, [0.0, 1.0]),  # exact dup of 1 -> cluster 1
        (5, [0.8, 0.6]),  # cluster 0 edge member, cos_c = 0.8
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    tight = semdedup.semantic_dedup(df, num_centroids=2, cosine_threshold=0.99)
    assert {r.vec_id for r in tight.collect()} == {0, 1, 5}

    # tau=0.7 pulls id5 (cos to id0 = 0.8) into the dup group; keep-order
    # is cos_c ASC so the cluster-edge vector 5 survives and the three
    # centroid-core copies 0/2/3 are all dropped
    loose = semdedup.semantic_dedup(df, num_centroids=2, cosine_threshold=0.7)
    assert {r.vec_id for r in loose.collect()} == {5, 1}

    dropped = semdedup.semantic_dedup(
        df, num_centroids=2, cosine_threshold=0.7, return_dropped=True
    )
    assert {r.vec_id for r in dropped.collect()} == {0, 2, 3, 4}


def test_semdedup_threshold_extremes(spark):
    from go_crawler_spark.functions import semdedup

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = df.count()
    # threshold above any possible cosine: nothing is a duplicate
    assert (
        semdedup.semantic_dedup(df, num_centroids=8, cosine_threshold=1.5).count()
        == n
    )
    # threshold below any possible cosine: every pair qualifies, so only
    # the first-in-keep-order member of each cluster survives
    all_dup = semdedup.semantic_dedup(df, num_centroids=8, cosine_threshold=-1.5)
    per_cluster = {r.cluster_id for r in all_dup.collect()}
    assert all_dup.count() == len(per_cluster)


def test_semdedup_matches_numpy_reference(spark):
    """Implementation diversity: the Spark plan (broadcast argmax +
    cluster-keyed semi-join) must reproduce a closed-form numpy
    evaluation of the same rule on real testdata."""
    import numpy as np

    from go_crawler_spark.functions import semdedup

    pdf = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf["vec_id"].to_numpy()
    embs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    unit = embs / np.maximum(norms, 1e-300)

    C, tau = 8, 0.4
    cents = unit[:C]  # rows already sorted by vec_id
    cos_to_cents = np.round(unit @ cents.T, 6)
    cluster = cos_to_cents.argmax(axis=1)  # ties -> lowest cid, as argmax
    cos_c = cos_to_cents[np.arange(len(ids)), cluster]

    sims = np.round(unit @ unit.T, 6)
    survivors = set()
    for i in range(len(ids)):
        same = (cluster == cluster[i]) & (ids != ids[i])
        earlier = (cos_c < cos_c[i]) | ((cos_c == cos_c[i]) & (ids < ids[i]))
        if not np.any(same & earlier & (sims[i] >= tau)):
            survivors.add(int(ids[i]))

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = semdedup.semantic_dedup(df, num_centroids=C, cosine_threshold=tau)
    assert {r.vec_id for r in got.collect()} == survivors


# ---------------------------------------------------------------------------
# CCNet paragraph-level dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_known_case(spark):
    """Keep-first across the corpus by (doc_id, pos); normalization is
    case/punctuation-blind; empty paragraphs are structure and never
    drop."""
    from go_crawler_spark.functions.dedup import paragraph_dedup

    rows = [
        (1, "Alpha one\nshared footer\nunique one"),
        (2, "Beta two\nshared footer\nunique two"),
        (3, "shared footer\nalpha, ONE!"),  # both match doc 1 normalized
        (4, "x\n\ny"),                      # empty middle paragraph
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].text_clean == "Alpha one\nshared footer\nunique one"
    assert got[1].n_removed == 0 and got[1].n_paras == 3
    assert got[2].text_clean == "Beta two\nunique two"
    assert got[2].n_removed == 1
    assert got[3].text_clean == "" and got[3].n_removed == 2
    assert got[4].text_clean == "x\n\ny" and got[4].n_removed == 0


def test_paragraph_dedup_within_doc_and_hash_parity(spark):
    """A paragraph repeated inside ONE document dedups too, and the
    cross-engine md5 hash path keeps the identical survivor set as the
    xxhash64 production default."""
    from go_crawler_spark.functions.dedup import md5_hash64_col, paragraph_dedup

    rows = [(1, "same line\nother\nsame line"), (2, "fresh\nsame line")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {1: "same line\nother", 2: "fresh"}
    for hf in (None, md5_hash64_col):
        got = {r.doc_id: r.text_clean
               for r in paragraph_dedup(df, hash_fn=hf).collect()}
        assert got == want


# ---------------------------------------------------------------------------
# Bigram LM perplexity (CCNet quality signal)
# ---------------------------------------------------------------------------


def test_lm_discriminates_fluent_from_scrambled(spark):
    """Train on fluent text; a scrambled-bigram doc with the SAME
    unigrams must score strictly higher perplexity.  A fully
    out-of-vocabulary doc lands BETWEEN them, exactly at the uniform
    floor (ppl == V): an unseen context degrades to 1/V, while a SEEN
    context concentrates its mass on observed continuations, making an
    unseen continuation rarer than 1/V — the asymmetry that lets the
    CCNet filter punish shuffled/boilerplate text hardest."""
    from go_crawler_spark.functions import lm

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(5)],
        ["doc_id", "text"],
    )
    model = lm.train_bigram_lm(train)
    target = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),     # in-domain
            (2, "rug the on cat mat sat the"), # same unigrams, scrambled
            (3, "zebra quark flux boson"),     # fully out-of-vocab
            (4, "single"),                     # no bigrams
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in
           lm.score_perplexity(target, model).collect()}
    v = model["vocab"].collect()[0].v
    assert got[1].perplexity < got[3].perplexity < got[2].perplexity
    assert got[3].perplexity == float(v)  # uniform floor, exactly
    assert got[4].perplexity is None and got[4].n_bigrams is None


def test_lm_smoothed_conditional_sums_to_one(spark):
    """Σ_w2 p(w2|w1) over the vocabulary == 1 for a seen context (the
    add-alpha invariant that makes perplexities comparable)."""
    import math

    from go_crawler_spark.functions import lm

    train = spark.createDataFrame(
        [(0, "a b a c a b")], ["doc_id", "text"]
    )
    m = lm.train_bigram_lm(train)
    v = m["vocab"].collect()[0].v
    uni = {r.w1: r.c for r in m["unigrams"].collect()}
    big = {(r.w1, r.w2): r.c for r in m["bigrams"].collect()}
    alpha = 0.1
    vocab_words = {w for (w1, w2) in big for w in (w1, w2)}
    assert len(vocab_words) == v
    for w1 in uni:
        total = sum(
            (big.get((w1, w2), 0) + alpha) / (uni[w1] + alpha * v)
            for w2 in vocab_words
        )
        assert math.isclose(total, 1.0, rel_tol=1e-12)


def test_lm_buckets_fraction_and_null_policy(spark):
    from go_crawler_spark.functions import lm
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = lm.train_bigram_lm(docs)
    scored = lm.score_perplexity(docs, model)
    b = lm.lm_buckets(scored, head_frac=0.33, tail_frac=0.33)
    counts = {r.bucket: r.c for r in
              b.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert 0.2 <= counts["head"] / n <= 0.45
    assert 0.2 <= counts["tail"] / n <= 0.45
    # head strictly better than tail on average
    means = {r.bucket: r.m for r in
             b.groupBy("bucket").agg(F.avg("perplexity").alias("m")).collect()}
    assert means["head"] < means["tail"]


# ---------------------------------------------------------------------------
# Merged-interval duplicated-gram coverage (published Gopher rule)
# ---------------------------------------------------------------------------


def test_merged_dup_coverage_goldens(spark):
    """Hand-computed: overlapping duplicated grams count each char once
    (fraction capped at 1.0, exactly 1.0 for a fully-duplicated doc),
    disjoint occurrences sum, clean docs score 0, short docs drop."""
    from go_crawler_spark.functions.textstats import repetition_stats_merged

    rows = [
        (1, "a b a b a b"),    # every 2-gram duplicated -> full coverage
        (2, "x y z x y w"),    # "x y" at [0,3) and [6,9) -> 6/11
        (3, "p q r s t u"),    # no duplicated 2-gram -> 0.0
        (4, "only"),           # < 2 tokens -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.dup2gram_char_frac_merged
           for r in repetition_stats_merged(df, dup_n=2).collect()}
    assert got[1] == 1.0
    assert got[2] == round(6 / 11, 6)
    assert got[3] == 0.0
    assert 4 not in got


def test_merged_vs_occurrence_sum_ordering(spark):
    """On every real doc the merged fraction is <= the occurrence-sum
    fraction scaled to the same denominator — merging can only shrink
    coverage (the advice-item divergence, quantified)."""
    import pyspark.sql.functions as F

    from go_crawler_spark.functions.textstats import (
        repetition_stats,
        repetition_stats_merged,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    merged = repetition_stats_merged(d)
    strict = repetition_stats(d).select(
        "doc_id", "dup5gram_char_frac"
    )
    # strict uses len(text) as denominator; merged uses the token-stream
    # length. Compare coverage in CHARS, not fractions, to stay exact:
    # rebuild char counts by multiplying back the denominators.
    toks_len = F.aggregate(
        F.split(F.lower("text"), r"[^\p{L}\p{N}]+"),
        F.lit(0).cast("long"),
        lambda a, x: a + F.length(x).cast("long"),
    )
    j = (
        d.select("doc_id", "text")
        .join(merged, "doc_id")
        .join(strict, "doc_id")
    )
    bad = j.where(
        F.col("dup5gram_char_frac_merged") > F.col("dup5gram_char_frac") + 1e-9
    ).count()
    # merged/streamlen <= strict/len(text) is NOT guaranteed in general
    # (different denominators), but on this corpus (single-space ASCII
    # word salad, stream_len ~ len(text)) any violation means the merge
    # under-subtracted overlap — a real bug.
    assert bad == 0


def test_gopher_full_consistent_with_pairwise(spark, documents):
    """The nine-column single projection must agree with the original
    two-column repetition_stats on the shared (top2, dup5) columns, and
    per-column NULL semantics must track token count."""
    from go_crawler_spark.functions.textstats import (
        gopher_repetition_full,
        repetition_stats,
    )

    full = {r.doc_id: r for r in gopher_repetition_full(documents).collect()}
    two = {r.doc_id: r for r in repetition_stats(documents).collect()}
    assert set(two) <= set(full)  # full keeps short docs, two drops them
    for d, r in two.items():
        assert full[d].top2gram_char_frac == r.top2gram_char_frac
        assert full[d].dup5gram_char_frac == r.dup5gram_char_frac

    rows = [(1, "a b c d e f g"), (2, "a b c")]  # 7 and 3 tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    g = {r.doc_id: r for r in gopher_repetition_full(df).collect()}
    assert g[1].dup7gram_char_frac is not None
    assert g[1].dup8gram_char_frac is None      # 7 tokens: no 8-gram
    assert g[2].top3gram_char_frac is not None
    assert g[2].top4gram_char_frac is None      # 3 tokens: no 4-gram
    assert g[2].dup5gram_char_frac is None


def test_gopher_full_unigram_and_empty_levels(spark):
    """n=1 must work (the chained construction starts its zip loop at
    n=2, so unigrams come straight off the token array — a regression
    the r5 chaining introduced), and empty level sets must degrade to
    the id-only frame instead of raising on max(())."""
    from go_crawler_spark.functions.textstats import gopher_repetition_full

    df = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "x y")], ["doc_id", "text"]
    )
    g = {
        r.doc_id: r
        for r in gopher_repetition_full(df, top_ns=(1, 2), dup_ns=()).collect()
    }
    # doc 1: top unigram "aa" covers 4 of 11 chars
    assert g[1].top1gram_char_frac == round(4 / 11, 6)
    assert g[1].top2gram_char_frac is not None
    assert g[2].top1gram_char_frac == round(1 / 3, 6)

    empty = gopher_repetition_full(df, top_ns=(), dup_ns=())
    assert empty.columns == ["doc_id"] and empty.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        gopher_repetition_full(df, top_ns=(0,), dup_ns=())


def test_gopher_dup_structure_goldens(spark):
    """Line/paragraph duplicate-structure rules (Gopher table A1 rows
    1-4), hand-computed: duplicates are occurrences after the first;
    lines split on \\n runs, paragraphs on blank-line runs; char
    fractions over total document characters; NULL for empty docs."""
    from go_crawler_spark.functions.textstats import gopher_dup_structure

    rows = [
        (1, "a\nb\na\n\nc"),        # lines [a,b,a,c]: 1 dup of len 1 / 8 chars
        (2, "xx\nxx\nxx"),          # 2 dup lines of len 2 each / 8 chars
        (3, ""),                     # empty: all NULL
        (4, "p q\n\np q\n\nr"),     # 1 dup line AND 1 dup para ("p q") / 11
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = {r.doc_id: r for r in gopher_dup_structure(df).collect()}

    assert g[1].dup_line_frac == 0.25
    assert g[1].dup_line_char_frac == 0.125
    assert g[1].dup_para_frac == 0.0 and g[1].dup_para_char_frac == 0.0
    assert g[1].gopher_dup_structure_pass is True

    assert g[2].dup_line_frac == round(2 / 3, 6)
    assert g[2].dup_line_char_frac == 0.5
    assert g[2].gopher_dup_structure_pass is False  # 0.67 > 0.30

    assert all(
        getattr(g[3], c) is None
        for c in (
            "dup_line_frac", "dup_line_char_frac",
            "dup_para_frac", "dup_para_char_frac",
            "gopher_dup_structure_pass",
        )
    )

    assert g[4].dup_para_frac == round(1 / 3, 6)
    assert g[4].dup_para_char_frac == round(3 / 11, 6)
    assert g[4].gopher_dup_structure_pass is False


# -- Gopher table-A1 quality rules (non-repetition half) ---------------------


def _gq(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return textstats.gopher_quality_stats(df).collect()[0]


def test_gopher_quality_passing_doc(spark):
    base = "the data and pipeline run with care. " * 8  # 56 words
    r = _gq(spark, base.strip())
    assert r.n_words == 56
    assert 3.0 <= r.gopher_mean_word_len <= 10.0
    assert r.hash_word_ratio == 0.0 and r.ellipsis_word_ratio == 0.0
    assert r.bullet_line_frac == 0.0
    assert r.ellipsis_line_frac == 0.0
    assert r.alpha_word_frac == 1.0
    assert r.n_stop_hits >= 2
    assert r.gopher_quality_pass is True


def test_gopher_quality_each_rule_fires(spark):
    base = ("the data and pipeline run with care. " * 8).strip()
    # word count
    assert _gq(spark, "the short and tiny doc.").gopher_quality_pass is False
    # bullets: one bullet line out of two breaches 10%
    r = _gq(spark, base + "\n• a bullet item starts this line here")
    assert r.bullet_line_frac == 0.5 and r.gopher_quality_pass is False
    # ellipsis endings breach 30%
    r = _gq(spark, base + "\nthis spiked line trails off...")
    assert r.ellipsis_line_frac == 0.5 and r.gopher_quality_pass is False
    # hash-symbol ratio: 7 hashes on 63 words > 0.1
    r = _gq(spark, base + " # # # # # # #")
    assert r.hash_word_ratio > 0.1 and r.gopher_quality_pass is False
    # ellipsis-symbol ratio fires INDEPENDENTLY of the hash ratio (the
    # paper's "either" semantics): 7 mid-line ellipses on 63 words
    r = _gq(spark, base + " ...x ...x ...x ...x ...x ...x ...x")
    assert r.ellipsis_word_ratio > 0.1 >= (r.hash_word_ratio or 0.0)
    assert r.gopher_quality_pass is False
    # alpha words: 15 numeric words pull the fraction under 0.8
    r = _gq(spark, base + " 000" * 15)
    assert r.alpha_word_frac < 0.8 and r.gopher_quality_pass is False
    # stop words: no hits in a 54-word doc
    r = _gq(spark, "data pipeline sort merge join scan " * 9)
    assert r.n_stop_hits == 0 and r.gopher_quality_pass is False
    # mean word length under 3
    r = _gq(spark, "a b c " * 20)
    assert r.gopher_mean_word_len < 3.0 and r.gopher_quality_pass is False


def test_gopher_quality_empty_doc_fails_with_nulls(spark):
    r = _gq(spark, "")
    assert r.gopher_quality_pass is False
    assert r.gopher_mean_word_len is None and r.alpha_word_frac is None


def test_gopher_quality_plan_zero_shuffle_python_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (textstats.gopher_quality_stats(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_tfidf_top_terms_known_case(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana common"), (2, "cherry common"),
         (3, "common words only here")],
        "doc_id long, text string",
    )
    out = textstats.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 'apple' (tf 2, df 1) dominates; 'common' (df 3) ranks last
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert d1[0].term == "apple" and d1[0].tf == 2
    assert all(len(v) == 2 for v in by_doc.values())  # exactly k rows
    # rank is dense 1..k and scores non-increasing within a doc
    for rows in by_doc.values():
        rows = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2]
        assert rows[0].score >= rows[1].score
    # rarer term outscores commoner term at equal tf
    d2 = {r.term: r.score for r in by_doc[2]}
    assert d2["cherry"] > d2["common"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textstats.tfidf_top_terms(df, k=0)


def test_boilerplate_lines_removes_all_occurrences(spark):
    """Frequency-thresholded boilerplate (Dolma line dedup): a line in
    >= min_doc_frac of docs is removed EVERYWHERE — including its first
    occurrence, which paragraph_dedup's keep-first rule preserves."""
    footer = "Subscribe To Our Newsletter!"
    rows = [
        (1, f"alpha body one\n{footer}"),
        (2, f"beta body two\n{footer}\n\nextra"),
        (3, f"gamma body three\n{footer}"),
        (4, "delta body four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.boilerplate_lines(
        df, min_doc_frac=0.5, min_docs=2).collect()}
    assert got[1].text_clean == "alpha body one"
    assert got[1].n_removed == 1 and got[1].n_lines == 2
    # empty line (structure) survives; footer removed even mid-doc
    assert got[2].text_clean == "beta body two\n\nextra"
    assert got[3].text_clean == "gamma body three"
    assert got[4].text_clean == "delta body four" and got[4].n_removed == 0
    # contrast: keep-first retains doc 1's footer occurrence
    pd = {r.doc_id: r.text_clean for r in dedup.paragraph_dedup(df).collect()}
    assert footer in pd[1] and footer not in pd[2]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dedup.boilerplate_lines(df, min_doc_frac=0.0)
