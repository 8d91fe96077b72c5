"""Distributed sequence packing — two-phase prefix sum correctness."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import packing


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _expected(rows, seq_len, sep=1):
    """Naive single-threaded packing over (u, id) order."""
    order = sorted(rows, key=lambda r: (r["u"], r["doc_id"]))
    off, out = 0, {}
    for r in order:
        n = r["n"]
        out[r["doc_id"]] = (
            off,
            off // seq_len,
            (off + max(n - 1, 0)) // seq_len,
        )
        off += n + sep
    return out


def test_matches_naive_packing_and_bucket_invariance(spark):
    texts = [
        "one two three",
        "a b c d e f g",
        "",
        "just two",
        "w " * 19,  # 19 tokens: straddles the 8-token chunk boundary
        "solo",
    ]
    df = _docs(spark, texts)
    u = (F.col("doc_id") * 37 % 100).cast("double") / 100.0
    rows = [
        {"doc_id": i, "u": (i * 37 % 100) / 100.0,
         "n": len([w for w in t.split() if w])}
        for i, t in enumerate(texts)
    ]
    want = _expected(rows, seq_len=8)

    results = {}
    for b in (1, 3, 64):
        got = {
            r.doc_id: (r.offset, r.first_chunk, r.last_chunk)
            for r in packing.pack_assignments(
                df, seq_len=8, num_buckets=b, u=u
            ).collect()
        }
        assert got == want, f"num_buckets={b}"
        results[b] = got
    # bucket count is parallelism only, never layout
    assert results[1] == results[64]


def test_offsets_tile_the_stream_exactly(spark, ):
    df = _docs(spark, [f"tok " * (i % 7 + 1) for i in range(200)])
    out = packing.pack_assignments(df, seq_len=16, num_buckets=8).collect()
    spans = sorted((r.offset, r.n_tokens) for r in out)
    pos = 0
    for off, n in spans:
        assert off == pos  # every doc starts where the previous ended
        pos = off + n + 1  # + separator
    total = sum(n + 1 for _, n in spans)
    assert pos == total


def test_chunk_math_and_validation(spark):
    df = _docs(spark, ["w " * 20])  # 20 tokens, seq_len 8
    r = packing.pack_assignments(df, seq_len=8).collect()[0]
    assert (r.offset, r.first_chunk, r.last_chunk) == (0, 0, 2)
    with pytest.raises(ValueError):
        packing.pack_assignments(df, seq_len=0)
    with pytest.raises(ValueError):
        packing.pack_assignments(df, seq_len=8, num_buckets=0)


def test_deterministic_and_subset_consistent_order(spark):
    df = _docs(spark, [f"word {i} text here" for i in range(100)])
    a = packing.pack_assignments(df, seq_len=32).collect()
    b = packing.pack_assignments(df, seq_len=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the RELATIVE order of surviving docs is hash-stable: packing a
    # subset keeps the same neighbor order (offsets shift, order doesn't)
    sub = df.where(F.col("doc_id") % 2 == 0)
    full_order = [r.doc_id for r in sorted(a, key=lambda r: r.offset)
                  if r.doc_id % 2 == 0]
    sub_order = [r.doc_id for r in sorted(
        packing.pack_assignments(sub, seq_len=32).collect(),
        key=lambda r: r.offset)]
    assert full_order == sub_order


def test_pack_sequences_golden_and_invariants(spark):
    texts = ["one two three", "a b c d e f g", "just two", "solo"]
    df = _docs(spark, texts)
    u = (F.col("doc_id") * 37 % 100).cast("double") / 100.0
    L = 8
    chunks = {r.chunk_id: r.tokens
              for r in packing.pack_sequences(df, L, u=u).collect()}
    # stream = docs in (u, id) order, each followed by </s>
    order = sorted(range(len(texts)), key=lambda i: ((i * 37 % 100) / 100.0, i))
    stream = []
    for i in order:
        stream += texts[i].split() + ["</s>"]
    n_full = len(stream) // L
    assert set(chunks) == set(range(n_full))  # partial tail dropped
    for cid in range(n_full):
        assert chunks[cid] == stream[cid * L:(cid + 1) * L]
        assert len(chunks[cid]) == L


def test_pack_sequences_consistent_with_assignments(spark):
    df = _docs(spark, [f"tok{i} " * (i % 5 + 2) for i in range(60)])
    L = 16
    chunks = packing.pack_sequences(df, L).collect()
    asg = packing.pack_assignments(df, L).collect()
    # every full chunk has exactly L tokens and chunk ids are dense
    ids = sorted(r.chunk_id for r in chunks)
    assert ids == list(range(len(ids)))
    assert all(len(r.tokens) == L for r in chunks)
    total = sum(r.n_tokens + 1 for r in asg)
    assert len(ids) == total // L
    # a doc's first token appears in its assigned first_chunk
    tok_by_chunk = {r.chunk_id: r.tokens for r in chunks}
    for a in sorted(asg, key=lambda r: r.offset)[:10]:
        fc = a.offset // L
        if fc in tok_by_chunk:
            assert tok_by_chunk[fc][a.offset % L].startswith("tok")


def test_take_token_budget_prefix_and_bucket_invariance(spark):
    """The exact-budget cut keeps the LARGEST whole-document prefix of
    the unit_hash order not exceeding the budget: membership identical
    at every bucket count (num_buckets=1 IS the sequential scan, so
    equality with it certifies the distributed prefix sum), total
    within budget, and the first excluded document would overflow."""
    df = _docs(spark, ["w " * (i % 7 + 1) for i in range(40)])
    budget = 60
    sets = {}
    for nb in (1, 4, 64):
        rows = packing.take_token_budget(df, budget, num_buckets=nb).collect()
        sets[nb] = {(r.doc_id, r.n_tokens, r.offset) for r in rows}
    assert sets[1] == sets[4] == sets[64] and sets[1]
    total = sum(n for _, n, _ in sets[1])
    assert total <= budget
    # first excluded doc in stream order straddles the budget
    asn = packing.pack_assignments(df, 1, sep_tokens=0).collect()
    excluded = sorted(
        (r for r in asn if (r.doc_id,) not in {(d,) for d, _, _ in sets[1]}),
        key=lambda r: r.offset,
    )
    assert excluded and excluded[0].offset + excluded[0].n_tokens > budget
    with pytest.raises(ValueError):
        packing.take_token_budget(df, 0)
