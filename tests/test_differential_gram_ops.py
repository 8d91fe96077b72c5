"""Randomized differential tests for the gram-based primitives.

The DuckDB oracles in test_entry_contract.py cover the driver fixtures;
these compare against independent pure-Python references over a seeded
random corpus with adversarial shapes (single-token docs, all-same-token
docs, unicode tokens, high repetition) — the boundary cases a fixture of
well-formed documents never exercises.
"""

import random
import re
from decimal import ROUND_HALF_UP, Decimal

import pytest

from go_crawler_spark.functions import dedup, textstats

_WORDS = ["a", "bb", "ccc", "dd", "e", "ümlaut", "ставка", "x9", "longword",
          "snake_case"]


def _tokenize(text: str) -> list[str]:
    # [\W_]+ = the product tokenizer's [^\p{L}\p{N}]+: \w alone would
    # keep '_' inside tokens where Spark treats it as a separator
    return [t for t in re.split(r"[\W_]+", text.lower(), flags=re.UNICODE) if t]


def _round6(x: float) -> float:
    # Spark's F.round is HALF_UP on the double's decimal repr; Python's
    # round() is banker's HALF_EVEN — a latent flake on exact halves
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _corpus(seed: int = 7, n_docs: int = 60) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        shape = rng.randrange(5)
        if shape == 0:
            words = [rng.choice(_WORDS)]                       # single token
        elif shape == 1:
            words = [rng.choice(_WORDS)] * rng.randrange(2, 15)  # all-same
        elif shape == 2:
            base = [rng.choice(_WORDS) for _ in range(rng.randrange(3, 8))]
            words = base * rng.randrange(2, 5)                 # high repetition
        else:
            words = [rng.choice(_WORDS) for _ in range(rng.randrange(2, 40))]
        rows.append((i, " ".join(words)))
    # a shared 10-token run planted in two docs (cross-doc span)
    run = " ".join(rng.choice(_WORDS) for _ in range(10))
    rows.append((n_docs, f"{run} {rng.choice(_WORDS)}"))
    rows.append((n_docs + 1, f"{rng.choice(_WORDS)} {run}"))
    return rows


def _py_kgrams(toks: list[str], k: int) -> list[str]:
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _py_repetition(text: str, top_n: int = 2, dup_n: int = 5):
    toks = _tokenize(text)
    if len(toks) < max(top_n, dup_n):
        return None
    nc = len(text)

    def counts(k):
        c = {}
        for g in _py_kgrams(toks, k):
            c[g] = c.get(g, 0) + 1
        return c

    c2, c5 = counts(top_n), counts(dup_n)
    top = max(cnt * len(g) for g, cnt in c2.items())
    dup = sum(cnt * len(g) for g, cnt in c5.items() if cnt >= 2)
    return _round6(top / nc), _round6(dup / nc)


def _py_spans(rows, n=4, min_count=2):
    wins = {}
    for i, text in rows:
        for pos, g in enumerate(_py_kgrams(_tokenize(text), n), start=1):
            wins.setdefault(g, []).append((i, pos))
    hits = {}
    for g, occ in wins.items():
        if len(occ) >= min_count:
            for i, pos in occ:
                hits.setdefault(i, set()).add(pos)
    spans = []
    for i, positions in hits.items():
        run = []
        for pos in sorted(positions):
            if run and pos <= run[-1] + n:
                run.append(pos)
            else:
                if run:
                    spans.append((i, run[0], run[-1] + n - 1))
                run = [pos]
        spans.append((i, run[0], run[-1] + n - 1))
    return sorted((i, s, e, e - s + 1) for i, s, e in spans)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _corpus()
    return rows, spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_kgrams_match_python_reference(spark, corpus):
    rows, df = corpus
    for k in (1, 2, 5):
        got = {
            r.doc_id: r.g
            for r in df.select(
                "doc_id",
                textstats.kgrams_col(textstats.tokens_col("text"), k).alias("g"),
            ).collect()
        }
        for i, text in rows:
            toks = _tokenize(text)
            want = _py_kgrams(toks, k) if len(toks) >= k else []
            assert got[i] == want, (i, k, text)


def test_sql_built_repetition_matches_column_built(spark, corpus):
    """The r6 SQL-parsed constructors (_rep_aggs_sql/_kgrams_sql) must
    be bit-identical to the Column-API reference formulations they
    replace in the hot construction path."""
    import pyspark.sql.functions as F

    rows, df = corpus
    toks = textstats.tokens_col("text")
    base = df.select("doc_id", toks.alias("_t"))
    for k in (1, 2, 5, 9):
        col_built = base.select(
            "doc_id",
            textstats._repetition_aggs(
                F.array_sort(textstats.kgrams_col(F.col("_t"), k))
            ).alias("a"),
        )
        sql_built = base.select(
            "doc_id",
            F.expr(
                textstats._rep_aggs_sql(
                    f"array_sort({textstats._kgrams_sql('_t', k)})"
                )
            ).alias("a"),
        )
        got = {r.doc_id: (r.a.top, r.a.dup) for r in sql_built.collect()}
        want = {r.doc_id: (r.a.top, r.a.dup) for r in col_built.collect()}
        assert got == want, k


def test_sql_built_minhash_sig_matches_column_built(spark, corpus):
    """dedup._minhash_sql must be bit-identical to minhash_from_hashes
    (including the empty-input all-NULL signature)."""
    import pyspark.sql.functions as F

    rows, df = corpus
    hs = F.transform(
        textstats.shingles_col("text", 3), lambda s: F.xxhash64(s)
    )
    base = df.select("doc_id", hs.alias("_sh")).union(
        spark.createDataFrame([(10**6, [])], "doc_id long, _sh array<long>")
    )
    col_built = base.select(
        "doc_id", dedup.minhash_from_hashes(F.col("_sh"), 16)
    )
    sql_built = base.select(
        "doc_id", F.expr(dedup._minhash_sql("_sh", 16)).alias("minhash_sig")
    )
    got = {r.doc_id: r.minhash_sig for r in sql_built.collect()}
    want = {r.doc_id: r.minhash_sig for r in col_built.collect()}
    assert got == want


def test_repetition_matches_python_reference(spark, corpus):
    rows, df = corpus
    got = {
        r.doc_id: (r.top2gram_char_frac, r.dup5gram_char_frac)
        for r in textstats.repetition_stats(df).collect()
    }
    for i, text in rows:
        want = _py_repetition(text)
        if want is None:
            assert i not in got, (i, text)
        else:
            assert got[i] == want, (i, text)


def test_duplicate_spans_match_python_reference(spark, corpus):
    rows, df = corpus
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in dedup.duplicate_ngram_spans(df, n=4).collect()
    )
    assert got == _py_spans(rows, n=4)


def test_cut_matches_python_reference(spark, corpus):
    rows, df = corpus
    span_rows = _py_spans(rows, n=4)
    spans = dedup.duplicate_ngram_spans(df, n=4)
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in dedup.cut_duplicate_spans(df, spans).collect()
    }
    covered = {}
    for i, s, e, _ in span_rows:
        covered.setdefault(i, set()).update(range(s, e + 1))
    for i, text in rows:
        toks = _tokenize(text)
        cut = covered.get(i, set())
        keep = [w for j, w in enumerate(toks, start=1) if j not in cut]
        assert got[i] == (" ".join(keep), len(toks) - len(keep)), (i, text)
