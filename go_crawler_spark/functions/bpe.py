"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909).

Training-data engines don't just COUNT tokens — they train the
tokenizer.  BPE's classic formulation already has the right distributed
decomposition built in: merges are learned from the WORD-FREQUENCY
table, not the raw corpus.  So the corpus-scale work is exactly one
explode+groupBy (the same shape as ``textstats.vocab_counts``), and the
iterative part — k merge rounds of "count adjacent symbol pairs, take
the argmax, fuse it everywhere" — runs over a vocabulary table that is
orders of magnitude smaller than the corpus (10^5–10^7 rows at web
scale, weighted by count).

Per round, all pure Column expressions over the vocab table:

* pair counts: ``zip_with`` the symbol array with its own tail,
  explode, ONE groupBy(pair) weighted sum — map-side partial agg
  collapses Zipf-hot pairs;
* argmax: a 1-row sort-limit collect (count desc, then pair asc — the
  deterministic tie-break; implementations differ here, ours is
  pinned and tested);
* fuse: a streaming ``aggregate`` fold over each word's symbols that
  rebuilds the array with the pair merged (lambda bodies touch only
  their own arguments — the repo-wide expression-safety invariant);
* ``localCheckpoint`` per round keeps plans flat across k rounds,
  exactly like the PageRank superstep loop.

Encoding applies the learned merges per word.  The package path is an
Arrow-batched pandas UDF with the merge list broadcast (tokenizer
application is the textbook "UDF is honest here" case — production
tokenizers are native code; a k-deep nested Column expression would
blow the Catalyst tree for real merge counts).

The driver entry for this op is rows-only by design: k data-dependent
argmax rounds are a genuinely iterative algorithm no single SQL
statement expresses (the round brief's stated exemption); correctness
is pinned instead by the classic hand-computed golden and a
pure-Python differential trainer (implementation diversity, the same
device the SimHash dual implementation uses).

No counterpart in the Go reference; beyond-reference LLM-corpus layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from go_crawler_spark.functions.textstats import tokens_col

__all__ = [
    "word_counts",
    "train_bpe",
    "train_bpe_reference",
    "bpe_encode",
    "END_MARK",
]

END_MARK = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the ONE corpus-scale pass BPE training needs."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word_cnt: DataFrame) -> DataFrame:
    """(syms array<string>, cnt): characters + the end-of-word marker."""
    return word_cnt.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_MARK))
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n1 = F.greatest(F.size(F.col("syms")) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, n1),
        F.slice(F.col("syms"), 2, n1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("c"))
    )


def _fuse_col(syms, left: str, right: str):
    """Rebuild a symbol array with every adjacent (left, right) fused.

    Streaming fold: the accumulator carries the rebuilt array plus the
    pending previous symbol; each step either fuses (pending == left
    and current == right) or flushes the pending symbol.  Left-to-right
    greedy, matching the reference implementation ("aaa" with merge
    (a,a) -> ["aa", "a"])."""
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit("").alias("pend"),
        F.lit(False).alias("has"),
    )

    def step(acc, x):
        fuse = acc["has"] & (acc["pend"] == F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(fuse, F.concat(acc["acc"], F.array(F.lit(left + right))))
            .when(acc["has"], F.concat(acc["acc"], F.array(acc["pend"])))
            .otherwise(acc["acc"])
            .alias("acc"),
            F.when(fuse, F.lit("")).otherwise(x).alias("pend"),
            (~fuse).alias("has"),
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["has"], F.concat(acc["acc"], F.array(acc["pend"]))
        ).otherwise(acc["acc"]),
    )


def train_bpe(
    df_or_word_counts: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    from_word_counts: bool = False,
    driver_vocab_threshold: int = 500_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges.  Accepts raw documents (one
    corpus pass) or a precomputed ``word_counts`` table.  Ties break
    deterministically: highest count, then (left, right) ascending.

    Hybrid execution (r6, guide §1.2 — fix the algorithm before the
    constants): the one corpus-scale pass (``word_counts``) is always
    distributed, but the k argmax rounds run over the word-frequency
    table, whose size is the VOCABULARY, not the corpus.  When that
    table has at most ``driver_vocab_threshold`` rows it is collected
    once (bounded: 500k rows ≈ a few tens of MB) and the rounds run in
    the driver with incrementally-maintained pair counts —
    O(total symbols) once plus O(touched words) per merge — instead of
    k Spark jobs whose per-round scheduling floor dominates at any
    vocabulary size.  Larger vocabularies keep the distributed
    per-round path unchanged.  Both paths are bit-identical (ties and
    early-stop pinned by tests/test_bpe.py's differential tests).
    ``driver_vocab_threshold=0`` forces the distributed path."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be > 0, got {num_merges}")
    wc = (
        df_or_word_counts
        if from_word_counts
        else word_counts(df_or_word_counts, text_col)
    )
    if driver_vocab_threshold:
        # limit+collect bounds driver memory: at most threshold+1 rows
        # come back, and the overflow row routes to the distributed path.
        head = wc.select("word", "cnt").limit(driver_vocab_threshold + 1).collect()
        if len(head) <= driver_vocab_threshold:
            return _train_bpe_driver(
                {r["word"]: r["cnt"] for r in head}, num_merges
            )
    vocab = _initial_symbols(wc).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].c < 2:
            break  # nothing left worth merging
        left, right = top[0].left, top[0].right
        merges.append((left, right))
        vocab = vocab.select(
            _fuse_col(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)
    return merges


def _train_bpe_driver(
    counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-side trainer with INCREMENTAL pair counts — the classic
    fast BPE formulation (Sennrich et al. 2016 §3): build the
    pair-count table once from every word's symbol chain, then per
    merge rewrite only the words that contain the merged pair
    (tracked by a pair -> word-index occurrence map), subtracting
    their old pair contributions and adding the new ones.  The
    pair-count dict therefore always equals what a full recount would
    produce (minus keys whose count reached 0), so the argmax, the
    tie-break (count desc, pair asc) and the early-stop (best < 2)
    are exactly :func:`train_bpe_reference`'s — pinned by the
    differential test.  O(total symbols) setup, O(touched words) per
    merge, argmax over the (alphabet-bounded, small) distinct-pair
    dict."""
    vocab: list[list] = [
        [list(w) + [END_MARK], c] for w, c in counts.items()
    ]
    pc: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, c) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pc[p] = pc.get(p, 0) + c
            occ.setdefault(p, set()).add(idx)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        l, r = best[0]
        merges.append((l, r))
        # occurrence sets may carry stale indices (word rewritten since);
        # subtract-then-re-add is an exact no-op for those, so staleness
        # is harmless — correctness never depends on eager cleanup.
        for idx in sorted(occ.get((l, r), ())):
            syms, c = vocab[idx]
            for p in zip(syms, syms[1:]):
                left = pc[p] - c
                if left:
                    pc[p] = left
                else:
                    del pc[p]
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[idx][0] = out
            for p in zip(out, out[1:]):
                pc[p] = pc.get(p, 0) + c
                occ.setdefault(p, set()).add(idx)
    return merges


def train_bpe_reference(
    counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Single-threaded reference trainer (differential test target):
    the same algorithm and tie-break in plain Python."""
    vocab = {tuple(list(w) + [END_MARK]): c for w, c in counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((l, r))
        fused = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            fused[tuple(out)] = fused.get(tuple(out), 0) + c
        vocab = fused
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    memoize: bool = True,
) -> DataFrame:
    """(id_col, bpe_tokens array<string>, n_bpe_tokens): apply the
    merge list per word — Arrow-batched pandas UDF, merge list shipped
    once per executor (broadcast via closure).

    The greedy merge loop is memoized over DISTINCT words (VERDICT r4
    item 3): Zipf means >90% of word occurrences repeat, and the
    closure-level cache persists for the lifetime of the Python worker
    process, so each distinct word is encoded once per worker instead
    of once per occurrence.  Output is bit-identical to the uncached
    loop (the encoding of a word is a pure function of the merge list).
    The cache is bounded (cleared at ``_CACHE_MAX`` entries) so a
    pathological all-unique corpus cannot grow worker memory without
    limit; natural-language vocabularies stay far under the bound.
    ``memoize=False`` disables the cache (A/B harness only)."""
    merge_rank = {m: i for i, m in enumerate(merges)}
    _CACHE_MAX = 1_000_000
    # closure-captured: cloudpickle ships the (empty) dict by value with
    # the UDF, so each deserialization gets a fresh one — the memo scope
    # is one UDF deserialization, i.e. AT BEST per-worker, in practice
    # per-task when tasks re-deserialize.  It still amortizes across all
    # Arrow batches and rows of that scope, where Zipf repetition lives;
    # _CACHE_MAX therefore bounds memory per task, not per executor.
    cache: dict = {}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(words_s):
        import pandas as pd

        def enc_word_raw(w: str) -> list[str]:
            syms = list(w) + [END_MARK]
            while len(syms) > 1:
                best, bi = None, -1
                for i, p in enumerate(zip(syms, syms[1:])):
                    r = merge_rank.get(p)
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            return syms

        def enc_word(w: str) -> list[str]:
            if not memoize:
                return enc_word_raw(w)
            enc = cache.get(w)
            if enc is None:
                if len(cache) >= _CACHE_MAX:
                    cache.clear()
                enc = enc_word_raw(w)
                cache[w] = enc
            return enc

        return pd.Series(
            [
                []
                if ws is None
                else [t for w in ws for t in enc_word(w)]
                for ws in words_s
            ]
        )

    toks = tokens_col(text_col)
    out = df.select(
        F.col(id_col), encode(toks).alias("bpe_tokens")
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    return out
