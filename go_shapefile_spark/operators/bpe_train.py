"""Distributed BPE tokenizer training (learn merge rules at corpus
scale) — the TRAINING counterpart of ``text.bpe_token_stats_sql``'s
tokenization counts.

Algorithm (byte-pair encoding over words, Sennrich et al. 2016,
re-implemented from the published pseudo-code):

1. ONE corpus-sized pass: whitespace pre-tokenize + word-frequency
   aggregation (shuffle on the word).  Everything after operates on the
   aggregated word table — vocabulary-bounded, orders of magnitude
   smaller than the corpus.  This is the honest 100-TB shape of BPE
   training: the petabytes are touched once; the iterative phase runs
   on megabytes.
2. Per merge round, on the word table: adjacent symbol pairs via
   ``arrays_zip(slice, slice)`` + explode, frequency-weighted pair
   counts (groupBy), the arg-max pair (count desc, then lexicographic
   pair — a TOTAL order, so the learned sequence is deterministic and
   two implementations can be compared exactly), then a greedy
   left-to-right merge fold applied to every word's symbol array via
   the ``aggregate`` higher-order function (JVM, no Python worker).
   Each round's word table is pinned with :func:`rolling_pins` — the
   fold otherwise NESTS per round and round 30 would carry 30 stacked
   HOFs in one plan.

The per-round driver action (one-row collect of the best pair) is
inherent to the algorithm's sequential dependency and bounded by
``n_merges``; the collected relation is the aggregated pair table's
top row, never corpus-sized.

:func:`bpe_reference` is an independent pure-Python implementation of
the same specification (same splitter, same end-of-word marker, same
tie-break, same greedy application) used as the parity twin by the
tests and the ``bpe_learn`` contract gate.  Symbol comparisons are
byte-wise in Spark (UTF8String) and code-point-wise in Python — these
agree on ASCII corpora; supplementary-plane text would need a
normalized collation before trusting cross-implementation ties.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java \s includes \x0B, RE2/Python's does not — build the splitter
# from text.py's shared seam so BPE word splitting can never silently
# diverge from token_stats/shingle splitting (r5 review).
from .text import _WS  # noqa: E402  (the round-4 whitespace seam)

WS_CLASS = f"[{_WS}]+"
WORD_END = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus-sized pass: (word, freq)."""
    return (docs
            .select(F.explode(F.split(F.col(text_col), WS_CLASS))
                    .alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _symbols(word_col: str):
    """word -> initial symbol array (chars + end-of-word marker), shared
    by the train and apply sides.  The empty-word guard matters:
    ``sequence(1, 0)`` DESCENDS in Spark (yielding [1, 0], not []), so
    an unfiltered '' word would otherwise get two phantom '' symbols
    and break parity with the Python twin (r5 review)."""
    return F.concat(
        F.when(F.length(word_col) == 0, F.array().cast("array<string>"))
        .otherwise(F.transform(
            F.sequence(F.lit(1), F.length(word_col)),
            lambda i: F.col(word_col).substr(i, F.lit(1)))),
        F.array(F.lit(WORD_END)))


def _merge_fold(a: str, b: str, col: str = "syms"):
    """Greedy left-to-right merge of adjacent (a, b) -> a||b over the
    ``col`` symbol array, as one ``aggregate`` fold (CASE
    short-circuits, so ``element_at(acc, -1)`` never sees an empty
    accumulator)."""
    merged = a + b

    def step(acc, x):
        return (F.when(F.size(acc) == 0, F.concat(acc, F.array(x)))
                .when((F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
                      F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                               F.array(F.lit(merged))))
                .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(col, F.array().cast("array<string>"), step)


def learn_bpe(docs: DataFrame, text_col: str = "text", n_merges: int = 30,
              min_freq: int = 2) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from a document corpus.
    Stops early when the best pair's weighted frequency drops below
    ``min_freq``.  Returns the ordered merge list."""
    from .pinning import rolling_pins

    spark = docs.sparkSession
    pin = rolling_pins(spark)
    try:
        return _learn_bpe_rounds(docs, text_col, n_merges, min_freq, pin)
    finally:
        # the return value is a plain list — nothing references the
        # final pinned word table, so release it on EVERY exit path
        # (a mid-training failure must not leak the pin either —
        # r5 review; contrast with connected_components, whose RESULT
        # reads its final pin)
        pin.release()


def _learn_bpe_rounds(docs: DataFrame, text_col: str, n_merges: int,
                      min_freq: int, pin) -> list[tuple[str, str]]:
    words = word_frequencies(docs, text_col) \
        .withColumn("syms", _symbols("word"))
    words = pin(words.select("word", "freq", "syms"))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = (words
                 .where(n >= 2)
                 .select("freq", F.explode(F.arrays_zip(
                     F.slice("syms", F.lit(1), n - 1).alias("a"),
                     F.slice("syms", F.lit(2), n - 1).alias("b")))
                     .alias("p"))
                 .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                 .agg(F.sum("freq").alias("cnt")))
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")) \
            .limit(1).collect()
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = pin(words.withColumn("syms", _merge_fold(a, b)))
    return merges


def bpe_reference(texts: list[str] | list[tuple[str, int]],
                  n_merges: int = 30, min_freq: int = 2,
                  from_frequencies: bool = False) -> list[tuple[str, str]]:
    """Independent pure-Python BPE trainer (the parity twin).  Accepts
    raw texts, or — with ``from_frequencies=True`` — a pre-aggregated
    ``(word, freq)`` list so the gate can compare ONLY the iterative
    phase against a Spark-aggregated word table."""
    wf: Counter = Counter()
    if from_frequencies:
        for w, f in texts:
            wf[w] += int(f)
    else:
        splitter = re.compile("[ \t\n\r\f\x0B]+")
        for t in texts:
            for w in splitter.split(t):
                if w:
                    wf[w] += 1
    syms = {w: list(w) + [WORD_END] for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        a, b = pair
        merges.append(pair)
        merged = a + b
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges


def tokenize_words(words: DataFrame, merges: list[tuple[str, str]],
                   word_col: str = "word") -> DataFrame:
    """Apply a learned merge sequence to a DISTINCT-word relation ->
    adds ``tokens array<string>``.  The folds chain once per merge over
    the vocabulary-bounded table — never over the corpus; corpus
    tokenization is a broadcast join against this result (see
    :func:`bpe_token_counts`), which is the 100-TB shape of BPE
    inference: petabytes join a megabyte dictionary."""
    out = words.withColumn("tokens", _symbols(word_col))
    for a, b in merges:
        out = out.withColumn("tokens", _merge_fold(a, b, col="tokens"))
    return out


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus tokenization with a learned merge table ->
    (id_col, n_words, n_tokens).  One corpus pass explodes words; the
    per-word token arity comes from the broadcast-joined tokenized
    vocabulary (every distinct word is folded exactly once)."""
    vocab = tokenize_words(
        docs.select(F.explode(F.split(F.col(text_col), WS_CLASS))
                    .alias("word"))
            .where(F.col("word") != "").distinct(),
        merges)
    arity = F.broadcast(vocab.select(
        "word", F.size("tokens").alias("n_word_tokens")))
    # explode_outer keeps ONE null-word row for blank/whitespace-only
    # docs, so they survive as (0, 0) without a second corpus scan +
    # distinct shuffle (r5 review: the petabytes are scanned once;
    # count("word") skips the null, coalesce turns the null sum into 0)
    words_arr = F.filter(F.split(F.col(text_col), WS_CLASS),
                         lambda x: x != "")
    exploded = docs.select(id_col,
                           F.explode_outer(words_arr).alias("word"))
    return (exploded.join(arity, "word", "left")
            .groupBy(id_col)
            .agg(F.count("word").alias("n_words"),
                 F.coalesce(F.sum("n_word_tokens"),
                            F.lit(0)).alias("n_tokens")))


def tokenize_word_reference(word: str,
                            merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python apply twin: fold each merge over one word, same
    greedy left-to-right semantics as :func:`_merge_fold`."""
    s = list(word) + [WORD_END]
    for a, b in merges:
        out: list[str] = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        s = out
    return s
