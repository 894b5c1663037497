"""Distributed BPE tokenizer training vs the independent pure-Python
reference (same spec: splitter, end-of-word marker, deterministic
tie-break, greedy left-to-right merge application)."""

import pandas as pd

from go_shapefile_spark.operators.bpe_train import (
    bpe_reference, learn_bpe, word_frequencies,
)


def test_reference_learns_the_classic_example():
    """Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    widest:3} — est dominates, then the low stem."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = bpe_reference(wf, n_merges=5, from_frequencies=True)
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"),
                   ("l", "o"), ("lo", "w")]


def test_spark_matches_reference_end_to_end(spark, sf_dir):
    """Distributed training over the documents table reproduces the
    reference's merge sequence exactly (both from raw texts)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = learn_bpe(docs, n_merges=10)
    texts = [r.text for r in docs.select("text").collect()]
    ref = bpe_reference(texts, n_merges=10)
    assert len(got) == 10 and got == ref


def test_greedy_overlap_and_early_stop(spark):
    """'aaa' exercises the non-overlapping greedy fold (aaa -> [aa, a],
    never [aa, aa]); a pair budget larger than the corpus supports
    stops early at min_freq in BOTH implementations."""
    texts = ["aaa aaa aa", "b b"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = learn_bpe(df, n_merges=50, min_freq=2)
    ref = bpe_reference(texts, n_merges=50, min_freq=2)
    assert got == ref
    assert 0 < len(got) < 50
    assert got[0] == ("a", "a")      # (a,a) weighted 2+2+1=5 dominates


def test_word_frequencies_splitter(spark):
    """The splitter is the shared explicit whitespace class (including
    \\x0B, which Python's \\s covers but RE2's does not)."""
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["a\tb\x0bc  a\n b", ""]}))
    got = {r["word"]: r["freq"]
           for r in word_frequencies(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_tokenize_words_and_corpus_counts(spark):
    """Apply side: the chained merge folds over the vocabulary equal
    the pure-Python tokenizer per word, and corpus token counts come
    from the broadcast-joined arities."""
    from pyspark.sql import functions as F

    from go_shapefile_spark.operators.bpe_train import (
        bpe_token_counts, tokenize_word_reference, tokenize_words,
    )

    texts = ["lower lowest low", "newest newer low", "wide widest"]
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": texts}))
    merges = learn_bpe(df, n_merges=6, min_freq=1)
    vocab = spark.createDataFrame(pd.DataFrame(
        {"word": sorted({w for t in texts for w in t.split()})}))
    tok = {r["word"]: r["tokens"]
           for r in tokenize_words(vocab, merges).collect()}
    for w, ts in tok.items():
        assert ts == tokenize_word_reference(w, merges), w
    counts = bpe_token_counts(df, merges).toPandas() \
        .set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        words = t.split()
        assert counts.loc[i, "n_words"] == len(words)
        assert counts.loc[i, "n_tokens"] == sum(
            len(tokenize_word_reference(w, merges)) for w in words)
    # the arity join must be a broadcast, never a shuffle of the corpus
    plan = bpe_token_counts(df, merges) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_word_and_blank_doc_edges(spark):
    """r5 review fixes: sequence(1,0) DESCENDS in Spark, so an
    unfiltered '' word must still tokenize to ['</w>'] like the Python
    twin; blank docs keep a (0, 0) counts row instead of vanishing;
    learn_bpe releases its final pin (no leak per training run)."""
    from go_shapefile_spark.operators.bpe_train import (
        bpe_token_counts, tokenize_word_reference, tokenize_words,
    )
    from go_shapefile_spark.operators.pinning import _PINS

    vocab = spark.createDataFrame(pd.DataFrame({"word": ["", "ab"]}))
    merges = [("a", "b")]
    tok = {r["word"]: r["tokens"]
           for r in tokenize_words(vocab, merges).collect()}
    assert tok[""] == tokenize_word_reference("", merges) == ["</w>"]
    assert tok["ab"] == ["ab", "</w>"]

    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b", "   ", ""]}))
    counts = bpe_token_counts(df, merges).toPandas() \
        .set_index("doc_id").sort_index()
    assert len(counts) == 3
    assert counts.loc[1].tolist() == [0, 0]
    assert counts.loc[2].tolist() == [0, 0]

    before = sum(1 for k in _PINS if k[0] == id(spark))
    learn_bpe(df, n_merges=3, min_freq=1)
    after = sum(1 for k in _PINS if k[0] == id(spark))
    assert after == before          # final pin released, slot empty
