"""Text-operator compositions (corpus curation and friends)."""

def test_corpus_curation_stages_all_fire(spark):
    """Every curation stage proven on a planted corpus: the quality
    floor drops a symbol-noise doc, the language gate drops a German
    doc, and exact dedup keeps only the first of two identical texts."""
    import pandas as pd

    from go_shapefile_spark.operators.text import corpus_curation_sql

    good = ("the data and the table of values is prepared to scan in "
            "a stable order that it keeps for every run " * 3)
    rows = [
        (1, good + "one", "en", "web", 0),
        (2, good + "two", "en", "web", 0),
        (10, good + "dup", "en", "web", 0),
        (11, good + "dup", "en", "crawl", 0),      # exact duplicate
        (20, "der hund und die katze das ist nicht mit ein zu den "
             "haus der garten und die sonne das wasser " * 4,
         "de", "web", 0),                          # German -> dropped
        (30, "@@@@ #### $$$$ %%%% ^^^^ &&&& " * 20, "xx", "web", 0),
        # reaches SCORING (has tokens, zero-vote tie predicts 'en')
        # but fails the quality floor: too short, no stopwords -> 0.3.
        # Without this row the quality threshold has no regression
        # guard — every other drop happens before scoring (r5 review)
        (40, "zebra quartz mango", "en", "web", 0),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    spark.createDataFrame(pdf).createOrReplaceTempView("cur_docs")
    got = spark.sql(corpus_curation_sql("spark", rel="cur_docs")) \
        .toPandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 10]    # 11 deduped away
    assert (got["pred_lang"] == "en").all()
    assert (got["quality"] >= 0.7).all()


def test_corpus_curation_fused_parity_and_plan(spark, sf_dir):
    """The single-pass fusion returns exactly the staged composition's
    rows while scanning the documents table half as many times."""
    from go_shapefile_spark.operators.text import (
        corpus_curation_fused_sql, corpus_curation_sql,
    )
    from go_shapefile_spark.queries import register_tables

    register_tables(spark, sf_dir)
    staged = spark.sql(corpus_curation_sql("spark"))
    fused = spark.sql(corpus_curation_fused_sql("spark"))
    # count scans BEFORE executing: the post-run AQE tree string appends
    # an "== Initial Plan ==" section that double-counts every node
    n_staged = staged._jdf.queryExecution().executedPlan() \
        .toString().count("Scan parquet")
    n_fused = fused._jdf.queryExecution().executedPlan() \
        .toString().count("Scan parquet")
    assert n_fused == 2 and n_staged >= 2 * n_fused
    assert sorted(map(tuple, staged.collect())) \
        == sorted(map(tuple, fused.collect()))


def test_bm25_matches_pure_python_reference(spark):
    """The relational BM25 (rational-idf variant) equals a
    straightforward per-doc Python implementation, including the
    round-before-rank and doc_id tie-break laws."""
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import bm25_topk_sql

    docs = [
        (0, "table scan and table join over the table"),
        (1, "row scan row scan row"),
        (2, "the quick brown fox jumps over nothing relevant"),
        (3, "scan"),
        (4, "table row scan table row scan"),
        (5, "completely unrelated words only here"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).createOrReplaceTempView("bm_docs")
    got = spark.sql(bm25_topk_sql(
        "spark", terms=["table", "scan"], rel="bm_docs", k=10)).toPandas()

    tok = {i: re.split(r"[ \t\n\r\f\x0b]+", t) for i, t in docs}
    tok = {i: [w for w in ws if w] for i, ws in tok.items()}
    dl = {i: len(ws) for i, ws in tok.items()}
    avgdl = sum(dl.values()) / len(dl)
    n = float(len(docs))
    k1, b = 1.2, 0.75
    want = {}
    for term in ("table", "scan"):
        df_t = sum(1 for ws in tok.values() if term in ws)
        idf = (n - df_t + 0.5) / (df_t + 0.5)
        for i, ws in tok.items():
            tf = ws.count(term)
            if tf:
                want[i] = want.get(i, 0.0) + idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dl[i] / avgdl))
    expect = sorted(((round(s, 4), i) for i, s in want.items()),
                    key=lambda x: (-x[0], x[1]))
    assert [(r.doc_id, r.bm25) for r in got.itertuples(index=False)] \
        == [(i, s) for s, i in expect]


def _dual_run(spark, sql_fn, pdf, view):
    """Run a dual-dialect template over a planted corpus in BOTH engines;
    assert identical row sets and return the Spark rows."""
    import duckdb

    spark.createDataFrame(pdf).createOrReplaceTempView(view)
    got = sorted(map(tuple, spark.sql(sql_fn("spark")).collect()))
    con = duckdb.connect()
    con.register(view, pdf)
    want = sorted(map(tuple, con.sql(sql_fn("duck")).fetchall()))
    assert got == want
    return got


def test_decontam_planted_overlap(spark):
    """Benchmark doc 0 (0 % 11 == 0) plants a 5-gram; the train doc
    copying it is flagged, the clean and too-short docs are not, and
    both engines agree on the planted corpus."""
    import functools

    import pandas as pd

    from go_shapefile_spark.operators.text import decontam_overlap_sql

    leak = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"intro words then {leak} and some tail text here", ),
        (1, f"training doc quoting {leak} verbatim in the middle", ),
        (2, "totally different content with no shared phrases at all", ),
        (3, "four tokens only here", ),          # < 5 tokens -> no grams
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = _dual_run(
        spark, functools.partial(decontam_overlap_sql, rel="dc_docs"),
        pdf, "dc_docs")
    by_id = {r[0]: r for r in got}
    assert set(by_id) == {1, 2, 3}               # bench doc 0 excluded
    assert by_id[1][2] == 1 and by_id[1][1] >= 1  # flagged, >=1 gram
    assert by_id[2] == (2, 0, 0)
    assert by_id[3] == (3, 0, 0)


def test_repetition_planted_signals(spark):
    """The top-bigram and duplicate-gram fractions hit their extremes on
    a degenerate spam doc, stay low on varied text, and degenerate
    short docs fall through the LEFT JOIN as zero/keep."""
    import functools

    import pandas as pd

    from go_shapefile_spark.operators.text import repetition_stats_sql

    rows = [
        (1, "spam " * 40),                        # one bigram everywhere
        (2, "the quick brown fox jumps over a lazy dog near the river "
            "bank while birds sing softly above tall green trees"),
        (3, "lone"),                              # 1 token: no bigrams
        (4, ""),                                  # empty
        (5, "only two"),                          # exactly one bigram
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = _dual_run(
        spark, functools.partial(repetition_stats_sql, rel="rep_docs"),
        pdf, "rep_docs")
    by_id = {r[0]: r for r in got}
    assert by_id[1][1] == 1.0 and by_id[1][2] == 1.0 and by_id[1][3] == 0
    assert by_id[2][1] < 0.2 and by_id[2][2] == 0.0 and by_id[2][3] == 1
    assert by_id[3] == (3, 0.0, 0.0, 1)
    assert by_id[4] == (4, 0.0, 0.0, 1)
    # single bigram: top2 is 100% of one position; no 3-grams exist
    assert by_id[5] == (5, 1.0, 0.0, 0)


def test_split_sample_quotas_and_stability(spark):
    """sqrt-temperature quotas: a 64/16/4 source skew samples ~8:4:2
    (damped, not proportional), the sample is deterministic across
    runs, and both engines agree."""
    import functools

    import pandas as pd

    from go_shapefile_spark.operators.text import split_sample_sql

    rows = [(i, f"doc {i} text", f"s{src}")
            for i, src in enumerate(
                [0] * 64 + [1] * 16 + [2] * 4)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    fn = functools.partial(split_sample_sql, rel="ss_docs",
                           sample_total=14)
    got = _dual_run(spark, fn, pdf, "ss_docs")
    per_src = {}
    for src, _split, n in got:
        per_src[src] = per_src.get(src, 0) + n
    # weights 8:4:2 over total 14 -> quotas floor(14*8/14)=8, 4, 2
    assert per_src == {"s0": 8, "s1": 4, "s2": 2}
    again = sorted(map(tuple, spark.sql(fn("spark")).collect()))
    assert again == got


def test_pack_sequences_matches_pure_python_packer(spark):
    """Shard-local concat-then-chunk accounting equals an independent
    pure-Python packer (explicit token-stream simulation), including
    documents spanning several sequences, carried docs, and the final
    partial sequence; both engines agree."""
    import functools
    import hashlib
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import pack_sequences_sql

    rows = [(i, ("tok " * ((i * 13) % 41 + (30 if i % 7 == 0 else 1)))
             .strip()) for i in range(60)]
    rows.append((60, ""))                   # zero-token doc: excluded
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    L, S = 16, 4
    fn = functools.partial(pack_sequences_sql, rel="pk_docs",
                           seq_len=L, n_shards=S)
    got = _dual_run(spark, fn, pdf, "pk_docs")

    def h32(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")

    shards = {}
    for doc_id, text in rows:
        tok = len(re.findall(r"[a-z0-9]+", text.lower()))
        if tok:
            shards.setdefault(h32(f"pack:{doc_id}") % S, []).append(
                (doc_id, tok))
    want = {}
    for shard, docs in shards.items():
        pos = 0
        for _doc, tok in sorted(docs):
            for seq in range(pos // L, (pos + tok - 1) // L + 1):
                n, c, t = want.get((shard, seq), (0, 0, 0))
                want[(shard, seq)] = (
                    n + 1, c + (1 if pos < seq * L else 0),
                    t + min(pos + tok, (seq + 1) * L) - max(pos, seq * L))
            pos += tok
    assert {(s, q): (n, c, t) for s, q, n, c, t in got} == want
    # a doc longer than seq_len really spans >1 sequence somewhere
    assert any(c > 0 for (_, _), (_, c, _) in
               zip(want.keys(), want.values()))
    # every non-final sequence is exactly full
    last = {s: max(q for (s2, q) in want if s2 == s) for s in shards}
    for (s, q), (_, _, t) in want.items():
        assert t == 16 or q == last[s]


def test_pii_redact_counts_and_global_replace(spark):
    """PII counts and redaction hashes equal a pure-Python re.sub
    reference replicating the planting — proving the patterns, the
    GLOBAL replace (doc 14 carries two pre-existing emails; a
    first-match-only engine would leave the second one and diverge),
    the email->phone->ip pass order, and both engines' agreement."""
    import functools
    import hashlib
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import (
        PII_EMAIL_RX, PII_IP_RX, PII_PHONE_RX, pii_redact_sql,
    )

    rows = [
        (3, "reach me at dev@host.example.org please"),   # %11==3: +planted
        (7, "plain text with no contact info at all"),    # %11==7: +phones
        (9, "server logs said 192.168.7.13 was flaky"),   # %11==9: +ip
        (12, "nothing sensitive in this row"),            # untouched
        (15, "a@b.io then later c.d@e.f.co too"),         # two emails, no plant
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    fn = functools.partial(pii_redact_sql, rel="pii_docs")
    got = _dual_run(spark, fn, pdf, "pii_docs")

    def plant(doc_id, text):
        r = doc_id % 11
        if r == 3:
            return (f"{text} contact user{doc_id}@mail{doc_id}"
                    ".example.com ok")
        if r == 7:
            four = str(1000 + doc_id % 9000)[:4]
            return f"{text} call 415-555-{four} or 415-555-0199 today"
        if r == 9:
            return f"{text} host 10.{doc_id % 256}.0.7 up"
        return text

    want = []
    for doc_id, text in rows:
        p = plant(doc_id, text)
        n_email = len(re.findall(PII_EMAIL_RX, p))
        n_phone = len(re.findall(PII_PHONE_RX, p))
        n_ip = len(re.findall(PII_IP_RX, p))
        red = re.sub(PII_EMAIL_RX, "<EMAIL>", p)
        red = re.sub(PII_PHONE_RX, "<PHONE>", red)
        red = re.sub(PII_IP_RX, "<IP>", red)
        want.append((doc_id, n_email, n_phone, n_ip,
                     hashlib.md5(red.encode()).hexdigest()))
    assert got == sorted(want)
    by_id = {r[0]: r for r in got}
    assert by_id[3][1] == 2            # pre-existing + planted email
    assert by_id[7][2] == 2            # two planted phone numbers
    assert by_id[9][3] == 2            # pre-existing + planted IPv4
    assert by_id[12][1:4] == (0, 0, 0)
    assert by_id[15][1] == 2           # global replace, not first-only


def test_sparse_cosine_matches_numpy_reference(spark):
    """Inverted-index cosine join vs a dense numpy computation with the
    same spec (counts over kept terms, <= max_df pruning)."""
    import numpy as np

    from go_shapefile_spark.operators.text import sparse_cosine_pairs_sql

    docs = [
        (0, "apple banana apple cherry"),
        (1, "apple banana apple cherry date"),       # near-dup of 0
        (2, "zebra yak xray walrus"),
        (3, "zebra yak xray walrus zebra"),          # near-dup of 2
        (4, "apple zebra mango"),                    # bridges, low sim
        (5, "the the the the the"),                  # degenerate
    ]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .createOrReplaceTempView("sc_docs")
    got = {(r.doc_a, r.doc_b): (r.dot, r.cosine)
           for r in spark.sql("WITH " + sparse_cosine_pairs_sql(
               "spark", rel="sc_docs", min_cosine=0.0).lstrip()).collect()}

    import re
    vocab = sorted({t for _i, s in docs for t in re.split("[^a-z0-9]+",
                                                          s.lower()) if t})
    vecs = {}
    for i, s in docs:
        v = np.zeros(len(vocab), np.int64)
        for t in re.split("[^a-z0-9]+", s.lower()):
            if t:
                v[vocab.index(t)] += 1
        vecs[i] = v
    for a in range(6):
        for b in range(a + 1, 6):
            dot = int(vecs[a] @ vecs[b])
            if dot == 0:
                assert (a, b) not in got     # no shared term, no pair
                continue
            cos = dot / np.sqrt(float(vecs[a] @ vecs[a])
                                * float(vecs[b] @ vecs[b]))
            gd, gc = got[(a, b)]
            assert gd == dot and abs(gc - cos) < 1e-15, (a, b)
    # near-dups rank far above the bridge pairs
    assert got[(0, 1)][1] > 0.9 and got[(2, 3)][1] > 0.9
    assert all(c < 0.6 for (a, b), (_d, c) in got.items()
               if 4 in (a, b))

    # max_df prunes the stop term: with max_df=2 the 'the'-only doc
    # keeps nothing and 'apple' (df=3) drops, killing the 0-4 pair
    pruned = {(r.doc_a, r.doc_b)
              for r in spark.sql("WITH " + sparse_cosine_pairs_sql(
                  "spark", rel="sc_docs", max_df=2,
                  min_cosine=0.0).lstrip()).collect()}
    assert (0, 1) in pruned and (2, 3) in pruned
    assert not any(5 in p or (0, 4) == p for p in pruned)


def test_chunk_documents_matches_python_chunker(spark):
    import hashlib
    import re

    import pandas as pd

    from go_shapefile_spark.functions import hashes as H
    from go_shapefile_spark.operators.text import chunk_documents_sql

    size, overlap, stride = 10, 3, 7
    docs = {
        1: "one two three",                          # < size: one chunk
        2: " ".join(f"w{i}" for i in range(10)),     # == size
        3: " ".join(f"w{i}" for i in range(11)),     # size + 1
        4: " ".join(f"w{i}" for i in range(25)),     # several chunks
        5: "Sol! Sol, SOL?  x",                      # normalization
    }

    def chunker(text):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        n = len(toks)
        nc = 1 if n <= size else -((n - size) // -stride) + 1
        out = []
        for ci in range(nc):
            piece = toks[ci * stride: ci * stride + size]
            h = int(hashlib.md5(" ".join(piece).encode())
                    .hexdigest()[:15], 16)
            out.append((ci, ci * stride, len(piece), h))
        return out

    expected = {(d, *row) for d, t in docs.items() for row in chunker(t)}
    pdf = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    spark.createDataFrame(pdf).createOrReplaceTempView("chunk_test_docs")
    got = {(r.doc_id, r.chunk_id, r.tok_start, r.n_tok, r.chunk_hash)
           for r in spark.sql(chunk_documents_sql(
               H.SPARK, rel="chunk_test_docs",
               size=size, overlap=overlap)).collect()}
    assert got == expected
    # coverage + overlap invariants on the multi-chunk doc
    rows = sorted((r for r in got if r[0] == 4), key=lambda r: r[1])
    assert rows[0][2] == 0
    for a, b in zip(rows, rows[1:]):
        assert b[2] == a[2] + stride          # stride advance
        assert a[2] + a[3] >= b[2] + overlap or a[3] < size
    assert rows[-1][2] + rows[-1][3] == 25    # last token covered


def test_pmi_planted_collocation(spark):
    """A planted always-together pair ranks first by the integer PMI
    quotient, which matches the hand-computed rational; dual-engine
    row sets are identical."""
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import pmi_bigrams_sql

    # "san francisco" always adjacent; filler words co-occur freely.
    filler = "alpha beta gamma delta epsilon zeta".split()
    docs = []
    for i in range(12):
        pre = " ".join(filler[(i + j) % 6] for j in range(5))
        docs.append((i, f"{pre} san francisco {pre}"))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    rows = _dual_run(
        spark,
        lambda d: pmi_bigrams_sql(d, rel="pmi_docs", min_count=3,
                                  top_k=5),
        pdf, "pmi_docs")

    # hand-computed PMI quotient for the planted pair
    toks = [re.findall(r"[a-z0-9]+", t.lower()) for _, t in docs]
    n = sum(len(ws) for ws in toks)
    c12 = sum(1 for ws in toks
              for a, b in zip(ws, ws[1:]) if (a, b) == ("san", "francisco"))
    c1 = sum(ws.count("san") for ws in toks)
    c2 = sum(ws.count("francisco") for ws in toks)
    want_q = (c12 * n * 1_000_000) // (c1 * c2)

    top = [r for r in rows if r[6] == 1]  # rk column
    assert len(top) == 1
    w1, w2, got_c12, got_c1, got_c2, pmi_q, rk = top[0]
    assert (w1, w2) == ("san", "francisco")
    assert (got_c12, got_c1, got_c2, pmi_q) == (c12, c1, c2, want_q)
    # the planted collocation beats every filler bigram
    assert all(r[5] <= pmi_q for r in rows)


def test_lm_likelihood_matches_python_bigram_model(spark):
    """The quantized bigram-LM doc scores equal a pure-Python model
    with the same integer-division quantization; a sub-2-token doc
    lands in the 'short' band."""
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import lm_likelihood_sql

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran on the mat"),
        (2, "a dog sat on a log"),
        (3, "mat"),                       # 1 token -> no bigrams
        (4, "the cat sat on the log"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    rows = _dual_run(
        spark,
        lambda d: lm_likelihood_sql(d, rel="lm_docs",
                                    low_q=100_000_000),
        pdf, "lm_docs")

    tok = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in docs}
    uni, big = {}, {}
    for ws in tok.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    model = {k: (c * 10**9) // uni[k[0]] for k, c in big.items()}
    want = {}
    for i, ws in tok.items():
        ps = [model[(a, b)] for a, b in zip(ws, ws[1:])]
        if ps:
            want[i] = (len(ps), sum(ps) // len(ps))
        else:
            want[i] = (0, 0)

    got = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want
    bands = {r[0]: r[3] for r in rows}
    assert bands[3] == "short"
    assert set(bands.values()) <= {"keep", "review", "short"}


def test_boilerplate_ngrams_matches_python(spark):
    """Planted-boilerplate corpus: docs sharing a header sentence must
    score high, unique docs zero, short docs (< gram tokens) emit a
    zero row rather than vanishing.  Python reference recomputes df
    and per-doc coverage independently."""
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import boilerplate_ngrams_sql

    header = "subscribe to our newsletter for updates"
    bodies = [
        f"{header} alpha beta gamma delta",
        f"{header} epsilon zeta eta theta iota",
        f"{header} kappa lambada mu",
        f"{header} nu xi omicron pi rho sigma",
        "completely unique text about volcanic rocks and lichen",
        "another singular document mentioning orbital mechanics",
        "tiny doc",          # 2 tokens < gram=3 -> zero positions
        "",                   # empty
    ]
    pdf = pd.DataFrame({"doc_id": range(len(bodies)), "text": bodies})
    spark.createDataFrame(pdf).createOrReplaceTempView("bp_docs")
    got = {r.doc_id: (r.n_grams, r.n_boiler, r.boiler_ppb) for r in
           spark.sql(boilerplate_ngrams_sql(
               "spark", rel="bp_docs", gram=3, min_df=4)).collect()}

    G, MIN_DF = 3, 4
    toks = {i: re.findall(r"[a-z0-9]+", t.lower())
            for i, t in enumerate(bodies)}
    grams = {i: [tuple(ts[j:j + G]) for j in range(len(ts) - G + 1)]
             for i, ts in toks.items()}
    df: dict = {}
    for i, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    hot = {g for g, c in df.items() if c >= MIN_DF}
    want = {}
    for i, gs in grams.items():
        nb = sum(1 for g in gs if g in hot)
        want[i] = (len(gs), nb,
                   10 ** 9 * nb // len(gs) if gs else 0)
    assert got == want
    # contract rows: header docs boilerplate-heavy, unique docs zero,
    # short docs present with zeros
    assert got[0][1] >= 4 and got[4] == (6, 0, 0)
    assert got[6] == (0, 0, 0) and got[7] == (0, 0, 0)


def test_duplicate_spans_matches_python(spark):
    """Planted corpus: a sentence shared verbatim by two docs becomes
    one merged span in each; two separated shared regions stay two
    spans; overlapping duplicated windows merge; unique docs emit the
    zero row.  Python reference recomputes the flag-and-merge."""
    import re

    import pandas as pd

    from go_shapefile_spark.operators.text import duplicate_spans_sql

    shared1 = "the quick brown fox jumps over the lazy dog again today"
    shared2 = "all work and no play makes jack a dull boy indeed"
    bodies = [
        f"intro words here {shared1} and some unique tail",
        f"{shared1} different middle part {shared2}",
        f"prefix {shared2} closing remark",
        "a completely unique document with no repeats anywhere at all "
        "continuing with more singular text",
        "short doc",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(bodies)), "text": bodies})
    spark.createDataFrame(pdf).createOrReplaceTempView("ds_docs")
    G, MD = 8, 2
    got = {r.doc_id: (r.n_tok, r.n_spans, r.dup_tokens, r.dup_ppb)
           for r in spark.sql(duplicate_spans_sql(
               "spark", rel="ds_docs", gram=G, min_docs=MD)).collect()}

    toks = {i: re.findall(r"[a-z0-9]+", t.lower())
            for i, t in enumerate(bodies)}
    df: dict = {}
    for i, ts in toks.items():
        for j in range(len(ts) - G + 1):
            df.setdefault(tuple(ts[j:j + G]), set()).add(i)
    dup = {g for g, docs in df.items() if len(docs) >= MD}
    want = {}
    for i, ts in toks.items():
        flagged = [j for j in range(len(ts) - G + 1)
                   if tuple(ts[j:j + G]) in dup]
        spans = []
        for j in flagged:
            if spans and j <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], j + G - 1)
            else:
                spans.append([j, j + G - 1])
        dt = sum(e - s + 1 for s, e in spans)
        want[i] = (len(ts), len(spans), dt,
                   10 ** 9 * dt // len(ts) if ts else 0)
    assert got == want
    assert got[1][1] == 2          # two separated shared regions
    assert got[3] == (len(toks[3]), 0, 0, 0)
    assert got[4][1] == 0          # < gram tokens -> no positions
