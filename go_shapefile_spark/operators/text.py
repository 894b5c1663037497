"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting — over the ``documents`` table, dual-dialect SQL (Spark
engine / DuckDB oracle) like the dedup family.

All operators are pure relational algebra + regex built-ins: one
tokenize-explode, map-side combined aggregation per doc, no Python.
"""

from __future__ import annotations

from ..functions import hashes as H

# Tiny embedded stopword lists per language (n-gram/stopword heuristic).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "del", "por", "con"],
}
STOPWORDS_EN = LANG_STOPWORDS["en"]


def _in_list(col: str, words: list[str]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return f"CASE WHEN {col} IN ({lit}) THEN 1 ELSE 0 END"


def token_stats_sql(dialect: str, rel: str = "documents") -> str:
    """Whitespace/alnum token counting + char stats per doc."""
    n_tokens = H.regexp_count("lower(text)", "[a-z0-9]+", dialect)
    n_punct = H.regexp_count("text", "[.,;:!?]", dialect)
    return f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
       CAST({n_tokens} AS BIGINT) AS n_tokens,
       CAST({n_punct} AS BIGINT) AS n_punct,
       ROUND(CAST(LENGTH(text) AS DOUBLE) / GREATEST({n_tokens}, 1), 6) AS chars_per_token
FROM {rel}
"""



def _lang_vote_sums(indent: str = "  ") -> str:
    """One SUM per language's stopword hits (s_en doubles as the
    quality score's n_stop — shared by langid_sql and the fused
    curation template)."""
    return (",\n" + indent).join(
        f"SUM({_in_list('tok', words)}) AS s_{lang}"
        for lang, words in LANG_STOPWORDS.items())


def _lang_vote_case() -> str:
    """Deterministic arg-max over the vote sums (earlier language wins
    ties with later ones)."""
    langs = list(LANG_STOPWORDS)
    cond = []
    for i, lang in enumerate(langs):
        others = [f"s_{lang} >= s_{o}" for o in langs[i + 1:]]
        prior = [f"s_{lang} > s_{o}" for o in langs[:i]]
        clauses = prior + others
        cond.append(
            f"WHEN {' AND '.join(clauses) if clauses else 'TRUE'} "
            f"THEN '{lang}'")
    return "CASE " + " ".join(cond) + " ELSE 'und' END"


def _quality_expr(n_chars: str, n_stop: str, n_tokens: str,
                  n_symbols: str) -> str:
    """The quality blend (length band + stopword density + symbol
    noise) over caller-supplied sub-expressions."""
    return f"""ROUND(
         (CASE WHEN {n_chars} BETWEEN 100 AND 20000
               THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
       + (CASE WHEN CAST({n_stop} AS DOUBLE) / {n_tokens} >= 0.01
               THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
       + (CASE WHEN CAST({n_symbols} AS DOUBLE) / {n_chars} <= 0.1
               THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
       , 6)"""


def quality_score_sql(dialect: str, rel: str = "documents") -> str:
    """Heuristic quality score: length band + stopword ratio + punct ratio.

    Score components are exact integer/rational arithmetic so both engines
    agree bitwise; the blend mirrors common training-data quality filters
    (length, stopword density, symbol noise).
    """
    return f"""
WITH tokens AS (
  SELECT doc_id, {H.split_tokens("text", dialect)} AS tok FROM {rel}
),
tok_agg AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         SUM({_in_list("tok", STOPWORDS_EN)}) AS n_stop
  FROM tokens WHERE tok <> '' GROUP BY doc_id
),
base AS (
  SELECT d.doc_id,
         LENGTH(d.text) AS n_chars,
         t.n_tokens, t.n_stop,
         {H.regexp_count("d.text", "[^a-z0-9 ]", dialect)} AS n_symbols
  FROM {rel} d JOIN tok_agg t ON t.doc_id = d.doc_id
)
SELECT doc_id,
       ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       ROUND(CAST(n_symbols AS DOUBLE) / n_chars, 6) AS symbol_ratio,
       {_quality_expr('n_chars', 'n_stop', 'n_tokens', 'n_symbols')} AS quality
FROM base
"""


def langid_sql(dialect: str, rel: str = "documents") -> str:
    """Stopword-vote language ID with deterministic tie-break order."""
    sums = _lang_vote_sums()
    case = _lang_vote_case()
    return f"""
WITH tokens AS (
  SELECT doc_id, {H.split_tokens("text", dialect)} AS tok FROM {rel}
),
votes AS (
  SELECT doc_id,
  {sums}
  FROM tokens WHERE tok <> '' GROUP BY doc_id
)
SELECT doc_id, {case} AS pred_lang FROM votes
"""


def fingerprint_sql(dialect: str, rel: str = "documents") -> str:
    """Document fingerprint: 60-bit content hash of whitespace-normalized
    text + per-source duplicate-fingerprint counts."""
    norm = "regexp_replace(lower(text), '[^a-z0-9]+', ' ')"
    fp = H.h60(norm, dialect)
    return f"""
SELECT doc_id, source, {fp} AS fingerprint
FROM {rel}
"""


def winnow_fingerprint_sql(dialect: str, rel: str = "documents",
                           k: int = 7, window: int = 4) -> str:
    """Winnowing fingerprints (the rolling-hash document fingerprint of
    MOSS): hash every k-gram, slide a ``window``-wide frame over the
    hash sequence, keep each frame's MINIMUM — the classic guarantee
    that any shared substring of length ≥ k + window - 1 contributes at
    least one identical fingerprint to both documents.

    Expressed as pure relational algebra (positions explode → k-gram
    hash → windowed MIN → DISTINCT), so Spark and DuckDB run the
    identical computation; the gate aggregates per doc (count / min /
    max / sum of fingerprints — sums stay far below int64 under ANSI
    because k-gram hashes are 32-bit).

    The SPARK dialect emits the de-skewed CHUNKED fingerprint build
    (r6 optimization): the unchunked form sorts each document in one
    window partition AND carries the full text through the position
    explode — O(len²) bytes per document (the CLAUDE.md winnowing
    rule).  Chunk 64 bounds the carried substring to ~80 chars, which
    measures fastest on BOTH the web-page gate corpus and the
    book-length bench probe (7.3 s → ~1.3 s there).  The chunked ``fps`` set is IDENTICAL to
    the unchunked one (property-tested per chunk size), and the DuckDB
    dialect keeps the original unchunked text, so the oracle continues
    to check the chunk restructure against the reference algebra.
    """
    from ..functions import hashes as H

    if dialect == H.SPARK:
        body = _winnow_fps_cte_chunked(dialect, rel, k, window, 64)
    else:
        body = _winnow_fps_cte(dialect, rel, k, window)
    return f"""
WITH {body}
SELECT doc_id, COUNT(*) AS n_fps,
       MIN(fp) AS min_fp, MAX(fp) AS max_fp,
       CAST(SUM(fp) AS BIGINT) AS sum_fp
FROM fps GROUP BY doc_id
"""


def _winnow_fps_cte(dialect: str, rel: str, k: int, window: int) -> str:
    """CTE chain ending in ``fps(doc_id, fp)`` — each document's
    DISTINCT winnowed fingerprint set (shared by the per-doc gate
    aggregate and the overlap-pair operator)."""
    from ..functions import hashes as H

    kg = H.h32(f"SUBSTRING(text, pos, {k})", dialect)
    return f"""positions AS (
  SELECT doc_id, text,
         {H.seq_1_to(f"GREATEST(1, LENGTH(text) - {k - 1})", dialect)} AS pos
  FROM {rel}
),
kgrams AS (
  SELECT doc_id, pos, {kg} AS h
  FROM positions
),
winmins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ASC
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
           AS fp
  FROM kgrams
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmins
)"""


def fingerprint_overlap_pairs_sql(dialect: str, rel: str = "documents",
                                  k: int = 7, window: int = 4,
                                  min_shared: int = 2,
                                  max_doc_freq: float | None = 0.1,
                                  chunk: int | None = None) -> str:
    """MOSS-style near-dup detection: document pairs sharing at least
    ``min_shared`` winnowed fingerprints (the winnowing guarantee makes
    every shared substring of length ≥ k + window − 1 contribute a
    common fingerprint, so plagiarized/boilerplate-copied passages are
    caught structurally — a different detector family from the
    set-similarity ones: it localizes CONTIGUOUS overlap).

    The join is an equi-join on the fingerprint value — never the n²
    pair space — and ``max_doc_freq`` drops fingerprints present in
    more than that fraction of documents before the join: a fingerprint
    shared by m documents contributes m² candidate rows, so ubiquitous
    boilerplate fingerprints are exactly the quadratic hazard the
    minhash stop-shingle filter addresses (same FLOOR-based
    dialect-shared cutoff, dedup.stop_shingle_filter_cte).
    ``max_doc_freq=None`` disables the guard.  ``chunk`` selects the
    de-skewed chunked fingerprint build (identical fps set) — the
    long-document scale path per CLAUDE.md's winnowing rule.
    """
    from .dedup import stop_shingle_filter_cte

    fps_cte = (_winnow_fps_cte_chunked(dialect, rel, k, window, chunk)
               if chunk else _winnow_fps_cte(dialect, rel, k, window))
    if max_doc_freq is not None:
        keep = f""",
{stop_shingle_filter_cte(rel, max_doc_freq, "fps", "fp", "fps_j")}"""
        join_rel = "fps_j"
    else:
        keep = ""
        join_rel = "fps"
    # /*+ MERGE */: the fingerprint relation is the FULL per-doc
    # fingerprint set (22M rows at the 50k-doc rehearsal) and Spark's
    # estimate of it is tiny — both inlined (filter-selectivity
    # underestimate) and pinned (checkpointed LogicalRDDs preserve the
    # origin plan's Statistics) — so the planner broadcasts it and OOMs
    # an 8g heap.  The hint forces the scale-correct shuffle join on fp;
    # DuckDB reads it as an ordinary block comment, so the oracle twin
    # is byte-identical SQL.
    return f"""
WITH {fps_cte}{keep}
SELECT /*+ MERGE(a, b) */ a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM {join_rel} a JOIN {join_rel} b
  ON b.fp = a.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {min_shared}
"""


def _winnow_fps_cte_chunked(dialect: str, rel: str, k: int, window: int,
                            chunk: int) -> str:
    """Chunked twin of :func:`_winnow_fps_cte` (identical ``fps`` output,
    property-tested): bounds every sort partition at chunk+window-1
    k-grams and never carries the full text through the explode."""
    from ..functions import hashes as H

    s = chunk
    ln = s + window - 1             # k-gram positions per chunk
    kg = H.h32(f"SUBSTRING(ctext, i, {k})", dialect)
    n_chunks = H.idiv(f"nk + {s - 1}", str(s), dialect)
    return f"""docs AS (
  SELECT doc_id, text, GREATEST(1, LENGTH(text) - {k - 1}) AS nk
  FROM {rel}
),
cidx AS (
  SELECT doc_id, text, nk, {H.seq_1_to(n_chunks, dialect)} AS c
  FROM docs
),
chunks AS (
  SELECT doc_id, nk, c, 1 + (c - 1) * {s} AS pos0,
         SUBSTRING(text, 1 + (c - 1) * {s}, {ln + k - 1}) AS ctext
  FROM cidx
),
cpos AS (
  SELECT doc_id, c, pos0, ctext,
         {H.seq_1_to(f"LEAST({ln}, nk - pos0 + 1)", dialect)} AS i
  FROM chunks
),
kgrams AS (
  SELECT doc_id, c, pos0, pos0 + i - 1 AS pos, {kg} AS h
  FROM cpos
),
winmins AS (
  SELECT doc_id, pos0, pos,
         MIN(h) OVER (PARTITION BY doc_id, c ORDER BY pos ASC
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
           AS fp
  FROM kgrams
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmins WHERE pos < pos0 + {s}
)"""


def winnow_fingerprint_chunked_sql(dialect: str, rel: str = "documents",
                                   k: int = 7, window: int = 4,
                                   chunk: int = 4096) -> str:
    """Winnowing fingerprints, de-skewed for long documents.

    :func:`winnow_fingerprint_sql` windows ``PARTITION BY doc_id`` — one
    sort partition per document, which is fine for web-page-sized rows
    but serializes a book-length document onto a single task.  This
    variant splits each document into overlapping chunks and windows
    ``PARTITION BY (doc_id, chunk)``, bounding every sort partition at
    ``chunk + window - 1`` k-grams regardless of document length.

    Output is IDENTICAL to the unchunked form (property-tested): chunk
    ``c`` owns frame starts in ``[1 + c·chunk, 1 + (c+1)·chunk)`` but
    its k-gram run extends ``window - 1`` positions past the owned range
    (the substring carries ``k - 1`` extra characters), so every owned
    frame sees its full window; truncated frames occur only at the true
    document tail, exactly as in the unchunked SQL.
    """
    return f"""
WITH {_winnow_fps_cte_chunked(dialect, rel, k, window, chunk)}
SELECT doc_id, COUNT(*) AS n_fps,
       MIN(fp) AS min_fp, MAX(fp) AS max_fp,
       CAST(SUM(fp) AS BIGINT) AS sum_fp
FROM fps GROUP BY doc_id
"""


# GPT-2-style pre-tokenizer pattern, ASCII form, RE2-safe (no lookahead/
# unicode classes): common English contractions, space-prefixed letter
# runs, space-prefixed digit runs, space-prefixed punctuation runs,
# residual whitespace.  The whitespace class is spelled out explicitly —
# Java's \s includes vertical tab (\x0B) while RE2's does not, so a
# shared \s would silently count differently per engine.  Written with
# single backslashes; H.rx() handles each dialect's literal escaping
# ('' is a literal apostrophe in both).
_WS = r" \t\n\r\f\x0B"
BPE_PATTERN = (r"''s|''t|''re|''ve|''m|''ll|''d"
               r"| ?[a-zA-Z]+| ?[0-9]+"
               rf"| ?[^a-zA-Z0-9{_WS}]+|[{_WS}]+")


def bpe_token_stats_sql(dialect: str, rel: str = "documents") -> str:
    """BPE-ish token counting: the GPT-2 pre-tokenizer segmentation
    (contractions / letter runs / digit runs / punctuation runs, each
    optionally space-prefixed) — the standard first pass of byte-pair
    tokenizers, which bounds the true BPE token count from below and
    tracks it closely on natural text.  Pure regexp aggregation, one
    scan, identical pattern in both engines (ASCII RE2-safe form)."""
    n_bpe = H.regexp_count("text", H.rx(BPE_PATTERN, dialect), dialect)
    n_ws = H.regexp_count("text", H.rx(rf"[^{_WS}]+", dialect), dialect)
    return f"""
SELECT doc_id,
       CAST({n_bpe} AS BIGINT) AS n_bpe_tokens,
       CAST({n_ws} AS BIGINT) AS n_ws_tokens,
       ROUND(CAST({n_bpe} AS DOUBLE) /
             GREATEST(CAST({n_ws} AS BIGINT), 1), 6) AS bpe_per_ws
FROM {rel}
"""


def corpus_curation_sql(dialect: str, rel: str = "documents",
                        min_quality: float = 0.7,
                        lang: str = "en") -> str:
    """End-to-end corpus CURATION: the filter composition a training-
    data pipeline runs before tokenization — quality floor + language
    gate + exact-dedup keep-one (first doc_id per content hash) — as
    ONE dual-dialect relational query (every stage reuses its existing
    template, so the composition inherits their oracle parity).
    Returns the curated per-document rows (doc_id, source, quality,
    pred_lang)."""
    q = quality_score_sql(dialect, rel)
    lid = langid_sql(dialect, rel)
    return f"""
SELECT doc_id, source, quality, pred_lang
FROM (
  SELECT d.doc_id, d.source, q.quality, l.pred_lang,
         ROW_NUMBER() OVER (PARTITION BY MD5(d.text)
                            ORDER BY d.doc_id) AS rn
  FROM {rel} d
  JOIN ({q}) q ON q.doc_id = d.doc_id
  JOIN ({lid}) l ON l.doc_id = d.doc_id
  WHERE q.quality >= CAST({min_quality} AS DOUBLE)
    AND l.pred_lang = '{lang}'
) t
WHERE rn = 1
"""


def corpus_curation_fused_sql(dialect: str, rel: str = "documents",
                              min_quality: float = 0.7,
                              lang: str = "en") -> str:
    """Single-pass fusion of :func:`corpus_curation_sql` — identical
    output rows (parity-tested), built for the 100-TB shape: the staged
    composition inlines each stage's CTEs and scans ``{rel}`` four
    times (measured), while this form tokenizes ONCE (the language
    votes already contain the quality score's stopword count — s_en),
    joins back once, and windows the filtered survivors: two scans,
    one aggregation shuffle, one window."""
    n_sym = H.regexp_count("d.text", "[^a-z0-9 ]", dialect)
    return f"""
WITH tokens AS (
  SELECT doc_id, {H.split_tokens("text", dialect)} AS tok FROM {rel}
),
tok_agg AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         {_lang_vote_sums(indent="         ")}
  FROM tokens WHERE tok <> '' GROUP BY doc_id
),
scored AS (
  SELECT d.doc_id, d.source,
         MD5(d.text) AS text_hash,
         {_quality_expr("LENGTH(d.text)", "t.s_en",
                        "t.n_tokens", n_sym)} AS quality,
         {_lang_vote_case()} AS pred_lang
  FROM {rel} d JOIN tok_agg t ON t.doc_id = d.doc_id
)
SELECT doc_id, source, quality, pred_lang
FROM (
  SELECT doc_id, source, quality, pred_lang,
         ROW_NUMBER() OVER (PARTITION BY text_hash
                            ORDER BY doc_id) AS rn
  FROM scored
  WHERE quality >= CAST({min_quality} AS DOUBLE)
    AND pred_lang = '{lang}'
) t
WHERE rn = 1
"""


def bm25_topk_sql(dialect: str, terms: list[str] | None = None,
                  rel: str = "documents", k: int = 20,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """Corpus retrieval scoring: BM25 top-k for a literal query term
    set, as one relational query (tokens -> per-doc term frequencies ->
    document lengths -> corpus stats -> per-term scores -> sum ->
    deterministic top-k).

    The idf factor is the RATIONAL core of BM25 —
    ``(N - df + 0.5) / (df + 0.5)`` — without the final ``LN``:
    IEEE +,*,/ are bit-deterministic across engines while the two
    engines' libm ``ln`` may differ in the last ulp, which a
    hash-compared oracle cannot tolerate.  Per term the transform is
    monotone (documented variant; a production caller who wants the
    classic log damping applies LN Spark-side).  The summed score is
    rounded to 4 dp before ranking in BOTH engines so partition-order
    float-addition jitter cannot flip the ordering; ties break on
    doc_id.

    Scale shape: the only corpus-wide shuffle is GROUP BY
    (doc_id, tok) over TERM-FILTERED tokens — the query-term filter
    sits under the explode, so non-matching tokens never shuffle.
    Document lengths come from a scan-side ``regexp_count`` (non-
    whitespace runs == split-token count), not from aggregating every
    token; ``WHERE dl > 0`` keeps the doc set identical to the
    explode-based definition (docs with at least one token).
    """
    terms = terms or ["table", "row", "scan"]
    tlist = ", ".join(f"'{t}'" for t in terms)
    k1p1 = f"CAST({k1 + 1.0} AS DOUBLE)"
    k1c = f"CAST({k1} AS DOUBLE)"
    one_b = f"CAST({1.0 - b} AS DOUBLE)"
    bc = f"CAST({b} AS DOUBLE)"
    n_tok = H.regexp_count("text", f"[^{_WS}]+", dialect)
    return f"""
WITH tokens AS (
  SELECT doc_id, {H.split_tokens("text", dialect)} AS tok FROM {rel}
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM tokens WHERE tok IN ({tlist}) GROUP BY doc_id, tok
),
doclen AS (
  SELECT doc_id, dl FROM (
    SELECT doc_id, CAST({n_tok} AS BIGINT) AS dl FROM {rel}
  ) t WHERE dl > 0
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         AVG(CAST(dl AS DOUBLE)) AS avgdl
  FROM doclen
),
term_df AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df
  FROM tok_counts GROUP BY tok
),
scores AS (
  SELECT tc.doc_id,
         SUM(
           ((s.n_docs - d.df + CAST(0.5 AS DOUBLE))
              / (d.df + CAST(0.5 AS DOUBLE)))
           * (CAST(tc.tf AS DOUBLE) * {k1p1})
           / (CAST(tc.tf AS DOUBLE)
              + {k1c} * ({one_b} + {bc} * CAST(dl.dl AS DOUBLE) / s.avgdl))
         ) AS score
  FROM tok_counts tc
  JOIN term_df d ON d.tok = tc.tok
  JOIN doclen dl ON dl.doc_id = tc.doc_id
  CROSS JOIN stats s
  GROUP BY tc.doc_id
)
SELECT doc_id, ROUND(score, 4) AS bm25
FROM scores
ORDER BY ROUND(score, 4) DESC, doc_id
LIMIT {k}
"""


def decontam_overlap_sql(dialect: str, rel: str = "documents",
                         n: int = 5, bench_mod: int = 11) -> str:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a held-out benchmark split (doc_id %
    ``bench_mod`` == 0 plays the benchmark here; a real pipeline joins
    an external eval table of the same (doc_id, text) shape).

    The join key is the 32-bit hash of the n-gram, not the string —
    integer keys shuffle; the benchmark side is tiny by construction
    and the hint broadcasts it (DuckDB reads the hint as a block
    comment, keeping the template shared).  Per-doc DISTINCT collapses
    the gram stream map-side before the join, so the shuffled volume is
    ~unique grams, not positions.  Emits every training doc with its
    overlap count — the caller's removal policy is one WHERE.
    """
    toks = H.tokens_arr("text", dialect)
    gram = H.arr_gram("toks", "pos", n, dialect)
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS toks FROM {rel}
),
positions AS (
  SELECT doc_id, toks, {H.seq_1_to(f"{H.array_len('toks', dialect)} - {n - 1}", dialect)} AS pos
  FROM toks WHERE {H.array_len('toks', dialect)} >= {n}
),
grams AS (
  SELECT DISTINCT doc_id, {H.h32(gram, dialect)} AS g
  FROM positions
),
bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0
),
hits AS (
  SELECT /*+ BROADCAST(b) */ t.doc_id, COUNT(*) AS n_overlap
  FROM grams t JOIN bench b ON t.g = b.g
  WHERE t.doc_id % {bench_mod} <> 0
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CASE WHEN h.n_overlap IS NOT NULL THEN 1 ELSE 0 END AS contaminated
FROM {rel} d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {bench_mod} <> 0
"""


def repetition_stats_sql(dialect: str, rel: str = "documents",
                         dup_n: int = 3, top2_max: float = 0.08,
                         dup_max: float = 0.10) -> str:
    """Gopher-style repetition quality signals per document: the token
    fraction claimed by the most frequent word 2-gram and the fraction
    of ``dup_n``-gram positions whose gram repeats within the doc, plus the
    keep/drop verdict at the given thresholds.

    One scan, one explode: both gram sizes ride a single position
    stream (the dup_n-gram is NULL on the trailing positions), so the
    heavy tokenize/explode work is not duplicated per gram size.
    Fractions are exact rationals of integer counts — no float
    accumulation — so the dual-engine compare is bit-stable.
    """
    toks = H.tokens_arr("text", dialect)
    alen = H.array_len("toks", dialect)
    g2 = H.arr_gram("toks", "pos", 2, dialect)
    gd = H.arr_gram("toks", "pos", dup_n, dialect)
    dcol = f"dup{dup_n}_frac"
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS toks FROM {rel}
),
positions AS (
  SELECT doc_id, toks, {alen} AS nt,
         {H.seq_1_to(f"{alen} - 1", dialect)} AS pos
  FROM toks WHERE {alen} >= 2
),
grams AS (
  SELECT doc_id, nt, {H.h32(g2, dialect)} AS g2,
         CASE WHEN pos + {dup_n - 1} <= nt THEN {H.h32(gd, dialect)} END AS gd
  FROM positions
),
c2 AS (
  SELECT doc_id, nt, g2 AS g, COUNT(*) AS cnt
  FROM grams GROUP BY doc_id, nt, g2
),
a2 AS (
  SELECT doc_id, MAX(cnt) AS top_cnt, SUM(cnt) AS n_pos
  FROM c2 GROUP BY doc_id
),
cd AS (
  SELECT doc_id, gd AS g, COUNT(*) AS cnt
  FROM grams WHERE gd IS NOT NULL GROUP BY doc_id, gd
),
ad AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_pos,
         SUM(cnt) AS n_pos
  FROM cd GROUP BY doc_id
)
SELECT d.doc_id,
       ROUND(CAST(COALESCE(a2.top_cnt, 0) AS DOUBLE)
             / GREATEST(COALESCE(a2.n_pos, 0), 1), 6) AS top2_frac,
       ROUND(CAST(COALESCE(ad.dup_pos, 0) AS DOUBLE)
             / GREATEST(COALESCE(ad.n_pos, 0), 1), 6) AS {dcol},
       CASE WHEN CAST(COALESCE(a2.top_cnt, 0) AS DOUBLE)
                 <= {top2_max!r} * GREATEST(COALESCE(a2.n_pos, 0), 1)
             AND CAST(COALESCE(ad.dup_pos, 0) AS DOUBLE)
                 <= {dup_max!r} * GREATEST(COALESCE(ad.n_pos, 0), 1)
            THEN 1 ELSE 0 END AS keep
FROM {rel} d
LEFT JOIN a2 ON d.doc_id = a2.doc_id
LEFT JOIN ad ON d.doc_id = ad.doc_id
"""


def pack_sequences_sql(dialect: str, rel: str = "documents",
                       seq_len: int = 256, n_shards: int = 8) -> str:
    """GPT-style sequence-packing accounting: concatenate each shard's
    documents in deterministic order, chunk the token stream into
    fixed ``seq_len`` sequences, and emit per-sequence composition
    stats — the bookkeeping a pretraining pipeline runs to build its
    packed batches.

    Shard = md5-bucket of the doc id (stable under corpus growth, like
    the split operator); within a shard the pack order is doc_id.  The
    cumulative token sum windows PER SHARD, so the sort is shard-local
    and parallelism = shard count — pick shards ≈ cluster cores at
    100 TB; there is NO global sort.  A document spanning k sequences
    explodes to k rows (fan-out ≤ tok/seq_len + 1).  Zero-token docs
    are excluded (they occupy no sequence positions).  Every output is
    an integer — the dual-engine compare is bit-stable.

    Columns: shard, seq_id (per-shard), n_docs (docs contributing
    tokens), n_carried (docs continuing from the previous sequence),
    n_tokens (= seq_len except each shard's final partial sequence).
    """
    st = "STRING" if dialect == H.SPARK else "VARCHAR"
    tok = H.array_len(H.tokens_arr("text", dialect), dialect)
    shard_h = H.h32(f"CONCAT('pack:', CAST(doc_id AS {st}))", dialect)
    first_seq = H.idiv("s", str(seq_len), dialect)
    last_seq = H.idiv("e - 1", str(seq_len), dialect)
    return f"""
WITH toks AS (
  SELECT doc_id, {shard_h} % {n_shards} AS shard,
         CAST({tok} AS BIGINT) AS tok
  FROM {rel}
),
spans AS (
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which generate_series rejects
  SELECT shard, doc_id, tok,
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - tok AS BIGINT) AS s,
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS e
  FROM toks WHERE tok > 0
),
touched AS (
  SELECT shard, doc_id, s, e,
         {H.seq_range(first_seq, last_seq, dialect)} AS seq_id
  FROM spans
)
SELECT shard, seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s < seq_id * {seq_len} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_carried,
       CAST(SUM(LEAST(e, (seq_id + 1) * {seq_len})
                - GREATEST(s, seq_id * {seq_len})) AS BIGINT) AS n_tokens
FROM touched
GROUP BY shard, seq_id
"""


def split_sample_sql(dialect: str, rel: str = "documents",
                     sample_total: int = 200) -> str:
    """Deterministic corpus splitting + temperature-weighted source
    sampling, the two bookkeeping ops every training pipeline runs
    before tokenization.

    Split: md5-bucket of the doc id — stable under corpus growth
    (adding docs never moves an existing doc between splits), 80/10/10.
    Sampling: per-source quotas ∝ sqrt(source size) (temperature
    alpha = 0.5 damps head sources; SQRT is IEEE-correctly-rounded so
    both engines compute the identical per-source weight, unlike a
    libm ``pow``), then the quota-many docs with the smallest sampling
    hash win — a deterministic uniform sample per source.  Weights are
    fixed-point BIGINTs (floor(sqrt·1e6)) so the cross-source SUM is
    integer — order-independent, unlike double addition, whose
    partition-order jitter could flip a FLOOR at a quota boundary.
    Emits (source, split, n_docs) of the sampled corpus.
    """
    st = "STRING" if dialect == H.SPARK else "VARCHAR"
    split_hash = H.h32(f"CONCAT('split:', CAST(doc_id AS {st}))", dialect)
    samp_hash = H.h32(f"CONCAT('sample:', CAST(doc_id AS {st}))", dialect)
    quota_div = H.idiv(f"{sample_total} * w", "(SELECT SUM(w) FROM src_stats)",
                       dialect)
    return f"""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN {split_hash} % 100 < 80 THEN 'train'
              WHEN {split_hash} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         {samp_hash} AS sh
  FROM {rel}
),
src_stats AS (
  SELECT source,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS w
  FROM assigned GROUP BY source
),
quotas AS (
  SELECT source, {quota_div} AS quota
  FROM src_stats
),
ranked AS (
  SELECT a.doc_id, a.source, a.split, q.quota,
         ROW_NUMBER() OVER (PARTITION BY a.source
                            ORDER BY a.sh ASC, a.doc_id ASC) AS rk
  FROM assigned a JOIN quotas q ON a.source = q.source
)
SELECT source, split, COUNT(*) AS n_docs
FROM ranked WHERE rk <= quota
GROUP BY source, split
"""


# PII patterns, written ONCE with single backslashes; H.rx renders each
# dialect's string-literal escaping.  Classes only — no \b / \s, whose
# semantics differ between Java regex and RE2-style engines.
PII_EMAIL_RX = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PII_PHONE_RX = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP_RX = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_redact_sql(dialect: str, rel: str = "documents",
                   plant_mod: int = 11) -> str:
    """PII detection + redaction as one relational pass: count emails /
    phone numbers / IPv4 literals per document and emit the md5 of the
    text with every occurrence replaced by a typed placeholder.

    The corpus is synthetic word salad with no real PII, so the
    template PLANTS deterministic PII spans on doc_id % {plant_mod}
    residues (identical strings in both engines — the planting is part
    of the shared algebra) before detecting: the gate thereby proves
    the patterns, the global-replace semantics (DuckDB replaces only
    the FIRST match without the 'g' flag — see
    ``hashes.regexp_replace_all``), and the redaction hash on rows
    both with and without PII.  Order of redaction passes matters
    (IP redaction must not eat the host part of a planted email), so
    passes run email → phone → ip.
    """
    st = "STRING" if dialect == H.SPARK else "VARCHAR"
    did = f"CAST(doc_id AS {st})"
    planted = f"""CASE
      WHEN doc_id % {plant_mod} = 3 THEN text || ' contact user' || {did}
           || '@mail' || {did} || '.example.com ok'
      WHEN doc_id % {plant_mod} = 7 THEN text || ' call 415-555-'
           || SUBSTRING(CAST(1000 + doc_id % 9000 AS {st}), 1, 4)
           || ' or 415-555-0199 today'
      WHEN doc_id % {plant_mod} = 9 THEN text || ' host 10.'
           || CAST(doc_id % 256 AS {st}) || '.0.7 up'
      ELSE text END"""
    email = H.rx(PII_EMAIL_RX, dialect)
    phone = H.rx(PII_PHONE_RX, dialect)
    ip = H.rx(PII_IP_RX, dialect)
    red = H.regexp_replace_all("ptext", email, "<EMAIL>", dialect)
    red = H.regexp_replace_all(red, phone, "<PHONE>", dialect)
    red = H.regexp_replace_all(red, ip, "<IP>", dialect)
    return f"""
WITH planted AS (
  SELECT doc_id, {planted} AS ptext FROM {rel}
)
SELECT doc_id,
       CAST({H.regexp_count('ptext', email, dialect)} AS BIGINT) AS n_email,
       CAST({H.regexp_count('ptext', phone, dialect)} AS BIGINT) AS n_phone,
       CAST({H.regexp_count('ptext', ip, dialect)} AS BIGINT) AS n_ip,
       MD5({red}) AS redacted_hash
FROM planted
"""


def sparse_cosine_pairs_sql(dialect: str, rel: str = "documents",
                            max_df: int | None = None,
                            min_cosine: float = 0.5) -> str:
    """Exact sparse-cosine similarity join via an inverted index — the
    classic term-at-a-time all-pairs similarity join (Bayardo et al.,
    WWW'07 family), relational: per-doc term frequencies self-join on
    the term (the inverted index; candidate pairs are bounded by
    per-term document frequency, never |docs|²), partial products sum
    per pair, and the cosine normalizes by per-doc norms.

    Dual-engine exactness discipline: dot products and squared norms
    are all-integer (BIGINT — order-independent), and the one float
    step is ``dot / SQRT(n2a * n2b)`` — SQRT is correctly rounded
    (unlike libm pow), so both engines compute the identical double.

    ``max_df`` is the scale lever: a term in m docs contributes m²/2
    candidate partials, so stop-terms must be pruned at corpus scale
    (same lesson as the MinHash stop-shingle filter).  Norms are over
    the KEPT terms (documented: pruning changes the vector space, not
    just the candidates).  The Spark runner must PIN the kept-tf
    relation — the self-join inlines CTEs per reference otherwise.
    """
    toks = H.split_tokens("text", dialect)
    df_filter = f"WHERE d <= {int(max_df)}" if max_df is not None else ""
    tau = f"CAST('{float(min_cosine)!r}' AS DOUBLE)"
    return f"""
sc_toks AS (
  SELECT doc_id, {toks} AS tok FROM {rel}),
sc_tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM sc_toks WHERE tok <> '' GROUP BY doc_id, tok),
sc_df AS (
  SELECT tok, COUNT(*) AS d FROM sc_tf GROUP BY tok),
kept_tf AS (
  SELECT t.doc_id, t.tok, t.c
  FROM sc_tf t JOIN sc_df f ON t.tok = f.tok {df_filter}),
sc_norms AS (
  SELECT doc_id, CAST(SUM(c * c) AS BIGINT) AS n2
  FROM kept_tf GROUP BY doc_id),
sc_dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM kept_tf a JOIN kept_tf b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d.doc_a, d.doc_b, d.dot,
       CAST(d.dot AS DOUBLE)
         / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosine
FROM sc_dots d
JOIN sc_norms na ON d.doc_a = na.doc_id
JOIN sc_norms nb ON d.doc_b = nb.doc_id
WHERE CAST(d.dot AS DOUBLE)
        / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) >= {tau}
"""


def chunk_documents_sql(dialect: str, rel: str = "documents",
                        size: int = 128, overlap: int = 32) -> str:
    """RAG-style document chunking: fixed ``size``-token windows with
    ``overlap`` tokens of context carried between consecutive chunks —
    the retrieval-pipeline splitter every embedding index is built on.

    Pure relational: tokenize once, compute the chunk count per doc
    (ceil((n - size)/stride) + 1, stride = size - overlap), explode the
    chunk grid, and slice the token array per chunk.  The fan-out is
    ≤ n/stride + 1 rows per document and the chunk text is reduced to
    a 60-bit hash on the spot, so the explode never carries document
    text (the winnowing-chunked discipline).  Per-doc fan-out is
    embarrassingly parallel — no joins, no windows, one shuffle only if
    a downstream aggregate asks for one.

    Invariants (tested vs an independent python chunker): every token
    index is covered; consecutive chunks share exactly ``overlap``
    tokens (except a shorter final chunk); chunk 0 starts at token 0;
    a doc with ≤ size tokens yields exactly one chunk.

    Columns: doc_id, chunk_id (0-based), tok_start (0-based), n_tok,
    chunk_hash.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    tok = H.tokens_arr("text", dialect)
    nc_tail = H.idiv(f"n - {size} + {stride - 1}", str(stride), dialect)
    grid = H.seq_range("CAST(0 AS BIGINT)", "nc - 1", dialect)
    piece = H.arr_slice_join(
        "tok", f"ci * {stride} + 1", "LEAST(CAST(%d AS BIGINT), "
        "n - ci * %d)" % (size, stride), dialect)
    return f"""
WITH ch_toks AS (
  SELECT doc_id, {tok} AS tok FROM {rel}),
ch_meta AS (
  SELECT doc_id, tok, CAST({H.array_len('tok', dialect)} AS BIGINT) AS n
  FROM ch_toks),
ch_nc AS (
  SELECT doc_id, tok, n,
         CASE WHEN n <= {size} THEN CAST(1 AS BIGINT)
              ELSE {nc_tail} + 1 END AS nc
  FROM ch_meta),
ch_grid AS (
  SELECT doc_id, tok, n, {grid} AS ci FROM ch_nc)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
       CAST(ci * {stride} AS BIGINT) AS tok_start,
       CAST(LEAST(CAST({size} AS BIGINT), n - ci * {stride}) AS BIGINT)
         AS n_tok,
       {H.h60(piece, dialect)} AS chunk_hash
FROM ch_grid"""


def _word_stream_cte(dialect: str, rel: str = "documents") -> str:
    """Shared CTE chain ending in ``wpos(doc_id, w1, w2)`` — every
    adjacent word pair in the corpus (``w2`` NULL on each document's
    final position) — plus ``wuni(w, c)`` unigram counts and
    ``wtot(n)`` the corpus token total.  One tokenize, one explode;
    both the PMI and the LM-likelihood operators ride it."""
    toks = H.tokens_arr("text", dialect)
    alen = H.array_len("tok", dialect)
    w1 = H.elem("tok", "p", dialect)
    w2 = H.elem("tok", "p + 1", dialect)
    return f"""wtoks AS (
  SELECT doc_id, {toks} AS tok FROM {rel}),
wpos AS (
  SELECT doc_id, {w1} AS w1,
         CASE WHEN p < {alen} THEN {w2} END AS w2
  FROM (SELECT doc_id, tok, {H.seq_1_to(alen, dialect)} AS p
        FROM wtoks WHERE {alen} >= 1) e),
wuni AS (
  SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM wpos GROUP BY w1),
wtot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM wuni)"""


def pmi_bigrams_sql(dialect: str, rel: str = "documents",
                    min_count: int = 5, top_k: int = 50,
                    scale: int = 1_000_000) -> str:
    """Collocation extraction: the corpus's top-``top_k`` word bigrams
    by pointwise mutual information.  PMI = ln(c12·N / (c1·c2)) is
    monotone in the rational c12·N/(c1·c2), so the ranking (and the
    emitted score) uses the exact integer quotient
    ``(c12·N·scale) DIV (c1·c2)`` — no logarithm, no float, bit-equal
    in both engines.

    Scale posture: the bigram/unigram count relations are vocabulary-
    bounded (not corpus-bounded) after the one map-side-combinable
    groupBy, and the scoring join is vocab×vocab — tiny.  The integer
    numerator bounds exactness: c12·N·scale < 2^63 holds through
    ~3×10^12-token corpora at the default scale; beyond that halve
    ``scale`` (the ranking is unchanged — the quotient loses low
    bits, ties broken lexically either way).
    """
    return f"""
WITH {_word_stream_cte(dialect, rel)},
wbig AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM wpos WHERE w2 IS NOT NULL GROUP BY w1, w2),
wscore AS (
  SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
         {H.idiv('b.c12 * t.n * ' + str(scale), 'u1.c * u2.c', dialect)}
           AS pmi_q
  FROM wbig b
  JOIN wuni u1 ON u1.w = b.w1
  JOIN wuni u2 ON u2.w = b.w2
  CROSS JOIN wtot t
  WHERE b.c12 >= {min_count}),
wrank AS (
  SELECT w1, w2, c12, c1, c2, pmi_q,
         ROW_NUMBER() OVER (ORDER BY pmi_q DESC, w1 ASC, w2 ASC) AS rk
  FROM wscore)
SELECT w1, w2, c12, c1, c2, pmi_q, CAST(rk AS BIGINT) AS rk
FROM wrank WHERE rk <= {top_k}
"""


def lm_likelihood_sql(dialect: str, rel: str = "documents",
                      ppb: int = 1_000_000_000,
                      low_q: int = 30_000_000) -> str:
    """Bigram-language-model document scoring — the model-based quality
    filter of a training-data pipeline (KenLM-style, minus the log):
    train bigram conditional probabilities on the corpus itself, then
    score every document by its mean conditional probability.

    Each bigram's conditional probability P(w2|w1) = c12/c1 is
    quantized to parts-per-billion via exact integer division; a
    document's score is the integer mean of its bigrams' quantized
    probabilities.  Integer-only end to end, so the dual-engine
    compare is bit-stable (a float log-prob SUM would not be — see
    BENCH.md's accumulation-order rule).  Docs with fewer than 2
    tokens score NULL-free via the LEFT JOIN + 0 sentinel.

    Scale posture: the model (wbig ⋈ wuni) is vocab²-bounded and
    broadcastable; the scoring pass is one equi-join of the corpus
    bigram stream against it — map-side with the broadcast.  The
    ``lm_band`` column is the keep/review/drop verdict at the
    ``low_q`` ppb threshold (mean-prob analogue of a perplexity cut).
    """
    return f"""
WITH {_word_stream_cte(dialect, rel)},
wbig AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM wpos WHERE w2 IS NOT NULL GROUP BY w1, w2),
wmodel AS (
  SELECT b.w1, b.w2, {H.idiv('b.c12 * ' + str(ppb), 'u.c', dialect)} AS p_q
  FROM wbig b JOIN wuni u ON u.w = b.w1),
wdoc AS (
  SELECT p.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(m.p_q) AS BIGINT) AS sum_p_q
  FROM wpos p JOIN wmodel m ON m.w1 = p.w1 AND m.w2 = p.w2
  WHERE p.w2 IS NOT NULL
  GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(w.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE({H.idiv('w.sum_p_q', 'w.n_bigrams', dialect)}, 0)
            AS BIGINT) AS mean_p_q,
       CASE WHEN w.n_bigrams IS NULL THEN 'short'
            WHEN {H.idiv('w.sum_p_q', 'w.n_bigrams', dialect)}
                 >= {low_q} THEN 'keep'
            ELSE 'review' END AS lm_band
FROM {rel} d LEFT JOIN wdoc w ON w.doc_id = d.doc_id
"""


def boilerplate_ngrams_sql(dialect: str, rel: str = "documents",
                           gram: int = 3, min_df: int = 4,
                           ppb: int = 1_000_000_000) -> str:
    """Boilerplate detection — the curation filter that strips nav
    bars, license headers, and template text from a crawl corpus:
    an n-gram is boilerplate when it appears in >= ``min_df`` DISTINCT
    documents; each document is then scored by the fraction of its
    n-gram positions covered by boilerplate (truncating-ppb integer,
    dual-engine exact).

    Scale shape: one tokenize + position explode (corpus-token
    bounded), a distinct-doc groupBy per gram hash (map-side
    combinable after the per-doc DISTINCT), and one equi-join of
    positions against the df-filtered hot-gram relation — keyed on the
    gram hash, never a broadcast of the big kept side (the
    stop-shingle lesson: the filtered set is the SMALL relation by
    construction, positions stream past it).  Gate parameters
    (gram=3, min_df=4) suit the synthetic small-vocab corpus; a web
    corpus runs gram≈8 with min_df as an absolute count derived from
    the crawl's duplication policy (fraction-of-count cutoffs must go
    through the FLOOR seam — see dedup.stop_shingle_filter_cte).

    Short documents (< ``gram`` tokens) have zero positions and score
    0 via the final LEFT JOIN — never dropped."""
    tok = H.tokens_arr("text", dialect)
    alen = H.array_len("tok", dialect)
    g = H.h60(H.arr_gram("tok", "p", gram, dialect), dialect)
    return f"""
WITH bp_toks AS (
  SELECT doc_id, {tok} AS tok FROM {rel}),
bp_pos AS (
  SELECT doc_id, {g} AS g
  FROM (SELECT doc_id, tok, {H.seq_1_to(f"{alen} - {gram - 1}", dialect)} AS p
        FROM bp_toks WHERE {alen} >= {gram}) e),
bp_hot AS (
  SELECT g FROM (
    SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM bp_pos GROUP BY g) d
  WHERE df >= {min_df}),
bp_doc AS (
  SELECT p.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(h.g) AS BIGINT) AS n_boiler
  FROM bp_pos p LEFT JOIN bp_hot h ON h.g = p.g
  GROUP BY p.doc_id)
SELECT d.doc_id,
       COALESCE(b.n_grams, 0) AS n_grams,
       COALESCE(b.n_boiler, 0) AS n_boiler,
       CASE WHEN COALESCE(b.n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE {H.idiv(f'{ppb} * b.n_boiler', 'b.n_grams', dialect)}
       END AS boiler_ppb
FROM {rel} d LEFT JOIN bp_doc b ON b.doc_id = d.doc_id
"""


def duplicate_spans_sql(dialect: str, rel: str = "documents",
                        gram: int = 8, min_docs: int = 2,
                        ppb: int = 1_000_000_000) -> str:
    """Exact duplicate-SPAN detection — the ExactSubstr dedup primitive
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): a token position is duplicated when the ``gram``-token
    window starting there appears in >= ``min_docs`` DISTINCT
    documents; overlapping flagged windows merge into maximal spans
    (the cut-list a dedup pass would remove).

    The merge is gaps-and-islands over flagged positions with a
    running-max window (prev_end = MAX(p + gram - 1) over preceding
    rows): a new island starts where the window's token range clears
    the previous covered end.  Per-doc outputs: span count, covered
    tokens, coverage ppb.  One tokenize + position explode
    (corpus-token bounded), one df groupBy, one per-doc sort window —
    the winnowing/chunking scale notes apply verbatim at book length
    (chunk the explode; the hash stream, never the text, shuffles)."""
    tok = H.tokens_arr("text", dialect)
    alen = H.array_len("tok", dialect)
    g = H.h60(H.arr_gram("tok", "p", gram, dialect), dialect)
    return f"""
WITH ds_toks AS (
  SELECT doc_id, {tok} AS tok FROM {rel}),
ds_meta AS (
  SELECT doc_id, tok, CAST({alen} AS BIGINT) AS n_tok FROM ds_toks),
ds_pos AS (
  SELECT doc_id, p, {g} AS g
  FROM (SELECT doc_id, tok,
               {H.seq_1_to(f"n_tok - {gram - 1}", dialect)} AS p
        FROM ds_meta WHERE n_tok >= {gram}) e),
ds_dup AS (
  SELECT g FROM (
    SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
    FROM ds_pos GROUP BY g) d
  WHERE nd >= {int(min_docs)}),
ds_flag AS (
  SELECT p.doc_id, p.p
  FROM ds_pos p JOIN ds_dup d ON d.g = p.g),
ds_isl AS (
  SELECT doc_id, p,
         CASE WHEN MAX(p + {gram - 1}) OVER (PARTITION BY doc_id
                ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) IS NULL
              OR p > MAX(p + {gram - 1}) OVER (PARTITION BY doc_id
                ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM ds_flag),
ds_id AS (
  SELECT doc_id, p,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ds_isl),
ds_spans AS (
  SELECT doc_id, island,
         MIN(p) AS sp, MAX(p) + {gram - 1} AS ep
  FROM ds_id GROUP BY doc_id, island),
ds_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(ep - sp + 1) AS BIGINT) AS dup_tokens
  FROM ds_spans GROUP BY doc_id)
SELECT m.doc_id, m.n_tok,
       COALESCE(d.n_spans, 0) AS n_spans,
       COALESCE(d.dup_tokens, 0) AS dup_tokens,
       CASE WHEN m.n_tok = 0 THEN CAST(0 AS BIGINT)
            ELSE {H.idiv(f'{ppb} * COALESCE(d.dup_tokens, 0)',
                         'm.n_tok', dialect)} END AS dup_ppb
FROM ds_meta m LEFT JOIN ds_doc d ON d.doc_id = m.doc_id
"""
