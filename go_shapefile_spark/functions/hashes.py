"""Deterministic hash expression builders with Spark-SQL and DuckDB twins.

Every dedup/similarity operator in this engine is defined by arithmetic
that both engines can evaluate bit-identically, so the driver's DuckDB
oracle can check the *same* algebra rather than a lookalike.  MD5 is the
shared primitive (identical hex output everywhere); 32/60-bit integers
are carved out of its hex prefix.  Dialect differences are confined to
this module (hex→int cast, xor, regexp splits, array length).
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def h32(expr: str, dialect: str) -> str:
    """First 8 hex chars of md5 → unsigned 32-bit int (as BIGINT)."""
    if dialect == SPARK:
        return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || SUBSTRING(MD5({expr}), 1, 8)) AS BIGINT)"


def h60(expr: str, dialect: str) -> str:
    """First 15 hex chars of md5 → 60-bit int (fits signed 64)."""
    if dialect == SPARK:
        return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || SUBSTRING(MD5({expr}), 1, 15)) AS BIGINT)"


def idiv(a: str, b: str, dialect: str) -> str:
    """Integer (floor-toward-zero) division of non-negative operands."""
    if dialect == SPARK:
        return f"(({a}) DIV ({b}))"
    return f"(({a}) // ({b}))"


def xor(a: str, b: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"({a} ^ {b})"
    return f"xor({a}, {b})"          # DuckDB ^ is exponentiation


def bit_count(e: str, dialect: str) -> str:
    return f"bit_count({e})"          # same name in both


def split_tokens(text_expr: str, dialect: str,
                 pattern: str = "[^a-z0-9]+") -> str:
    """Explode lowercased tokens; use in SELECT list (one generator)."""
    if dialect == SPARK:
        return f"explode(split(lower({text_expr}), '{pattern}'))"
    return f"unnest(string_split_regex(lower({text_expr}), '{pattern}'))"


def array_len(e: str, dialect: str) -> str:
    return f"size({e})" if dialect == SPARK else f"len({e})"


def rx(pattern: str, dialect: str) -> str:
    """Render a regex (written with SINGLE backslashes) for a dialect's
    string literal: Spark's parser processes backslash escapes inside
    quoted literals (so ``\\s`` must be written ``\\\\s``), DuckDB's
    standard-SQL literals do not."""
    return pattern.replace("\\", "\\\\") if dialect == SPARK else pattern


def regexp_count(text_expr: str, pattern: str, dialect: str) -> str:
    """Occurrences of pattern — via regexp_extract_all length (portable).
    Spark requires an explicit group index when the pattern has none."""
    if dialect == SPARK:
        return array_len(f"regexp_extract_all({text_expr}, '{pattern}', 0)", dialect)
    return array_len(f"regexp_extract_all({text_expr}, '{pattern}')", dialect)


def seq_1_to(n_expr: str, dialect: str) -> str:
    """Explodeable 1..n sequence (inclusive) for SELECT list."""
    if dialect == SPARK:
        return f"explode(sequence(1, {n_expr}))"
    return f"unnest(generate_series(1, {n_expr}))"


def seq_range(a_expr: str, b_expr: str, dialect: str) -> str:
    """Explodeable a..b sequence (inclusive both ends, both engines)."""
    if dialect == SPARK:
        return f"explode(sequence({a_expr}, {b_expr}))"
    return f"unnest(generate_series({a_expr}, {b_expr}))"


def doubles(arr_expr: str, dialect: str) -> str:
    """Cast array<float> → array<double> before arithmetic."""
    if dialect == SPARK:
        return f"transform({arr_expr}, x -> CAST(x AS DOUBLE))"
    return f"CAST({arr_expr} AS DOUBLE[])"


def dot(a: str, b: str, dialect: str) -> str:
    """Elementwise dot product with sequential double accumulation."""
    if dialect == SPARK:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    return f"list_dot_product({a}, {b})"


def elem(arr_expr: str, idx1_expr: str, dialect: str) -> str:
    """1-based array element access."""
    if dialect == SPARK:
        return f"element_at({arr_expr}, {idx1_expr})"
    return f"{arr_expr}[{idx1_expr}]"


def ints_0_to(n: int, dialect: str) -> str:
    """Explodeable 0..n-1 sequence for a SELECT list."""
    if dialect == SPARK:
        return f"explode(sequence(0, {n - 1}))"
    return f"unnest(range(0, {n}))"


def tokens_arr(text_expr: str, dialect: str,
               pattern: str = "[a-z0-9]+") -> str:
    """Array of lowercased tokens via regexp_extract_all — identical
    edge semantics in both engines (no phantom empty strings, unlike
    the split-on-separator spellings)."""
    if dialect == SPARK:
        return f"regexp_extract_all(lower({text_expr}), '{pattern}', 0)"
    return f"regexp_extract_all(lower({text_expr}), '{pattern}')"


def arr_gram(arr_expr: str, pos_expr: str, n: int, dialect: str) -> str:
    """Space-joined n-gram from a token array at 1-based ``pos``
    (caller guarantees pos + n - 1 ≤ len)."""
    if dialect == SPARK:
        return f"array_join(slice({arr_expr}, {pos_expr}, {n}), ' ')"
    return (f"array_to_string(list_slice({arr_expr}, {pos_expr}, "
            f"{pos_expr} + {n - 1}), ' ')")


def arr_slice_join(arr_expr: str, pos_expr: str, len_expr: str,
                   dialect: str) -> str:
    """Space-joined slice of a token array at 1-based ``pos`` with
    DYNAMIC length (the n-ary cousin of :func:`arr_gram`); a length of
    0 yields '' in both engines."""
    if dialect == SPARK:
        return f"array_join(slice({arr_expr}, {pos_expr}, {len_expr}), ' ')"
    return (f"array_to_string(list_slice({arr_expr}, {pos_expr}, "
            f"({pos_expr}) + ({len_expr}) - 1), ' ')")


def regexp_replace_all(text_expr: str, pattern: str, replacement: str,
                       dialect: str) -> str:
    """Replace EVERY match: Spark's regexp_replace is global by default,
    DuckDB replaces only the first match without the 'g' flag — a
    silent divergence a redaction template cannot tolerate."""
    if dialect == SPARK:
        return f"regexp_replace({text_expr}, '{pattern}', '{replacement}')"
    return f"regexp_replace({text_expr}, '{pattern}', '{replacement}', 'g')"


def last_ignore_nulls(expr: str, dialect: str) -> str:
    """``last_value`` skipping NULLs, for use before an OVER clause.

    Both engines implement the standard semantics; only the spelling of
    the IGNORE NULLS modifier differs (Spark puts it after the call,
    DuckDB inside the parens)."""
    if dialect == SPARK:
        return f"last_value({expr}) IGNORE NULLS"
    return f"last_value({expr} IGNORE NULLS)"


# Fixed (a, b) coefficients for the universal-hash family
# h_j(x) = (a_j·x + b_j) mod p over the 32-bit shingle hash x.
# Constants are arbitrary odd numbers < 2^30, embedded as literals so both
# dialects evaluate identical integer arithmetic (products < 2^62).
MINHASH_P = 2147483647  # 2^31 - 1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    out = []
    a, b = 1103515245, 12345      # LCG-style mixing, deterministic
    for j in range(num_hashes):
        a = (a * 1103515245 + 12345) % (1 << 30) | 1
        b = (b * 69069 + 1) % (1 << 30)
        out.append((a, b))
    return out


def minhash_expr(x_expr: str, j: int, num_hashes: int) -> str:
    a, b = minhash_coeffs(num_hashes)[j]
    return f"MIN(({a} * {x_expr} + {b}) % {MINHASH_P})"


def json_int(expr: str, key: str, dialect: str) -> str:
    """Integer field of a JSON string column — NULL when the document
    is malformed, the key is absent, or the value isn't numeric, in
    BOTH engines.  Three seams hide here: Spark's get_json_object
    already returns NULL on bad JSON but DuckDB's json_extract THROWS
    (hence the TRY_CAST-to-JSON first), and ANSI-mode Spark's plain
    CAST throws on non-numeric strings (hence TRY_CAST).  Spark's
    get_json_object is JVM codegen-able — the semi-structured hot path
    never leaves the executor."""
    if dialect == SPARK:
        return f"TRY_CAST(get_json_object({expr}, '$.{key}') AS BIGINT)"
    return (f"TRY_CAST(json_extract_string(TRY_CAST({expr} AS JSON), "
            f"'$.{key}') AS BIGINT)")
