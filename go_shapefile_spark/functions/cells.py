"""From-scratch hierarchical cell index (H3/S2-style, Morton/quadtree).

Mandated by the north rule (BASELINE.json: "H3/S2 cell indexing ... NOT a
port"); designed from public Morton-code/quadtree knowledge, not the H3
library (from-scratch mandate, SURVEY.md §2.B E3).

A cell at resolution ``r`` (0 ≤ r ≤ 26) is a rectangle of the 2^r × 2^r
grid over lon ∈ [-180, 180), lat ∈ [-90, 90).  The cell id packs the
resolution (bits 52..56) above the Morton interleave of (ix, iy), so ids
at one resolution sort in Z-order — nearby cells get nearby ids, which
makes range partitioning on ``cell`` spatially local and keeps shuffle
partitions geographically coherent at 100 TB scale.

Every encoder has two twins that produce *bit-identical* results:

* ``cell_sql`` — one SQL string valid in BOTH Spark SQL and DuckDB
  (bitwise ``&``/``|``, multiplication by powers of two instead of
  shifts), used by ``queries()`` and their DuckDB oracles;
* ``cell_np`` — vectorized numpy, used inside pandas UDFs.

Float determinism: the only inexact steps are ``(lon + 180.0) / 360.0``
and the multiply by 2^r (exact); both engines evaluate the identical
expression tree, so the results agree bitwise.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = 52  # bits 0..51 hold the ≤52-bit Morton code

# Morton bit-spread magic masks (public-domain bit-twiddling identity).
_M1 = 0x0000FFFF0000FFFF
_M2 = 0x00FF00FF00FF00FF
_M3 = 0x0F0F0F0F0F0F0F0F
_M4 = 0x3333333333333333
_M5 = 0x5555555555555555


def _spread_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    x = (x | (x << 16)) & _M1
    x = (x | (x << 8)) & _M2
    x = (x | (x << 4)) & _M3
    x = (x | (x << 2)) & _M4
    x = (x | (x << 1)) & _M5
    return x


def _compact_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64) & _M5
    x = (x | (x >> 1)) & _M4
    x = (x | (x >> 2)) & _M3
    x = (x | (x >> 4)) & _M2
    x = (x | (x >> 8)) & _M1
    x = (x | (x >> 16)) & 0xFFFFFFFF
    return x


def xy_np(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid coordinates at resolution res, clamped to [0, 2^r - 1]."""
    n = 1 << res
    ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    return np.clip(ix, 0, n - 1), np.clip(iy, 0, n - 1)


def cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized cell encoder: lon, lat, res → int64 cell id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range 0..{MAX_RES}")
    ix, iy = xy_np(np.asarray(lon, dtype=np.float64),
                   np.asarray(lat, dtype=np.float64), res)
    return (np.int64(res) << _RES_SHIFT) | _spread_np(ix) | (_spread_np(iy) << 1)


def cell_decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, ix, iy)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _RES_SHIFT
    morton = cell & ((np.int64(1) << _RES_SHIFT) - 1)
    return res, _compact_np(morton), _compact_np(morton >> 1)


def cell_from_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(res) << _RES_SHIFT) | _spread_np(np.asarray(ix)) | \
        (_spread_np(np.asarray(iy)) << 1)


def cell_bounds_np(cell: np.ndarray) -> tuple[np.ndarray, ...]:
    """cell id → (lon0, lat0, lon1, lat1) rectangle."""
    res, ix, iy = cell_decode_np(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w, h = 360.0 / n, 180.0 / n
    lon0 = -180.0 + ix * w
    lat0 = -90.0 + iy * h
    return lon0, lat0, lon0 + w, lat0 + h


def neighbors_np(cell: np.ndarray, ring: int = 1) -> np.ndarray:
    """All cells within a (2·ring+1)² neighborhood; lon wraps, lat clamps.

    Used by cell-local kNN for boundary correctness (SURVEY.md §2.B E7).
    Returns shape (len(cell), (2·ring+1)²) int64.
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, ix, iy = cell_decode_np(cell)
    n = np.int64(1) << res[0]
    r = int(res[0])
    offs = np.arange(-ring, ring + 1)
    dx, dy = np.meshgrid(offs, offs)
    nx = (ix[:, None] + dx.ravel()[None, :]) % n          # wrap longitude
    ny = np.clip(iy[:, None] + dy.ravel()[None, :], 0, n - 1)  # clamp latitude
    return cell_from_xy(nx, ny, r)


# --- SQL twins (one string valid in Spark SQL *and* DuckDB) ---------------


def _spread_sql(x: str) -> str:
    """Morton bit-spread using multiply-by-2^k (portable across dialects)."""
    e = f"(({x} | ({x} * 65536)) & {_M1})"
    e = f"(({e} | ({e} * 256)) & {_M2})"
    e = f"(({e} | ({e} * 16)) & {_M3})"
    e = f"(({e} | ({e} * 4)) & {_M4})"
    e = f"(({e} | ({e} * 2)) & {_M5})"
    return e


def ix_sql(lon: str, res: int) -> str:
    n = 1 << res
    return (f"GREATEST(0, LEAST({n - 1}, "
            f"CAST(FLOOR((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT)))")


def iy_sql(lat: str, res: int) -> str:
    n = 1 << res
    return (f"GREATEST(0, LEAST({n - 1}, "
            f"CAST(FLOOR((({lat}) + 90.0) / 180.0 * {n}) AS BIGINT)))")


def cell_sql(lon: str, lat: str, res: int) -> str:
    """Cell id as a SQL expression — identical text runs on Spark and DuckDB."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range 0..{MAX_RES}")
    sx = _spread_sql(ix_sql(lon, res))
    sy = _spread_sql(iy_sql(lat, res))
    return f"(CAST({res} AS BIGINT) * {1 << _RES_SHIFT} + ({sx} | ({sy} * 2)))"


def _compact_sql(x: str) -> str:
    """Morton bit-compact (inverse of ``_spread_sql``) using DIV-by-2^k.

    Spark-SQL dialect (``DIV`` integer division); all intermediate values
    are non-negative, so DIV == arithmetic shift.

    WARNING — utility for one-shot projections only (parity-tested in
    pytest; no hot path uses it).  The expression text DOUBLES per stage
    (~3 KB total), and CollapseProject will inline it into every
    reference: the rasterizer once decoded cells this way inside its
    ~150-reference crossing predicate and codegen blew up into 8-19 MiB
    task binaries (10× slowdown, BENCH.md round 3).  Carry decoded
    columns (e.g. the cover's lon0/lat0) through fat predicates instead.
    """
    e = f"(({x}) & {_M5})"
    e = f"((({e}) | (({e}) DIV 2)) & {_M4})"
    e = f"((({e}) | (({e}) DIV 4)) & {_M3})"
    e = f"((({e}) | (({e}) DIV 16)) & {_M2})"
    e = f"((({e}) | (({e}) DIV 256)) & {_M1})"
    e = f"((({e}) | (({e}) DIV 65536)) & 4294967295)"
    return e


def cell_ix_sql(cell: str) -> str:
    """cell id → grid ix (Spark SQL; bit-identical to cell_decode_np)."""
    return _compact_sql(f"(({cell}) & {(1 << _RES_SHIFT) - 1})")


def cell_iy_sql(cell: str) -> str:
    """cell id → grid iy (Spark SQL; bit-identical to cell_decode_np)."""
    return _compact_sql(f"((({cell}) & {(1 << _RES_SHIFT) - 1}) DIV 2)")


def cell_xy_sql(lon: str, lat: str, res: int) -> str:
    """Simpler row-major packed id (iy·2^r + ix) for oracle queries that
    want a human-readable tile id; same float semantics as cell_sql."""
    return f"({iy_sql(lat, res)} * {1 << res} + {ix_sql(lon, res)})"


def _morton_scalar(ix: int, iy: int) -> int:
    return int(_spread_np(np.array([ix], np.int64))[0]
               | (_spread_np(np.array([iy], np.int64))[0] << 1))


def z_ranges(lon0: float, lat0: float, lon1: float, lat1: float,
             res: int, max_ranges: int = 64) -> list[tuple[int, int]]:
    """Decompose a bbox window into Morton CELL-ID INTERVALS at ``res``
    — the data-skipping predicate for Z-ordered layouts.

    Because nearby cells share id prefixes, the window's cells are
    covered by a handful of contiguous id ranges; on a cell-sorted /
    range-partitioned table each ``cell BETWEEN lo AND hi`` maps to
    contiguous storage, so parquet row-group min/max stats (and range
    partition pruning) skip everything outside the window.  Standard
    quadrant descent: a quad fully inside the window emits its whole
    id interval, fully outside is dropped, partial splits; adjacent
    intervals merge, and if the count still exceeds ``max_ranges`` the
    smallest gaps merge — the result is then a SUPERSET cover (always
    sound for skipping: pair it with the exact residual predicate,
    which is how every pushdown works).  Returned ids carry the packed
    resolution bits, matching :func:`cell_sql`/:func:`cell_np` output.

    Guarantee (tested): every cell at ``res`` intersecting the window
    is inside exactly one returned interval; intervals are sorted and
    disjoint; with an unlimited budget the cover is exact (covers no
    cell outside the window).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range 0..{MAX_RES}")
    if max_ranges < 1:
        raise ValueError("max_ranges must be >= 1")
    qx = xy_np(np.array([min(lon0, lon1), max(lon0, lon1)]),
               np.array([min(lat0, lat1), max(lat0, lat1)]), res)
    qx0, qx1 = int(qx[0][0]), int(qx[0][1])
    qy0, qy1 = int(qx[1][0]), int(qx[1][1])
    out: list[tuple[int, int]] = []

    def rec(d: int, px: int, py: int) -> None:
        size = 1 << (res - d)
        x0, y0 = px * size, py * size
        x1, y1 = x0 + size - 1, y0 + size - 1
        if x1 < qx0 or x0 > qx1 or y1 < qy0 or y0 > qy1:
            return
        if x0 >= qx0 and x1 <= qx1 and y0 >= qy0 and y1 <= qy1:
            m = _morton_scalar(px, py) << (2 * (res - d))
            out.append((m, m + (1 << (2 * (res - d))) - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(d + 1, 2 * px + dx, 2 * py + dy)

    rec(0, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        # merge the pair with the smallest id gap (superset, sound)
        gaps = [merged[i + 1][0] - merged[i][1]
                for i in range(len(merged) - 1)]
        i = gaps.index(min(gaps))
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    base = res << _RES_SHIFT
    return [(base + lo, base + hi) for lo, hi in merged]


# pointy-top hexagonal binning constants, pinned as exact double
# literals so both engines compute identical axial coordinates
# (sqrt(3)/3 and 2/3 correctly rounded to double)
_HEX_C1 = "0.5773502691896258"
_HEX_C2 = "0.3333333333333333"
_HEX_C3 = "0.6666666666666666"


def hex_axial_sql(lon: str, lat: str, size: float) -> str:
    """Axial hex coordinates ``(hq, hr)`` of a point, as a SQL struct-
    free pair baked into two CASE expressions — use via
    :func:`hexbin_body`.  Pointy-top hexagons of circumradius ``size``
    degrees; fractional axial coords cube-round to the nearest hex
    center (Amit Patel's cube-rounding).  Every operation is +,*,/ on
    pinned double literals plus ROUND (round-half-away in both Spark
    and DuckDB for doubles), so the assignment is bit-identical in both
    engines — no libm."""
    s = f"CAST('{float(size)!r}' AS DOUBLE)"
    q = (f"((CAST('{_HEX_C1}' AS DOUBLE) * ({lon}) "
         f"- CAST('{_HEX_C2}' AS DOUBLE) * ({lat})) / {s})")
    r = f"((CAST('{_HEX_C3}' AS DOUBLE) * ({lat})) / {s})"
    return q, r


def hexbin_body(dialect: str, size: float, pts: str = "pts") -> str:
    """CTE chain ``hx -> hexcells`` rolling a point relation
    ``{pts}(lon, lat)`` up to hex-bin counts ``(hq, hr, n)``."""
    del dialect  # identical text in both engines
    q, r = hex_axial_sql("lon", "lat", size)
    return f"""
hx AS (
  SELECT ROUND(qf) AS rx, ROUND(-qf - rf) AS ry, ROUND(rf) AS rz,
         ABS(ROUND(qf) - qf) AS dx,
         ABS(ROUND(-qf - rf) - (-qf - rf)) AS dy,
         ABS(ROUND(rf) - rf) AS dz
  FROM (SELECT {q} AS qf, {r} AS rf FROM {pts}) t),
hexcells AS (
  SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz
              ELSE rx END AS BIGINT) AS hq,
         CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
              THEN -rx - ry ELSE rz END AS BIGINT) AS hr
  FROM hx)
SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n
FROM hexcells GROUP BY hq, hr"""


# --- geohash (public base32 encoding; lon-first bit interleave) -----------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_np(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash encoder: lon, lat → base32 string of
    ``precision`` chars.  Standard scheme: quantize lon over [-180,180)
    and lat over [-90,90) to ceil(5p/2) / floor(5p/2) bits, interleave
    lon-first, emit 5 bits per char.  Twin of :func:`geohash_sql`
    (bit-identical; same FLOOR-quantization as :func:`xy_np`)."""
    if not 1 <= precision <= 10:  # 5*10 = 50 bits < 2^53, double-exact
        raise ValueError(f"precision {precision} out of range 1..10")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    ix, _ = xy_np(np.asarray(lon, np.float64),
                  np.asarray(lat, np.float64) * 0.0, lon_bits)
    _, iy = xy_np(np.asarray(lon, np.float64) * 0.0,
                  np.asarray(lat, np.float64), lat_bits)
    sx, sy = _spread_np(ix), _spread_np(iy)
    # even total: pairs are (lon, lat) MSB-first → lon on the high bit
    # of each pair; odd total: the sequence starts AND ends with lon →
    # lon on the low bit.
    m = (sx * 2) | sy if bits % 2 == 0 else sx | (sy * 2)
    out = np.empty(m.shape, dtype=f"U{precision}")
    flat_m = m.ravel()
    chars = []
    for i in range(precision):
        shift = bits - 5 * (i + 1)
        chars.append((flat_m >> shift) & 31)
    alpha = np.array(list(GEOHASH_ALPHABET))
    joined = alpha[np.stack(chars, axis=1)]
    out.ravel()[:] = np.array(["".join(row) for row in joined])
    return out


def geohash_morton_sql(lon: str, lat: str, precision: int) -> str:
    """The lon-first interleaved ``5*precision``-bit integer a geohash
    encodes — compute this ONCE in a CTE column and feed it to
    :func:`geohash_chars_sql` (the char extraction references the value
    ``precision`` times; inlining the spread that many times is the
    CollapseProject codegen-bloat trap of :func:`_compact_sql`)."""
    if not 1 <= precision <= 10:
        raise ValueError(f"precision {precision} out of range 1..10")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    sx = _spread_sql(ix_sql(lon, lon_bits))
    sy = _spread_sql(iy_sql(lat, lat_bits))
    return (f"(({sx}) * 2 | ({sy}))" if bits % 2 == 0
            else f"(({sx}) | ({sy}) * 2)")


def geohash_chars_sql(m: str, precision: int) -> str:
    """Base32 chars from a :func:`geohash_morton_sql` column — each
    5-bit group extracted with exact FLOOR division (values < 2^50),
    1-based SUBSTR into the alphabet; identical text in both engines."""
    if not 1 <= precision <= 10:
        raise ValueError(f"precision {precision} out of range 1..10")
    bits = 5 * precision
    parts = []
    for i in range(precision):
        shift = bits - 5 * (i + 1)
        grp = (f"(CAST(FLOOR(({m}) / {1 << shift}) AS BIGINT) % 32)"
               if shift else f"(({m}) % 32)")
        parts.append(f"SUBSTR('{GEOHASH_ALPHABET}', CAST({grp} AS INT) + 1, 1)")
    return "CONCAT(" + ", ".join(parts) + ")"


def geohash_sql(lon: str, lat: str, precision: int) -> str:
    """Geohash as ONE SQL expression (tests / one-shot projections;
    prefer the CTE split above in query templates)."""
    return geohash_chars_sql(geohash_morton_sql(lon, lat, precision),
                             precision)


# --- Hilbert curve (locality-improved space-filling index) ----------------

# 4-state quad state machine: (state, qx, qy) -> (digit, next_state).
# Derived from the classic bit-loop algorithm (states are the dihedral
# transforms {identity, swap, swap+complement, complement} reachable
# from identity; test_cells re-derives the table and asserts equality).
_HILBERT_LUT = (
    (0, 0, 0, 0, 1), (0, 0, 1, 1, 0), (0, 1, 0, 3, 2), (0, 1, 1, 2, 0),
    (1, 0, 0, 0, 0), (1, 0, 1, 3, 3), (1, 1, 0, 1, 1), (1, 1, 1, 2, 1),
    (2, 0, 0, 2, 2), (2, 0, 1, 1, 2), (2, 1, 0, 3, 0), (2, 1, 1, 0, 3),
    (3, 0, 0, 2, 3), (3, 0, 1, 3, 1), (3, 1, 0, 1, 3), (3, 1, 1, 0, 2))


def hilbert_np(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Vectorized Hilbert index of grid cells (ix, iy) on a 2^res grid
    (the classic top-bit-down rotate/reflect loop; coordinates stay in
    [0, 2^res) because reflections use n-1-x)."""
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    n = np.int64(1) << res
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, n - 1 - x, x)
        y = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d


def hilbert_cte(res: int, src: str = "hsrc",
                carry: tuple[str, ...] = ()) -> str:
    """CTE chain computing the Hilbert index of ``{src}(ix, iy, ...)``
    rows — final CTE ``hilb`` has (ix, iy, *carry, hd).

    The per-bit rotate/reflect recurrence is NOT inlined as nested CASE
    expressions (each level would multiply the expression tree ~4x —
    the CollapseProject codegen blowup CLAUDE.md warns about; res 16
    would be a 4^16-node expression).  Instead each bit level is ONE
    equi-join against the 16-row state LUT: expression size stays
    constant, rows never fan out, Spark broadcasts the LUT and DuckDB
    hash-joins it.  ``res`` levels -> ``res`` joins.
    """
    lut_rows = ",".join(f"({s},{qx},{qy},{d},{ns})"
                        for s, qx, qy, d, ns in _HILBERT_LUT)
    cols = "".join(f"q.{c}, " for c in ("ix", "iy") + tuple(carry))
    parts = [f"""
hlut AS (SELECT * FROM (VALUES {lut_rows}) AS t(st, qx, qy, dig, nst)),
hq{res} AS (
  SELECT ix, iy, {", ".join(carry) + ", " if carry else ""}
         CAST(0 AS BIGINT) AS hd, 0 AS hst
  FROM {src})"""]
    for b in range(res - 1, -1, -1):
        parts.append(f"""
hq{b} AS (
  SELECT {cols}q.hd * 4 + l.dig AS hd, l.nst AS hst
  FROM hq{b + 1} q JOIN hlut l
    ON l.st = q.hst
   AND l.qx = (q.ix >> {b}) & 1
   AND l.qy = (q.iy >> {b}) & 1)""")
    parts.append(f"""
hilb AS (SELECT ix, iy, {", ".join(carry) + ", " if carry else ""}hd
         FROM hq0)""")
    return ",".join(parts)


def hilbert_ranges(lon0: float, lat0: float, lon1: float, lat1: float,
                   res: int, max_ranges: int = 64) -> list[tuple[int, int]]:
    """Decompose a bbox window into HILBERT-INDEX INTERVALS at ``res``
    — the data-skipping predicate for Hilbert-ordered layouts (twin of
    :func:`z_ranges`; same guarantees, fewer intervals on typical
    windows because the curve never teleports — measured in
    test_cells).

    Quadrant descent carrying the state machine: a node at depth d
    with accumulated Hilbert prefix p covers EXACTLY the contiguous
    ids [p·4^(res−d), (p+1)·4^(res−d)); each child quad's 2-bit digit
    and next state come from the same ``_HILBERT_LUT`` the encoders
    use, so the planner cannot drift from the index.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range 0..{MAX_RES}")
    if max_ranges < 1:
        raise ValueError("max_ranges must be >= 1")
    lut = {(s, qx, qy): (dig, ns)
           for s, qx, qy, dig, ns in _HILBERT_LUT}
    q = xy_np(np.array([min(lon0, lon1), max(lon0, lon1)]),
              np.array([min(lat0, lat1), max(lat0, lat1)]), res)
    qx0, qx1 = int(q[0][0]), int(q[0][1])
    qy0, qy1 = int(q[1][0]), int(q[1][1])
    out: list[tuple[int, int]] = []

    def rec(d: int, px: int, py: int, prefix: int, st: int) -> None:
        size = 1 << (res - d)
        x0, y0 = px * size, py * size
        x1, y1 = x0 + size - 1, y0 + size - 1
        if x1 < qx0 or x0 > qx1 or y1 < qy0 or y0 > qy1:
            return
        if x0 >= qx0 and x1 <= qx1 and y0 >= qy0 and y1 <= qy1:
            lo = prefix << (2 * (res - d))
            out.append((lo, lo + (1 << (2 * (res - d))) - 1))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                dig, ns = lut[(st, dx, dy)]
                rec(d + 1, 2 * px + dx, 2 * py + dy,
                    prefix * 4 + dig, ns)

    rec(0, 0, 0, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        gaps = [merged[i + 1][0] - merged[i][1]
                for i in range(len(merged) - 1)]
        i = gaps.index(min(gaps))
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]
