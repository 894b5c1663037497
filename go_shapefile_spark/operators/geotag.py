"""Deterministic synthetic geotagging (SURVEY.md §2.B E2).

The north rule's image table carries no coordinates; geotags are derived
deterministically from a hash of a row key (``phash`` for images, any id
for the relational demo tables).  Two twins:

* ``lonlat_sql`` — md5-based, one SQL text per dialect, integer-derived
  (identical floats on Spark and DuckDB) — used by oracle-gated queries;
* ``lonlat_np`` — splitmix64 in numpy for the high-volume image pipeline
  (no md5 cost per row; pure vectorized bit-mixing).
"""

from __future__ import annotations

import numpy as np

from ..functions import hashes as H


def _str(e: str, dialect: str) -> str:
    return f"CAST({e} AS STRING)" if dialect == H.SPARK else f"CAST({e} AS VARCHAR)"


def lon_sql(id_expr: str, dialect: str) -> str:
    # CAST to DOUBLE everywhere: Spark parses bare decimal literals as
    # DECIMAL (DuckDB as DOUBLE), which would silently change arithmetic.
    h = H.h32(f"{_str(id_expr, dialect)} || '_lon'", dialect)
    return (f"(CAST(({h} % 3600000) AS DOUBLE) / CAST(10000.0 AS DOUBLE) "
            f"- CAST(180.0 AS DOUBLE))")


def lat_sql(id_expr: str, dialect: str) -> str:
    h = H.h32(f"{_str(id_expr, dialect)} || '_lat'", dialect)
    return (f"(CAST(({h} % 1800000) AS DOUBLE) / CAST(10000.0 AS DOUBLE) "
            f"- CAST(90.0 AS DOUBLE))")


def lonlat_py(i: int) -> tuple[float, float]:
    """Pure-Python twin of :func:`lon_sql`/:func:`lat_sql` (md5 % range
    / 1e4) — for driver-side oracle pinning (e.g. the heatmap tile
    render twin).  Keep the three twins in THIS module so a formula
    change cannot silently diverge a private copy."""
    import hashlib

    hlon = int(hashlib.md5(f"{i}_lon".encode()).hexdigest()[:8], 16)
    hlat = int(hashlib.md5(f"{i}_lat".encode()).hexdigest()[:8], 16)
    return (float(hlon % 3600000) / 10000.0 - 180.0,
            float(hlat % 1800000) / 10000.0 - 90.0)


def with_lonlat_jvm(df, key_col: str = "phash", lon_col: str = "lon",
                    lat_col: str = "lat"):
    """JVM-only geotag: xxhash64-derived lon/lat columns.

    Stays inside whole-stage codegen (no Python worker, no Arrow hop),
    which scales linearly with cores — the production path for the
    10^12-row image table.  (The md5 SQL twin exists for oracle-gated
    queries; the numpy splitmix64 twin for pandas-side pipelines.)
    """
    from pyspark.sql import functions as F
    lon = (F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(3600000))
           .cast("double") / 10000.0 - 180.0)
    lat = (F.pmod(F.xxhash64(F.col(key_col), F.lit(2)), F.lit(1800000))
           .cast("double") / 10000.0 - 90.0)
    return df.withColumn(lon_col, lon).withColumn(lat_col, lat)


_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 bit-mixer (public-domain algorithm)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def lonlat_np(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """phash/int64 key → deterministic (lon, lat), uniform on the globe's
    lon/lat rectangle."""
    h1 = splitmix64(np.asarray(key, dtype=np.int64).view(np.uint64))
    h2 = splitmix64(h1)
    lon = (h1 >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 360.0 - 180.0
    lat = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 180.0 - 90.0
    return lon, lat
