"""Temporal join operators: as-of join and binned interval range join.

Neither exists as a Spark built-in; both are classic event-pipeline
operators (point-in-time feature lookup, interval containment).  Naive
phrasings are scale killers — Spark plans an inequality-only join
condition as BroadcastNestedLoopJoin (all pairs per partition pair) —
so both operators here re-express the semantics as a single shuffle on
an equi-key:

* :func:`asof_join` needs NO join at all: union the probe and dimension
  rows, one window pass per key carries the latest non-null dimension
  value forward (``last_value IGNORE NULLS`` over rows-unbounded-
  preceding), then keep the probe rows.  One shuffle on the key, state
  per row is O(1), and skewed keys degrade no worse than any window.
* :func:`range_join_binned` quantizes time into fixed-width bins:
  intervals explode to the bins they cover (a Generate node — bounded
  by ceil(duration / bin) + 1 rows per interval), points map to exactly
  one bin, and the containment predicate runs AFTER a plain hash
  equi-join on ``bin``.  Every true pair meets in the point's bin
  exactly once, so no dedup pass is needed.

Scale notes (100 TB): the as-of union never materializes pairs — it is
safe at any dim/probe ratio.  For the range join, pick ``bin_width`` of
the order of the typical interval length: explosion factor stays ~2×
while each bin's candidate set stays local.  Long-tail intervals fan
out linearly (an interval covering B bins costs B rows — still far
cheaper than the O(|points|) a nested-loop pairing costs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, dim: DataFrame, on: list[str],
              ts_col: str, value_col: str, out_col: str | None = None,
              tiebreak_col: str | None = None) -> DataFrame:
    """Point-in-time lookup: for each probe row, the ``value_col`` of the
    latest dim row with the same key and ``dim.ts <= probe.ts`` (NULL
    when no dim row precedes the probe).

    At equal timestamps the dim row counts as already effective (the
    standard as-of convention); among multiple dim rows at one (key, ts)
    the one with the greatest ``tiebreak_col`` wins, which makes the
    result deterministic — pass a unique id column present in BOTH
    inputs (or leave None when (key, ts) is unique on the dim side).

    Returns all probe columns plus ``out_col`` (default
    ``asof_<value_col>``).
    """
    out_col = out_col or f"asof_{value_col}"
    if out_col in probe.columns:
        raise ValueError(f"output column {out_col!r} already in probe")
    vtype = dict(dim.dtypes)[value_col]

    carry = [c for c in probe.columns if c not in on and c != ts_col]
    d = dim.select(
        *on, F.col(ts_col),
        F.col(value_col).cast(vtype).alias("__asof_v"),
        F.lit(1).alias("__is_dim"),
        *[F.lit(None).cast(t).alias(c)
          for c, t in probe.dtypes if c in carry],
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("__tb"))
    p = probe.select(
        *on, F.col(ts_col),
        F.lit(None).cast(vtype).alias("__asof_v"),
        F.lit(0).alias("__is_dim"),
        *carry,
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("__tb"))

    w = (Window.partitionBy(*on)
         .orderBy(F.col(ts_col).asc(), F.col("__is_dim").desc(),
                  F.col("__tb").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.unionByName(p)
            .withColumn(out_col, F.last("__asof_v", ignorenulls=True).over(w))
            .where(F.col("__is_dim") == 0)
            .select(*probe.columns, out_col))


def covered_bins(start: Column, end: Column, bin_width: int,
                 half_open: bool = True) -> Column:
    """Array of bin ids an integer interval covers (empty when the
    interval is empty).  Guarded so Spark's descending ``sequence``
    semantics can never fire on degenerate input."""
    last = (end - 1) if half_open else end
    seq = F.sequence(F.floor(start / bin_width).cast("bigint"),
                     F.floor(last / bin_width).cast("bigint"))
    empty = start > end if not half_open else start >= end
    return F.when(empty, F.array().cast("array<bigint>")).otherwise(seq)


def range_join_binned(points: DataFrame, intervals: DataFrame,
                      point_ts: str, start_col: str, end_col: str,
                      bin_width: int, half_open: bool = True) -> DataFrame:
    """All (point, interval) pairs with the point inside the interval
    (``start <= ts < end``; closed end with ``half_open=False``), as a
    hash equi-join on time bins — never a nested-loop join.

    Timestamps and bounds must be integers (epoch seconds/millis); the
    containment predicate itself is exact, bins only route candidates.
    Columns from both inputs are returned (names must not collide).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column name collision: {sorted(overlap)}")
    iv = intervals.withColumn(
        "__bin", F.explode(covered_bins(
            F.col(start_col), F.col(end_col), bin_width, half_open)))
    pt = points.withColumn(
        "__bin", F.floor(F.col(point_ts) / bin_width).cast("bigint"))
    upper = (F.col(point_ts) < F.col(end_col)) if half_open \
        else (F.col(point_ts) <= F.col(end_col))
    return (pt.join(iv, "__bin")
            .where((F.col(point_ts) >= F.col(start_col)) & upper)
            .drop("__bin"))


# --- dual-dialect SQL templates (gate queries) ------------------------------


def asof_union_window_sql(dialect: str, probe_cte: str, dim_cte: str,
                          on: list[str], ts_col: str, id_col: str,
                          value_col: str, out_col: str) -> str:
    """The same union+window algebra as :func:`asof_join`, as a SQL
    template both engines run verbatim (the IGNORE NULLS spelling is the
    only dialect seam).  ``probe_cte``/``dim_cte`` are relation names
    with columns (on..., ts_col, id_col, and value_col on the dim side);
    ``id_col`` doubles as the deterministic tiebreak."""
    from ..functions import hashes as H
    keys = ", ".join(on)
    lv = H.last_ignore_nulls("v", dialect)
    return f"""
u AS (
  SELECT {keys}, {ts_col}, CAST(NULL AS BIGINT) AS pid, {value_col} AS v,
         1 AS is_dim, {id_col} AS tb
  FROM {dim_cte}
  UNION ALL
  SELECT {keys}, {ts_col}, {id_col} AS pid, NULL AS v, 0 AS is_dim,
         {id_col} AS tb
  FROM {probe_cte}
),
w AS (
  SELECT pid, {keys}, {ts_col}, is_dim,
         {lv} OVER (PARTITION BY {keys}
                    ORDER BY {ts_col} ASC, is_dim DESC, tb ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS {out_col}
  FROM u
)"""


def gap_fill_sql(dialect: str, rel: str = "events", width: int = 3600,
                 key: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value",
                 tiebreak_col: str = "event_id") -> str:
    """Time-series densification: per-key dense bucket grid between the
    key's first and last observation + last-observation-carried-forward.

    Dialect seams: epoch seconds (unix_timestamp vs epoch), the grid
    explode (Spark ``sequence`` is end-inclusive, DuckDB ``range``
    end-exclusive), and the IGNORE-NULLS window modifier (shared with
    :func:`asof_join`).  Within a bucket the observation with the
    greatest (ts, tiebreak) wins — deterministic.  Gap buckets emit
    n_obs = 0 and carry the prior value; the first bucket always has an
    observation, so the filled value is never NULL.  One explode + two
    key-partitioned windows — no joins over raw pairs, scales per key.
    """
    from ..functions import hashes as H

    if dialect == H.SPARK:
        ep = f"unix_timestamp({ts_col})"
        grid = (f"SELECT {key}, explode(sequence(b0, b1, "
                f"CAST({width} AS BIGINT))) AS b FROM gf_span")
    else:
        ep = f"CAST(FLOOR(epoch({ts_col})) AS BIGINT)"
        grid = (f"SELECT {key}, unnest(range(b0, b1 + {width}, "
                f"{width})) AS b FROM gf_span")
    b = f"({H.idiv(ep, width, dialect)}) * {width}"
    locf = H.last_ignore_nulls("v", dialect)
    return f"""
gf_obs AS (
  SELECT {key}, {b} AS b, {value_col} AS value, {ts_col} AS ts,
         {tiebreak_col} AS tb FROM {rel}),
gf_span AS (
  SELECT {key}, MIN(b) AS b0, MAX(b) AS b1 FROM gf_obs
  GROUP BY {key}),
gf_grid AS ({grid}),
gf_last AS (
  SELECT {key}, b, v, n_obs FROM (
    SELECT {key}, b, value AS v,
           ROW_NUMBER() OVER (PARTITION BY {key}, b
                              ORDER BY ts DESC, tb DESC) AS rn,
           COUNT(*) OVER (PARTITION BY {key}, b) AS n_obs
    FROM gf_obs) t WHERE rn = 1),
gf_joined AS (
  SELECT g.{key}, g.b, l.v, COALESCE(l.n_obs, 0) AS n_obs
  FROM gf_grid g LEFT JOIN gf_last l
    ON g.{key} = l.{key} AND g.b = l.b)
SELECT {key}, b AS bucket_start,
       CAST(n_obs AS BIGINT) AS n_obs,
       {locf} OVER (PARTITION BY {key} ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS locf_value
FROM gf_joined"""


def resample_sql(dialect: str, src: str = "rs_src",
                 key: str = "user_id", width: int = 3600) -> str:
    """Trajectory resampling: per-key LINEAR interpolation of (lon, lat)
    at a fixed epoch grid — the densify step before map matching or
    sequence models (gap_fill is the LOCF cousin; this one moves the
    point along the segment).

    ``src`` must expose (key, es, id, lon, lat).  Observations dedupe
    to one per (key, epoch) first — greatest id wins, the gap_fill
    convention — then a union of obs(kind 0)/grid(kind 1) rows carries
    two IGNORE-NULLS window passes: forward (prev obs at es ≤ t, obs
    sorted before grid at the same epoch so an exact hit interpolates
    to itself) and backward (next obs at es ≥ t).  The lerp is one
    identical double expression tree over BIGINT-diff inputs —
    bit-identical dual-engine (the sparse-cosine SQRT precedent) — and
    outputs quantize to e6 BIGINTs.  Grid ends clamp to the nearest
    observation.  One dedupe window + explode + two key-partitioned
    windows; no joins over raw pairs — scales per key like gap_fill.
    """
    from ..functions import hashes as H

    # sub-grid spans (g0 > g1) must filter BEFORE the explode: Spark's
    # sequence(start, stop, +step) errors on start > stop where DuckDB's
    # range is empty — a seam unless both sides never see it
    if dialect == H.SPARK:
        grid = (f"SELECT {key}, explode(sequence(g0, g1, "
                f"CAST({width} AS BIGINT))) AS es FROM rs_span "
                "WHERE g0 <= g1")
    else:
        grid = (f"SELECT {key}, unnest(range(g0, g1 + {width}, "
                f"{width})) AS es FROM rs_span WHERE g0 <= g1")
    fwd = (f"OVER (PARTITION BY {key} ORDER BY es ASC, kind ASC, id ASC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    bwd = (f"OVER (PARTITION BY {key} ORDER BY es DESC, kind DESC, id DESC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")

    def ln(e):  # noqa: E306
        return H.last_ignore_nulls(e, dialect)

    frac = ("(CAST(es - p_es AS DOUBLE) / CAST(n_es - p_es AS DOUBLE))")
    lerp = {c: (f"CASE WHEN p_es IS NULL THEN n_{c} "
                f"WHEN n_es IS NULL OR n_es = p_es THEN p_{c} "
                f"ELSE p_{c} + (n_{c} - p_{c}) * {frac} END")
            for c in ("lon", "lat")}
    return f"""
rs_obs AS (
  SELECT {key}, es, id, lon, lat FROM (
    SELECT {key}, es, id, lon, lat,
           ROW_NUMBER() OVER (PARTITION BY {key}, es
                              ORDER BY id DESC) AS rn
    FROM {src}) d WHERE rn = 1),
rs_span AS (
  SELECT {key},
         ({H.idiv(f'MIN(es) + {width - 1}', str(width), dialect)})
           * {width} AS g0,
         ({H.idiv('MAX(es)', str(width), dialect)}) * {width} AS g1
  FROM rs_obs GROUP BY {key}),
rs_grid AS ({grid}),
rs_u AS (
  SELECT {key}, es, 0 AS kind, id, lon, lat FROM rs_obs
  UNION ALL
  SELECT {key}, es, 1 AS kind, CAST(-1 AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS lon, CAST(NULL AS DOUBLE) AS lat
  FROM rs_grid),
rs_w AS (
  SELECT {key}, es, kind,
         {ln('CASE WHEN kind = 0 THEN es END')} {fwd} AS p_es,
         {ln('CASE WHEN kind = 0 THEN lon END')} {fwd} AS p_lon,
         {ln('CASE WHEN kind = 0 THEN lat END')} {fwd} AS p_lat,
         {ln('CASE WHEN kind = 0 THEN es END')} {bwd} AS n_es,
         {ln('CASE WHEN kind = 0 THEN lon END')} {bwd} AS n_lon,
         {ln('CASE WHEN kind = 0 THEN lat END')} {bwd} AS n_lat
  FROM rs_u)
SELECT {key}, es AS t_s,
       CAST(ROUND(({lerp['lon']}) * 1000000) AS BIGINT) AS lon_e6,
       CAST(ROUND(({lerp['lat']}) * 1000000) AS BIGINT) AS lat_e6,
       CASE WHEN p_es IS NOT NULL AND n_es IS NOT NULL
                 AND n_es <> p_es AND es <> p_es
            THEN 1 ELSE 0 END AS interp
FROM rs_w WHERE kind = 1"""
