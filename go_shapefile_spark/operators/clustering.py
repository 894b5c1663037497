"""Grid-accelerated DBSCAN — density-based spatial clustering.

DBSCAN (Ester et al., KDD 1996) over a point corpus, expressed in the
relational shapes this engine already scales instead of the paper's
point-at-a-time region queries:

- the eps-radius neighbor search is a 9-key equi-join on an eps-sized
  grid (the 3x3 ring trick of operators/knn.py — any two points within
  eps share or abut a grid cell, so candidate pairs are bounded by grid
  occupancy; no BNLJ, no all-pairs scan);
- neighbor counting / core classification is one groupBy over the pair
  stream (a point's eps-neighborhood includes itself, per the paper);
- cluster formation is connected components over the core-core edge set
  (operators/graph.py alternating large-star/small-star — O(log n)
  rounds of key-partitioned shuffles), labels = component-minimum id;
- border points (non-core with >= 1 core neighbor) take the MINIMUM
  core-neighbor label; everything else is noise, labeled -1.

Classic DBSCAN's border assignment is visit-order-dependent; the
min-label tie-break makes the whole labeling a pure function of the
input, so results replay bit-identically under any partitioning — and
the DuckDB oracle can check the same algebra with a recursive-CTE
closure instead of our iterative operator (two different algorithms,
identical output; same discipline as q:neardup_components).

Distance is planar euclidean on the point coordinates; the predicate
compares SQUARED distances (IEEE *, + are bit-deterministic in both
engines; no sqrt, no libm).  eps literals are quoted-string casts so
both engines parse string->double (correctly rounded) rather than
DECIMAL-parsing a bare literal (CLAUDE.md dialect seam).

Scale posture: candidate fan-out is sum over cells of |cell| x |3x3
ring occupancy| — the same bound as the banded dedup joins.  A hot
cell (density skew) is the LSH bucket-flood analog; at gate scale it
cannot occur (eps-sized cells over a bounded domain), and at corpus
scale the mitigation is the same family (cap, pre-aggregate, or raise
the grid resolution and union two rings).  The npairs relation is
pinned once and read three times (counts, edges, border labels) —
CTE inlining would recompute the join per reference.

Reference analog: engine-layer operator (SURVEY.md §2.B family — the
reference repo is a record-level reader and has no clustering; this is
part of the analytics engine built over it, composing E3's grid with
the graph operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import hashes as H


def _eps_lit(eps: float) -> str:
    """Quoted string->double cast: identical correctly-rounded parse in
    Spark and DuckDB (a bare decimal literal DECIMAL-parses in DuckDB)."""
    return f"CAST('{float(eps)!r}' AS DOUBLE)"


def dbscan_base_cte(dialect: str, eps: float, min_pts: int,
                    pts: str = "pts") -> str:
    """CTE chain ``gcells -> goffs -> npairs -> cores -> core_edges``
    over a point relation ``pts(id, lon, lat)``.  Shared verbatim by the
    Spark runner and the DuckDB oracle (dialect only reaches the eps
    literal handling, which is already dialect-free)."""
    del dialect  # the chain is dialect-free; keep the seam signature
    e = _eps_lit(eps)
    return f"""
gcells AS (
  SELECT id, lon, lat,
         CAST(FLOOR(lon / {e}) AS BIGINT) AS cx,
         CAST(FLOOR(lat / {e}) AS BIGINT) AS cy
  FROM {pts}),
goffs AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)) AS t(dx, dy)),
npairs AS (
  SELECT p.id AS a, q.id AS b
  FROM (SELECT g.id, g.lon, g.lat, g.cx + o.dx AS gx, g.cy + o.dy AS gy
        FROM gcells g CROSS JOIN goffs o) p
  JOIN gcells q ON p.gx = q.cx AND p.gy = q.cy
  WHERE (p.lon - q.lon) * (p.lon - q.lon)
      + (p.lat - q.lat) * (p.lat - q.lat) <= {e} * {e}),
cores AS (
  SELECT a AS id FROM npairs GROUP BY a HAVING COUNT(*) >= {int(min_pts)}),
core_edges AS (
  SELECT p.a AS src, p.b AS dst
  FROM npairs p
  JOIN cores ca ON p.a = ca.id
  JOIN cores cb ON p.b = cb.id
  WHERE p.a < p.b)"""


def dbscan_tail_sql(dialect: str, pts: str = "pts") -> str:
    """Label assembly over ``{pts}``, ``npairs``, ``cores`` and a
    ``core_labels(id, label)`` relation (Spark: from the connected
    components operator; oracle: from a recursive closure).  Border =
    non-core with a core neighbor, min core-neighbor label; noise = -1."""
    del dialect
    return f"""
border_labels AS (
  SELECT p.a AS id, MIN(cl.label) AS label
  FROM npairs p
  JOIN core_labels cl ON p.b = cl.id
  LEFT JOIN cores ca ON p.a = ca.id
  WHERE ca.id IS NULL
  GROUP BY p.a)
SELECT n.id AS id,
       CAST(COALESCE(cl.label, bl.label, -1) AS BIGINT) AS cluster,
       CASE WHEN cl.label IS NOT NULL THEN 'core'
            WHEN bl.label IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM {pts} n
LEFT JOIN core_labels cl ON n.id = cl.id
LEFT JOIN border_labels bl ON n.id = bl.id"""


def dbscan_oracle_sql(dialect: str, eps: float, min_pts: int,
                      pts_cte: str) -> str:
    """Complete single-statement twin for DuckDB: the shared base chain
    plus a recursive-CTE transitive closure in place of the iterative
    components operator.  ``pts_cte`` is a CTE body defining ``pts``."""
    return f"""
WITH RECURSIVE {pts_cte},
{dbscan_base_cte(dialect, eps, min_pts).lstrip()},
bi AS (SELECT src AS a, dst AS b FROM core_edges
       UNION SELECT dst, src FROM core_edges),
reach AS (
  SELECT id AS src, id AS node FROM cores
  UNION
  SELECT r.src, e.b FROM reach r JOIN bi e ON e.a = r.node),
core_labels AS (SELECT src AS id, MIN(node) AS label FROM reach GROUP BY src),
{dbscan_tail_sql(dialect).lstrip()}
"""


def dbscan(points: DataFrame, eps: float, min_pts: int,
           pin: str | None = None, slot: str | None = None) -> DataFrame:
    """DBSCAN over ``points(id, lon, lat)`` -> ``(id, cluster, role)``.

    ``cluster`` is the smallest core-point id in the cluster (BIGINT;
    -1 for noise); ``role`` in {'core','border','noise'}.  ``min_pts``
    counts the point itself (the paper's |N_eps(p)| >= MinPts).  The
    candidate-pair relation is pinned (operators/pinning.py) because
    three downstream consumers read it; ``slot=None`` (the public
    default) allocates an anonymous per-call slot, the gate/bench
    harness passes a named one-shot slot so reruns recycle.
    """
    from .graph import connected_components
    from .pinning import fresh_pins

    spark = points.sparkSession
    pts_v = "dbscan_pts_in"
    points.selectExpr("id", "lon", "lat").createOrReplaceTempView(pts_v)
    pinf = fresh_pins(spark, slot, strategy=pin)

    # r6 optimization: generate each unordered candidate pair ONCE —
    # same-cell pairs with id order, cross-cell pairs through the four
    # HALF-plane offsets (E, NE, N, NW enumerate each unordered
    # adjacent cell pair exactly once) — which halves the fan-out join
    # and the distance evaluations vs the symmetric 9-offset template.
    # The directed ``npairs`` relation the shared tail expects is then
    # a cheap view: up ∪ mirror(up) ∪ self-pairs (one per point — the
    # (0,0) offset's p=q rows).  Identical row set to the template's.
    e = _eps_lit(eps)
    gcells = pinf(spark.sql(f"""
SELECT id, lon, lat,
       CAST(FLOOR(lon / {e}) AS BIGINT) AS cx,
       CAST(FLOOR(lat / {e}) AS BIGINT) AS cy
FROM {pts_v}"""))
    gcells.createOrReplaceTempView("dbscan_gcells")
    d2 = ("(p.lon - q.lon) * (p.lon - q.lon) "
          f"+ (p.lat - q.lat) * (p.lat - q.lat) <= {e} * {e}")
    up = pinf(spark.sql(f"""
SELECT p.id AS a, q.id AS b
FROM dbscan_gcells p JOIN dbscan_gcells q
  ON q.cx = p.cx AND q.cy = p.cy AND p.id < q.id
WHERE {d2}
UNION ALL
SELECT LEAST(p.id, q.id) AS a, GREATEST(p.id, q.id) AS b
FROM (SELECT g.id, g.lon, g.lat, g.cx + o.dx AS gx, g.cy + o.dy AS gy
      FROM dbscan_gcells g
      CROSS JOIN (SELECT * FROM (VALUES (0,1),(1,-1),(1,0),(1,1))
                  AS t(dx, dy)) o) p
JOIN dbscan_gcells q ON q.cx = p.gx AND q.cy = p.gy
WHERE {d2}"""))
    up.createOrReplaceTempView("dbscan_up")
    spark.sql("SELECT a, b FROM dbscan_up "
              "UNION ALL SELECT b AS a, a AS b FROM dbscan_up "
              "UNION ALL SELECT id AS a, id AS b FROM dbscan_gcells") \
        .createOrReplaceTempView("npairs")
    pinf(spark.sql(f"SELECT a AS id FROM npairs GROUP BY a "
                   f"HAVING COUNT(*) >= {int(min_pts)}")) \
        .createOrReplaceTempView("cores")
    core_edges = spark.sql(
        "SELECT u.a AS src, u.b AS dst FROM dbscan_up u "
        "JOIN cores ca ON u.a = ca.id JOIN cores cb ON u.b = cb.id")
    # up is distinct with a < b by construction, so the core-core edge
    # set is already normalized — CC can skip its dedup shuffle
    cc = connected_components(core_edges, pin=pin,
                              slot=None if slot is None else f"{slot}_cc",
                              assume_normalized=True)
    cc.createOrReplaceTempView("dbscan_cc")
    # isolated cores never appear in an edge: they are their own
    # cluster.  core_labels pins (r6): the tail references it twice
    # (direct label + border join), and each reference would re-run the
    # components operator's final label join-back chain
    pinf(spark.sql(
        "SELECT c.id, COALESCE(x.component, c.id) AS label "
        "FROM cores c LEFT JOIN dbscan_cc x ON c.id = x.node")) \
        .createOrReplaceTempView("core_labels")
    # the tail only needs the point ids; reading the pinned cell
    # relation instead of {pts} skips one more md5-geotag pass (r6)
    return spark.sql(
        "WITH " + dbscan_tail_sql(H.SPARK, pts="dbscan_gcells").lstrip())


# --- grid distance transform (multi-source BFS) ---------------------------

def distance_transform_base_cte(dialect: str, pts: str = "pts") -> str:
    """Occupied-pixel relation + queen-adjacency edge set for the grid
    distance transform.  Expects ``{pts}(lon, lat, is_src)``; emits
    ``dbase(x, y, is_src)`` and ``dedges(x, y, nx, ny)``.

    Adjacency is the same offset-fan-out equi-join as the spatial-
    autocorrelation and Getis-Ord gates — candidate neighbors via 8
    pinned offsets, kept only where the neighbor pixel EXISTS (the
    sparse-raster convention: BFS runs through observed cells, the
    connectivity-constrained distance, not free-space Chebyshev which
    would collapse to a closed-form nearest-source query).
    """
    del dialect  # identical text in both engines
    return f"""
dpx AS (
  SELECT CAST(FLOOR(lon) AS BIGINT) AS x,
         CAST(FLOOR(lat) AS BIGINT) AS y, is_src
  FROM {pts}),
dbase AS (
  SELECT x, y, CAST(MAX(is_src) AS BIGINT) AS is_src
  FROM dpx GROUP BY x, y),
doffs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                                (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
dedges AS (
  SELECT b.x, b.y, n.x AS nx, n.y AS ny
  FROM dbase b CROSS JOIN doffs o
  JOIN dbase n ON n.x = b.x + o.dx AND n.y = b.y + o.dy)"""


def distance_transform_oracle_sql(rounds: int, pts_cte: str,
                                  pts: str = "pts") -> str:
    """DuckDB oracle: the SAME base relations, but the iteration is a
    recursive-CTE walk (a different algorithm computing the same
    function — the q:dbscan_events discipline).  UNION dedups visited
    (x, y, d) states, MIN per cell is the BFS distance."""
    return f"""
WITH RECURSIVE {pts_cte},
{distance_transform_base_cte('duck', pts=pts).lstrip()},
walk AS (
  SELECT x, y, 0 AS d FROM dbase WHERE is_src = 1
  UNION
  SELECT e.nx, e.ny, w.d + 1
  FROM walk w JOIN dedges e ON e.x = w.x AND e.y = w.y
  WHERE w.d < {int(rounds)})
SELECT x, y, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY x, y"""


# --- bounded-grid driver iteration (r6) -----------------------------------
#
# The three fixed-round grid runners below (distance transform, cost
# distance, flow accumulation) iterate over an AGGREGATED degree-grid
# relation whose size is bounded by the grid itself (FLOOR(lon) ×
# FLOOR(lat) over geographic inputs is ≤ 360×180 = 64 800 cells no
# matter how many input rows fed the aggregation).  Distributed, each
# round is a join + aggregate over a few-thousand-row relation — pure
# shuffle-stage latency (~0.25 s/round measured, 2.2 s of a 3.1 s
# query).  So after the distributed aggregation the runners check the
# EXACT cell count and coordinate spans (one tiny agg on the pinned
# grid) and, when bounded, collect the grid through Arrow and run the
# identical integer recurrence vectorized in numpy on the driver —
# the same two-level discipline as connected_components' local finish
# (shrink distributively, iterate where per-round latency is free).
# The fallback keeps the fully distributed chain; tests force it.

_GRID_LOCAL_MAX_CELLS = 1_000_000


def _grid_local_stats(base: DataFrame):
    """Exact cell count + coordinate spans of the aggregated grid —
    the auto-gate for the driver-side iterate path (one 1-row agg on
    the pinned relation, which doubles as the pin materialization)."""
    from pyspark.sql import functions as F

    return base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1")).collect()[0]


def _grid_local_ok(st) -> bool:
    """Bounded for the driver path: cell count under the cap and the
    (span+2)-padded pack key fits int64 (sparse adversarial coords
    fall back to the distributed chain)."""
    if st.n == 0 or st.n > _GRID_LOCAL_MAX_CELLS:
        return False
    spanx = int(st.x1) - int(st.x0) + 3
    spany = int(st.y1) - int(st.y0) + 3
    return spanx * spany < (1 << 62)


def _grid_pack(pdf, st):
    """Sort the collected grid by a collision-free packed (x, y) key
    (ascending pack order == lexicographic (x, y) order, so emitted
    rows are partition-order independent); returns the sort
    permutation applied to nothing — callers index their own columns —
    plus the sorted key array and the y-span multiplier."""
    import numpy as np

    x = pdf["x"].to_numpy(np.int64)
    y = pdf["y"].to_numpy(np.int64)
    spany = int(st.y1) - int(st.y0) + 3
    key = (x - int(st.x0) + 1) * spany + (y - int(st.y0) + 1)
    order = np.argsort(key)
    return order, key[order], spany


def _grid_neighbor_pairs(key_sorted, spany, offsets):
    """Per offset (dx, dy, w): (source index array, neighbor index
    array, w) for every cell whose (x+dx, y+dy) neighbor EXISTS in the
    sorted key set (binary search — the vectorized twin of the
    distributed offset fan-out + equi-join)."""
    import numpy as np

    out = []
    for dx, dy, w in offsets:
        nk = key_sorted + dx * spany + dy
        pos = np.clip(np.searchsorted(key_sorted, nk),
                      0, len(key_sorted) - 1)
        hit = key_sorted[pos] == nk
        out.append((np.nonzero(hit)[0], pos[hit], w))
    return out


def _minplus_local_df(spark, base: DataFrame, st, offsets,
                      rounds: int, out_col: str) -> DataFrame:
    """Driver-side min-plus (Bellman-Ford) rounds over the bounded
    grid: the exact integer recurrence ``d_r(c) = min(d_{r-1}(c),
    min_nbr d_{r-1}(nbr) + w)`` the distributed chain runs —
    ``np.minimum.at`` is unbuffered, min is order-free, and all values
    are int64, so the result is bit-identical.  Unreached cells stay
    at the sentinel and are dropped (the oracle's absent-cells cap)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x", T.LongType(), True),
                           T.StructField("y", T.LongType(), True),
                           T.StructField(out_col, T.LongType(), True)])
    pdf = base.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    order, key_sorted, spany = _grid_pack(pdf, st)
    x = pdf["x"].to_numpy(np.int64)[order]
    y = pdf["y"].to_numpy(np.int64)[order]
    s = pdf["is_src"].to_numpy(np.int64)[order]
    pairs = _grid_neighbor_pairs(key_sorted, spany, offsets)
    inf = np.int64(1) << 62
    dist = np.where(s == 1, np.int64(0), inf)
    for _ in range(int(rounds)):
        nd = dist.copy()
        for i_idx, j_idx, w in pairs:
            np.minimum.at(nd, j_idx, dist[i_idx] + w)
        dist = nd
    keep = dist < inf
    out = pd.DataFrame({"x": x[keep], "y": y[keep], out_col: dist[keep]})
    if len(out) == 0:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(out, schema)


def grid_distance_transform(points: DataFrame, rounds: int = 8,
                            pin: str | None = None,
                            slot: str | None = None,
                            local_iterate: bool | None = None
                            ) -> DataFrame:
    """Multi-source BFS distance over the occupied pixel grid:
    ``points(lon, lat, is_src)`` → ``(x, y, dist)`` for every cell
    reachable from a source cell within ``rounds`` queen-steps through
    occupied cells (unreached cells are absent — same cap in the
    oracle).

    Scale posture: the edge relation is built ONCE (one offset fan-out
    + equi-join, pinned) and carries a ZERO-weight self-loop per
    occupied cell, so each BFS round is ONE equi-join + min-aggregate
    referencing the previous iterate exactly once — the whole fixed
    round count is a single lazy plan (one job, linear depth, the
    pinned edge exchange reused across rounds) instead of a
    per-round checkpoint job (r6 optimization: 4.1 s → one job).
    ``dist_r(c) = min(dist_{r-1}(c), min_nbr dist_{r-1}(nbr) + 1)``
    is exactly the first-reach BFS round recurrence, so the output is
    unchanged.  A fixed round count means NO per-round driver action
    (no count(), no convergence collect).
    """
    from pyspark.sql import functions as F

    from .pinning import fresh_pins

    spark = points.sparkSession
    pinf = fresh_pins(spark, slot, strategy=pin)
    v = "dtx_pts_in"
    points.selectExpr("lon", "lat",
                      "CAST(is_src AS BIGINT) AS is_src") \
        .createOrReplaceTempView(v)
    cte = distance_transform_base_cte(H.SPARK, pts=v)
    # split the chain: materialize dbase once, edges once
    base_sql = cte[:cte.index("doffs AS (")].rstrip().rstrip(",")
    base = pinf(spark.sql("WITH " + base_sql.lstrip() +
                          "\nSELECT * FROM dbase"))
    st = _grid_local_stats(base)
    if _grid_local_ok(st) if local_iterate is None else local_iterate:
        # bounded grid: run the identical recurrence on the driver
        # (see the section comment above) — the edge relation is never
        # built, and the 8 shuffle rounds collapse into vectorized
        # numpy passes
        return _minplus_local_df(
            spark, base, st,
            [(-1, -1, 1), (-1, 0, 1), (-1, 1, 1), (0, -1, 1),
             (0, 1, 1), (1, -1, 1), (1, 0, 1), (1, 1, 1)],
            rounds, out_col="dist")
    base.createOrReplaceTempView("dtx_base")
    edges = pinf(spark.sql(f"""
WITH doffs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                                     (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy))
SELECT b.x, b.y, n.x AS nx, n.y AS ny, CAST(1 AS BIGINT) AS w
FROM dtx_base b CROSS JOIN doffs o
JOIN dtx_base n ON n.x = b.x + o.dx AND n.y = b.y + o.dy
UNION ALL
SELECT x, y, x AS nx, y AS ny, CAST(0 AS BIGINT) AS w FROM dtx_base"""))

    dist = base.where("is_src = 1") \
        .selectExpr("x", "y", "CAST(0 AS BIGINT) AS dist")
    for _ in range(int(rounds)):
        dist = (dist.join(edges, ["x", "y"])
                .selectExpr("nx AS x", "ny AS y",
                            "CAST(dist + w AS BIGINT) AS dist")
                .groupBy("x", "y").agg(F.min("dist").alias("dist")))
    return dist


# --- raster blob labeling (connected-component regions) -------------------

def blob_base_cte(tau: int, pixels: str = "bpix") -> str:
    """Shared CTE chain for raster region labeling: ``{pixels}(x, y, v)``
    → ``bhot`` (cells at or above ``tau``, with a packed pixel id) and
    ``bedges`` (4-adjacency, directed east/north — the undirected
    closure adds the reverses).  Identical text in both engines.

    The two adjacency joins are EQUI-joins on shifted keys (never an
    OR-of-conjunctions join predicate, which Catalyst can only run as
    a nested-loop join)."""
    return f"""
bhot AS (
  SELECT x, y, v, (x + 512) * 4096 + (y + 512) AS pid
  FROM {pixels} WHERE v >= {int(tau)}),
bedges AS (
  SELECT a.pid AS ea, b.pid AS eb
  FROM bhot a JOIN bhot b ON b.x = a.x + 1 AND b.y = a.y
  UNION ALL
  SELECT a.pid AS ea, b.pid AS eb
  FROM bhot a JOIN bhot b ON b.x = a.x AND b.y = a.y + 1)"""


def blob_tail_sql() -> str:
    """Per-blob rollup over ``blabels(pid, x, y, v, blob)`` — region id,
    cell count, mass, bbox.  All-integer; identical in both engines."""
    return """
SELECT blob,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(MIN(x) AS BIGINT) AS x0, CAST(MAX(x) AS BIGINT) AS x1,
       CAST(MIN(y) AS BIGINT) AS y0, CAST(MAX(y) AS BIGINT) AS y1
FROM blabels GROUP BY blob"""


def label_blobs(pixels: DataFrame, tau: int,
                pin: str | None = None,
                slot: str | None = None) -> DataFrame:
    """Raster region labeling (the map-algebra "polygonize-labels" /
    blob-detection primitive): threshold ``pixels(x, y, v)`` at
    ``tau``, label 4-connected regions, and emit one row per region
    with (n_cells, sum_v, bbox).  Region id = the smallest packed
    pixel id in the region — deterministic under any partitioning.

    Spark side labels with the large-star/small-star components
    operator (O(log n) rounds, each one shuffle — the giant-region
    case a dense corpus produces stays cheap); the DuckDB oracle
    (:func:`blob_oracle_sql`) closes the same edge relation with a
    recursive-CTE transitive walk — two algorithms, one function.
    The hot relation is pinned: three consumers (the two adjacency
    self-joins and the label join-back) would otherwise re-run the
    upstream raster per reference.
    """
    from .graph import connected_components
    from .pinning import fresh_pins

    spark = pixels.sparkSession
    pinf = fresh_pins(spark, slot, strategy=pin)
    v = "blob_pix_in"
    pixels.selectExpr("x", "y", "CAST(v AS BIGINT) AS v") \
        .createOrReplaceTempView(v)
    hot = pinf(spark.sql(f"WITH {blob_base_cte(tau, pixels=v).lstrip()} "
                         "SELECT * FROM bhot"))
    hot.createOrReplaceTempView("blob_hot")
    edges = spark.sql(
        "SELECT a.pid AS src, b.pid AS dst FROM blob_hot a "
        "JOIN blob_hot b ON b.x = a.x + 1 AND b.y = a.y "
        "UNION ALL "
        "SELECT a.pid AS src, b.pid AS dst FROM blob_hot a "
        "JOIN blob_hot b ON b.x = a.x AND b.y = a.y + 1")
    cc = connected_components(edges, pin=pin)
    cc.createOrReplaceTempView("blob_cc")
    # isolated hot cells never enter an edge: they are their own region
    spark.sql("SELECT h.pid, h.x, h.y, h.v, "
              "COALESCE(c.component, h.pid) AS blob "
              "FROM blob_hot h LEFT JOIN blob_cc c ON h.pid = c.node") \
        .createOrReplaceTempView("blabels")
    return spark.sql("WITH blabels AS (SELECT * FROM blabels) "
                     + blob_tail_sql().lstrip())


def blob_oracle_sql(tau: int, pixels_cte: str,
                    pixels: str = "bpix") -> str:
    """DuckDB twin: same base chain, recursive-CTE closure in place of
    the iterative components operator.  ``pixels_cte`` must define
    ``{pixels}(x, y, v)``."""
    return f"""
WITH RECURSIVE {pixels_cte},
{blob_base_cte(tau, pixels=pixels).lstrip()},
bbi AS (SELECT ea AS a, eb AS b FROM bedges
        UNION SELECT eb, ea FROM bedges),
breach AS (
  SELECT pid AS src, pid AS node FROM bhot
  UNION
  SELECT r.src, e.b FROM breach r JOIN bbi e ON e.a = r.node),
blabels AS (
  SELECT h.pid, h.x, h.y, h.v, m.blob
  FROM bhot h JOIN (SELECT src AS pid, MIN(node) AS blob
                    FROM breach GROUP BY src) m ON m.pid = h.pid)
{blob_tail_sql().lstrip()}
"""


def _flow_local_df(spark, grid: DataFrame, st, rounds: int,
                   k: int) -> DataFrame:
    """Driver-side D8 inflow rounds over the bounded degree grid — the
    exact integer algebra of the distributed chain: per cell, the
    steepest uphill neighbor (max n, ties by smallest (x, y) — the
    template's ROW_NUMBER ORDER BY n DESC, x, y), then ``rounds``
    passes of ``u = 1 + Σ_incoming u`` (``np.add.at`` is unbuffered;
    integer sums are order-free), then the top-``k`` ranking by
    (acc DESC, x, y).  All int64 end to end."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x", T.LongType(), True),
                           T.StructField("y", T.LongType(), True),
                           T.StructField("n", T.LongType(), True),
                           T.StructField("acc", T.LongType(), True),
                           T.StructField("rk", T.LongType(), True)])
    pdf = grid.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    order, key_sorted, spany = _grid_pack(pdf, st)
    x = pdf["x"].to_numpy(np.int64)[order]
    y = pdf["y"].to_numpy(np.int64)[order]
    n = pdf["n"].to_numpy(np.int64)[order]
    pairs = _grid_neighbor_pairs(
        key_sorted, spany,
        [(-1, -1, 0), (-1, 0, 0), (-1, 1, 0), (0, -1, 0),
         (0, 1, 0), (1, -1, 0), (1, 0, 0), (1, 1, 0)])
    m = len(x)
    bn = np.full(m, np.int64(-1))
    bj = np.full(m, -1)
    btx = np.zeros(m, np.int64)
    bty = np.zeros(m, np.int64)
    for i_idx, j_idx, _w in pairs:
        # each offset yields at most one neighbor per cell, so i_idx
        # is duplicate-free within a pass and plain fancy assignment
        # is race-free
        cn, cx_, cy_ = n[j_idx], x[j_idx], y[j_idx]
        cur = bn[i_idx]
        better = (cn > cur) | ((cn == cur)
                               & ((cx_ < btx[i_idx])
                                  | ((cx_ == btx[i_idx])
                                     & (cy_ < bty[i_idx]))))
        sel = (cn > n[i_idx]) & better
        ii = i_idx[sel]
        bn[ii] = cn[sel]
        bj[ii] = j_idx[sel]
        btx[ii] = cx_[sel]
        bty[ii] = cy_[sel]
    src = np.nonzero(bj >= 0)[0]
    tgt = bj[src]
    u = np.ones(m, np.int64)
    for _ in range(int(rounds)):
        inflow = np.zeros(m, np.int64)
        np.add.at(inflow, tgt, u[src])
        u = 1 + inflow
    topk = np.lexsort((y, x, -u))[:int(k)]
    out = pd.DataFrame({
        "x": x[topk], "y": y[topk], "n": n[topk], "acc": u[topk],
        "rk": np.arange(1, len(topk) + 1, dtype=np.int64)})
    return spark.createDataFrame(out, schema)


def grid_flow_accumulation(points: DataFrame, rounds: int = 8,
                           k: int = 50, pin: str | None = None,
                           slot: str | None = None,
                           local_iterate: bool | None = None
                           ) -> DataFrame:
    """D8 uphill flow accumulation over the occupied 1-degree grid:
    ``points(lon, lat)`` → top-``k`` ``(x, y, n, acc, rk)`` — the
    runner twin of queries.flow_acc_sql (identical integer algebra,
    row-identical output).

    Why a runner instead of the unrolled CTE template on the Spark
    side: SQL CTE references INLINE, so round r's tree re-evaluates
    the grid aggregate and the direction window once per round —
    O(rounds²) recomputation (measured 523 s at sf0.1 vs ~3 s here).
    Here grid and dir pin ONCE (operators/pinning.py — executor-local
    by default, storage-backed via the gate seam) and each inflow
    round is one equi-join + groupBy on the CELLS relation, pinned to
    stop plan growth; counts strictly increase along dir, so each
    upstream cell is counted exactly once within the round horizon.
    Fixed round count ⇒ no per-round driver action."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .pinning import fresh_pins

    spark = points.sparkSession
    pinf = fresh_pins(spark, slot, strategy=pin)
    grid = pinf(points
                .selectExpr("CAST(FLOOR(lon) AS BIGINT) AS x",
                            "CAST(FLOOR(lat) AS BIGINT) AS y")
                .groupBy("x", "y")
                .agg(F.count(F.lit(1)).cast("long").alias("n")))
    st = _grid_local_stats(grid)
    if _grid_local_ok(st) if local_iterate is None else local_iterate:
        # bounded grid: steepest-neighbor pick + inflow rounds on the
        # driver (see the bounded-grid section comment) — the dirs
        # relation is never built distributively
        return _flow_local_df(spark, grid, st, rounds, k)
    grid.createOrReplaceTempView("fa_grid_v")
    # the neighbor coordinates are PRECOMPUTED in a subquery before
    # the b join: with `b.n > a.n` written directly against the
    # 3-relation join, Catalyst has an a–b join edge with only that
    # inequality and picks a quadratic BroadcastNestedLoopJoin (43M
    # rows, 68 s at sf0.1); staged, the only a–b edge is the clean
    # (bx, by) equi-join (~0.5 s)
    dirs = pinf(spark.sql("""
SELECT x, y, tx, ty FROM (
  SELECT c.x AS x, c.y AS y, b.x AS tx, b.y AS ty,
         ROW_NUMBER() OVER (PARTITION BY c.x, c.y
                            ORDER BY b.n DESC, b.x, b.y) AS rk
  FROM (SELECT a.x, a.y, a.n, a.x + o.dx AS bx, a.y + o.dy AS by
        FROM fa_grid_v a
        CROSS JOIN (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                           (0,1),(1,-1),(1,0),(1,1)) AS o(dx, dy)) o) c
  JOIN fa_grid_v b ON b.x = c.bx AND b.y = c.by
  WHERE b.n > c.n) r WHERE rk = 1"""))

    # Each round references the previous iterate exactly ONCE (the
    # inflow join), so the loop chains lazily without per-round pins —
    # one job at the end, linear plan depth, the pinned grid/dirs
    # exchanges reused across rounds (r6 optimization; the prior
    # per-round checkpoint paid ~0.5 s of job latency per round).
    u = grid.selectExpr("x", "y", "CAST(1 AS BIGINT) AS u")
    for _ in range(int(rounds)):
        inflow = (dirs.join(u, ["x", "y"])
                  .groupBy(F.col("tx").alias("jx"),
                           F.col("ty").alias("jy"))
                  .agg(F.sum("u").cast("long").alias("m")))
        u = (grid.join(inflow,
                       (F.col("x") == F.col("jx"))
                       & (F.col("y") == F.col("jy")), "left")
             .selectExpr("x", "y",
                         "CAST(1 + COALESCE(m, 0) AS BIGINT) AS u"))
    ranked = (grid.join(u, ["x", "y"])
              .selectExpr("x", "y", "n", "u AS acc")
              .withColumn("rk", F.row_number().over(
                  Window.orderBy(F.desc("acc"), "x", "y"))
                  .cast("long")))
    return ranked.where(F.col("rk") <= int(k))


def cost_distance_base_cte(dialect: str, pts: str = "pts") -> str:
    """Chamfer 2-3 weighted adjacency over the occupied grid: the
    distance-transform base with edge weights (orthogonal 2, diagonal
    3 — the classic integer approximation of Euclidean cell distance,
    exact ratio 1.5 vs √2 ≈ 1.414)."""
    del dialect
    return f"""
dpx AS (
  SELECT CAST(FLOOR(lon) AS BIGINT) AS x,
         CAST(FLOOR(lat) AS BIGINT) AS y, is_src
  FROM {pts}),
dbase AS (
  SELECT x, y, CAST(MAX(is_src) AS BIGINT) AS is_src
  FROM dpx GROUP BY x, y),
doffs AS (SELECT * FROM (VALUES (-1,-1,3),(-1,0,2),(-1,1,3),(0,-1,2),
                                (0,1,2),(1,-1,3),(1,0,2),(1,1,3))
          AS t(dx, dy, w)),
dedges AS (
  SELECT b.x, b.y, n.x AS nx, n.y AS ny, CAST(o.w AS BIGINT) AS w
  FROM dbase b CROSS JOIN doffs o
  JOIN dbase n ON n.x = b.x + o.dx AND n.y = b.y + o.dy)"""


def cost_distance_oracle_sql(rounds: int, pts_cte: str,
                             pts: str = "pts") -> str:
    """DuckDB oracle: recursive min-plus walk over ≤``rounds``-edge
    paths (Bellman-Ford after R rounds computes exactly the min over
    ≤R-edge paths, so the two algorithms agree by construction).
    States carry the step count; UNION dedups (x, y, d, s)."""
    return f"""
WITH RECURSIVE {pts_cte},
{cost_distance_base_cte('duck', pts=pts).lstrip()},
walk AS (
  SELECT x, y, CAST(0 AS BIGINT) AS d, 0 AS s
  FROM dbase WHERE is_src = 1
  UNION
  SELECT e.nx, e.ny, w.d + e.w, w.s + 1
  FROM walk w JOIN dedges e ON e.x = w.x AND e.y = w.y
  WHERE w.s < {int(rounds)})
SELECT x, y, CAST(MIN(d) AS BIGINT) AS cost FROM walk GROUP BY x, y"""


def grid_cost_distance(points: DataFrame, rounds: int = 8,
                       pin: str | None = None,
                       slot: str | None = None,
                       local_iterate: bool | None = None) -> DataFrame:
    """Weighted (chamfer 2-3) cost distance: ``points(lon, lat,
    is_src)`` → ``(x, y, cost)`` = min path weight from any source
    within ``rounds`` edges through occupied cells — the
    accessibility/least-cost-path surface (grid_distance_transform's
    weighted sibling).

    Min-plus (Bellman-Ford) relaxation: the edge relation carries a
    ZERO-weight self-loop per occupied cell, so each round is ONE
    equi-join + min-aggregate referencing the previous iterate exactly
    once — the fixed round count is a single lazy plan (one job,
    linear depth, the pinned edge exchange reused across rounds)
    instead of per-round checkpoint jobs (r6 optimization: the prior
    delta-frontier loop paid ~0.6 s of job latency per round).
    ``cost_r(c) = min(cost_{r-1}(c), min_nbr cost_{r-1}(nbr) + w)``
    is the Bellman-Ford round, so after R rounds the result is the
    min over ≤R-edge paths — the oracle's definition, unchanged.
    Every relation is grid-bounded; no per-round driver action."""
    from pyspark.sql import functions as F

    from .pinning import fresh_pins

    spark = points.sparkSession
    pinf = fresh_pins(spark, slot, strategy=pin)
    v = "cdx_pts_in"
    points.selectExpr("lon", "lat",
                      "CAST(is_src AS BIGINT) AS is_src") \
        .createOrReplaceTempView(v)
    cte = cost_distance_base_cte(H.SPARK, pts=v)
    base_sql = cte[:cte.index("doffs AS (")].rstrip().rstrip(",")
    base = pinf(spark.sql("WITH " + base_sql.lstrip() +
                          "\nSELECT * FROM dbase"))
    st = _grid_local_stats(base)
    if _grid_local_ok(st) if local_iterate is None else local_iterate:
        # chamfer 2-3 weights through the same bounded driver path
        return _minplus_local_df(
            spark, base, st,
            [(-1, -1, 3), (-1, 0, 2), (-1, 1, 3), (0, -1, 2),
             (0, 1, 2), (1, -1, 3), (1, 0, 2), (1, 1, 3)],
            rounds, out_col="cost")
    base.createOrReplaceTempView("cdx_base")
    edges = pinf(spark.sql("""
WITH doffs AS (SELECT * FROM (VALUES (-1,-1,3),(-1,0,2),(-1,1,3),(0,-1,2),
                                     (0,1,2),(1,-1,3),(1,1,3),(1,0,2))
               AS t(dx, dy, w))
SELECT b.x, b.y, n.x AS nx, n.y AS ny, CAST(o.w AS BIGINT) AS w
FROM cdx_base b CROSS JOIN doffs o
JOIN cdx_base n ON n.x = b.x + o.dx AND n.y = b.y + o.dy
UNION ALL
SELECT x, y, x AS nx, y AS ny, CAST(0 AS BIGINT) AS w FROM cdx_base"""))

    dist = base.where("is_src = 1") \
        .selectExpr("x", "y", "CAST(0 AS BIGINT) AS cost")
    for _ in range(int(rounds)):
        dist = (dist.join(edges, ["x", "y"])
                .selectExpr("nx AS x", "ny AS y",
                            "CAST(cost + w AS BIGINT) AS cost")
                .groupBy("x", "y").agg(F.min("cost").alias("cost")))
    return dist


def kmeans_lloyd(points: DataFrame, k: int = 8, rounds: int = 3,
                 pin: str | None = None,
                 slot: str | None = None) -> DataFrame:
    """Planar Lloyd k-means over ``points(id, x, y)`` (non-negative
    integer coords) → per-cluster ``(ck, n, cx, cy, inertia_e6)`` with
    cx/cy still in the shifted domain — the runner twin of
    queries.q_kmeans (identical integer algebra: TakeOrdered (md5, id)
    init, exact BIGINT squared distances, min-ck argmin tiebreak,
    truncating-integer centroid means, empty clusters keep their
    centroid, inertia = assignment-time d2 DIV 1e6).

    Why a runner: the template's argmin join-back references each
    round's assignment twice, so CTE inlining re-evaluates the whole
    upstream ~2^rounds times.  Here the points pin once, and each
    round is ONE distributed job — broadcast k-row VALUES cross join →
    map-side struct-MIN argmin → per-cluster (Σx, Σy, count), which is
    ≤k rows and collects to the driver where the truncating-mean
    centroid update (``sx DIV n``, empty clusters keep their centroid
    — all operands non-negative, so python ``//`` IS the SQL DIV) runs
    in python and re-enters the next round's SQL as literals (r6: the
    k-row centroid relation was referenced twice per round, which
    forced two checkpoint jobs per round to stop exponential
    re-evaluation; a ≤k-row collect is bounded at any input scale)."""
    from .pinning import fresh_pins

    spark = points.sparkSession
    pinf = fresh_pins(spark, slot, strategy=pin)
    pts = pinf(points.selectExpr("id", "x", "y"))
    pts.createOrReplaceTempView("km_pts_v")
    cent = [(int(r.ck), int(r.x), int(r.y)) for r in spark.sql(f"""
SELECT ROW_NUMBER() OVER (ORDER BY h, id) AS ck, x, y
FROM (SELECT CAST(CONV(SUBSTRING(MD5(CAST(id AS STRING)), 1, 8), 16, 10)
             AS BIGINT) AS h, id, x, y
      FROM km_pts_v ORDER BY 1, 2 LIMIT {int(k)}) seeds""").collect()]

    def cent_values(cs):
        return ", ".join(
            f"({ck}, CAST({x} AS BIGINT), CAST({y} AS BIGINT))"
            for ck, x, y in cs)

    def argmin_sql(cs):
        # the lexicographic struct-MIN replaces the template's
        # MIN/join-back argmin — identical result (min d2, min ck
        # tie); unlike a per-point ROW_NUMBER window it partial-
        # aggregates map-side, so the k-way cross-join fan-out never
        # shuffles (guide §2.3)
        return f"""
  SELECT p.id, p.x, p.y,
         MIN(STRUCT((p.x - c.x) * (p.x - c.x)
                    + (p.y - c.y) * (p.y - c.y) AS d2, c.ck AS ck)) AS m
  FROM km_pts_v p
  CROSS JOIN (SELECT * FROM (VALUES {cent_values(cs)})
              AS t(ck, x, y)) c
  GROUP BY p.id, p.x, p.y"""

    assign_cent = cent
    for _ in range(int(rounds)):
        assign_cent = cent
        sums = {int(r.ck): r for r in spark.sql(f"""
SELECT a.m.ck AS ck,
       CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(a.y) AS BIGINT) AS sy,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ({argmin_sql(cent)}) a
GROUP BY a.m.ck""").collect()}
        cent = [(ck,
                 int(sums[ck].sx) // int(sums[ck].n) if ck in sums else x,
                 int(sums[ck].sy) // int(sums[ck].n) if ck in sums else y)
                for ck, x, y in cent]
    # final rollup: assignment against the centroids that ENTERED the
    # last round (the template's km_picked_v), centroid coords from
    # the post-update set (its km_cent_v) — same relations, one job
    return spark.sql(f"""
SELECT a.m.ck AS ck,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(c2.x) AS BIGINT) AS cx,
       CAST(MIN(c2.y) AS BIGINT) AS cy,
       CAST(SUM(a.m.d2 DIV 1000000) AS BIGINT) AS inertia_e6
FROM ({argmin_sql(assign_cent)}) a
JOIN (SELECT * FROM (VALUES {cent_values(cent)}) AS t(ck, x, y)) c2
  ON c2.ck = a.m.ck
GROUP BY a.m.ck""")
