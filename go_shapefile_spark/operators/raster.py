"""Raster analysis over the sparse pixel relation (map-algebra family).

Extends the E8 tiling layer (reference scope: go-shapefile parses the
vector layers; the engine side rasterizes/vectorizes them —
shapefile.go:1-40 never needed map algebra, this is engine-side
capability a 100-TB imagery/telemetry pipeline does) with three
classic raster operators, all expressed on the SPARSE ``(x, y, v)``
pixel relation — absent pixel == 0 — so they scale with *occupied*
pixels, never with the grid extent:

* ``blur5_body`` — 5×5 binomial focal convolution.  Two forms from one
  weight table: the **separable two-pass** form (a 5-way fan-out in x,
  aggregate, then 5-way in y — 2 shuffles, O(2k) kernel rows) and the
  **direct 2-D** form (25-way fan-out, 1 shuffle, O(k²) kernel rows).
  Both are exact integer sums of the same products, so they agree
  bit-for-bit — the gate runs separable on Spark against the direct
  form on DuckDB, which *proves* the separability algebra instead of
  assuming it.  At 100 TB the separable form wins once k²·rows
  dominates the extra shuffle (k=5: 10 vs 25 kernel rows; k=33: 66 vs
  1089) — the same reason every image library separates its Gaussians.
* ``marching_squares_body`` — iso-contour extraction (threshold τ) via
  the midpoint marching-squares rule.  One shuffle: every hot pixel
  splats its ≤4 incident 2×2 blocks carrying its corner bit, the block
  case index is the SUM of present hot-corner bits (absent corners are
  cold by construction), and segments come from a 16-case inline
  lookup joined on the case.  Coordinates are DOUBLED integers so edge
  midpoints stay exact BIGINTs.  Saddle cases (5, 10) use the fixed
  "separate the diagonal hot corners" convention, documented in the
  lookup.  Because the hot set is finite, every contour is a closed
  loop — every segment endpoint has even degree (property-tested).
* ``slope_aspect_body`` — Horn 3×3 gradient stencil (the standard
  slope/aspect estimator for DEM rasters).  Splat-transposed: each
  source pixel contributes z·w to the 8 neighbouring stencils in ONE
  fan-out + ONE aggregation, instead of 8 self-joins; a center marker
  restricts output to pixels that exist in the raster.  Gradient
  numerators are exact BIGINTs; aspect is classified into 8 octants by
  pure integer comparisons and slope into power-of-4 magnitude classes
  by a CASE ladder — no floats anywhere, so the dual-engine compare is
  bit-stable and the int64 ANSI ceiling is never approached
  (|numerator| ≤ 4·max_z).

All three are dialect-free shared templates (same SQL runs on Spark
and DuckDB): the arithmetic is integer +,*, CASE, GROUP BY only.
"""

from __future__ import annotations

# 1-D binomial kernel B4 = C(4, i): the discrete Gaussian of choice for
# small focal blurs.  The 2-D kernel is the outer product (sum 256).
_B5 = (1, 4, 6, 4, 1)


def _values_rows(rows) -> str:
    return ",".join("(" + ",".join(str(v) for v in r) + ")" for r in rows)


def pixel_grid_cte(pts: str = "pts", ppd: int = 1) -> str:
    """``(x, y, n)`` occupied-pixel relation from a point table —
    identical floor-grid binning to ``tiles.heatmap_body`` (hagg)."""
    return f"""
rpx AS (
  SELECT CAST(FLOOR(lon * {int(ppd)}) AS BIGINT) AS x,
         CAST(FLOOR(lat * {int(ppd)}) AS BIGINT) AS y
  FROM {pts}),
rgrid AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS v FROM rpx GROUP BY x, y)"""


def blur5_body(form: str, grid: str = "rgrid",
               out: str | None = None) -> str:
    """5×5 binomial blur over ``{grid}(x, y, v)`` → ``(x, y, v)``.

    ``form='separable'`` — two cascaded 1-D passes (the scale path);
    ``form='direct'``   — one 25-way 2-D splat (the oracle twin).
    Exact-integer equal by the separability of the outer product:
    Σ_dx Σ_dy wx(dx)·wy(dy)·v(x−dx, y−dy) groups either way.

    With ``out`` the final select is wrapped as a named CTE so
    downstream raster operators (contours, slope) can chain on it.
    """
    k1 = _values_rows((d - 2, w) for d, w in enumerate(_B5))
    if form == "separable":
        prefix = f"""
bk1 AS (SELECT * FROM (VALUES {k1}) AS t(d, w)),
bx AS (
  SELECT g.x + k.d AS x, g.y AS y, CAST(SUM(k.w * g.v) AS BIGINT) AS v
  FROM {grid} g CROSS JOIN bk1 k GROUP BY g.x + k.d, g.y)"""
        sel = f"""SELECT b.x AS x, b.y + k.d AS y,
       CAST(SUM(k.w * b.v) AS BIGINT) AS v
FROM bx b CROSS JOIN bk1 k GROUP BY b.x, b.y + k.d"""
    elif form == "direct":
        k2 = _values_rows(
            (dx - 2, dy - 2, wx * wy)
            for dx, wx in enumerate(_B5) for dy, wy in enumerate(_B5))
        prefix = f"""
bk2 AS (SELECT * FROM (VALUES {k2}) AS t(dx, dy, w))"""
        sel = f"""SELECT g.x + k.dx AS x, g.y + k.dy AS y,
       CAST(SUM(k.w * g.v) AS BIGINT) AS v
FROM {grid} g CROSS JOIN bk2 k GROUP BY g.x + k.dx, g.y + k.dy"""
    else:
        raise ValueError(f"unknown blur form: {form!r}")
    if out is None:
        return f"{prefix}\n{sel}"
    return f"{prefix},\n{out} AS (\n{sel})"


# Midpoint marching-squares lookup.  Corners of block (bx, by):
#   c0=(bx,by) bit 1, c1=(bx+1,by) bit 2, c2=(bx+1,by+1) bit 4,
#   c3=(bx,by+1) bit 8.  Edge midpoints in DOUBLED local coords:
#   E01=(1,0)  E12=(2,1)  E23=(1,2)  E30=(0,1).
# A segment joins the two crossed edges; saddles 5/10 emit two
# segments, each hugging one of the diagonal hot corners.
_MS_SEGMENTS = {
    1:  [((1, 0), (0, 1))],
    2:  [((1, 0), (2, 1))],
    3:  [((0, 1), (2, 1))],
    4:  [((2, 1), (1, 2))],
    5:  [((1, 0), (0, 1)), ((2, 1), (1, 2))],
    6:  [((1, 0), (1, 2))],
    7:  [((0, 1), (1, 2))],
    8:  [((1, 2), (0, 1))],
    9:  [((1, 0), (1, 2))],
    10: [((1, 0), (2, 1)), ((1, 2), (0, 1))],
    11: [((2, 1), (1, 2))],
    12: [((2, 1), (0, 1))],
    13: [((1, 0), (2, 1))],
    14: [((1, 0), (0, 1))],
}


def marching_squares_body(tau: int, grid: str = "rgrid") -> str:
    """Iso-contour segments of ``{grid}(x, y, v)`` at threshold ``tau``
    → ``(x0d, y0d, x1d, y1d)`` in doubled pixel coordinates.

    One shuffle: hot pixels splat corner bits onto their ≤4 incident
    blocks; case = Σ bits (cold/absent corners contribute nothing);
    segments come from the 16-case lookup join.  Blocks where no
    corner is hot never materialize — the relation scales with the
    contour length, not the grid.
    """
    corners = _values_rows([(0, 0, 1), (-1, 0, 2), (-1, -1, 4), (0, -1, 8)])
    segs = _values_rows(
        (case, i, p[0], p[1], q[0], q[1])
        for case, pairs in sorted(_MS_SEGMENTS.items())
        for i, (p, q) in enumerate(pairs))
    return f"""
mhot AS (
  SELECT x, y FROM {grid} WHERE v >= {int(tau)}),
mcorn AS (SELECT * FROM (VALUES {corners}) AS t(ox, oy, bit)),
mcase AS (
  SELECT h.x + c.ox AS bx, h.y + c.oy AS by,
         CAST(SUM(c.bit) AS BIGINT) AS cs
  FROM mhot h CROSS JOIN mcorn c
  GROUP BY h.x + c.ox, h.y + c.oy),
mseg AS (SELECT * FROM (VALUES {segs})
         AS t(cs, seg, lx0, ly0, lx1, ly1))
SELECT b.bx * 2 + s.lx0 AS x0d, b.by * 2 + s.ly0 AS y0d,
       b.bx * 2 + s.lx1 AS x1d, b.by * 2 + s.ly1 AS y1d
FROM mcase b JOIN mseg s ON b.cs = s.cs"""


def horn_gradient_cte(grid: str = "rgrid") -> str:
    """Horn-stencil gradient numerators over ``{grid}(x, y, v)`` —
    emits ``hgrad(x, y, gx, gy, ctr)`` (ctr = 1 iff the pixel exists
    in the input raster).  One splat fan-out + one aggregation; shared
    by the slope/aspect classifier and the hillshade renderer."""
    rows = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            wx = ox * (2 if oy == 0 else 1)
            wy = oy * (2 if ox == 0 else 1)
            rows.append((ox, oy, wx, wy, 1 if ox == 0 and oy == 0 else 0))
    stencil = _values_rows(rows)
    return f"""
hst AS (SELECT * FROM (VALUES {stencil}) AS t(ox, oy, wx, wy, ctr)),
hgrad AS (
  SELECT g.x - s.ox AS x, g.y - s.oy AS y,
         CAST(SUM(s.wx * g.v) AS BIGINT) AS gx,
         CAST(SUM(s.wy * g.v) AS BIGINT) AS gy,
         CAST(SUM(s.ctr) AS BIGINT) AS ctr
  FROM {grid} g CROSS JOIN hst s
  GROUP BY g.x - s.ox, g.y - s.oy)"""


def slope_aspect_body(grid: str = "rgrid") -> str:
    """Horn-stencil slope/aspect over ``{grid}(x, y, v)`` →
    ``(aspect_bin, slope_class, n_pixels)``.

    dz/dx numerator = (z_NE + 2·z_E + z_SE) − (z_NW + 2·z_W + z_SW)
    (Horn 1981, the estimator every GIS ships); dz/dy likewise.
    Transposed to a splat: source at offset (ox, oy) from the target
    carries wx = ox·(2−|oy|‖…)  — concretely ox·(oy=0 ? 2 : 1) — and
    wy = oy·(ox=0 ? 2 : 1); the (0,0) row carries the center marker.
    Absent neighbours are zero (the sparse-raster convention).  Aspect
    octant 0..7 counts counter-clockwise from +x by integer
    comparisons on (gx, gy); flat cells (gx=gy=0) bin to −1.  Slope
    class is a power-of-4 ladder on max(|gx|, |gy|).
    """
    return f"""{horn_gradient_cte(grid)},
hcls AS (
  SELECT CASE
           WHEN gx = 0 AND gy = 0 THEN -1
           WHEN gy >= 0 AND gx > 0 AND gx >= gy THEN 0
           WHEN gy > 0 AND gy > gx AND gx >= 0 THEN 1
           WHEN gy > 0 AND gx < 0 AND -gx <= gy THEN 2
           WHEN gy >= 0 AND gx < 0 AND -gx > gy THEN 3
           WHEN gy < 0 AND gx < 0 AND gx <= gy THEN 4
           WHEN gy < 0 AND gy < gx AND gx <= 0 THEN 5
           WHEN gy < 0 AND gx > 0 AND gx < -gy THEN 6
           ELSE 7
         END AS aspect_bin,
         CASE
           WHEN gx = 0 AND gy = 0 THEN 0
           WHEN GREATEST(ABS(gx), ABS(gy)) < 4 THEN 1
           WHEN GREATEST(ABS(gx), ABS(gy)) < 16 THEN 2
           WHEN GREATEST(ABS(gx), ABS(gy)) < 64 THEN 3
           WHEN GREATEST(ABS(gx), ABS(gy)) < 256 THEN 4
           WHEN GREATEST(ABS(gx), ABS(gy)) < 1024 THEN 5
           ELSE 6
         END AS slope_class
  FROM hgrad WHERE ctr = 1)
SELECT aspect_bin, slope_class, CAST(COUNT(*) AS BIGINT) AS n_pixels
FROM hcls GROUP BY aspect_bin, slope_class"""
