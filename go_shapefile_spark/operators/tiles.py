"""Raster↔vector tile materialization (SURVEY.md §2.B E8).

* ``tile_counts`` — per-cell rollup of a point table (the "tiles" half of
  the headline metric).  Pure built-ins: map-side partial aggregation,
  one shuffle on the Morton ``cell`` key.
* ``rasterize_polygons`` — vector→raster: every (tile, polygon) cover
  entry becomes a T×T occupancy grid; full-cover tiles short-circuit to
  all-ones without touching geometry; partial tiles ray-cast pixel
  centers.  Runs distributed via ``mapInPandas`` over the cover.
* ``vectorize_raster`` — raster→vector: per-tile pixel rows are merged
  into maximal horizontal runs, then rectangles, via ``applyInPandas``
  per (cell, fid) group.  Output rectangles are exact covers of the
  input pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geom_np as G


def tile_counts(points: DataFrame, res: int, lon_col: str = "lon",
                lat_col: str = "lat", extra_aggs: list | None = None) -> DataFrame:
    """Per-cell counts (+optional aggs). One shuffle on ``cell``; AQE
    coalesces small partitions, skew-join handling is upstream."""
    aggs = [F.count(F.lit(1)).alias("n")] + list(extra_aggs or [])
    return (points
            .withColumn("cell", F.expr(C.cell_sql(lon_col, lat_col, res)))
            .groupBy("cell").agg(*aggs))


def rasterize_polygons(spark: SparkSession, polygons: list[dict], res: int,
                       tile_px: int = 16) -> DataFrame:
    """Vector→raster: (cell, fid, px, py) rows for occupied pixels.

    Cover classification reuses the spatial-join machinery: full tiles
    emit the whole T×T block without geometry work.
    """
    from .spatial_join import polygon_cell_cover

    cover_pdf = polygon_cell_cover(polygons, res)
    cover = spark.createDataFrame(cover_pdf)
    poly_bc = spark.sparkContext.broadcast(
        {p["fid"]: (p["coords"], np.asarray(p["ends"], dtype=np.int64))
         for p in polygons})

    def rasterize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = poly_bc.value
        t = tile_px
        gx, gy = np.meshgrid(np.arange(t), np.arange(t))
        gx, gy = gx.ravel(), gy.ravel()
        for pdf in batches:
            out_cell, out_fid, out_px, out_py = [], [], [], []
            for row in pdf.itertuples(index=False):
                lon0, lat0, lon1, lat1 = (float(v[0]) for v in
                                          C.cell_bounds_np(np.array([row.cell])))
                if row.full:
                    px, py = gx, gy
                else:
                    cx = lon0 + (gx + 0.5) * (lon1 - lon0) / t
                    cy = lat0 + (gy + 0.5) * (lat1 - lat0) / t
                    coords, ends = polys[int(row.fid)]
                    inside = G.point_in_polygon_chunked(cx, cy, coords, ends)
                    px, py = gx[inside], gy[inside]
                out_cell.append(np.full(len(px), row.cell, dtype=np.int64))
                out_fid.append(np.full(len(px), row.fid, dtype=np.int64))
                out_px.append(px.astype(np.int32))
                out_py.append(py.astype(np.int32))
            if out_cell:
                yield pd.DataFrame({
                    "cell": np.concatenate(out_cell),
                    "fid": np.concatenate(out_fid),
                    "px": np.concatenate(out_px),
                    "py": np.concatenate(out_py)})

    # repartition so tiles spread across tasks (cover rows are tiny; the
    # emitted pixel rows are the real volume)
    n_parts = max(8, cover.rdd.getNumPartitions())
    return cover.repartition(n_parts, "cell").mapInPandas(
        rasterize, schema="cell long, fid long, px int, py int")


def vectorize_raster(raster: DataFrame, tile_px: int = 16) -> DataFrame:
    """Raster→vector: per (cell, fid), merge pixels into maximal
    axis-aligned rectangles (greedy row-run merge).  Exact inverse of a
    rasterization in the sense that the union of rectangles equals the
    pixel set."""
    def to_rects(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell, fid = key
        occ = np.zeros((tile_px, tile_px), dtype=bool)
        occ[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = True
        rects = []  # (x0, y0, x1, y1) inclusive pixel coords
        open_runs: dict[tuple[int, int], list] = {}
        for y in range(tile_px):
            row = occ[y]
            runs = []
            x = 0
            while x < tile_px:
                if row[x]:
                    x0 = x
                    while x < tile_px and row[x]:
                        x += 1
                    runs.append((x0, x - 1))
                else:
                    x += 1
            next_open = {}
            for run in runs:
                if run in open_runs:
                    rect = open_runs.pop(run)
                    rect[3] = y
                    next_open[run] = rect
                else:
                    next_open[run] = [run[0], y, run[1], y]
            for rect in open_runs.values():
                rects.append(rect)
            open_runs = next_open
        rects.extend(open_runs.values())
        return pd.DataFrame({
            "cell": np.full(len(rects), cell, dtype=np.int64),
            "fid": np.full(len(rects), fid, dtype=np.int64),
            "x0": [r[0] for r in rects], "y0": [r[1] for r in rects],
            "x1": [r[2] for r in rects], "y1": [r[3] for r in rects]})

    return raster.groupBy("cell", "fid").applyInPandas(
        to_rects, schema="cell long, fid long, x0 int, y0 int, x1 int, y1 int")
