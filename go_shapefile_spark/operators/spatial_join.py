"""Spatial join: points × polygons via broadcast cell-cover + PIP refine.

The engine pattern mandated by the north rule (SURVEY.md §2.B E4-E6):

1. **Cell cover** (driver/small side): every polygon is decomposed at
   resolution ``r`` into ``full`` cells (entirely inside) and ``partial``
   cells (boundary-crossing).  The polygon side is small (e.g. 177
   Natural Earth countries); the cover is a few thousand rows.
2. **Broadcast equi-join**: the huge point side gets a ``cell`` column
   (pure JVM-side expression — no Python) and equi-joins the broadcast
   cover on ``cell``.  Catalyst picks BroadcastHashJoin: no shuffle of
   the big side, the geometry theta-join became an equi-join.
3. **PIP refinement**: only rows landing in ``partial`` cells run the
   vectorized ray-cast (Arrow-batched pandas UDF); ``full``-cell rows
   skip geometry entirely.  At sane resolutions >90% of matched area is
   full cells, so the Python path touches a small fraction of rows.

Scale notes: the cover is O(polygons · cells/polygon) and broadcast once;
the big side is never shuffled; skew from hot cells only matters for
downstream aggregations (see operators/skew.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geom_np as G


def polygons_from_features(features_rows) -> list[dict]:
    """Collected ``features`` rows (fid, geometry) → polygon dicts."""
    polys = []
    for row in features_rows:
        g = row.geometry
        stride = {"XY": 2, "XYM": 3, "XYZM": 4}[g.layout]
        coords = np.asarray(g.coords, dtype=np.float64)
        if stride != 2:
            # planar ops use XY only
            xy = np.empty(2 * (len(coords) // stride))
            xy[0::2] = coords[0::stride]
            xy[1::2] = coords[1::stride]
            scale = 2 / stride
            ends = [int(e * scale) for e in g.ends]
            coords = xy
        else:
            ends = [int(e) for e in g.ends]
        polys.append({"fid": row.fid, "coords": coords, "ends": ends})
    return polys


def polygon_cell_cover(polygons: list[dict], res: int,
                       edge_chunk: int = 512) -> pd.DataFrame:
    """Classify grid cells at ``res`` against each polygon.

    Soundness: a cell whose rectangle overlaps NO edge bbox is uniformly
    inside or outside (no boundary crosses it), so a single center-PIP
    classifies it (``full``/drop).  Cells overlapping any edge bbox are
    conservatively ``partial`` — refinement stays correct, just does a
    little more PIP work.

    Returns pandas DataFrame (cell:int64, fid:int64, full:bool).
    """
    n = 1 << res
    w, h = 360.0 / n, 180.0 / n
    out_cells, out_fids, out_full = [], [], []
    for poly in polygons:
        coords, ends, fid = poly["coords"], poly["ends"], poly["fid"]
        x0, y0, x1, y1 = G.polygon_bbox(coords)
        ix0, iy0 = C.xy_np(np.array([x0]), np.array([y0]), res)
        ix1, iy1 = C.xy_np(np.array([x1]), np.array([y1]), res)
        ixs = np.arange(ix0[0], ix1[0] + 1)
        iys = np.arange(iy0[0], iy1[0] + 1)
        gx, gy = np.meshgrid(ixs, iys)
        gx, gy = gx.ravel(), gy.ravel()
        lon0 = -180.0 + gx * w
        lat0 = -90.0 + gy * h

        exmin, eymin, exmax, eymax = G.edge_bboxes(coords, ends)
        partial = np.zeros(gx.shape, dtype=bool)
        for s in range(0, len(exmin), edge_chunk):
            e = slice(s, s + edge_chunk)
            hit = ((exmin[None, e] < lon0[:, None] + w) &
                   (exmax[None, e] > lon0[:, None]) &
                   (eymin[None, e] < lat0[:, None] + h) &
                   (eymax[None, e] > lat0[:, None]))
            partial |= hit.any(axis=1)

        interior = ~partial
        if interior.any():
            cx = lon0[interior] + w / 2
            cy = lat0[interior] + h / 2
            inside = G.point_in_polygon_chunked(cx, cy, coords, ends)
        else:
            inside = np.zeros(0, dtype=bool)

        cell_ids_partial = C.cell_from_xy(gx[partial], gy[partial], res)
        cell_ids_full = C.cell_from_xy(gx[interior][inside], gy[interior][inside], res)
        out_cells.append(np.concatenate([cell_ids_full, cell_ids_partial]))
        out_fids.append(np.full(len(cell_ids_full) + len(cell_ids_partial), fid,
                                dtype=np.int64))
        out_full.append(np.concatenate([np.ones(len(cell_ids_full), dtype=bool),
                                        np.zeros(len(cell_ids_partial), dtype=bool)]))
    if not out_cells:
        return pd.DataFrame({"cell": np.array([], dtype=np.int64),
                             "fid": np.array([], dtype=np.int64),
                             "full": np.array([], dtype=bool)})
    return pd.DataFrame({"cell": np.concatenate(out_cells),
                         "fid": np.concatenate(out_fids),
                         "full": np.concatenate(out_full)})


def spatial_join(spark: SparkSession, points: DataFrame, polygons: list[dict],
                 res: int, lon_col: str = "lon", lat_col: str = "lat",
                 keep_cols: list[str] | None = None) -> DataFrame:
    """points ⋈ polygons → rows (point cols..., polygon_fid).

    Implements E6: broadcast cell-cover equi-join + E5 PIP refinement on
    partial cells only.  The point side is only touched by JVM
    expressions until the (small) partial subset.
    """
    cover_pdf = polygon_cell_cover(polygons, res)
    cover = spark.createDataFrame(cover_pdf).withColumnRenamed("fid", "polygon_fid")

    pts = points.withColumn("cell", F.expr(C.cell_sql(lon_col, lat_col, res)))
    joined = pts.join(F.broadcast(cover), "cell")

    full_rows = joined.where(F.col("full")).drop("full")
    partial_rows = joined.where(~F.col("full")).drop("full")

    poly_bc = spark.sparkContext.broadcast(
        {p["fid"]: (p["coords"], np.asarray(p["ends"], dtype=np.int64))
         for p in polygons})
    schema = full_rows.schema

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = poly_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for fid, grp in pdf.groupby("polygon_fid"):
                coords, ends = polys[int(fid)]
                keep[grp.index.to_numpy()] = G.point_in_polygon_chunked(
                    grp[lon_col].to_numpy(), grp[lat_col].to_numpy(), coords, ends)
            yield pdf[keep]

    refined = partial_rows.mapInPandas(refine, schema=schema)
    out = full_rows.unionByName(refined)
    if keep_cols is not None:
        out = out.select(*keep_cols)
    return out


def spatial_join_bruteforce(points_pdf: pd.DataFrame, polygons: list[dict],
                            lon_col: str = "lon", lat_col: str = "lat") -> pd.DataFrame:
    """Tiny-scale PIP oracle (SURVEY.md §5): every point against every
    polygon, pure numpy — used by tests to validate the cell-cover path."""
    rows = []
    px = points_pdf[lon_col].to_numpy()
    py = points_pdf[lat_col].to_numpy()
    for poly in polygons:
        inside = G.point_in_polygon_chunked(px, py, poly["coords"], poly["ends"])
        sub = points_pdf[inside].copy()
        sub["polygon_fid"] = poly["fid"]
        rows.append(sub)
    if not rows:
        return points_pdf.iloc[0:0].assign(polygon_fid=np.int64(0))
    return pd.concat(rows, ignore_index=True)
