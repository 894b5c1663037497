"""Planar geometry measures over the flat-coordinate geometry model.

Area / perimeter / centroid per feature — the ST_Area / ST_Length /
ST_Centroid analog the engine's analytic layer needs (the reference
parses geometry but computes no measures; its winding primitive is
shp.go:246-256, mirrored by shapefile_core._double_area).

Measures are per-geometry kernels (like decode and the numpy PIP): each
feature is independent, so the distributed shape is one Arrow-batched
pass with no shuffle — numpy does the per-ring arithmetic vectorized.
Shapefile winding (outer rings clockwise, holes counter-clockwise,
shapefile_core.make_multipolygon_endss) means the standard CCW-positive
shoelace sum is negative for solid area; holes carry the opposite sign
and subtract automatically, so ``area = -Σ signed2 / 2`` over ALL rings
of a feature and the ring→polygon grouping (``rings``) never needs to
be consulted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.shapefile_core import (SHAPE_TYPE_POLYGON,
                                      SHAPE_TYPE_POLYGON_M,
                                      SHAPE_TYPE_POLYGON_Z,
                                      SHAPE_TYPE_POLYLINE,
                                      SHAPE_TYPE_POLYLINE_M,
                                      SHAPE_TYPE_POLYLINE_Z, STRIDES)

_POLYGONS = {SHAPE_TYPE_POLYGON, SHAPE_TYPE_POLYGON_M, SHAPE_TYPE_POLYGON_Z}
_POLYLINES = {SHAPE_TYPE_POLYLINE, SHAPE_TYPE_POLYLINE_M,
              SHAPE_TYPE_POLYLINE_Z}


def part_measures(coords: np.ndarray, ends, stride: int = 2):
    """Per-part (signed2, length, cx6, cy6) from the flat coords array.

    ``signed2`` is twice the signed shoelace area (CCW positive);
    ``cx6``/``cy6`` are the centroid numerators ``Σ (x_i+x_{i+1})·cross``
    (divide by ``3·Σ signed2`` for the area-weighted centroid — ring
    winding signs cancel in the ratio).  Rings arrive explicitly closed
    (first == last, per the spec; the golden suite guards the parser),
    so consecutive pairs already cover the full cycle.
    """
    out = []
    prev = 0
    for end in ends:
        x = coords[prev:end:stride]
        y = coords[prev + 1:end:stride]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        out.append((float(cross.sum()),
                    float(np.hypot(np.diff(x), np.diff(y)).sum()),
                    float(((x[:-1] + x[1:]) * cross).sum()),
                    float(((y[:-1] + y[1:]) * cross).sum())))
        prev = end
    return out


def feature_measures(shape_type: int, layout: str | None, coords,
                     ends) -> tuple[float, float, float, float]:
    """(area, length, cx, cy) for one feature.

    Polygons: positive planar area under shapefile winding, boundary
    length including holes, area-weighted centroid (vertex mean for
    degenerate zero-area features).  Polylines: area 0, total length,
    vertex mean.  Other shape types are rejected — point measures are
    trivially the point and a silent 0 would mask a caller bug.
    """
    st = int(shape_type)
    stride = STRIDES.get(layout or "XY", 2)
    coords = np.asarray(coords, dtype=np.float64)
    if st in _POLYLINES:
        parts = part_measures(coords, ends, stride)
        length = sum(p[1] for p in parts)
        return 0.0, length, float(coords[0::stride].mean()), \
            float(coords[1::stride].mean())
    if st not in _POLYGONS:
        raise ValueError(f"measures: unsupported shape type {st}")
    parts = part_measures(coords, ends, stride)
    signed2 = sum(p[0] for p in parts)
    length = sum(p[1] for p in parts)
    if signed2 == 0.0:
        return 0.0, length, float(coords[0::stride].mean()), \
            float(coords[1::stride].mean())
    cx = sum(p[2] for p in parts) / (3.0 * signed2)
    cy = sum(p[3] for p in parts) / (3.0 * signed2)
    return -signed2 / 2.0, length, cx, cy


def geom_measures(features: DataFrame) -> DataFrame:
    """(fid, area, perimeter, cx, cy) per feature of a shapefile
    DataFrame (the ``read_shapefile_df`` schema).

    One Arrow-batched pass, no shuffle, no driver state — the plan shape
    is a scan followed by a stateless projection regardless of corpus
    size, so a 10^9-feature table parallelizes by input split alone.
    """
    cols = features.select("fid", "shape_type", "geometry.layout",
                           "geometry.coords", "geometry.ends")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a, ln, cx, cy = feature_measures(
                    r.shape_type, r.layout, r.coords, r.ends)
                rows.append((r.fid, a, ln, cx, cy))
            yield pd.DataFrame(rows, columns=["fid", "area", "perimeter",
                                              "cx", "cy"])

    return cols.mapInPandas(
        run, schema="fid long, area double, perimeter double, "
                    "cx double, cy double")
