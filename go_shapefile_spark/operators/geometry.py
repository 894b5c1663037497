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


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Douglas–Peucker keep-mask over one part (iterative, numpy).

    Distance metric is point-to-SEGMENT (t clamped to [0,1]), not
    point-to-infinite-line — robust when the two anchors coincide,
    which is exactly the closed-ring case: rings arrive closed
    (first == last), the first split degenerates to "farthest point
    from the shared anchor", and every later span is a normal segment,
    so ONE code path serves rings and open polylines.  Guarantee (the
    property tests assert it): every dropped vertex lies within
    ``eps`` of the kept segment spanning it.
    """
    n = x.size
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    e2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        px, py = x[i + 1:j] - x[i], y[i + 1:j] - y[i]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d2 = px * px + py * py
        else:
            t = np.clip((px * dx + py * dy) / l2, 0.0, 1.0)
            d2 = (px - t * dx) ** 2 + (py - t * dy) ** 2
        k = int(np.argmax(d2))
        if d2[k] > e2:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_feature(shape_type: int, layout: str | None, coords, ends,
                     rings, eps: float):
    """Simplified (coords, ends, rings) for one feature, or ``None``
    when the whole feature collapses below tolerance.

    Polygons: each ring is simplified independently; a ring that keeps
    fewer than 4 points (under 3 distinct vertices) or simplifies to
    zero area is dropped — it is smaller than the tolerance.  Dropping
    a polygon's OUTER ring drops its holes too (a hole without its
    outer would re-enter the winding decomposition as a bogus island).
    Polylines: endpoints are always kept, parts never drop.  Dropped
    rings void the within-``eps`` guarantee only for their own points.
    """
    st = int(shape_type)
    stride = STRIDES.get(layout or "XY", 2)
    coords = np.asarray(coords, dtype=np.float64)
    pts = coords.reshape(-1, stride)
    if st in _POLYLINES:
        groups = [[e] for e in ends]          # each part stands alone
        closed = False
    elif st in _POLYGONS:
        groups, i = [], 0
        for n_rings in rings:
            groups.append(list(ends[i:i + int(n_rings)]))
            i += int(n_rings)
        closed = True
    else:
        raise ValueError(f"simplify: unsupported shape type {st}")

    kept_parts: list[np.ndarray] = []
    new_ends: list[int] = []
    new_rings: list[int] = []
    pos = 0
    for group in groups:
        group_parts: list[np.ndarray] = []
        outer_dropped = False
        for ring_idx, end in enumerate(group):
            prev = pos
            pos = end
            if outer_dropped:
                continue
            x = coords[prev:end:stride]
            y = coords[prev + 1:end:stride]
            m = dp_keep_mask(x, y, eps)
            if closed:
                xs, ys = x[m], y[m]
                degenerate = (m.sum() < 4 or
                              (xs[:-1] * ys[1:] - xs[1:] * ys[:-1]).sum() == 0.0)
                if degenerate:
                    if ring_idx == 0:
                        outer_dropped = True
                    continue
            group_parts.append(pts[prev // stride:end // stride][m])
        if not group_parts:
            continue
        for part in group_parts:
            kept_parts.append(part)
            new_ends.append((new_ends[-1] if new_ends else 0)
                            + part.size)
        if closed:
            new_rings.append(len(group_parts))
    if not kept_parts:
        return None
    return (np.concatenate(kept_parts).ravel(), new_ends, new_rings)


def simplify_features(features: DataFrame, eps: float) -> DataFrame:
    """Douglas–Peucker simplification of a shapefile DataFrame — the
    ST_Simplify analog (``fid, shape_type, geometry`` out, same
    geometry struct as the source, so the result composes with
    :func:`geom_measures`, the GeoJSON exporter, and the writer).

    Features that collapse entirely below tolerance are filtered out.
    Per-feature kernel in one Arrow-batched pass: no shuffle, no
    driver state — parallel by input split at any corpus size.
    """
    if eps < 0:
        raise ValueError("eps must be non-negative")
    cols = features.select("fid", "shape_type", "geometry.layout",
                           "geometry.coords", "geometry.ends",
                           "geometry.rings")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                simp = simplify_feature(r.shape_type, r.layout, r.coords,
                                        r.ends, r.rings, eps)
                if simp is None:
                    continue
                c, e, rg = simp
                rows.append((r.fid, r.shape_type,
                             {"layout": r.layout, "coords": c.tolist(),
                              "ends": e, "rings": rg}))
            yield pd.DataFrame(
                rows, columns=["fid", "shape_type", "geometry"])

    return cols.mapInPandas(
        run, schema="fid long, shape_type int, geometry struct<"
                    "layout:string, coords:array<double>, "
                    "ends:array<int>, rings:array<int>>")


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
