"""Shapefile batch source for Spark: component files → ``features`` DataFrame.

Spark-first restatement of the reference's two read paths
(reference shapefile.go:86-205 eager, scanner.go:297-525 streaming):

* The driver does a tiny header pre-pass (SHX index + DBF field
  descriptors + CPG/PRJ, all ≤ a few KB of reads) — the analog of
  ``NewScanner``'s header parse (scanner.go:332-375).
* The SHX index gives every record's byte range, so the planner assigns
  contiguous record ranges to tasks which seek directly into .shp/.dbf —
  the distributed analog of ``Scanner.Discard`` (scanner.go:458-525:
  random access into SHP is only possible through SHX).  A .shp without
  .shx is not splittable and gets a single sequential task, mirroring
  scanner.go:511-513.
* Executors parse their byte ranges with the vectorized parsers in
  ``shapefile_core`` inside ``mapInPandas`` — records flow through Arrow
  batches, never fully materialized per executor.
* Zip bundles (.zip/.shz/.exe) are not splittable → one task ingests and
  re-emits as ``features`` rows (fine for the polygon side; the large
  side of every join in this engine is parquet/Iceberg and splittable).

The 3-way positional zip of SHP⋈SHX⋈DBF (scanner.go:400-451) happens
inside each task by batch index; the record-count consistency check
(shapefile.go:192-196) is enforced at plan time from SHX/DBF header
counts and re-checked per split.
"""

from __future__ import annotations

import math
import posixpath
from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fsio
from . import shapefile_core as core

GEOMETRY_TYPE = T.StructType([
    T.StructField("layout", T.StringType()),
    T.StructField("coords", T.ArrayType(T.DoubleType())),
    T.StructField("ends", T.ArrayType(T.IntegerType())),
    T.StructField("rings", T.ArrayType(T.IntegerType())),
])
BBOX_TYPE = T.StructType([
    T.StructField("xmin", T.DoubleType()), T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()), T.StructField("ymax", T.DoubleType()),
    T.StructField("zmin", T.DoubleType()), T.StructField("zmax", T.DoubleType()),
    T.StructField("mmin", T.DoubleType()), T.StructField("mmax", T.DoubleType()),
])


def _dbf_spark_type(f: core.DBFField, decimal_count: int) -> T.DataType:
    """Column-level type decision for DBF fields (SURVEY.md §1.3).

    The reference types N fields per *value* ('.' → float64 else int,
    dbf.go:365-382); Spark columns are monotyped, so we decide from the
    field descriptor's decimal count — matching the golden fixtures'
    mixed long/double rows (shapefile_test.go:242-254).
    """
    return {
        "C": T.StringType(), "M": T.StringType(), "D": T.DateType(),
        "L": T.BooleanType(), "F": T.DoubleType(),
    }.get(f.type) or (T.DoubleType() if decimal_count > 0 else T.LongType())


@dataclass
class ShapefilePlan:
    """Driver-side plan: everything a task needs to parse its split.

    ``path`` may be a bare local path or any pyarrow-fs URI
    (file://, s3://, hdfs://, gs://) — tasks re-resolve it via
    :mod:`fsio`, so the plan pickles as plain strings/arrays.
    ``has_shp``/``has_dbf`` are captured at plan time so tasks never
    issue existence probes (an extra HEAD per task on object stores).
    """
    path: str                    # file path or URI (basename or zip)
    is_zip: bool
    basename: str | None
    n_records: int
    shape_type: int
    header_bounds: tuple | None
    crs_wkt: str | None
    charset: str | None
    dbf_fields: list[tuple[str, str, int, int]]   # (name, type, length, decimals)
    dbf_header_size: int
    dbf_record_size: int
    shx_offsets: np.ndarray | None
    shx_lengths: np.ndarray | None
    shp_options: dict | None
    dbf_options: dict | None
    has_shp: bool = False
    has_dbf: bool = False


def plan_shapefile(path: str, options: dict | None = None,
                   basename: str | None = None) -> ShapefilePlan:
    """Header pre-pass on the driver. Reads only headers + the SHX index."""
    options = options or {}
    is_zip = path.lower().endswith((".zip", ".shz", ".exe"))
    charset = None
    crs = None
    dbf_fields: list[tuple[str, str, int, int]] = []
    dbf_header_size = dbf_record_size = 0
    shx_offsets = shx_lengths = None
    n_dbf = n_shx = None
    shape_type = 0
    header_bounds = None
    has_shp = has_dbf = False

    if is_zip:
        members = core.zip_members(fsio.open_seekable(path))
        if basename is not None:
            members = {ext: (n, d) for ext, (n, d) in members.items()
                       if n.rsplit("/", 1)[-1].rsplit(".", 1)[0] == basename}
        if "cpg" in members:
            charset = core.parse_cpg(members["cpg"][1])
        if "prj" in members:
            crs = core.parse_prj(members["prj"][1])
        if "dbf" in members:
            hdr, fields, pos = core.parse_dbf_fields(members["dbf"][1])
            raw = members["dbf"][1]
            dbf_fields = _fields_with_decimals(raw, fields)
            dbf_header_size, dbf_record_size, n_dbf = pos, hdr.record_size, hdr.records
            has_dbf = True
        if "shx" in members:
            shx = core.parse_shx(members["shx"][1])
            shx_offsets, shx_lengths = shx.offsets, shx.content_lengths
            n_shx = len(shx.offsets)
            shape_type, header_bounds = shx.header.shape_type, shx.header.bounds
        if "shp" in members:
            data = members["shp"][1]
            h = core.parse_shx_header(data[:100], len(data))
            shape_type, header_bounds = h.shape_type, h.bounds
            has_shp = True
    else:
        def read_head(ext: str, nbytes: int | None = None) -> bytes | None:
            p = f"{path}.{ext}"
            if not fsio.exists(p):
                return None
            return fsio.read_bytes(p, 0, nbytes)

        cpg = read_head("cpg")
        if cpg is not None:
            charset = core.parse_cpg(cpg)
        prj = read_head("prj")
        if prj is not None:
            crs = core.parse_prj(prj)
        shx_bytes = read_head("shx")
        if shx_bytes is not None:
            shx = core.parse_shx(shx_bytes)
            shx_offsets, shx_lengths = shx.offsets, shx.content_lengths
            n_shx = len(shx.offsets)
            shape_type, header_bounds = shx.header.shape_type, shx.header.bounds
        dbf_head = read_head("dbf", 65536)
        if dbf_head is not None:
            hdr, fields, pos = core.parse_dbf_fields(dbf_head)
            dbf_fields = _fields_with_decimals(dbf_head, fields)
            dbf_header_size, dbf_record_size, n_dbf = pos, hdr.record_size, hdr.records
            has_dbf = True
        shp_path = f"{path}.shp"
        if fsio.exists(shp_path):
            head = fsio.read_bytes(shp_path, 0, 100)
            h = core.parse_shx_header(head, fsio.getsize(shp_path))
            shape_type, header_bounds = h.shape_type, h.bounds
            has_shp = True

    # Record-count consistency (shapefile.go:192-196); SHP count only known
    # after parse when no SHX, re-checked per split then.
    counts = {c for c in (n_dbf, n_shx) if c is not None}
    if len(counts) > 1:
        raise core.ShapefileError("inconsistent number of records")
    n_records = counts.pop() if counts else -1

    if charset is None:
        charset = (options.get("dbf") or {}).get("charset")

    return ShapefilePlan(
        path=path, is_zip=is_zip, basename=basename, n_records=n_records,
        shape_type=shape_type, header_bounds=header_bounds, crs_wkt=crs,
        charset=charset, dbf_fields=dbf_fields,
        dbf_header_size=dbf_header_size, dbf_record_size=dbf_record_size,
        shx_offsets=shx_offsets, shx_lengths=shx_lengths,
        shp_options=options.get("shp"), dbf_options=options.get("dbf"),
        has_shp=has_shp, has_dbf=has_dbf)


def _fields_with_decimals(raw: bytes, fields: list[core.DBFField]) -> list[tuple[str, str, int, int]]:
    """Re-read descriptor byte 17 (decimal count) for column typing; the
    reference ignores it at parse time but real DBF files set it."""
    out = []
    pos = core.DBF_HEADER_LENGTH
    for f in fields:
        decimals = raw[pos + 17]
        out.append((f.name, f.type, f.length, decimals))
        pos += 32
    return out


def features_schema(plan: ShapefilePlan) -> T.StructType:
    fields = [
        T.StructField("fid", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
    ]
    for name, ftype, length, decimals in plan.dbf_fields:
        fields.append(T.StructField(
            name, _dbf_spark_type(core.DBFField(name, ftype, length, 0, 0), decimals)))
    fields += [
        T.StructField("shape_type", T.IntegerType()),
        T.StructField("geometry", GEOMETRY_TYPE),
        T.StructField("bbox", BBOX_TYPE),
    ]
    return T.StructType(fields)


def _record_bbox(rec: core.SHPRecord) -> dict[str, float | None]:
    b: dict[str, float | None] = dict(xmin=None, ymin=None, xmax=None, ymax=None,
                                      zmin=None, zmax=None, mmin=None, mmax=None)
    if rec.layout is None:
        return b
    stride = core.STRIDES[rec.layout]
    if rec.shape_type in core.POINT_TYPES:
        x, y = float(rec.coords[0]), float(rec.coords[1])
        b.update(xmin=x, ymin=y, xmax=x, ymax=y)
        if rec.layout == "XYM":
            b.update(mmin=float(rec.coords[2]), mmax=float(rec.coords[2]))
        elif rec.layout == "XYZM":
            b.update(zmin=float(rec.coords[2]), zmax=float(rec.coords[2]),
                     mmin=float(rec.coords[3]), mmax=float(rec.coords[3]))
        return b
    bounds = rec.bounds
    if bounds is None:
        return b
    if rec.layout == "XY":
        b.update(xmin=bounds[0], ymin=bounds[1], xmax=bounds[2], ymax=bounds[3])
    elif rec.layout == "XYM":
        b.update(xmin=bounds[0], ymin=bounds[1], mmin=bounds[2],
                 xmax=bounds[3], ymax=bounds[4], mmax=bounds[5])
    else:
        b.update(xmin=bounds[0], ymin=bounds[1], zmin=bounds[2], mmin=bounds[3],
                 xmax=bounds[4], ymax=bounds[5], zmax=bounds[6], mmax=bounds[7])
    return b


def _geom_dict(rec: core.SHPRecord) -> dict[str, Any]:
    return {
        "layout": rec.layout,
        "coords": rec.coords.tolist(),
        "ends": [int(e) for e in rec.ends],
        "rings": [len(e) for e in rec.endss] if rec.endss else
                 ([1] * len(rec.ends) if rec.shape_type in core.POLYGON_TYPES else []),
    }


def _coerce_column(values: list, ftype: str, decimals: int):
    if ftype == "N" and decimals == 0:
        for v in values:
            if isinstance(v, float) and v != int(v):
                raise core.ShapefileError(
                    f"{v}: fractional value in zero-decimal numeric field")
        return pd.array([None if v is None else int(v) for v in values], dtype="Int64")
    if ftype == "N" or ftype == "F":
        return pd.array([None if v is None else float(v) for v in values], dtype="float64")
    if ftype == "L":
        return pd.array(values, dtype="boolean")
    return pd.Series(values, dtype="object")


def _ord_names(shape_type: int) -> list[str]:
    stride = core.STRIDES[core._LAYOUT_BY_TYPE[shape_type]]
    return {2: ["x", "y"], 3: ["x", "y", "m"],
            4: ["x", "y", "z", "m"]}[stride]


def _attr_columns(plan: ShapefilePlan, dbf_cols, deleted,
                  fid_start: int, count: int) -> dict[str, Any]:
    """Assemble the attribute columns (fid, deleted, DBF fields) into
    pandas-ready arrays."""
    out: dict[str, Any] = {
        "fid": pd.array(range(fid_start, fid_start + count), dtype="int64"),
        "deleted": pd.array(deleted if deleted is not None
                            else [False] * count, dtype="boolean"),
    }
    for j, (name, ftype, length, decs) in enumerate(plan.dbf_fields):
        if dbf_cols is None:
            out[name] = _coerce_column([None] * count, ftype, decs)
        else:
            kind, vals, mask = dbf_cols[j]
            if kind == "int":
                out[name] = pd.arrays.IntegerArray(vals, mask)
            elif kind == "float":
                out[name] = vals  # float64; NaN → null under Arrow
            elif ftype == "L":
                out[name] = pd.array(vals, dtype="boolean")
            elif ftype in ("N", "F"):
                out[name] = _coerce_column(list(vals), ftype, decs)
            else:
                out[name] = pd.Series(vals, dtype="object")
    return out


def record_bounds_quick(buf: bytes, rel: np.ndarray) -> np.ndarray:
    """Per-record (xmin, ymin, xmax, ymax) straight from the record
    headers — NO geometry decode (the reference reads the same leading
    bbox fields, shp.go:176-190).  Point records synthesize a degenerate
    bbox from their x/y; Null shapes (and records too short to carry a
    bbox) yield NaN rows, which fail every pushed comparison — matching
    SQL NULL semantics for a NULL bbox.

    One fancy-index gather over the split buffer; used by the bbox
    filter pushdown to select records BEFORE any decode.
    """
    a = np.frombuffer(buf, dtype=np.uint8)
    rel = np.asarray(rel, dtype=np.int64)
    n = len(rel)
    out = np.full((n, 4), np.nan)
    if not n:
        return out
    ok_type = rel + 12 <= len(a)
    st = np.zeros(n, dtype=np.int64)
    if ok_type.any():
        st_idx = rel[ok_type, None] + 8 + np.arange(4)[None, :]
        st[ok_type] = a[st_idx].view("<u4").ravel()
    is_point = np.isin(st, (core.SHAPE_TYPE_POINT, core.SHAPE_TYPE_POINT_M,
                            core.SHAPE_TYPE_POINT_Z))
    has_bbox = (st != core.SHAPE_TYPE_NULL) & ~is_point & (rel + 44 <= len(a))
    if has_bbox.any():
        idx = rel[has_bbox, None] + 12 + np.arange(32)[None, :]
        out[has_bbox] = a[idx].view("<f8").reshape(-1, 4)
    pt = is_point & (rel + 28 <= len(a))
    if pt.any():
        idx = rel[pt, None] + 12 + np.arange(16)[None, :]
        xy = a[idx].view("<f8").reshape(-1, 2)
        out[pt, 0] = out[pt, 2] = xy[:, 0]
        out[pt, 1] = out[pt, 3] = xy[:, 1]
    return out


def _parse_split(plan: ShapefilePlan, fid_start: int, fid_end: int,
                 flat_ords: bool = False,
                 attr_mask_fn=None, bbox_mask_fn=None) -> pd.DataFrame:
    """Parse records [fid_start, fid_end) (1-based fids) into a pandas batch.

    ``flat_ords=True`` (point types): emit ordinate columns instead of
    the geometry/bbox structs — no per-row python objects anywhere.

    ``attr_mask_fn`` (DataSource filter pushdown): called with the
    attribute-only DataFrame, returns a boolean keep-mask.  Attributes
    decode first, so records the mask rejects never reach the geometry
    parser — on the SHX path only the selected records' byte offsets are
    parsed at all.

    ``bbox_mask_fn`` (bbox predicate pushdown): called with the split's
    (buf, rel offsets) on the SHX path, returns a keep-mask computed from
    the record-header bounds (``record_bounds_quick``) — records outside
    the query window are never geometry-decoded.
    """
    if plan.is_zip:
        members = core.zip_members(fsio.open_seekable(plan.path))
        if plan.basename is not None:
            members = {ext: (n, d) for ext, (n, d) in members.items()
                       if n.rsplit("/", 1)[-1].rsplit(".", 1)[0] == plan.basename}
        shp_bytes = members.get("shp", (None, None))[1]
        dbf_bytes = members.get("dbf", (None, None))[1]
    else:
        shp_bytes = dbf_bytes = None

    n = fid_end - fid_start
    # --- attribute side (column-vectorized, native dtypes) ------------------
    dbf_cols: list[tuple[str, np.ndarray, np.ndarray | None]] | None = None
    deleted: np.ndarray | None = None
    if plan.dbf_record_size:
        fields = [core.DBFField(n_, t, l, 0, 0) for n_, t, l, d in plan.dbf_fields]
        decimals = [d for n_, t, l, d in plan.dbf_fields]
        hdr = core.DBFHeader(3, None, plan.n_records, 0, plan.dbf_record_size)  # type: ignore[arg-type]
        skip = (plan.dbf_options or {}).get("skip_broken_fields", False)
        if plan.is_zip and dbf_bytes is not None:
            dbf_cols, deleted = core.parse_dbf_native_columns(
                dbf_bytes, hdr, fields, plan.dbf_header_size, decimals,
                charset=plan.charset, skip_broken_fields=skip,
                first_record=fid_start - 1, num_records=n)
        elif not plan.is_zip and plan.has_dbf:
            dbf_cols, deleted = _read_split_dbf(plan, fid_start, n)
    n_attr = len(deleted) if deleted is not None else 0

    # pushed-down attribute mask: evaluated before any geometry work
    # (combined with the bbox mask below before anything is subset)
    sel: np.ndarray | None = None
    adf: pd.DataFrame | None = None
    if n_attr:
        adf = pd.DataFrame(_attr_columns(plan, dbf_cols, deleted,
                                         fid_start, n_attr))
        if attr_mask_fn is not None:
            sel = np.asarray(attr_mask_fn(adf), dtype=bool)

    # --- geometry side (selective under a pushed mask) ----------------------
    shp_records: list[core.SHPRecord] = []
    fast_ords: np.ndarray | None = None  # vectorized point fast path
    geom_selected = False                # geometry already mask-subset?
    if plan.is_zip and shp_bytes is not None:
        data = core.parse_shp(shp_bytes, plan.shp_options)
        shp_records = data.records[fid_start - 1:fid_end - 1]
    elif not plan.is_zip and plan.has_shp:
        if plan.shx_offsets is not None:
            # SHX-driven split: range-read straight to this byte span.
            got = _read_split_shp(plan, fid_start, fid_end)
            if got is not None:
                buf, rel = got
                if bbox_mask_fn is not None:
                    # record-header bounds test BEFORE any decode
                    bsel = np.asarray(bbox_mask_fn(buf, rel), dtype=bool)
                    if sel is not None and len(sel) != len(bsel):
                        # SHX and DBF disagree on the record count: fail
                        # with the reference's error, not a numpy shape
                        # error (shapefile.go:192-196)
                        raise core.ShapefileError(
                            "inconsistent number of records")
                    sel = bsel if sel is None else (sel & bsel)
                fast_ords = _parse_points_vectorized(
                    buf, rel, plan.shape_type, fid_start, fid_end)
                if fast_ords is None:
                    if sel is not None and len(rel) == len(sel):
                        # selective parse: only the records the pushed
                        # filter kept are ever decoded
                        fids = np.arange(fid_start, fid_end)[sel]
                        shp_records = core.parse_shp_range(
                            buf, rel[sel], plan.shp_options, numbers=fids)
                        geom_selected = True
                    else:
                        shp_records = core.parse_shp_range(
                            buf, rel, plan.shp_options,
                            numbers=np.arange(fid_start, fid_end))
        else:
            # No SHX → sequential single task (scanner.go:511-513).
            data = core.parse_shp(fsio.read_bytes(f"{plan.path}.shp"),
                                  plan.shp_options)
            shp_records = data.records[fid_start - 1:fid_end - 1]
    if adf is not None and sel is not None:
        if len(sel) != len(adf):
            raise core.ShapefileError("inconsistent number of records")
        adf = adf[sel].reset_index(drop=True)

    # count consistency (shapefile.go:192-196), on pre-mask counts
    if geom_selected:
        n_geom_check = n_attr  # selective parse validated fids directly
    else:
        n_geom_check = len(fast_ords) if fast_ords is not None else len(shp_records)
    if n_geom_check and n_attr and n_geom_check != n_attr:
        raise core.ShapefileError("inconsistent number of records")

    # subset full-parsed geometry by the mask
    if sel is not None and not geom_selected:
        if fast_ords is not None and len(fast_ords) == len(sel):
            fast_ords = fast_ords[sel]
        elif shp_records and len(shp_records) == len(sel):
            shp_records = [r for r, m in zip(shp_records, sel) if m]

    n_geom = len(shp_records) if fast_ords is None else len(fast_ords)
    if adf is not None:
        out: dict[str, Any] = {c: adf[c] for c in adf.columns}
        count = len(adf)
    else:
        count = n_geom
        out = _attr_columns(plan, dbf_cols, deleted, fid_start, count)
        if sel is not None:
            # no attribute side: fids must follow the pushed bbox mask.
            # A mask that doesn't span the split would silently assign
            # consecutive wrong fids — fail loudly instead.
            if len(sel) != fid_end - fid_start:
                raise core.ShapefileError(
                    f"pushed mask length {len(sel)} != split span "
                    f"{fid_end - fid_start}")
            out["fid"] = pd.array(np.arange(fid_start, fid_end)[sel],
                                  dtype="int64")
    if flat_ords:
        if fast_ords is None:
            fast_ords = np.array([r.coords for r in shp_records]) if \
                shp_records else np.zeros((count, len(_ord_names(plan.shape_type))))
        for j, c in enumerate(_ord_names(plan.shape_type)):
            out[c] = fast_ords[:, j]
        return pd.DataFrame(out)

    if fast_ords is not None:
        layout = core._LAYOUT_BY_TYPE[plan.shape_type]
        out["shape_type"] = pd.array([plan.shape_type] * count, dtype="int32")
        out["geometry"] = pd.Series(
            [{"layout": layout, "coords": row, "ends": [], "rings": []}
             for row in fast_ords.tolist()], dtype="object")
        none8 = {"zmin": None, "zmax": None, "mmin": None, "mmax": None}
        if layout == "XYM":
            out["bbox"] = pd.Series(
                [{"xmin": r[0], "ymin": r[1], "xmax": r[0], "ymax": r[1],
                  **none8, "mmin": r[2], "mmax": r[2]}
                 for r in fast_ords.tolist()], dtype="object")
        elif layout == "XYZM":
            out["bbox"] = pd.Series(
                [{"xmin": r[0], "ymin": r[1], "xmax": r[0], "ymax": r[1],
                  "zmin": r[2], "zmax": r[2], "mmin": r[3], "mmax": r[3]}
                 for r in fast_ords.tolist()], dtype="object")
        else:
            out["bbox"] = pd.Series(
                [{"xmin": r[0], "ymin": r[1], "xmax": r[0], "ymax": r[1],
                  **none8}
                 for r in fast_ords.tolist()], dtype="object")
    elif shp_records:
        out["shape_type"] = pd.array([r.shape_type for r in shp_records], dtype="int32")
        out["geometry"] = pd.Series([_geom_dict(r) for r in shp_records], dtype="object")
        out["bbox"] = pd.Series([_record_bbox(r) for r in shp_records], dtype="object")
    else:
        out["shape_type"] = pd.array([None] * count, dtype="Int32")
        out["geometry"] = pd.Series([None] * count, dtype="object")
        out["bbox"] = pd.Series([None] * count, dtype="object")
    return pd.DataFrame(out)


def _parse_points_vectorized(buf: bytes, rel_offsets: np.ndarray,
                             shape_type: int, fid_start: int,
                             fid_end: int) -> list[core.SHPRecord] | None:
    """Bulk decode for fixed-width Point records — no per-record Python.

    Point/PointM/PointZ records are all (8B BE header, 4B LE type,
    stride·8B LE ordinates); when the SHX spacing confirms that shape,
    one structured ``np.frombuffer`` decodes the whole split (the path
    that matters for billions-of-points corpora).  Falls back (returns
    None) on any irregularity, preserving the reference's full
    per-record validation semantics in the slow path.
    """
    stride = {core.SHAPE_TYPE_POINT: 2, core.SHAPE_TYPE_POINT_M: 3,
              core.SHAPE_TYPE_POINT_Z: 4}.get(shape_type)
    if stride is None:
        return None
    rec_size = 8 + 4 + 8 * stride
    n = fid_end - fid_start
    if len(buf) != n * rec_size:
        return None
    expected = np.arange(0, n * rec_size, rec_size, dtype=np.int64)
    if not np.array_equal(rel_offsets, expected):
        return None
    dtype = np.dtype([("num", ">u4"), ("half", ">u4"), ("shape", "<u4"),
                      ("ords", "<f8", (stride,))])
    arr = np.frombuffer(buf, dtype=dtype)
    if not np.array_equal(arr["num"],
                          np.arange(fid_start, fid_end, dtype=np.uint32)):
        return None  # slow path reproduces the reference's error text
    if not (arr["shape"] == shape_type).all() or \
            not (arr["half"] == (rec_size - 8) // 2).all():
        return None
    return arr["ords"]


def _read_split_dbf(plan: ShapefilePlan, fid_start: int, n: int):
    """Decode this split's DBF byte range into native columns (shared by
    the pandas and Arrow emit paths)."""
    fields = [core.DBFField(n_, t, l, 0, 0) for n_, t, l, d in plan.dbf_fields]
    decimals = [d for n_, t, l, d in plan.dbf_fields]
    hdr = core.DBFHeader(3, None, plan.n_records, 0, plan.dbf_record_size)  # type: ignore[arg-type]
    start = plan.dbf_header_size + (fid_start - 1) * plan.dbf_record_size
    buf = fsio.read_bytes(f"{plan.path}.dbf", start, n * plan.dbf_record_size)
    return core.parse_dbf_native_columns(
        buf, hdr, fields, 0, decimals, charset=plan.charset,
        skip_broken_fields=(plan.dbf_options or {}).get(
            "skip_broken_fields", False),
        first_record=0, num_records=n)


def _read_split_shp(plan: ShapefilePlan, fid_start: int,
                    fid_end: int) -> tuple[bytes, np.ndarray] | None:
    """One range-read of this split's .shp byte span → (buffer, relative
    record offsets); None when the split is empty."""
    offs = plan.shx_offsets[fid_start - 1:fid_end - 1]
    lens = plan.shx_lengths[fid_start - 1:fid_end - 1]
    if not len(offs):
        return None
    start = int(offs[0])
    end = int(offs[-1]) + 8 + int(lens[-1])
    return fsio.read_bytes(f"{plan.path}.shp", start, end - start), offs - start


def _arrow_attr_arrays(plan: ShapefilePlan, fid_start: int, n_full: int,
                       keep: np.ndarray | None, n: int, arrow_schema):
    """Attribute-side Arrow arrays (deleted flag + DBF fields) for one
    split, decoded straight from the split's DBF byte range — shared by
    the columnar polygon and flat-point emit paths.  ``keep`` optionally
    subsets the ``n_full`` decoded records down to ``n`` survivors."""
    import pyarrow as pa

    dbf_cols = deleted = None
    if plan.dbf_record_size and plan.has_dbf:
        dbf_cols, deleted = _read_split_dbf(plan, fid_start, n_full)
        if len(deleted) != n_full:
            raise core.ShapefileError("inconsistent number of records")
        if keep is not None:
            deleted = deleted[keep]
            dbf_cols = [(k, v[keep], None if m is None else m[keep])
                        for k, v, m in dbf_cols]
    arrays = [pa.array(deleted if deleted is not None
                       else np.zeros(n, dtype=bool))]
    for j, (name, ftype, length, decs) in enumerate(plan.dbf_fields):
        if dbf_cols is None:
            arrays.append(pa.nulls(n, arrow_schema.field(name).type))
            continue
        kind, vals, mask = dbf_cols[j]
        if kind == "int":
            arrays.append(pa.array(vals, mask=mask))
        elif kind == "float":
            arrays.append(pa.array(vals, from_pandas=True))  # NaN → null
        else:
            arrays.append(pa.array(vals.tolist(),
                                   type=arrow_schema.field(name).type))
    return arrays


def _arrow_split_batch(plan: ShapefilePlan, fid_start: int, fid_end: int,
                       arrow_schema, attr_mask_fn=None, bbox_mask_fn=None):
    """One split → one Arrow RecordBatch, columnar end to end when the
    vectorized polygon kernel applies.

    The per-row cost of the features scan is NOT parsing but building a
    Python dict per geometry for Arrow conversion; this path builds the
    geometry/bbox struct columns directly as Arrow ListArrays over the
    kernel's flat buffers — zero per-record Python for XY polygon
    corpora.  Anything the kernel declines falls back to the pandas path
    (same rows, same schema)."""
    import pyarrow as pa

    # the columnar build is positional over the FULL features schema; a
    # user-supplied (pruned/reordered) read schema takes the by-name
    # pandas conversion instead
    full_names = [f.name for f in features_schema(plan).fields]
    vec = None
    keep: np.ndarray | None = None
    if (not plan.is_zip and plan.has_shp and plan.shx_offsets is not None
            and plan.shape_type in (core.SHAPE_TYPE_POLYGON,
                                    core.SHAPE_TYPE_POLYLINE)
            and attr_mask_fn is None
            and [f.name for f in arrow_schema] == full_names):
        got = _read_split_shp(plan, fid_start, fid_end)
        if got is not None:
            buf, rel = got
            # sized to the records actually present — fid_end may be a
            # large sentinel when the record count is unknown upstream
            fids = fid_start + np.arange(len(rel), dtype=np.int64)
            if bbox_mask_fn is not None:
                # SELECTIVE vectorized decode: mask from the record
                # headers, then the kernel gathers only survivors — the
                # columnar path stays available under bbox pushdown
                keep = np.asarray(bbox_mask_fn(buf, rel), dtype=bool)
                rel, fids = rel[keep], fids[keep]
                if not len(rel):
                    # fully pruned split: emit empty directly (falling
                    # through to _parse_split would re-read the same
                    # byte span and decode the whole DBF for zero rows)
                    return pa.RecordBatch.from_arrays(
                        [pa.array([], type=f.type) for f in arrow_schema],
                        schema=arrow_schema)
            if len(rel):
                vec = core.parse_polygons_vectorized(
                    buf, rel, fids,
                    plan.shp_options, shape_type=plan.shape_type)
                if vec is not None and \
                        2 * int(vec["num_points"].sum()) >= (1 << 31):
                    vec = None  # ListArray int32 offsets would overflow
    if vec is None:
        pdf = _parse_split(plan, fid_start, fid_end,
                           attr_mask_fn=attr_mask_fn,
                           bbox_mask_fn=bbox_mask_fn)
        return pa.RecordBatch.from_pandas(pdf, schema=arrow_schema,
                                          preserve_index=False)

    n = vec["n"]
    n_full = fid_end - fid_start
    # --- attribute columns ---------------------------------------------
    arrays = [pa.array(fids, pa.int64())]
    arrays += _arrow_attr_arrays(plan, fid_start, n_full, keep, n,
                                 arrow_schema)
    # --- geometry struct --------------------------------------------------
    arrays.append(pa.array(np.full(n, plan.shape_type, np.int32)))
    coord_counts = 2 * vec["num_points"]
    coord_offs = np.concatenate(([0], np.cumsum(coord_counts))).astype("int32")
    coords_arr = pa.ListArray.from_arrays(
        pa.array(coord_offs), pa.array(vec["coords"], pa.float64()))
    ends_offs = np.concatenate(([0], np.cumsum(vec["num_parts"]))).astype("int32")
    ends_arr = pa.ListArray.from_arrays(
        pa.array(ends_offs), pa.array(vec["ends_rel"].astype(np.int32)))
    rings_offs = np.concatenate(
        ([0], np.cumsum(vec["polys_per_rec"]))).astype("int32")
    rings_arr = pa.ListArray.from_arrays(
        pa.array(rings_offs), pa.array(vec["rings_flat"].astype(np.int32)))
    layout_arr = pa.array(["XY"] * n)
    geom_type = arrow_schema.field("geometry").type
    arrays.append(pa.StructArray.from_arrays(
        [layout_arr, coords_arr, ends_arr, rings_arr],
        fields=list(geom_type)))
    # --- bbox struct -------------------------------------------------------
    bb = vec["bbox"]
    nulls = pa.nulls(n, pa.float64())
    bbox_type = arrow_schema.field("bbox").type
    arrays.append(pa.StructArray.from_arrays(
        [pa.array(bb[:, 0]), pa.array(bb[:, 1]),
         pa.array(bb[:, 2]), pa.array(bb[:, 3]),
         nulls, nulls, nulls, nulls],
        fields=list(bbox_type)))
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def read_shapefile_df(spark: SparkSession, path: str, options: dict | None = None,
                      basename: str | None = None,
                      target_records_per_split: int = 100_000,
                      flat_points: bool = False,
                      bbox: tuple[float, float, float, float] | None = None
                      ) -> DataFrame:
    """Read a shapefile (basename or zip bundle) as a ``features`` DataFrame.

    Splittable when a .shx is present and the source is not a zip: the
    planner cuts [1..n] into contiguous fid ranges of
    ``target_records_per_split`` and each task seeks independently.

    ``flat_points=True`` (Point-type files only): emit plain ``x``/``y``
    (+``z``/``m``) double columns instead of the nested geometry struct.
    The whole batch then moves as flat Arrow arrays — per-row struct
    serialization is the dominant cost for billions-of-points corpora
    (~10x throughput difference measured at 2M points).

    ``bbox=(x0, y0, x1, y1)``: keep only records whose bbox INTERSECTS
    the window (degenerate point bboxes included).  Pushed all the way
    down: the whole file is skipped when the header bounds miss the
    window, and on the SHX path records are bounds-tested from their
    record headers BEFORE geometry decode (the same machinery as the
    DataSource's ``bbox.*`` predicate pushdown); zip members filter
    after parse — same rows either way.
    """
    plan = plan_shapefile(path, options, basename)
    pruned = (bbox is not None
              and not _header_intersects(plan.header_bounds, bbox))
    if flat_points:
        if plan.shape_type not in core.POINT_TYPES:
            raise core.ShapefileError(
                "flat_points requires a Point-type shapefile")
        out = _read_points_flat(spark, plan, target_records_per_split)
        if pruned:
            # whole file outside the window (folds to an empty relation)
            return out.where(F.lit(False))
        if bbox is not None:
            # per-record pre-decode masking is intentionally skipped on
            # the flat path: the whole-split frombuffer decode is faster
            # than a selective decode, and this filter is codegen'd
            qx0, qy0, qx1, qy1 = (float(v) for v in bbox)
            out = out.where((F.col("x") >= qx0) & (F.col("x") <= qx1) &
                            (F.col("y") >= qy0) & (F.col("y") <= qy1))
        return out
    schema = features_schema(plan)

    if pruned:
        return spark.createDataFrame([], schema)   # whole file pruned

    if plan.n_records >= 0 and not plan.is_zip and plan.shx_offsets is not None:
        n = plan.n_records
        k = max(1, math.ceil(n / target_records_per_split))
        bounds = [(1 + i * n // k, 1 + (i + 1) * n // k) for i in range(k)]
        can_pretest = plan.has_shp
    else:
        # unknown count (no SHX/DBF) or zip → single sequential split
        n = plan.n_records if plan.n_records >= 0 else 1 << 40
        bounds = [(1, n + 1)]
        can_pretest = False

    splits_df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in bounds], "fid_start long, fid_end long")

    from pyspark.sql.pandas.types import to_arrow_schema
    arrow_schema = to_arrow_schema(schema)
    window = None if bbox is None else tuple(float(v) for v in bbox)
    pretest = window is not None and can_pretest

    def parse(batches):
        bbox_fn = (lambda buf, rel: _bbox_window_mask(buf, rel, window)) \
            if pretest else None
        for rb in batches:
            for a, b in zip(rb.column("fid_start").to_pylist(),
                            rb.column("fid_end").to_pylist()):
                out = _arrow_split_batch(plan, int(a), int(b), arrow_schema,
                                         bbox_mask_fn=bbox_fn)
                if out.num_rows:
                    yield out

    ndf = splits_df.repartition(len(bounds), "fid_start")
    df = ndf.mapInArrow(parse, schema=schema)
    if window is not None and not pretest:
        qx0, qy0, qx1, qy1 = window
        df = df.where((F.col("bbox.xmax") >= qx0) &
                      (F.col("bbox.xmin") <= qx1) &
                      (F.col("bbox.ymax") >= qy0) &
                      (F.col("bbox.ymin") <= qy1))
    return df


def _bbox_window_mask(buf: bytes, rel: np.ndarray,
                      window: tuple[float, float, float, float]) -> np.ndarray:
    """Record-header bounds INTERSECT the query window (NaN bounds —
    Null shapes — never intersect)."""
    bb = record_bounds_quick(buf, rel)
    qx0, qy0, qx1, qy1 = window
    return ((bb[:, 2] >= qx0) & (bb[:, 0] <= qx1) &
            (bb[:, 3] >= qy0) & (bb[:, 1] <= qy1))


def discover_shapefile_bases(directory: str) -> list[str]:
    """Shapefile corpus discovery (shared by ``read_shapefile_dir`` and
    the DataSource's directory mode): every .shp basename plus every
    .zip bundle under ``directory``, sorted."""
    files = fsio.list_files(directory)
    bases = sorted({p[:-4] for p in files if p.lower().endswith(".shp")})
    bases += sorted(p for p in files if p.lower().endswith(".zip"))
    return bases


def _header_intersects(bounds: tuple | None,
                       bbox: tuple[float, float, float, float]) -> bool:
    """Does a file-header bounds tuple intersect a (x0, y0, x1, y1) query
    window?  Unknown/NoData bounds conservatively intersect."""
    if bounds is None:
        return True
    half = len(bounds) // 2
    hx0, hy0, hx1, hy1 = bounds[0], bounds[1], bounds[half], bounds[half + 1]
    if hx0 > hx1 or hy0 > hy1:          # NoData-scrubbed → unknown
        return True
    qx0, qy0, qx1, qy1 = bbox
    return not (hx1 < qx0 or hx0 > qx1 or hy1 < qy0 or hy0 > qy1)


def read_shapefile_dir(spark: SparkSession, directory: str,
                       options: dict | None = None,
                       target_records_per_split: int = 100_000,
                       bbox: tuple[float, float, float, float] | None = None,
                       plan_files_per_task: int = 16) -> DataFrame:
    """Read every shapefile under ``directory`` into one ``features``
    DataFrame with a ``source_basename`` column.

    Scale shape (VERDICT r2 #6): the driver does ONE directory listing
    plus ONE representative header plan (for the schema); every other
    header pre-pass runs INSIDE tasks.  Stage 1 maps file paths →
    (path, fid_start, fid_end) split rows (reading only SHX/DBF headers);
    stage 2 shuffles the tiny split rows across the cluster and parses.
    Driver wall time is O(1) in file count — a 10k-tile corpus plans
    10k headers across the cluster, not serially on the driver.

    ``bbox=(x0, y0, x1, y1)`` skips whole files whose header bounds
    (shxheader.go:53-102) don't intersect the window (file-level
    partition pruning), bounds-tests surviving records from their
    record headers BEFORE geometry decode on the SHX path, and filters
    zip members post-parse — the same semantics as
    ``read_shapefile_df(bbox=...)`` per file.

    All files must share the representative file's schema; a mismatched
    file fails its task loudly (Arrow schema error) rather than silently
    coercing.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    bases = discover_shapefile_bases(directory)
    if not bases:
        raise core.ShapefileError(f"no shapefiles under {directory}")

    base_schema = features_schema(plan_shapefile(bases[0], options))
    # StructType.add mutates in place — build the extended schema fresh
    schema = T.StructType(list(base_schema.fields) +
                          [T.StructField("source_basename", T.StringType())])
    arrow_base = to_arrow_schema(base_schema)
    arrow_full = to_arrow_schema(schema)
    tps = target_records_per_split

    def plan_splits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths: list[str] = []
            starts: list[int] = []
            ends: list[int] = []
            for p in pdf["path"]:
                plan = plan_shapefile(p, options)
                if bbox is not None and not _header_intersects(
                        plan.header_bounds, bbox):
                    continue
                if (plan.n_records >= 0 and not plan.is_zip
                        and plan.shx_offsets is not None):
                    n = plan.n_records
                    k = max(1, math.ceil(n / tps))
                    bnds = [(1 + i * n // k, 1 + (i + 1) * n // k)
                            for i in range(k)]
                else:
                    n = plan.n_records if plan.n_records >= 0 else 1 << 40
                    bnds = [(1, n + 1)]
                for a, b in bnds:
                    paths.append(p)
                    starts.append(a)
                    ends.append(b)
            yield pd.DataFrame({
                "path": pd.Series(paths, dtype="object"),
                "fid_start": pd.Series(starts, dtype="int64"),
                "fid_end": pd.Series(ends, dtype="int64")})

    n_plan_tasks = max(1, math.ceil(len(bases) / plan_files_per_task))
    paths_df = spark.createDataFrame([(b,) for b in bases], "path string")
    splits = (paths_df.repartition(n_plan_tasks, "path")
              .mapInPandas(plan_splits,
                           "path string, fid_start long, fid_end long"))

    window = None if bbox is None else tuple(float(v) for v in bbox)

    def parse(batches):
        plans: dict[str, ShapefilePlan] = {}
        for rb in batches:
            for p, a, b in zip(rb.column("path").to_pylist(),
                               rb.column("fid_start").to_pylist(),
                               rb.column("fid_end").to_pylist()):
                plan = plans.get(p)
                if plan is None:
                    plan = plans[p] = plan_shapefile(p, options)
                pretest = (window is not None and not plan.is_zip
                           and plan.shx_offsets is not None and plan.has_shp)
                bbox_fn = (lambda buf, rel:
                           _bbox_window_mask(buf, rel, window)) \
                    if pretest else None
                out = _arrow_split_batch(plan, int(a), int(b), arrow_base,
                                         bbox_mask_fn=bbox_fn)
                if not out.num_rows:
                    continue
                name = posixpath.basename(p)
                yield pa.RecordBatch.from_arrays(
                    list(out.columns) +
                    [pa.array([name] * out.num_rows, pa.string())],
                    schema=arrow_full)

    df = (splits.repartition(F.col("path"), F.col("fid_start"))
          .mapInArrow(parse, schema=schema))
    if window is not None:
        # exact semantics on files the pre-test couldn't cover (zips, no
        # SHX); idempotent on the rest
        qx0, qy0, qx1, qy1 = window
        df = df.where((F.col("bbox.xmax") >= qx0) &
                      (F.col("bbox.xmin") <= qx1) &
                      (F.col("bbox.ymax") >= qy0) &
                      (F.col("bbox.ymin") <= qy1))
    return df


def _arrow_points_flat_batch(plan: ShapefilePlan, fid_start: int,
                             fid_end: int, arrow_schema):
    """One flat-point split → one Arrow RecordBatch built directly from
    the vectorized decoder's numpy columns — no pandas frame in between
    (the frame build + from_pandas conversion was ~30% of the scan wall
    time at 2M points; see BENCH.md round 4)."""
    import pyarrow as pa

    ords = None
    if not plan.is_zip and plan.has_shp and plan.shx_offsets is not None:
        got = _read_split_shp(plan, fid_start, fid_end)
        if got is None:
            return pa.RecordBatch.from_arrays(
                [pa.array([], type=f.type) for f in arrow_schema],
                schema=arrow_schema)
        buf, rel = got
        fid_end = fid_start + len(rel)  # clamp unknown-count sentinels
        ords = _parse_points_vectorized(buf, rel, plan.shape_type,
                                        fid_start, fid_end)
    if ords is None:
        # irregular records / zip / no SHX → validated slow path
        pdf = _parse_split(plan, fid_start, fid_end, flat_ords=True)
        return pa.RecordBatch.from_pandas(pdf, schema=arrow_schema,
                                          preserve_index=False)
    n = len(ords)
    arrays = [pa.array(np.arange(fid_start, fid_end, dtype=np.int64))]
    arrays += _arrow_attr_arrays(plan, fid_start, n, None, n, arrow_schema)
    for j in range(ords.shape[1]):
        arrays.append(pa.array(np.ascontiguousarray(ords[:, j])))
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def sequential_split_bounds(plan: ShapefilePlan,
                            records_per_split: int) -> list[tuple[int, int]]:
    """Per-file fid split bounds for task-side sequential scans, shared
    by the function readers and both DataSource readers (r5 review: the
    rule lived in three places and could drift): chunk by
    ``records_per_split`` when the record count is known and the source
    can range-read (SHX present, not a zip member); otherwise one
    sequential split, with the large sentinel when the count is unknown."""
    n = plan.n_records
    if n >= 0 and not plan.is_zip and plan.shx_offsets is not None \
            and plan.has_shp:
        step = records_per_split
        return [(a, min(a + step, n + 1)) for a in range(1, n + 1, step)]
    n = n if n >= 0 else (1 << 40)
    return [(1, n + 1)]


def flat_points_schema(plan: ShapefilePlan) -> T.StructType:
    """Schema of the flat-point emit path: fid, deleted, DBF columns,
    then plain x/y(/z/m) doubles — no nested geometry struct."""
    ord_names = _ord_names(plan.shape_type)
    fields = [T.StructField("fid", T.LongType(), False),
              T.StructField("deleted", T.BooleanType(), False)]
    for name, ftype, length, decimals in plan.dbf_fields:
        fields.append(T.StructField(
            name, _dbf_spark_type(core.DBFField(name, ftype, length, 0, 0), decimals)))
    fields += [T.StructField(c, T.DoubleType()) for c in ord_names]
    return T.StructType(fields)


def _read_points_flat(spark: SparkSession, plan: ShapefilePlan,
                      target_records_per_split: int) -> DataFrame:
    """Point-type scan emitting flat x/y(/z/m) double columns + DBF cols."""
    schema = flat_points_schema(plan)

    n = plan.n_records
    if n >= 0 and plan.shx_offsets is not None and not plan.is_zip \
            and plan.has_shp:
        k = max(1, math.ceil(n / target_records_per_split))
        bounds = [(1 + i * n // k, 1 + (i + 1) * n // k) for i in range(k)]
    else:
        # zip (not splittable: every split would re-read the member) or
        # unknown count (no SHX/DBF) → single sequential split with the
        # same large-sentinel fallback as read_shapefile_df
        bounds = sequential_split_bounds(plan, target_records_per_split)
    splits_df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in bounds], "fid_start long, fid_end long")

    from pyspark.sql.pandas.types import to_arrow_schema
    arrow_schema = to_arrow_schema(schema)

    def parse(batches):
        for rb in batches:
            for a, b in zip(rb.column("fid_start").to_pylist(),
                            rb.column("fid_end").to_pylist()):
                out = _arrow_points_flat_batch(plan, int(a), int(b),
                                               arrow_schema)
                if out.num_rows:
                    yield out

    return splits_df.repartition(len(bounds), "fid_start") \
        .mapInArrow(parse, schema=schema)


def file_metadata(path: str, options: dict | None = None,
                  basename: str | None = None) -> dict[str, Any]:
    """File-level metadata row (header bbox, shape type, CRS) — the analog
    of the reference's SHxHeader + PRJ accessors (scanner.go:541-593)."""
    plan = plan_shapefile(path, options, basename)
    return {
        "path": plan.path, "shape_type": plan.shape_type,
        "bounds": plan.header_bounds, "crs_wkt": plan.crs_wkt,
        "charset": plan.charset, "n_records": plan.n_records,
    }
