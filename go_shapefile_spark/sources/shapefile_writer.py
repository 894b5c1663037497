"""Minimal shapefile writer (points + polygons) for tests and benchmarks.

The reference is read-only; this writer exists so the engine can (a)
roundtrip-test its own parser against independently constructed files
and (b) synthesize arbitrarily large .shp/.shx/.dbf bundles for parse
throughput measurement.  Field support mirrors what the parser's tests
need: C and N columns.  Layout follows the ESRI spec exactly as the
parser expects it (big-endian record headers, little-endian bodies,
lengths in 16-bit words; reference shp.go:66-163, shx.go:63-70,
dbf.go:98-203).
"""

from __future__ import annotations

import struct

import numpy as np


def _shx_header(shape_type: int, file_length_bytes: int,
                bbox: tuple[float, float, float, float]) -> bytes:
    h = bytearray(100)
    struct.pack_into(">I", h, 0, 9994)
    struct.pack_into(">I", h, 24, file_length_bytes // 2)
    struct.pack_into("<I", h, 28, 1000)
    struct.pack_into("<I", h, 32, shape_type)
    struct.pack_into("<4d", h, 36, *bbox)
    return bytes(h)


def write_points(basename: str, xs: np.ndarray, ys: np.ndarray,
                 fields: list[tuple] | None = None,
                 rows: list[list] | None = None) -> None:
    """Write a Point shapefile (+SHX, +DBF when fields given)."""
    n = len(xs)
    body_len = 4 + 16                      # shape type + x,y
    rec = np.zeros(n, dtype=[("num", ">u4"), ("half", ">u4"),
                             ("shape", "<u4"), ("x", "<f8"), ("y", "<f8")])
    rec["num"] = np.arange(1, n + 1)
    rec["half"] = body_len // 2
    rec["shape"] = 1
    rec["x"], rec["y"] = xs, ys
    payload = rec.tobytes()
    bbox = (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))
    shp = _shx_header(1, 100 + len(payload), bbox) + payload
    with open(basename + ".shp", "wb") as f:
        f.write(shp)

    offs = 100 + (8 + body_len) * np.arange(n, dtype=np.int64)
    shx_rec = np.zeros(n, dtype=[("off", ">u4"), ("len", ">u4")])
    shx_rec["off"] = offs // 2
    shx_rec["len"] = body_len // 2
    with open(basename + ".shx", "wb") as f:
        f.write(_shx_header(1, 100 + 8 * n, bbox) + shx_rec.tobytes())

    if fields is not None:
        write_dbf(basename + ".dbf", fields,
                  rows or [[None] * len(fields) for _ in range(n)])


def write_polygons(basename: str, polygons: list[dict],
                   fields: list[tuple] | None = None,
                   rows: list[list] | None = None,
                   shape_type: int = 5) -> None:
    """Write a Polygon shapefile from {coords, ends} dicts (flat XY).
    PolyLine (type 3) shares the record layout byte-for-byte, so
    ``shape_type=3`` writes a line corpus (see :func:`write_polylines`).
    """
    recs, offs = [], []
    pos = 100
    gx0 = gy0 = float("inf")
    gx1 = gy1 = float("-inf")
    for i, p in enumerate(polygons):
        coords = np.asarray(p["coords"], dtype=np.float64)
        ends = [int(e) for e in p["ends"]]
        num_points = len(coords) // 2
        parts = [0] + [e // 2 for e in ends[:-1]]
        x, y = coords[0::2], coords[1::2]
        x0, y0, x1, y1 = x.min(), y.min(), x.max(), y.max()
        gx0, gy0 = min(gx0, x0), min(gy0, y0)
        gx1, gy1 = max(gx1, x1), max(gy1, y1)
        body = struct.pack("<I4dII", shape_type, x0, y0, x1, y1, len(parts), num_points)
        body += np.asarray(parts, dtype="<u4").tobytes()
        body += coords.astype("<f8").tobytes()
        recs.append(struct.pack(">II", i + 1, len(body) // 2) + body)
        offs.append((pos // 2, len(body) // 2))
        pos += 8 + len(body)
    payload = b"".join(recs)
    bbox = (gx0, gy0, gx1, gy1)
    with open(basename + ".shp", "wb") as f:
        f.write(_shx_header(shape_type, 100 + len(payload), bbox) + payload)
    shx = b"".join(struct.pack(">II", o, l) for o, l in offs)
    with open(basename + ".shx", "wb") as f:
        f.write(_shx_header(shape_type, 100 + len(shx), bbox) + shx)
    if fields is not None:
        write_dbf(basename + ".dbf", fields,
                  rows or [[None] * len(fields) for _ in polygons])


def write_polylines(basename: str, lines: list[dict],
                    fields: list[tuple] | None = None,
                    rows: list[list] | None = None) -> None:
    """Write a PolyLine shapefile from {coords, ends} dicts (flat XY)."""
    write_polygons(basename, lines, fields, rows, shape_type=3)


def write_dbf(path: str, fields: list[tuple],
              rows: list[list]) -> None:
    """dBase III with C/N fields; values stringified + space-padded.

    A field spec is ``(name, type, length[, decimals])`` — the decimal
    count lands in descriptor byte 17, which is what types the column
    double vs long on read (SURVEY §1.3); N values with decimals are
    fixed-point formatted to exactly that many places.
    """
    specs = [(f[0], f[1], int(f[2]), int(f[3]) if len(f) > 3 else 0)
             for f in fields]
    record_size = 1 + sum(length for _, _, length, _ in specs)
    header = bytearray(32)
    header[0] = 3
    header[1:4] = bytes([124, 1, 1])
    struct.pack_into("<I", header, 4, len(rows))
    struct.pack_into("<H", header, 8, 32 + 32 * len(specs) + 1)
    struct.pack_into("<H", header, 10, record_size)
    out = [bytes(header)]
    for name, ftype, length, decimals in specs:
        d = bytearray(32)
        d[:len(name)] = name.encode("ascii")
        d[11] = ord(ftype)
        d[16] = length
        d[17] = 0 if ftype == "C" else decimals
        out.append(bytes(d))
    out.append(b"\x0d")
    for row in rows:
        if len(row) != len(specs):
            raise ValueError(
                f"row has {len(row)} values for {len(specs)} fields")
        rec = b" "
        for (name, ftype, length, decimals), val in zip(specs, row):
            if val is None:
                s = b""
            elif ftype == "N" and decimals > 0:
                s = f"{val:.{decimals}f}".encode("ascii")
            else:
                s = str(val).encode("ascii")
            if len(s) > length:
                raise ValueError(
                    f"field {name}: value {val!r} wider than {length}")
            rec += s.rjust(length) if ftype in ("N", "F") else s.ljust(length)
        out.append(rec)
    out.append(b"\x1a")
    with open(path, "wb") as f:
        f.write(b"".join(out))
