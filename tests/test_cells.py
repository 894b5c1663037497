"""Cell encoder: numpy/Spark-SQL/DuckDB twins must agree bitwise."""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from go_shapefile_spark.functions import cells as C


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_roundtrip_decode():
    lon, lat = _rand_lonlat(5000)
    for res in (0, 1, 5, 12, 26):
        cell = C.cell_np(lon, lat, res)
        r, ix, iy = C.cell_decode_np(cell)
        assert (r == res).all()
        ex, ey = C.xy_np(lon, lat, res)
        np.testing.assert_array_equal(ix, ex)
        np.testing.assert_array_equal(iy, ey)
        lon0, lat0, lon1, lat1 = C.cell_bounds_np(cell)
        assert ((lon >= lon0) & (lon <= lon1)).all()
        assert ((lat >= lat0) & (lat <= lat1)).all()


def test_sql_decode_matches_numpy(spark):
    """cell_ix_sql/cell_iy_sql (Spark) must be bit-identical to
    cell_decode_np — the distributed rasterizer depends on it."""
    lon, lat = _rand_lonlat(2000, seed=11)
    for res in (0, 4, 9, 26):
        cell = C.cell_np(lon, lat, res)
        _, ex, ey = C.cell_decode_np(cell)
        got = (spark.createDataFrame(pd.DataFrame({"cell": cell}))
               .selectExpr(f"{C.cell_ix_sql('cell')} AS ix",
                           f"{C.cell_iy_sql('cell')} AS iy")
               .toPandas())
        np.testing.assert_array_equal(got["ix"].to_numpy(), ex)
        np.testing.assert_array_equal(got["iy"].to_numpy(), ey)


def test_z_order_locality():
    # adjacent cells at the same resolution share id prefixes: the morton
    # code of a 2x2 block differs only in the low 2 bits
    base = C.cell_from_xy(np.array([10]), np.array([20]), 8)[0]
    sib = C.cell_from_xy(np.array([11]), np.array([21]), 8)[0]
    assert base >> 2 == sib >> 2


def test_neighbors_wrap_clamp():
    res = 4
    n = 1 << res
    cell = C.cell_from_xy(np.array([0]), np.array([0]), res)
    nb = C.neighbors_np(cell, 1)[0]
    _, ix, iy = C.cell_decode_np(nb)
    assert set(ix) == {0, 1, n - 1}     # lon wraps
    assert set(iy) == {0, 1}            # lat clamps (clamped dupes collapse)


def test_sql_np_duckdb_parity(spark):
    lon, lat = _rand_lonlat(2000, seed=11)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    for res in (3, 9, 17):
        expected = C.cell_np(lon, lat, res)
        # Spark SQL twin
        sdf = spark.createDataFrame(pdf)
        got_spark = np.array(
            sdf.select(F.expr(C.cell_sql("lon", "lat", res)).alias("c"))
            .toPandas()["c"], dtype=np.int64)
        np.testing.assert_array_equal(got_spark, expected)
        # DuckDB twin (same SQL string)
        con = duckdb.connect()
        con.register("t", pdf)
        got_duck = np.array(
            con.execute(f"SELECT {C.cell_sql('lon', 'lat', res)} AS c FROM t")
            .fetchnumpy()["c"], dtype=np.int64)
        np.testing.assert_array_equal(got_duck, expected)


def test_cell_xy_sql_parity(spark):
    lon, lat = _rand_lonlat(500, seed=3)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    res = 7
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(f"SELECT {C.cell_xy_sql('lon', 'lat', res)} c FROM t").fetchnumpy()["c"]
    sdf = spark.createDataFrame(pdf)
    got = np.array(sdf.select(F.expr(C.cell_xy_sql("lon", "lat", res)).alias("c"))
                   .toPandas()["c"])
    np.testing.assert_array_equal(got, np.array(duck))


def test_z_ranges_cover_window_exactly_and_budget_is_superset():
    import pytest
    import numpy as np

    from go_shapefile_spark.functions.cells import cell_np, z_ranges

    res = 6
    lon0, lat0, lon1, lat1 = -33.0, 7.5, 41.2, 55.0
    n = 1 << res
    # brute-force reference: enumerate the window's grid cells from the
    # same clamped corner coords z_ranges uses
    from go_shapefile_spark.functions.cells import xy_np
    qx, qy = xy_np(np.array([lon0, lon1]), np.array([lat0, lat1]), res)
    cells_in = set()
    for x in range(int(qx[0]), int(qx[1]) + 1):
        for y in range(int(qy[0]), int(qy[1]) + 1):
            clon = -180.0 + (x + 0.5) * 360.0 / n
            clat = -90.0 + (y + 0.5) * 180.0 / n
            cells_in.add(int(cell_np(np.array([clon]),
                                     np.array([clat]), res)[0]))

    exact = z_ranges(lon0, lat0, lon1, lat1, res, max_ranges=10**9)
    covered = set()
    for lo, hi in exact:
        covered.update(range(lo, hi + 1))
    assert covered == cells_in                 # exact cover, both ways

    tight = z_ranges(lon0, lat0, lon1, lat1, res, max_ranges=5)
    assert len(tight) <= 5
    cov2 = set()
    for lo, hi in tight:
        cov2.update(range(lo, hi + 1))
    assert cells_in <= cov2                    # superset: still sound
    # sorted + disjoint
    for (l1, h1), (l2, h2) in zip(tight, tight[1:]):
        assert h1 < l2 and l1 <= h1
    with pytest.raises(ValueError):
        z_ranges(0, 0, 1, 1, 99)


def test_hexbin_assigns_nearest_center(spark):
    """Cube rounding must send every point to the NEAREST hex center
    (Euclidean, pointy-top lattice) — checked against a brute-force
    nearest-center search over the local lattice neighborhood."""
    import numpy as np

    from go_shapefile_spark.functions.cells import hexbin_body

    rng = np.random.default_rng(13)
    size = 2.0
    pdf_lon = rng.uniform(-30, 30, 2000)
    pdf_lat = rng.uniform(-30, 30, 2000)
    import pandas as pd
    spark.createDataFrame(pd.DataFrame({"lon": pdf_lon, "lat": pdf_lat})) \
        .createOrReplaceTempView("hex_pts")
    # per-point assignment: run the same chain without the final rollup
    body = hexbin_body("spark", size, pts="hex_pts")
    body = body[:body.index("SELECT hq, hr, CAST(COUNT(*)")]
    rows = spark.sql("WITH " + body.rstrip().rstrip(",")
                     + "\nSELECT hq, hr FROM hexcells").collect()
    assert len(rows) == 2000

    c1, c2, c3 = np.sqrt(3) / 3, 1 / 3, 2 / 3
    for (lon, lat), r in zip(zip(pdf_lon, pdf_lat), rows):
        # center of assigned hex back in lon/lat:
        # lat = hr*size/c3 ; lon = (hq + c2/ c1... invert the map
        def center(hq, hr):
            clat = hr * size / c3
            clon = (hq * size + c2 * clat) / c1
            return clon, clat
        ax, ay = center(r.hq, r.hr)
        d0 = (lon - ax) ** 2 + (lat - ay) ** 2
        for dq in (-1, 0, 1):
            for dr in (-1, 0, 1):
                bx, by = center(r.hq + dq, r.hr + dr)
                d = (lon - bx) ** 2 + (lat - by) ** 2
                assert d0 <= d + 1e-9, (lon, lat, r.hq, r.hr, dq, dr)


def test_geohash_known_vectors():
    # classic public test vectors (Wikipedia / original geohash.org)
    assert C.geohash_np(np.array([10.40744]), np.array([57.64911]), 6)[0] \
        == "u4pruy"
    assert C.geohash_np(np.array([-5.6]), np.array([42.6]), 5)[0] == "ezs42"
    assert C.geohash_np(np.array([10.40744]), np.array([57.64911]), 5)[0] \
        == "u4pru"


def test_geohash_sql_np_duckdb_spark_parity(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 179.999, 300)
    lat = rng.uniform(-90, 89.999, 300)
    for p in (1, 4, 5, 6):
        expected = C.geohash_np(lon, lat, p)
        sql = C.geohash_sql("lon", "lat", p)
        pdf = pd.DataFrame({"lon": lon, "lat": lat})
        got_duck = np.array([r[0] for r in
                             duckdb.query_df(pdf, "pdf",
                                             f"SELECT {sql} FROM pdf")
                             .fetchall()])
        np.testing.assert_array_equal(got_duck, expected)
        sdf = spark.createDataFrame(pdf)
        got_spark = np.array(
            [r[0] for r in sdf.selectExpr(f"{sql} AS gh").collect()])
        np.testing.assert_array_equal(got_spark, expected)


def test_geohash_prefix_nesting():
    # a geohash at precision p is a prefix of the same point at p+1
    # only when the higher precision refines the SAME cell; the
    # guaranteed invariant is prefix-compatibility of the bit paths:
    # cells at precision p group points whose p-char hashes are equal.
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 179.999, 200)
    lat = rng.uniform(-90, 89.999, 200)
    g4 = C.geohash_np(lon, lat, 4)
    g6 = C.geohash_np(lon, lat, 6)
    # even-split precisions nest exactly (4 -> 6 adds 5 lon + 5 lat bits)
    assert all(b.startswith(a) for a, b in zip(g4, g6))


def test_hilbert_lut_rederivation_and_properties():
    """Re-derive the 4-state LUT from first principles (transform
    composition on the rotate/reflect group) and assert it equals the
    hardcoded table; then the defining properties: bijective and
    unit-step (consecutive Hilbert indices are grid neighbors)."""
    import numpy as np

    from go_shapefile_spark.functions.cells import (_HILBERT_LUT,
                                                    hilbert_np)

    def apply_t(t, qx, qy):
        sw, cx, cy = t
        return ((qy if sw else qx) ^ cx, (qx if sw else qy) ^ cy)

    def compose_rot(t, rx, ry):
        if ry == 1:
            return t
        r = (1, 1, 1) if rx == 1 else (1, 0, 0)
        rsw, rcx, rcy = r
        tsw, tcx, tcy = t
        if rsw:
            return (1 - tsw, tcy ^ rcx, tcx ^ rcy)
        return (tsw, tcx ^ rcx, tcy ^ rcy)

    digit = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}
    states, rows, frontier = {(0, 0, 0): 0}, [], [(0, 0, 0)]
    while frontier:
        t = frontier.pop()
        for qx in (0, 1):
            for qy in (0, 1):
                rx, ry = apply_t(t, qx, qy)
                nt = compose_rot(t, rx, ry)
                if nt not in states:
                    states[nt] = len(states)
                    frontier.append(nt)
                rows.append((states[t], qx, qy, digit[(rx, ry)],
                             states[nt]))
    assert len(states) == 4
    assert tuple(sorted(rows)) == _HILBERT_LUT

    for res in (1, 2, 3, 6):
        n = 1 << res
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_np(xs.ravel(), ys.ravel(), res)
        assert np.array_equal(np.sort(d), np.arange(n * n))
        order = np.argsort(d)
        px, py = xs.ravel()[order], ys.ravel()[order]
        assert (np.abs(np.diff(px)) + np.abs(np.diff(py))).max() == 1


def test_hilbert_sql_twin_matches_numpy():
    import duckdb
    import numpy as np

    from go_shapefile_spark.functions import cells as C

    rng = np.random.default_rng(5)
    for res in (4, 9, 14):
        ix = rng.integers(0, 1 << res, 200)
        iy = rng.integers(0, 1 << res, 200)
        rows = ",".join(f"({a},{b})" for a, b in zip(ix, iy))
        sql = (f"WITH hsrc AS (SELECT * FROM (VALUES {rows}) "
               f"AS t(ix, iy)),{C.hilbert_cte(res)} "
               f"SELECT ix, iy, hd FROM hilb")
        con = duckdb.connect()
        df = con.sql(sql).df()
        con.close()
        want = C.hilbert_np(df.ix.to_numpy(), df.iy.to_numpy(), res)
        assert np.array_equal(df.hd.to_numpy(), want), res


def test_hilbert_locality_beats_morton():
    """The reason to offer Hilbert at all: random window queries need
    fewer contiguous index intervals than Morton (fewer scan ranges /
    data-skipping row groups at 100 TB).  Intervals are counted
    directly from the sorted index values of the covered cells."""
    import numpy as np

    from go_shapefile_spark.functions import cells as C

    res, n = 7, 1 << 7
    rng = np.random.default_rng(23)
    h_total = m_total = 0
    for _ in range(40):
        x0 = int(rng.integers(0, n - 16))
        y0 = int(rng.integers(0, n - 16))
        w = int(rng.integers(4, 16))
        h = int(rng.integers(4, 16))
        xs, ys = np.meshgrid(np.arange(x0, x0 + w),
                             np.arange(y0, y0 + h))
        hd = np.sort(C.hilbert_np(xs.ravel(), ys.ravel(), res))
        md = np.sort(C.cell_from_xy(xs.ravel(), ys.ravel(), res))
        h_total += int((np.diff(hd) > 1).sum()) + 1
        m_total += int((np.diff(md) > 1).sum()) + 1
    assert h_total < m_total, (h_total, m_total)


def test_hilbert_ranges_exact_cover_and_fewer_intervals():
    import bisect

    import numpy as np

    from go_shapefile_spark.functions import cells as C

    rng = np.random.default_rng(9)
    res = 7
    h_total = m_total = 0
    for _ in range(25):
        x0, x1 = sorted(rng.uniform(-170, 170, 2))
        y0, y1 = sorted(rng.uniform(-80, 80, 2))
        rs = C.hilbert_ranges(x0, y0, x1, y1, res, max_ranges=10**9)
        ix, iy = C.xy_np(np.array([x0, x1]), np.array([y0, y1]), res)
        xs, ys = np.meshgrid(np.arange(ix[0], ix[1] + 1),
                             np.arange(iy[0], iy[1] + 1))
        hd = np.sort(C.hilbert_np(xs.ravel(), ys.ravel(), res))
        # exact cover: interval mass equals the window's cell count,
        # and every window cell falls inside one interval
        assert sum(hi - lo + 1 for lo, hi in rs) == len(hd)
        los = [lo for lo, _ in rs]
        his = [hi for _, hi in rs]
        for d in (int(hd[0]), int(hd[len(hd) // 2]), int(hd[-1])):
            i = bisect.bisect_right(los, d) - 1
            assert 0 <= i and d <= his[i]
        h_total += len(rs)
        m_total += len(C.z_ranges(x0, y0, x1, y1, res,
                                  max_ranges=10**9))
        # budget merging stays a sound superset
        capped = C.hilbert_ranges(x0, y0, x1, y1, res, max_ranges=8)
        assert len(capped) <= 8
        assert sum(hi - lo + 1 for lo, hi in capped) >= len(hd)
    assert h_total < m_total, (h_total, m_total)
