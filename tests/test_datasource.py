"""spark.read.format("shapefile") — Python DataSource with pushdown."""

import os

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThan

from go_shapefile_spark.sources.datasource import (
    ShapefileDataSource, ShapefileReader,
)
from go_shapefile_spark.sources.shapefile import (
    features_schema, plan_shapefile, read_shapefile_df,
)


@pytest.fixture(scope="module")
def ds_spark(spark):
    spark.dataSource.register(ShapefileDataSource)
    return spark


def test_format_matches_function_reader(ds_spark, ref_testdata):
    base = os.path.join(ref_testdata, "poly")
    via_format = (ds_spark.read.format("shapefile").option("path", base)
                  .load().orderBy("fid").collect())
    via_fn = read_shapefile_df(ds_spark, base).orderBy("fid").collect()
    assert via_format == via_fn


def test_attribute_pushdown_results(ds_spark, ref_testdata):
    base = os.path.join(ref_testdata, "poly")
    df = ds_spark.read.format("shapefile").option("path", base).load()
    got = sorted((r.fid, r.AREA) for r in
                 df.where("AREA > 300000 AND fid > 2").collect())
    exp = sorted((r.fid, r.AREA) for r in
                 read_shapefile_df(ds_spark, base)
                 .where("AREA > 300000 AND fid > 2").collect())
    assert got == exp and len(got) > 0
    # string equality + zip bundle path
    zpath = os.path.join(ref_testdata, "110m-admin-0-countries.zip")
    dfz = ds_spark.read.format("shapefile").option("path", zpath).load()
    got_z = dfz.where("SOVEREIGNT = 'France'").select("NAME").collect()
    exp_z = (read_shapefile_df(ds_spark, zpath)
             .where("SOVEREIGNT = 'France'").select("NAME").collect())
    assert sorted(got_z) == sorted(exp_z) and len(got_z) > 0


def test_fid_pushdown_prunes_partitions(ref_testdata):
    """fid-range predicates prune whole splits exactly at plan time —
    the DataSourceV2 analog of Scanner.Discard (scanner.go:458-525)."""
    plan = plan_shapefile(os.path.join(ref_testdata, "poly"))
    r = ShapefileReader(plan, features_schema(plan), records_per_split=2)
    assert len(r.partitions()) == 5  # 10 records / 2 per split
    leftover = list(r.pushFilters([GreaterThan(("fid",), 4),
                                   LessThan(("fid",), 8)]))
    assert leftover == []            # fully handled by pruning
    parts = [(p.fid_start, p.fid_end) for p in r.partitions()]
    assert parts == [(5, 6), (6, 8)]
    # unsupported filters are yielded back for Spark to evaluate
    r2 = ShapefileReader(plan, features_schema(plan), records_per_split=2)
    back = list(r2.pushFilters([In(("fid",), (1, 5)),
                                EqualTo(("AREA",), 215229.266)]))
    assert len(back) == 1 and isinstance(back[0], In)
    assert len(r2.attr_filters) == 1


def test_bbox_pushdown_results_and_plan(ds_spark, ref_testdata):
    """bbox.* comparisons are accepted by the source (VERDICT r2 #5):
    results match the unpushed scan, and the comparison disappears from
    the post-scan Filter node (only Catalyst's isnotnull remains)."""
    from go_shapefile_spark.plans.audit import executed_plan

    base = os.path.join(ref_testdata, "poly")
    df = ds_spark.read.format("shapefile").option("path", base).load()
    for pred in ("bbox.xmin > 479000", "bbox.ymax < 4765000",
                 "bbox.xmin > 479000 AND bbox.ymax < 4765000"):
        got = sorted(r.fid for r in df.where(pred).collect())
        exp = sorted(r.fid for r in read_shapefile_df(ds_spark, base)
                     .where(pred).collect())
        assert got == exp and 0 < len(got) < 10, pred
    plan = executed_plan(df.where("bbox.xmin > 479000"))
    assert "BatchScan shapefile" in plan
    assert "479000" not in plan   # comparison evaluated inside the source
    # zip bundles can't range-read → bbox filters are yielded back and the
    # comparison stays in Spark's Filter node; results still correct
    zpath = os.path.join(ref_testdata, "110m-admin-0-countries.zip")
    dfz = ds_spark.read.format("shapefile").option("path", zpath).load()
    got_z = sorted(r.fid for r in dfz.where("bbox.ymin > 60").collect())
    exp_z = sorted(r.fid for r in read_shapefile_df(ds_spark, zpath)
                   .where("bbox.ymin > 60").collect())
    assert got_z == exp_z and len(got_z) > 0
    assert "60.0" in executed_plan(dfz.where("bbox.ymin > 60"))


def test_bbox_header_prune_and_decode_skip(ref_testdata, monkeypatch):
    """A bbox window outside the file-header bounds prunes the whole scan
    at plan time; an in-bounds window decodes ONLY surviving records."""
    import go_shapefile_spark.sources.shapefile_core as core
    from pyspark.sql.datasource import GreaterThan as GT

    plan = plan_shapefile(os.path.join(ref_testdata, "poly"))
    schema = features_schema(plan)
    r = ShapefileReader(plan, schema, records_per_split=100)
    assert list(r.pushFilters([GT(("bbox", "xmin"), 999999999.0)])) == []
    parts = r.partitions()
    assert [(p.fid_start, p.fid_end) for p in parts] == [(1, 1)]

    # polygons now take the SELECTIVE vectorized kernel under a bbox
    # mask: count the record offsets the kernel is asked to gather
    seen = []
    orig = core.parse_polygons_vectorized

    def counting(buf, offsets, *a, **k):
        seen.append(len(offsets))
        return orig(buf, offsets, *a, **k)

    monkeypatch.setattr(core, "parse_polygons_vectorized", counting)
    monkeypatch.setattr(
        "go_shapefile_spark.sources.shapefile.core.parse_polygons_vectorized",
        counting)
    r2 = ShapefileReader(plan, schema, records_per_split=100)
    assert list(r2.pushFilters([GT(("bbox", "ymax"), 4765000.0)])) == []
    [part] = r2.partitions()
    n_rows = sum(b.num_rows for b in r2.read(part))
    assert seen == [n_rows] and 0 < n_rows < 10


def test_record_bounds_quick_matches_decode(ref_testdata):
    """record_bounds_quick (header gather, no decode) must equal the
    fully-decoded record bboxes."""
    import numpy as np

    from go_shapefile_spark.sources.shapefile import (
        _read_split_shp, record_bounds_quick)

    plan = plan_shapefile(os.path.join(ref_testdata, "poly"))
    buf, rel = _read_split_shp(plan, 1, plan.n_records + 1)
    quick = record_bounds_quick(buf, rel)
    full = read_shapefile_df.__globals__["core"].parse_shp_range(
        buf, rel, numbers=np.arange(1, plan.n_records + 1))
    exp = np.array([[r.bounds[0], r.bounds[1], r.bounds[2], r.bounds[3]]
                    for r in full])
    np.testing.assert_array_equal(quick, exp)


def test_pushdown_skips_geometry_decode(ds_spark, ref_testdata, monkeypatch):
    """Records rejected by a pushed attribute filter never reach the
    geometry parser on the SHX path (selective parse_shp_range)."""
    import go_shapefile_spark.sources.shapefile_core as core

    seen = []
    orig = core.parse_shp_range

    def counting(buf, offsets, options=None, numbers=None):
        seen.append(len(offsets))
        return orig(buf, offsets, options, numbers=numbers)

    monkeypatch.setattr(core, "parse_shp_range", counting)
    monkeypatch.setattr(
        "go_shapefile_spark.sources.shapefile.core.parse_shp_range", counting)
    plan = plan_shapefile(os.path.join(ref_testdata, "poly"))
    schema = features_schema(plan)
    r = ShapefileReader(plan, schema, records_per_split=100)
    list(r.pushFilters([GreaterThan(("AREA",), 300000.0)]))
    [part] = r.partitions()
    batches = list(r.read(part))
    n_rows = sum(b.num_rows for b in batches)
    assert seen == [n_rows]  # parsed exactly the surviving records
    assert 0 < n_rows < 10


def test_format_directory_mode(ds_spark, ref_testdata, tmp_path):
    """format("shapefile") on a DIRECTORY: one partition per file, header
    planning inside tasks, source_basename file pruning, and bbox
    predicates exact on both the SHX pre-test path (.shp files) and the
    post-parse path (zip bundles)."""
    import shutil
    import zipfile

    d = tmp_path / "dscorpus"
    d.mkdir()
    for i in range(4):
        for ext in ("shp", "shx", "dbf"):
            shutil.copy(os.path.join(ref_testdata, f"poly.{ext}"),
                        d / f"t{i}.{ext}")
    # one zip bundle with the same schema → post-parse bbox filtering
    with zipfile.ZipFile(d / "z0.zip", "w") as z:
        for ext in ("shp", "shx", "dbf"):
            z.write(os.path.join(ref_testdata, f"poly.{ext}"), f"poly.{ext}")
    df = ds_spark.read.format("shapefile").option("path", str(d)).load()
    assert df.count() == 50
    assert df.select("source_basename").distinct().count() == 5
    # file pruning via source_basename equality
    assert df.where("source_basename = 't2'").count() == 10
    # bbox predicate: identical result on every file, zip included
    got = (df.where("bbox.ymax < 4765000")
           .groupBy("source_basename").count().collect())
    assert {r.source_basename: r["count"] for r in got} == {
        "t0": 3, "t1": 3, "t2": 3, "t3": 3, "z0.zip": 3}
    # header bbox prune: off-window → empty
    assert df.where("bbox.xmin > 999999999").count() == 0
    # attribute pushdown still applies per file
    assert df.where("AREA > 300000").count() == 15


def test_dir_mode_record_level_decode_skip(ref_testdata, tmp_path,
                                           monkeypatch):
    """Directory mode must apply the record-level bbox mask PER FILE —
    records outside the window are never geometry-decoded (the dir twin
    of test_bbox_header_prune_and_decode_skip's counter assertion)."""
    import shutil

    import go_shapefile_spark.sources.shapefile_core as core
    from pyspark.sql.datasource import LessThan as LT

    from go_shapefile_spark.sources.datasource import ShapefileDirReader

    d = tmp_path / "cnt"
    d.mkdir()
    for i in range(3):
        for ext in ("shp", "shx", "dbf"):
            shutil.copy(os.path.join(ref_testdata, f"poly.{ext}"),
                        d / f"t{i}.{ext}")
    rep = plan_shapefile(str(d / "t0"))
    schema = features_schema(rep).add("source_basename", "string")
    bases = [str(d / f"t{i}") for i in range(3)]
    reader = ShapefileDirReader(bases, rep, schema,
                                records_per_split=100, options=None)
    assert list(reader.pushFilters([LT(("bbox", "ymax"), 4765000.0)])) == []

    seen = []
    orig = core.parse_polygons_vectorized

    def counting(buf, offsets, *a, **k):
        seen.append(len(offsets))
        return orig(buf, offsets, *a, **k)

    monkeypatch.setattr(core, "parse_polygons_vectorized", counting)
    monkeypatch.setattr(
        "go_shapefile_spark.sources.shapefile.core.parse_polygons_vectorized",
        counting)
    total = 0
    for part in reader.partitions():
        for rb in reader.read(part):
            total += rb.num_rows
    # 3 files × 3 surviving records; the kernel gathered ONLY survivors
    assert total == 9
    assert seen == [3, 3, 3]


def test_flat_points_datasource_matches_function_reader(ds_spark, tmp_path):
    """flat_points=true on format("shapefile") must take the same
    Arrow-direct flat-point scan as read_shapefile_df(flat_points=True)
    (VERDICT r4 #7): identical rows, flat x/y schema, no geometry
    struct."""
    import numpy as np

    from go_shapefile_spark.sources.shapefile_writer import write_points

    rng = np.random.default_rng(21)
    base = str(tmp_path / "pts")
    write_points(base, rng.uniform(-180, 180, 500), rng.uniform(-90, 90, 500))
    df = (ds_spark.read.format("shapefile").option("path", base)
          .option("flat_points", "true")
          .option("records_per_split", "200").load())
    assert {"x", "y"} <= set(df.columns) and "geometry" not in df.columns
    via_fn = read_shapefile_df(ds_spark, base, flat_points=True,
                               target_records_per_split=200)
    got = sorted((r.fid, r.x, r.y) for r in df.collect())
    exp = sorted((r.fid, r.x, r.y) for r in via_fn.collect())
    assert got == exp and len(got) == 500
    # x/y predicates evaluate correctly (codegen'd over flat columns)
    lhs = df.where("x > 0 AND y < 10").count()
    rhs = via_fn.where("x > 0 AND y < 10").count()
    assert lhs == rhs > 0


def test_flat_points_datasource_dir_mode(ds_spark, tmp_path):
    """Directory mode + flat_points: per-file Arrow-direct batches with
    the source_basename column; basename equality still prunes files."""
    import numpy as np

    from go_shapefile_spark.sources.shapefile_writer import write_points

    rng = np.random.default_rng(22)
    d = tmp_path / "ptsdir"
    d.mkdir()
    for i in range(3):
        write_points(str(d / f"f{i}"), rng.uniform(-10, 10, 100),
                     rng.uniform(-10, 10, 100))
    df = (ds_spark.read.format("shapefile").option("path", str(d))
          .option("flat_points", "true").load())
    assert df.count() == 300
    per_file = {r.source_basename: r["count"] for r in
                df.groupBy("source_basename").count().collect()}
    assert per_file == {"f0": 100, "f1": 100, "f2": 100}
    assert df.where("source_basename = 'f1'").count() == 100


def test_flat_points_rejects_non_point_corpus(ds_spark, ref_testdata):
    with pytest.raises(Exception, match="Point-type"):
        (ds_spark.read.format("shapefile")
         .option("path", os.path.join(ref_testdata, "poly"))
         .option("flat_points", "true").load().collect())


def test_flat_points_reader_uses_vectorized_point_kernel(tmp_path,
                                                         monkeypatch):
    """Counter test (direct reader drive — worker monkeypatches don't
    propagate): the flat reader must call the vectorized point kernel
    once per split and emit flat Arrow columns."""
    import numpy as np
    import go_shapefile_spark.sources.shapefile as sf
    from go_shapefile_spark.sources.datasource import _Split
    from go_shapefile_spark.sources.shapefile import flat_points_schema
    from go_shapefile_spark.sources.shapefile_writer import write_points

    rng = np.random.default_rng(23)
    base = str(tmp_path / "pts")
    write_points(base, rng.uniform(-1, 1, 120), rng.uniform(-1, 1, 120))
    plan = plan_shapefile(base)
    calls = []
    orig = sf._parse_points_vectorized

    def counting(buf, rel, *a, **k):
        calls.append(len(rel))
        return orig(buf, rel, *a, **k)

    monkeypatch.setattr(sf, "_parse_points_vectorized", counting)
    reader = ShapefileReader(plan, flat_points_schema(plan),
                             records_per_split=60, flat=True)
    parts = reader.partitions()
    assert len(parts) == 2
    rows = 0
    for p in parts:
        for rb in reader.read(p):
            assert "x" in rb.schema.names and "y" in rb.schema.names
            rows += rb.num_rows
    assert rows == 120 and calls == [60, 60]


def test_flat_points_fid_pruning(tmp_path):
    """r5 review: flat mode must keep exact fid-range partition pruning
    (zero-I/O skip of whole splits) while yielding row masks back."""
    import numpy as np

    from go_shapefile_spark.sources.shapefile import flat_points_schema
    from go_shapefile_spark.sources.shapefile_writer import write_points

    rng = np.random.default_rng(24)
    base = str(tmp_path / "pts")
    write_points(base, rng.uniform(-1, 1, 120), rng.uniform(-1, 1, 120))
    plan = plan_shapefile(base)
    reader = ShapefileReader(plan, flat_points_schema(plan),
                             records_per_split=40, flat=True)
    from pyspark.sql.datasource import EqualTo as EQ
    from pyspark.sql.datasource import GreaterThan as GT
    leftover = list(reader.pushFilters([EQ(("fid",), 90), GT(("x",), 0.0)]))
    assert len(leftover) == 1 and leftover[0].attribute == ("x",)
    parts = reader.partitions()
    assert len(parts) == 1                       # pruned to one split
    rows = [rb for p in parts for rb in reader.read(p)]
    fids = [f for rb in rows for f in rb.column(0).to_pylist()]
    assert fids == [90]
