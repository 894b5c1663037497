"""End-to-end resumable pipeline: kill-and-rerun equals single-shot."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.pipeline import (
    bucketed_points, pipeline_rollup, spatial_pipeline,
)
from go_shapefile_spark.operators.geotag import with_lonlat_jvm
from go_shapefile_spark.operators.spatial_join import spatial_join


@pytest.fixture(scope="module")
def rect_polygons():
    polys = []
    rng = np.random.default_rng(77)
    for fid in range(12):
        x0 = float(rng.uniform(-170, 120))
        y0 = float(rng.uniform(-80, 50))
        w, h = float(rng.uniform(10, 40)), float(rng.uniform(8, 25))
        ring = [x0, y0, x0, y0 + h, x0 + w, y0 + h, x0 + w, y0, x0, y0]
        polys.append({"fid": fid, "coords": np.array(ring), "ends": [10]})
    return polys


def test_pipeline_resume_equals_single_shot(spark, tmp_path, rect_polygons):
    pts = with_lonlat_jvm(
        spark.range(30000).select(F.col("id").alias("idx"),
                                  F.xxhash64("id").alias("phash")))
    out = str(tmp_path / "pipe")
    n_buckets = 4
    factory = bucketed_points(pts, n_buckets)

    calls = []

    def failing_factory(bucket: int):
        calls.append(bucket)
        if bucket == 2 and calls.count(2) == 1:
            raise RuntimeError("simulated kill during bucket 2")
        return factory(bucket)

    with pytest.raises(RuntimeError):
        spatial_pipeline(spark, failing_factory, rect_polygons, out, n_buckets)
    # resume: buckets 0,1 skipped; 2,3 completed
    ran = spatial_pipeline(spark, failing_factory, rect_polygons, out, n_buckets)
    assert set(ran) == {"2", "3"}

    got = (pipeline_rollup(spark, out).toPandas()
           .sort_values("polygon_fid").reset_index(drop=True))
    exp = (spatial_join(spark, pts, rect_polygons, res=7,
                        keep_cols=["idx", "polygon_fid"])
           .groupBy("polygon_fid").agg(F.count(F.lit(1)).alias("n_points"))
           .toPandas().sort_values("polygon_fid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # a third invocation is a no-op
    assert spatial_pipeline(spark, factory, rect_polygons, out, n_buckets) == {}


def test_pipeline_snapshot_invalidation(spark, tmp_path, rect_polygons):
    """A resume with a changed input snapshot re-runs every bucket; an
    unchanged snapshot is a no-op (north rule: Iceberg-style snapshot-
    driven idempotent resume)."""
    from go_shapefile_spark.operators.lineage import input_snapshot_id

    pts = with_lonlat_jvm(
        spark.range(5000).select(F.col("id").alias("idx"),
                                 F.xxhash64("id").alias("phash")))
    out = str(tmp_path / "pipe_snap")
    factory = bucketed_points(pts, 2)

    src = tmp_path / "src.parquet"
    pts.write.mode("overwrite").parquet(str(src))
    snap1 = input_snapshot_id([str(src)])

    ran = spatial_pipeline(spark, factory, rect_polygons, out, 2,
                           snapshot_id=snap1)
    assert set(ran) == {"0", "1"}
    # same snapshot → resume is a no-op
    assert spatial_pipeline(spark, factory, rect_polygons, out, 2,
                            snapshot_id=snap1) == {}
    # input rewritten → new snapshot id → full re-run
    pts.limit(4000).write.mode("overwrite").parquet(str(src))
    snap2 = input_snapshot_id([str(src)])
    assert snap2 != snap1
    ran2 = spatial_pipeline(spark, factory, rect_polygons, out, 2,
                            snapshot_id=snap2)
    assert set(ran2) == {"0", "1"}
