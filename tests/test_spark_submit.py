"""Deployment-mode smoke: `spark-submit --py-files dist/go_shapefile_spark.zip`.

The north rule deploys the engine as a --py-files zip on a
multi-executor cluster; this test builds the zip (tools/make_pyfiles.sh)
and runs a real spark-submit whose job imports the package ONLY from
the zip (the job runs from a temp cwd, so the repo checkout is not on
sys.path) and exercises a worker-side import too (the distributed cover
build's mapInPandas stage re-imports the package inside Python workers).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]").appName("pyfiles-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())

from go_shapefile_spark.operators.spatial_join import (
    PreparedCover, spatial_join_prepared)
from go_shapefile_spark.sources.shapefile import read_shapefile_df

feats = read_shapefile_df(
    spark, "/root/reference/testdata/110m-admin-0-countries.zip")
assert feats.count() == 177
# mapInPandas stage: Python WORKERS must import the package from the zip
cover = PreparedCover.from_features(feats.select("fid", "geometry"), res=5)
pts = spark.range(2000).select(
    F.col("id"), (F.rand(1) * 360 - 180).alias("lon"),
    (F.rand(2) * 180 - 90).alias("lat"))
n = spatial_join_prepared(pts, cover, keep_cols=["id", "polygon_fid"]).count()
print("JOIN_ROWS=%d" % n)
spark.stop()
"""


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    cand = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles_zip(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    subprocess.run(["sh", "tools/make_pyfiles.sh"], cwd=REPO, check=True,
                   capture_output=True)
    zip_path = os.path.join(REPO, "dist", "go_shapefile_spark.zip")
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)   # the package must come from the zip
    proc = subprocess.run(
        [submit, "--py-files", zip_path, str(job)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("JOIN_ROWS=")]
    assert rows, proc.stdout[-2000:]
    n = int(rows[0].split("=", 1)[1])
    # uniform lon/lat points landing inside any ne_110m country
    assert 200 < n < 1800, n
