"""Deployment smoke job for `spark-submit --py-files` (north-rule mode).

Runs the flagship spatial join from inside a spark-submit-launched
driver where the engine arrives ONLY via the --py-files zip — proves
the package is self-contained (no repo checkout on executors).

  spark-submit --master 'local[4]' \
      --py-files dist/go_shapefile_spark.zip tools/submit_smoke.py
"""

import json

from pyspark.sql import SparkSession


def main() -> None:
    spark = (SparkSession.builder.appName("submit-smoke")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    # import AFTER session start: resolves from the --py-files zip
    from go_shapefile_spark.operators.geotag import with_lonlat_jvm
    from go_shapefile_spark.operators.spatial_join import (
        PreparedCover, spatial_join_prepared)
    from go_shapefile_spark.sources.shapefile import read_shapefile_df

    feats = read_shapefile_df(
        spark, "/root/reference/testdata/110m-admin-0-countries.zip")
    cover = PreparedCover.from_features(feats.select("fid", "geometry"), res=6)
    pts = with_lonlat_jvm(spark.range(20000).withColumnRenamed("id", "idx"),
                          key_col="idx")
    joined = spatial_join_prepared(pts, cover,
                                   keep_cols=["idx", "polygon_fid"])
    n = joined.count()
    print(json.dumps({"submit_smoke_join_rows": n}))
    assert n > 1000, "join produced implausibly few rows"
    spark.stop()


if __name__ == "__main__":
    main()
