"""Explicit partitioning strategies (SURVEY.md §2.B E10).

The north rule demands explicit range/hash partitioning at 10^12-row
scale.  Three tools:

* ``repartition_by_cell_range`` — range partitioning on the Morton
  ``cell`` key.  Z-order ids make ranges spatially coherent, so
  downstream per-cell work (kNN, tiles) reads contiguous partitions and
  partition pruning on cell ranges maps to geographic windows.
* ``write_bucketed`` — hash-bucketed table on a join key (the Iceberg
  ``bucket(phash)`` spec stand-in).  Two tables bucketed on the same key
  and count equi-join WITHOUT a shuffle (verified by plan test).
* ``coalesce_small_partitions`` — post-filter partition hygiene; AQE
  does this inside a job, this helper does it at stage boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def with_cell(df: DataFrame, res: int, lon_col: str = "lon",
              lat_col: str = "lat") -> DataFrame:
    return df.withColumn("cell", F.expr(C.cell_sql(lon_col, lat_col, res)))


def repartition_by_cell_range(df: DataFrame, n_partitions: int,
                              cell_col: str = "cell") -> DataFrame:
    return df.repartitionByRange(n_partitions, F.col(cell_col))


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """Write ``df`` as a hash-bucketed managed table, idempotently.

    A managed-table location left in the warehouse dir by a *previous*
    session makes a fresh session's ``saveAsTable`` throw
    LOCATION_ALREADY_EXISTS — mode("overwrite") cannot help because the
    new catalog never registered the table.  So: drop the table if the
    catalog knows it, AND delete any orphaned location it does not.
    """
    from ..sources import fsio

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # the orphan lives under the OWNING database's location (qualified
    # names and a non-default current database included), not under
    # warehouse/<table_name> — resolve it through the catalog
    if "." in table_name:
        db, tbl = table_name.rsplit(".", 1)
    else:
        db, tbl = spark.catalog.currentDatabase(), table_name
    db_loc = spark.catalog.getDatabase(db).locationUri
    fsio.rmtree(db_loc.rstrip("/") + "/" + tbl.lower())
    writer = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def coalesce_small_partitions(df: DataFrame, target_rows_per_partition: int,
                              approx_rows: int) -> DataFrame:
    n = max(1, approx_rows // target_rows_per_partition)
    return df.coalesce(n)
