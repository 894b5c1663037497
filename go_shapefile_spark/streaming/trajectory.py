"""Stateful streaming GPS-glitch filter: the online twin of the batch
``q_gps_glitches`` gate (queries.py), via ``applyInPandasWithState``.

State per user: the LAST seen point (epoch, lon, lat) plus running
(n_moves, n_glitches, clean_dist_mm).  Each micro-batch sorts its rows
by (epoch, event_id) — the batch window's order — chains them onto the
stored last point, and applies the SAME integer-domain speed test
(dist_mm > max_mm_per_s · dt_s, distances quantized ROUND(hav·1e6) —
the od_matrix precedent absorbs the libm/numpy ulp seam).  Because
every comparison and every accumulator is integer, draining a bounded
source with one availableNow trigger equals the batch gate EXACTLY
(update-mode emissions are per-user monotonic; take the max).

Ordering caveat (same as sessions.py): per-user correctness across
micro-batches requires batches to arrive time-ordered per user — true
for backfills and for watermarked time-ordered sources; a fully
out-of-order stream needs watermark-delayed emission upstream.

At scale the state store shards by user hash; state is O(1) per user
(one point + three counters) — never a buffer of the trajectory.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from ..operators.geotag import lat_sql, lon_sql
from ..operators.knn import EARTH_RADIUS_KM

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_moves", LongType()),
    StructField("n_glitches", LongType()),
    StructField("clean_dist_mm", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("last_es", LongType()),
    StructField("last_lon", DoubleType()),
    StructField("last_lat", DoubleType()),
    StructField("n_moves", LongType()),
    StructField("n_glitches", LongType()),
    StructField("clean_dist_mm", LongType()),
])


def _dist_mm(lon0: float, lat0: float, lon1: float, lat1: float) -> int:
    h = (np.sin(np.radians(lat1 - lat0) / 2) ** 2
         + np.cos(np.radians(lat0)) * np.cos(np.radians(lat1))
         * np.sin(np.radians(lon1 - lon0) / 2) ** 2)
    return int(round(2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(h)) * 1e6))


def _glitch_fn(max_mm_per_s: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_es, last_lon, last_lat, n_mv, n_gl, clean = state.get
        else:
            last_es, last_lon, last_lat, n_mv, n_gl, clean = (
                None, 0.0, 0.0, 0, 0, 0)
        pdf = pd.concat(list(pdfs)).sort_values(["es", "id"])
        for es, _id, lon, lat in zip(pdf["es"], pdf["id"],
                                     pdf["lon"], pdf["lat"]):
            es, lon, lat = int(es), float(lon), float(lat)
            if last_es is not None:
                d = _dist_mm(last_lon, last_lat, lon, lat)
                n_mv += 1
                if d > max_mm_per_s * (es - last_es):
                    n_gl += 1
                else:
                    clean += d
            last_es, last_lon, last_lat = es, lon, lat
        state.update((last_es, last_lon, last_lat, n_mv, n_gl, clean))
        yield pd.DataFrame({"user_id": [key[0]], "n_moves": [n_mv],
                            "n_glitches": [n_gl],
                            "clean_dist_mm": [clean]})
    return fn


def glitch_filter_stream(spark: SparkSession, source_dir: str,
                         schema: str,
                         max_mm_per_s: int = 83_000) -> DataFrame:
    """File-source stream → JVM geotag (identical doubles to the batch
    SQL) → per-user stateful glitch totals (update mode)."""
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .select(F.col("user_id"),
                      F.col("event_id").alias("id"),
                      F.unix_timestamp("ts").alias("es"),
                      F.expr(lon_sql("event_id", "spark")).alias("lon"),
                      F.expr(lat_sql("event_id", "spark")).alias("lat")))
    return stream.groupBy("user_id").applyInPandasWithState(
        _glitch_fn(max_mm_per_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
