"""Stateful streaming funnel: the online twin of the batch
``q_funnel`` gate (view → click → purchase, each stage the FIRST
qualifying event within the window of the previous stage).

State per user: the three stage timestamps (nullable) — O(1), never an
event buffer.  Under the time-ordered-per-user caveat (sessions.py /
trajectory.py) the online recurrence is exact: the first view fixes
t1; the first click in [t1, t1+W] fixes t2; the first purchase in
[t2, t2+W] fixes t3 — identical to the batch MIN-per-stage semantics
because minima of a time-ordered stream are first hits.  Stage depth
is monotonic per user, so an update-mode drain's per-user MAX equals
the batch answer exactly (all-integer epochs).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("depth", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("t1", LongType()),
    StructField("t2", LongType()),
    StructField("t3", LongType()),
])

_STAGE_TYPES = ("view", "click", "purchase")


def _funnel_fn(window_s: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        # ADVICE r5 #2: order same-second ties by funnel stage (view <
        # click < purchase) so an equal-timestamp earlier stage applies
        # first — the batch MIN algebra (e.ts_s >= f1.t1) counts a
        # same-second view→click pair, so the stream must too
        pdf = pd.concat(list(pdfs))
        pdf = pdf.assign(
            _rk=pdf["event_type"].map(
                {t: i for i, t in enumerate(_STAGE_TYPES)})
        ).sort_values(["es", "_rk", "id"])
        for es, et in zip(pdf["es"], pdf["event_type"]):
            es = int(es)
            if et == "view" and t1 is None:
                t1 = es
            elif (et == "click" and t2 is None and t1 is not None
                    and t1 <= es <= t1 + window_s):
                t2 = es
            elif (et == "purchase" and t3 is None and t2 is not None
                    and t2 <= es <= t2 + window_s):
                t3 = es
        state.update((t1, t2, t3))
        depth = 3 if t3 is not None else (
            2 if t2 is not None else (1 if t1 is not None else 0))
        yield pd.DataFrame({"user_id": [key[0]], "depth": [depth]})
    return fn


def funnel_stream(spark: SparkSession, source_dir: str, schema: str,
                  window_s: int = 604800) -> DataFrame:
    """File-source stream → per-user running funnel depth (update)."""
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .where(F.col("event_type").isin(*_STAGE_TYPES))
              .select(F.col("user_id"),
                      F.col("event_id").alias("id"),
                      F.col("event_type"),
                      F.unix_timestamp("ts").alias("es")))
    return stream.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(window_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
