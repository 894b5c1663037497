"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (the pattern the engine uses for stateful
ops that windowed aggregation can't express).

State per user: (last event epoch, session count, event count).  A new
session opens when the gap to the previous event exceeds ``gap_s``.
Each micro-batch emits the running totals per updated user (update
mode), so draining a bounded source with one availableNow trigger yields
exactly the batch sessionization (tested against the ``event_sessions``
oracle query).

At scale the state store shards by user hash across partitions and
checkpoints per micro-batch — the streaming twin of the lineage table's
resume semantics.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("last_es", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])


def _session_fn(gap_s: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_es, n_sessions, n_events = state.get
        else:
            last_es, n_sessions, n_events = None, 0, 0
        es = pd.concat([pdf["es"] for pdf in pdfs]).sort_values()
        for v in es:
            v = int(v)
            if last_es is None or v - last_es > gap_s:
                n_sessions += 1
            last_es = v
            n_events += 1
        state.update((last_es, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})
    return fn


def sessionize_stream(spark: SparkSession, source_dir: str, schema: str,
                      gap_s: int = 1800) -> DataFrame:
    """File-source stream → stateful running session counts per user."""
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .select(F.col("user_id"),
                      F.unix_timestamp("ts").alias("es")))
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
