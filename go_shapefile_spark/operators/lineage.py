"""Per-partition lineage + idempotent checkpoint/resume (SURVEY.md §2.B E11).

North rule: "resumable from checkpoint with per-partition lineage +
metrics".  An Iceberg ``_lineage`` side table would hold one row per
(stage, partition) with row counts and the input snapshot id; here the
same semantics run on a parquet directory (the sandbox has no Iceberg
runtime jar — SURVEY.md §7 slice 3 fallback; the directory version plays
the snapshot id).

Protocol (crash-safe by construction):
1. a partition's output is written to ``<out>/<stage>/part=<key>`` first,
2. only then is its lineage row appended (write-temp + atomic rename),
3. a re-run skips every partition whose lineage row says ``done`` —
   half-written outputs without a lineage row are overwritten.
So any stage can be killed at any point and re-run to an identical
final state (verified by the kill-and-rerun test).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Callable

from pyspark.sql import DataFrame


class LineageLog:
    """Append-only lineage ledger: one JSON file per completed partition
    (object-store friendly: no read-modify-write, atomic rename)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        d = os.path.join(self.root, stage)
        os.makedirs(d, exist_ok=True)
        return d

    def done(self, stage: str) -> dict[str, dict]:
        out = {}
        d = self._stage_dir(stage)
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    out[rec["partition"]] = rec
        return out

    def record(self, stage: str, partition: str, row_count: int,
               snapshot_id: str, metrics: dict | None = None) -> None:
        rec = {"stage": stage, "partition": partition, "row_count": row_count,
               "snapshot_id": snapshot_id, "status": "done",
               "wall_time_s": metrics.get("wall_time_s") if metrics else None}
        d = self._stage_dir(stage)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(d, f"{partition}.json"))


def run_stage(stage: str, partitions: list[str],
              build: Callable[[str], DataFrame],
              out_root: str, lineage: LineageLog,
              snapshot_id: str = "v1") -> dict[str, int]:
    """Run ``build(partition)`` for every partition not yet marked done;
    write each result to its own directory, then record lineage.

    Returns {partition: row_count} for the partitions run this call.
    """
    done = lineage.done(stage)
    ran: dict[str, int] = {}
    for key in partitions:
        if key in done:
            continue
        t0 = time.monotonic()
        df = build(key)
        out_dir = os.path.join(out_root, stage, f"part={key}")
        df.write.mode("overwrite").parquet(out_dir)
        # row count from what was actually written (cheap metadata read)
        n = df.sparkSession.read.parquet(out_dir).count()
        lineage.record(stage, key, n, snapshot_id,
                       {"wall_time_s": time.monotonic() - t0})
        ran[key] = n
    return ran


def stage_output(spark, out_root: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_root, stage))
