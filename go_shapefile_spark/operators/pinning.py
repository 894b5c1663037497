"""Pinned-relation materialization (the LSH-signature durability seam).

Several composed queries (MinHash/SimHash/ngram dedup self-joins, the
exact-kNN frontier, the tile pyramid) must materialize a small
intermediate relation once: Spark inlines CTEs per reference, and
CacheManager substitution silently fails inside banded union-over-agg
self-join compositions (round-4 finding — ``isCached()`` lies while the
planned tree re-inlines the subtree per reference).  A pinned relation
is a plan LEAF, so references physically cannot recompute it.

Two strategies, selected per call or globally:

``local`` (default)
    ``DataFrame.localCheckpoint()`` — executor-local block storage.
    Fastest, zero external dependencies; the right default for gate
    queries and short jobs.  **Cluster caveat** (VERDICT r4): the blocks
    live only on the executors that computed them, so losing an executor
    after the checkpoint invalidates the RDD and fails the job — a wrong
    default for a multi-hour 100-TB pipeline.

``storage``
    Materialize to reliable storage as parquet and scan it back.  The
    returned DataFrame is a plain parquet scan: it survives executor
    loss (and even a driver restart within the pin directory's
    lifetime), and like the checkpoint it is immune to re-inlining.
    The pin directory comes from ``spark.graft.pin.dir`` (point it at
    shared storage — HDFS/S3 — on a real cluster; any URI pyarrow.fs
    accepts works) or falls back to a per-application temp directory,
    which is only correct on a single machine.  ``df.checkpoint()``
    with ``sc.setCheckpointDir`` is the same durability class; parquet
    is preferred here because the scan-back re-enters Catalyst as a
    columnar source (pushdown/pruning still apply downstream).

Strategy resolution order: explicit ``strategy=`` argument, then the
``SPARK_GRAFT_PIN`` environment variable, then the
``spark.graft.pin.strategy`` conf, then ``local``.

Pins are recycled per (session, slot): a fresh :func:`fresh_pins` call
releases the PREVIOUS call's blocks/files for that slot — without this,
every gate/bench invocation pins fresh blocks forever (measured round
4: +2 persistent RDDs per call; ContextCleaner never reclaims them
while the session lives).
"""

from __future__ import annotations

import os
import posixpath
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources import fsio

PIN_STRATEGY_CONF = "spark.graft.pin.strategy"
PIN_DIR_CONF = "spark.graft.pin.dir"

_PINS: dict[tuple[int, str], list[Callable[[], None]]] = {}
_ANON = [0]      # counter for anonymous (per-call, non-recycled) slots


def pin_strategy(spark: SparkSession, strategy: str | None = None) -> str:
    s = (strategy or os.environ.get("SPARK_GRAFT_PIN")
         or spark.conf.get(PIN_STRATEGY_CONF, "local"))
    if s not in ("local", "storage"):
        raise ValueError(f"unknown pin strategy {s!r} "
                         "(expected 'local' or 'storage')")
    return s


def pin_dir(spark: SparkSession) -> str:
    """Root directory for ``storage`` pins.  On a cluster this MUST be
    shared storage (set ``spark.graft.pin.dir``); the temp-dir fallback
    is only correct for local mode."""
    base = (os.environ.get("SPARK_GRAFT_PIN_DIR")
            or spark.conf.get(PIN_DIR_CONF, None))
    if not base:
        base = os.path.join(
            tempfile.gettempdir(),
            f"spark-graft-pins-{spark.sparkContext.applicationId}")
    return base


def fresh_pins(spark: SparkSession, slot: str | None,
               strategy: str | None = None) -> Callable[[DataFrame],
                                                        DataFrame]:
    """Release any previous pins for (session, ``slot``) and return a
    ``pin(df) -> df`` that materializes a DataFrame under the resolved
    strategy.

    Release happens at FACTORY time, never between pins of the same
    call: iterative operators (kNN frontier rounds, pyramid levels)
    chain pins — each round reads the previous round's pin, and the
    final union reads ALL of them — so intra-call pins must stay alive
    until the NEXT invocation of the same slot.

    ``slot=None`` allocates an ANONYMOUS per-call slot that is never
    recycled by later calls: public operators use this so a previous
    call's returned DataFrame stays valid when the operator runs again
    in the same session (two tile pyramids, two kNN batches).  Named
    slots are for runners whose previous result is one-shot by
    construction (the gate/bench harness): the recycle releases it.
    Anonymous pins live until session stop or :func:`release_pins`."""
    s = pin_strategy(spark, strategy)
    if slot is None:
        _ANON[0] += 1
        slot = f"anon_{_ANON[0]}"
    key = (id(spark), slot)
    for release in _PINS.pop(key, []):
        try:
            release()
        except Exception:
            pass   # session restarted / executor gone — nothing to free
    handles = _PINS.setdefault(key, [])

    def pin(df: DataFrame) -> DataFrame:
        if s == "local":
            ck = df.localCheckpoint()
            jrdd = ck._jdf.queryExecution().analyzed().rdd()
            handles.append(lambda: jrdd.unpersist(False))
            return ck
        path = posixpath.join(pin_dir(spark), f"{slot}_{len(handles)}")
        df.write.mode("overwrite").parquet(path)
        handles.append(lambda: fsio.rmtree(path))
        return spark.read.parquet(path)

    return pin


def rolling_pins(spark: SparkSession,
                 strategy: str | None = None,
                 lazy: bool = False) -> Callable[[DataFrame], DataFrame]:
    """Pin factory for loops where ONLY the newest iterate is ever read
    again (connected-components contraction): each pin materializes the
    new DataFrame FIRST — its plan reads the previous pin — and then
    releases the superseded one, so block/disk usage stays bounded at
    two iterates instead of one per round (r5 review).  NOT safe for
    loops whose final result unions every round (kNN frontier, pyramid
    levels) — use :func:`fresh_pins` there.

    ``lazy=True`` (local strategy only) defers materialization to the
    caller's NEXT action over the pinned DataFrame — for loops that
    immediately run a convergence probe over each iterate, this fuses
    the checkpoint job and the probe job into one (r6; the probe's
    first pass computes AND persists the blocks).  Only safe when the
    caller guarantees such an action before the following pin."""
    s = pin_strategy(spark, strategy)
    _ANON[0] += 1
    slot = f"anon_{_ANON[0]}"
    key = (id(spark), slot)
    counter = [0]

    def pin(df: DataFrame) -> DataFrame:
        n = counter[0]
        counter[0] += 1
        if s == "local":
            out = df.localCheckpoint(eager=not lazy)
            jrdd = out._jdf.queryExecution().analyzed().rdd()
            release = (lambda: jrdd.unpersist(False))
        else:
            path = posixpath.join(pin_dir(spark), f"{slot}_r{n}")
            df.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
            release = (lambda: fsio.rmtree(path))
        prev = _PINS.pop(key, [])
        if s == "local" and lazy:
            # the new pin has NOT materialized yet and its plan reads
            # the newest previous pin (whose checkpoint cannot be
            # recomputed once unpersisted) — defer that one's release
            # by one round; anything older is no longer referenced
            _PINS[key] = prev[-1:] + [release]
            prev = prev[:-1]
        else:
            _PINS[key] = [release]
        for rel in prev:
            try:
                rel()
            except Exception:
                pass
        return out

    def release_slot() -> None:
        """Release the newest (last remaining) pin.  For loops whose
        RETURN VALUE does not read the final pin (learn_bpe returns a
        plain list): call after the loop, or the slot leaks one pinned
        relation per invocation until session stop.  Loops whose result
        DataFrame reads the final pin (connected_components) must NOT
        call this."""
        for rel in _PINS.pop(key, []):
            try:
                rel()
            except Exception:
                pass

    pin.release = release_slot
    return pin


def release_pins(spark: SparkSession, slot: str | None = None) -> None:
    """Explicitly release pinned relations: one named slot, or (default)
    every pin this session holds — named and anonymous.  After release,
    DataFrames returned by the affected calls are invalid."""
    sid = id(spark)
    keys = [k for k in _PINS
            if k[0] == sid and (slot is None or k[1] == slot)]
    for k in keys:
        for release in _PINS.pop(k):
            try:
                release()
            except Exception:
                pass
