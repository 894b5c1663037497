"""Distributed connected components (near-dup clustering).

The dedup family emits spanning EDGE sets (minhash/simhash/ngram pairs,
image ahash pairs); turning edges into duplicate GROUPS — "keep one
representative per component" — needs connected components.  This is
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): each
iteration is two groupBy+join rounds of pure DataFrame ops, and the
edge set converges to a star per component (every node pointing at its
component's minimum id) in O(log n) iterations — unlike naive label
propagation, whose round count grows with the graph diameter.

Scale posture: each iteration shuffles the current edge set on its
node keys (no all-pairs anything); iterates are pinned through
operators/pinning.py (anonymous per-call slot — ``pin="storage"`` for
durable multi-hour runs), so lineage stays one round deep and the
convergence probe piggybacks on the pin job.  Convergence is detected
by an order-independent checksum of the edge set (count + sum of
per-edge hashes), not by comparing materialized sets.

Correctness: the gate oracle computes the same components in DuckDB
with a recursive CTE (transitive closure + MIN per node) — a genuinely
different algorithm on a different engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's smallest neighbor
    (including u itself)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (sym.groupBy("src")
            .agg(F.min("dst").alias("_mn"))
            .select("src", F.least(F.col("_mn"), F.col("src")).alias("mn")))
    return (sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect all
    members to the minimum."""
    e = edges.select(F.greatest("src", "dst").alias("src"),
                     F.least("src", "dst").alias("dst"))
    mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
    members = (e.join(mins, "src")
               .select(F.col("dst").alias("node"), "mn")
               .unionByName(mins.select(F.col("src").alias("node"), "mn")))
    return (members.where(F.col("node") != F.col("mn"))
            .select(F.col("node").alias("src"), F.col("mn").alias("dst"))
            .distinct())


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: SUM over int64 hashes overflows under
        # ANSI mode (Spark 4 default here)
        F.coalesce(F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("h")
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         pin: str | None = None) -> DataFrame:
    """Undirected edge list → (node, component) with component = the
    smallest node id in each connected component.  Nodes are every
    distinct endpoint (isolated nodes don't appear — they were never in
    an edge).  Ids must be an orderable type (long/string).

    ``max_iter`` bounds the alternating rounds (convergence is
    O(log n); 25 covers any realistic graph) — non-convergence raises
    rather than returning partial labels.
    """
    from .pinning import rolling_pins

    spark = edges.sparkSession
    # rolling: only the newest iterate is ever re-read, so superseded
    # rounds release as soon as their successor materializes (bounded
    # at 2 copies instead of max_iter+1)
    pinf = rolling_pins(spark, pin)
    cur = pinf(edges
               .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
               .where(F.col("src") != F.col("dst"))
               .distinct())
    prev = _checksum(cur)
    for _ in range(max_iter):
        cur = pinf(_small_star(_large_star(cur)))
        now = _checksum(cur)
        if now == prev:
            break
        prev = now
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations")
    roots = cur.select(F.col("dst").alias("node"),
                       F.col("dst").alias("component")).distinct()
    return (cur.select(F.col("src").alias("node"),
                       F.col("dst").alias("component"))
            .unionByName(roots)
            .distinct())


def dedup_keep_representatives(edges: DataFrame, src: str = "src",
                               dst: str = "dst",
                               pin: str | None = None) -> DataFrame:
    """The pipeline verb on top of components: (node, component,
    is_representative) — keep rows where is_representative, drop the
    rest.  The representative is the component minimum (deterministic
    across runs and partitionings)."""
    cc = connected_components(edges, src, dst, pin=pin)
    return cc.withColumn("is_representative",
                         F.col("node") == F.col("component"))
