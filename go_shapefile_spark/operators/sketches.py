"""Sketch-based statistics for 100-TB pipelines.

Exact ``COUNT(DISTINCT ...)`` and exact quantiles need a full shuffle of
every distinct value / every row to one place; sketches answer the same
questions with bounded per-group state and map-side mergeability:

* **HLL++** (``approx_count_distinct``) — distinct counts in O(kB) of
  state per group, merged associatively across partitions;
* **KLL/GK-style quantiles** (``percentile_approx``) — rank queries with
  bounded error, also merge-friendly.

Both are Spark-builtin JVM aggregates — nothing leaves whole-stage
codegen.  Sketches are approximate by nature, so the oracle gate pins a
CONTRACT rather than hash-equality of the estimates: the Spark side
computes the estimate AND the exact value in one pass, emits the exact
value plus a within-tolerance boolean per group, and the DuckDB oracle
reproduces the exact values with the booleans pinned TRUE (the
image-invariants gate pattern).  A broken sketch (or a silently changed
default rsd/accuracy) flips the gate red.
"""

from __future__ import annotations


def sketch_stats_spark_sql(rel: str = "documents",
                           rel_tol: float = 0.05) -> str:
    """Spark side: per-source doc stats — exact + sketched, one pass."""
    return f"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT {rel}.text) AS exact_distinct,
       CAST(MIN(LENGTH(text)) AS BIGINT) AS min_len,
       CAST(MAX(LENGTH(text)) AS BIGINT) AS max_len,
       (ABS(approx_count_distinct(text, 0.01D)
            - COUNT(DISTINCT {rel}.text))
          <= {rel_tol} * COUNT(DISTINCT {rel}.text)) AS hll_ok,
       (percentile_approx(LENGTH(text), CAST(0.5 AS DOUBLE), 10000)
          BETWEEN MIN(LENGTH(text)) AND MAX(LENGTH(text))
        AND ABS(percentile_approx(LENGTH(text), CAST(0.5 AS DOUBLE), 10000)
                - MEDIAN(LENGTH(text))) <= GREATEST(1.0,
                    {rel_tol} * MEDIAN(LENGTH(text)))) AS p50_ok
FROM {rel}
GROUP BY source
"""


def sketch_stats_oracle_sql(rel: str = "documents") -> str:
    """DuckDB oracle: the exact columns recomputed relationally, the
    sketch-contract booleans pinned TRUE."""
    return f"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT text) AS exact_distinct,
       CAST(MIN(LENGTH(text)) AS BIGINT) AS min_len,
       CAST(MAX(LENGTH(text)) AS BIGINT) AS max_len,
       TRUE AS hll_ok,
       TRUE AS p50_ok
FROM {rel}
GROUP BY source
"""
