"""Scale-adaptive scan-parallelism floor (round-8, guide §2.5/§6).

A small parquet input (one row group) yields a single scan split, so
every narrow stage above it — token explode, per-shingle md5, the
64-permutation MinHash mins, the embedding feature sums — runs in ONE
task while the rest of the cluster idles. That is the guide's "input
skew: one huge unsplittable file" case at the opposite end of the size
axis, and the fix is the same: redistribute once, immediately after the
read.

``ensure_scan_parallelism`` is deliberately CONDITIONAL: it fires only
when the frame's planned partition count is below the session's default
parallelism, so at production scale (where a byte-ranged scan already
yields ≥ cores splits) the plan is untouched — no unconditional exchange
is ever added to the 100 TB path. The redistribution is a DETERMINISTIC
hash repartition on a stable key (never round-robin-on-rand — the
SPARK-38388 retry-duplication class).

Cheap, narrow queries (pii_mask, blocklist_filter, quantize) keep their
plan-guarded zero-exchange shape by simply not opting in: this helper is
wired only into operators whose per-row work is heavy enough that
serializing it on one core dominates the query (measured at sf0.1:
the MinHash signature pipeline ran ~1.9 s single-task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition ``df`` on ``key`` up to the session's default
    parallelism IF AND ONLY IF its planned partition count is lower —
    a no-op (plan untouched) whenever the source already scans wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic frames: leave untouched
        return df
    if current >= target:
        return df
    return df.repartition(target, key)
