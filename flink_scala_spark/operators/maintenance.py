"""Table-maintenance operators: the housekeeping a 100 TB lakehouse
needs between queries.

Small-file compaction is the canonical one: streaming sinks and
over-parallel writes leave thousands of KB-scale parquet files whose
per-file open/footer cost dominates scans. Compaction rewrites a
directory to approximately ``target_mb`` files while preserving rows
exactly.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(src_dir: str, target_mb: int = 128) -> int:
    """Number of output files for ``src_dir``: ceil(bytes / target).
    Driver-side metadata only — no data read."""
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return max(1, math.ceil(total / (target_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``src_dir``'s parquet as ``ceil(size/target_mb)`` files
    at ``dst_dir``; optionally cluster rows with a per-file sort
    (``sortWithinPartitions`` — better column run-lengths and min/max
    pruning, no global sort). ``repartition`` (round-robin) balances
    output file sizes regardless of input skew. Returns the reread
    result for verification."""
    n = plan_compaction(src_dir, target_mb)
    df = spark.read.parquet(src_dir).repartition(n)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
