"""Table-maintenance operators: the housekeeping a 100 TB lakehouse
needs between queries.

Small-file compaction is the canonical one: streaming sinks and
over-parallel writes leave thousands of KB-scale parquet files whose
per-file open/footer cost dominates scans. Compaction rewrites a
directory to approximately ``target_mb`` files while preserving rows
exactly.
"""

from __future__ import annotations

import atexit
import math
import os
import shutil
import tempfile
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

#: Scratch dirs for maintenance roundtrips, one per logical key —
#: reused across invocations in a process (the driver gate, pytest,
#: and bench may each run the same entry) and removed at exit.
_SCRATCH: dict[tuple, str] = {}


def _scratch_cleanup() -> None:
    for d in _SCRATCH.values():
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH.clear()


atexit.register(_scratch_cleanup)


_SCRATCH_LOCK = threading.Lock()


def scratch_dir(*key) -> str:
    """Process-cached scratch directory for the given key."""
    with _SCRATCH_LOCK:
        d = _SCRATCH.get(key)
        if d is None or not os.path.isdir(d):
            d = tempfile.mkdtemp(prefix="maint_")
            _SCRATCH[key] = d
        return d


def stage_once(path: str, write_fn) -> str:
    """Stage a deterministic dataset at ``path`` exactly once,
    atomically: ``write_fn(tmp)`` writes to a sibling temp directory
    which is then renamed into place. ``path`` is therefore only ever
    observed absent or complete — a concurrent invocation of the same
    query (the tests/test_concurrency.py pattern) either wins the
    rename or discards its own temp copy, and a crashed partial write
    leaves only an orphaned ``.tmp-*`` sibling, never a half-staged
    ``path`` that later callers would trust. Requires ``write_fn`` to
    be deterministic in content (both racers write the same rows), as
    every caller here is."""
    if os.path.isdir(path):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    write_fn(tmp)
    with _SCRATCH_LOCK:
        if os.path.isdir(path):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            try:
                os.rename(tmp, path)
            except OSError:
                if not os.path.isdir(path):
                    # NOT a racer (permissions, I/O, path-is-a-file):
                    # keep the staged copy and surface the real error
                    raise
                # A cross-process racer renamed first; ours is a
                # byte-equivalent duplicate — drop it.
                shutil.rmtree(tmp, ignore_errors=True)
    return path


def fresh_subdir(base: str, prefix: str) -> str:
    """A per-invocation output directory under a cached scratch base,
    so concurrent invocations never overwrite-race on one destination;
    everything under ``base`` is removed by the atexit cleanup."""
    return tempfile.mkdtemp(prefix=prefix + "_", dir=base)


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


ZORDER_BITS = 8  # per-dimension resolution: 256 buckets


def zorder_value(df: DataFrame, col_a: str, col_b: str):
    """Morton (Z-order) key over two numeric columns, as a pure column
    expression plus the one tiny stats agg it needs.

    Each column is min/max-normalized into ``2^ZORDER_BITS`` uniform
    buckets (the stats agg is a single map-side-combinable reduce —
    O(1) driver data), then the two 8-bit bucket ids interleave
    bit-by-bit into a 16-bit z-value. Sorting by the z-value clusters
    rows so that parquet min/max stats prune on EITHER column — the
    multi-dimensional generalization of the single-column
    ``sort_cols`` clustering above.

    Returns (df_with_zval, stats_row) — the z-value column is named
    ``_zval``.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_a).alias("min_a"),
        F.max(col_a).alias("max_a"),
        F.min(col_b).alias("min_b"),
        F.max(col_b).alias("max_b"),
    ).first()
    n_buckets = (1 << ZORDER_BITS) - 1

    def bucket(col: str, lo, hi):
        if hi == lo:
            return F.lit(0)
        frac = (F.col(col).cast("double") - float(lo)) / (float(hi) - float(lo))
        return F.least(
            F.floor(frac * (n_buckets + 1)).cast("int"), F.lit(n_buckets)
        )

    ba = bucket(col_a, stats["min_a"], stats["max_a"])
    bb = bucket(col_b, stats["min_b"], stats["max_b"])
    z = F.lit(0)
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return df.withColumn("_zval", z.cast("int")), stats


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, num_files: int
) -> DataFrame:
    """Cluster ``df`` into ``num_files`` z-ordered partitions:
    range-partition on the Morton key, then sort within each partition
    — after writing, per-file min/max spans of BOTH columns shrink to
    ~1/sqrt(files) of their global range, so predicates on either
    column skip most files. No global sort: repartitionByRange samples
    split points, the per-partition sorts are local."""
    z, _ = zorder_value(df, col_a, col_b)
    return z.repartitionByRange(num_files, "_zval").sortWithinPartitions("_zval")
