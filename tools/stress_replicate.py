"""Nx replication stress harness for duplication-rich load (default 8x).

Builds a synthetic sf dir whose ``documents`` / ``events`` tables are
the source tables unioned N times with shifted ids (texts/timestamps kept
IDENTICAL, so every row gains N-1 clones — the worst case for dedup
state and candidate-pair growth), then times the requested catalog
queries against it. This is the same treatment every earlier heavy
family got (BASELINE.md stress entries); persisting the harness keeps
future rounds from re-deriving it.

    python tools/stress_replicate.py <src_sf_dir> <query> [query ...]

Set STRESS_REPLICAS to override the replication factor (round 9 runs
the dedup/ANN family at 64x to expose bucket-population blowups an 8x
run hides).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = int(os.environ.get("STRESS_REPLICAS", "8"))
#: id shifts keep replicas in DISTINCT replay buckets so streaming
#: state carries clone signatures across microbatches.
DOC_SHIFT = 1_000_000
EVENT_SHIFT = 10_000_000
USER_SHIFT = 1_000_000


def _write_single_file(df, out: str, table: str) -> None:
    """Write as ONE parquet FILE named {table}.parquet (the testdata
    layout file_replay's pathGlobFilter expects), via a staging dir."""
    staging = os.path.join(out, f"_stage_{table}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    assert len(part) == 1, part
    shutil.move(
        os.path.join(staging, part[0]), os.path.join(out, f"{table}.parquet")
    )
    shutil.rmtree(staging, ignore_errors=True)


def build_stress_dir(spark, src_sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from flink_scala_spark import tables

    out = tempfile.mkdtemp(prefix=f"stress{REPLICAS}x_")
    docs = tables.load(spark, src_sf_dir, "documents")
    reps = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * DOC_SHIFT))
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "documents")

    ev = tables.load(spark, src_sf_dir, "events")
    reps = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(r * EVENT_SHIFT))
        .withColumn("user_id", F.col("user_id") + F.lit(r * USER_SHIFT))
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "events")

    emb = tables.load(spark, src_sf_dir, "embeddings")
    reps = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * DOC_SHIFT))
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "embeddings")

    # TPC-H side (round 8): lineitem/orders shift the order key in
    # lockstep (joins stay valid, every order gains 7 clones); part
    # shifts p_partkey. Remaining dims copy verbatim — their natural
    # fan-in is what the queries assume. The shifts must exceed the
    # source key ranges or replica ranges OVERLAP and clones silently
    # alias (wrong joins, collapsed distinct counts) — refuse loudly.
    li = tables.load(spark, src_sf_dir, "lineitem")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    assert max_ok < EVENT_SHIFT, (
        f"max l_orderkey {max_ok} >= EVENT_SHIFT {EVENT_SHIFT}: replica "
        "key ranges would overlap — raise the shift for this SF"
    )
    reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * EVENT_SHIFT))
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "lineitem")

    orders = tables.load(spark, src_sf_dir, "orders")
    reps = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * EVENT_SHIFT)
        )
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "orders")

    part = tables.load(spark, src_sf_dir, "part")
    max_pk = part.agg(F.max("p_partkey")).collect()[0][0]
    assert max_pk < DOC_SHIFT, (
        f"max p_partkey {max_pk} >= DOC_SHIFT {DOC_SHIFT}: replica key "
        "ranges would overlap — raise the shift for this SF"
    )
    reps = [
        part.withColumn("p_partkey", F.col("p_partkey") + F.lit(r * DOC_SHIFT))
        for r in range(REPLICAS)
    ]
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    _write_single_file(u, out, "part")

    for t in ("region", "nation", "customer", "supplier"):
        shutil.copy(
            os.path.join(src_sf_dir, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    return out


def main() -> int:
    src = sys.argv[1]
    names = sys.argv[2:]
    from flink_scala_spark.queries.catalog import QUERIES
    from flink_scala_spark.session import get_spark

    spark = get_spark(f"stress{REPLICAS}x")
    # STRESS_DIR reuses a prebuilt dir (one query per JVM for the 64x
    # probes — a task OOM then kills one measurement, not the sweep);
    # STRESS_KEEP=1 leaves the dir behind for that reuse.
    stress = os.environ.get("STRESS_DIR") or build_stress_dir(spark, src)
    truthy = ("1", "true", "yes")
    keep = bool(os.environ.get("STRESS_DIR")) or (
        os.environ.get("STRESS_KEEP", "").lower() in truthy
    )
    print(f"stress dir: {stress}")
    try:
        for name in names:
            fn = QUERIES[name].fn
            # 1x baseline then 8x, same process (warm JVM for both)
            t0 = time.time()
            n1 = fn(spark, src).count()
            t1 = time.time()
            n_rep = fn(spark, stress).count()
            t2 = time.time()
            print(
                f"{name}: 1x {t1-t0:.2f}s ({n1} rows) -> "
                f"{REPLICAS}x {t2-t1:.2f}s ({n_rep} rows), "
                f"wall x{(t2-t1)/max(t1-t0,1e-9):.1f}, "
                f"rows x{n_rep/max(n1,1):.1f}"
            )
    finally:
        if not keep:
            shutil.rmtree(stress, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
