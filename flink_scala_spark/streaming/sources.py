"""Streaming sources (SURVEY.md §2.1).

- S2 bounded-file-as-stream: the reference reads a text file through
  the streaming env (``hk/helloWorldTest/WordCount2.scala:23``); here
  any testdata parquet replays through ``readStream`` so every batch
  operator has a streaming twin.
- S3 socket source (``StreamWordCount.scala:25``).
- S5 Kafka source with offset control (``SourceFromKafka.scala:25-27``).
- S6 custom generator source (``OrderAnalysy.scala:338-362``): Flink's
  ``SourceFunction`` emitting rate-limited random orders becomes
  Spark's ``rate`` source + a deterministic seeded projection — same
  shape (rows/sec control), reproducible by construction.

Scale notes: the parquet replay source is Spark's production file
source (directory listing + maxFilesPerTrigger backpressure); Kafka
partitions map 1:1 to Spark input partitions — at 100 TB/day the
parallelism lever is topic partitioning, not engine code.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Replay dirs are pure functions of (sf_dir, table, bucketing), so one
#: materialization serves every later invocation in the process (the
#: repeatability test alone replays the same table twice); dirs are
#: removed at interpreter exit instead of accumulating per call.
_REPLAY_CACHE: dict[tuple, str] = {}
#: Serializes get-or-build per process: without it, two concurrent
#: first calls for the same key both materialize replay dirs and the
#: loser's tmpdir is orphaned forever (atexit only removes dirs still
#: referenced by the cache). Builds are rare and test-data-sized, so
#: one coarse lock is fine.
_REPLAY_LOCK = threading.Lock()


def _replay_cache_cleanup() -> None:
    for d in _REPLAY_CACHE.values():
        # d is <tmpdir>/replay — remove the whole tmpdir
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    _REPLAY_CACHE.clear()


atexit.register(_replay_cache_cleanup)


def _dir_bytes(path: str) -> int:
    """Total bytes under ``path`` — the replay's input size, recorded
    with runner.note_replay_input so the bounded runners can size
    shuffle/state partitions from the data instead of the local core
    count (see runner._replay_partitions)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _note_replay(path: str) -> None:
    from flink_scala_spark.streaming import runner

    runner.note_replay_input(_dir_bytes(path))


def _layout_replay_dir(staged: str, out: str) -> str:
    """Move one part file per bucket dir into ascending-named,
    ascending-mtime files under ``out``/replay (both orderings forced
    so maxFilesPerTrigger=1 replays buckets in bucket order)."""
    bdirs = sorted(
        (d for d in os.listdir(staged) if d.startswith("bucket=")),
        key=lambda s: int(s.split("=")[1]),
    )
    replay = os.path.join(out, "replay")
    os.makedirs(replay)
    now = time.time()
    for i, bd in enumerate(bdirs):
        parts = [
            f for f in os.listdir(os.path.join(staged, bd)) if f.endswith(".parquet")
        ]
        assert len(parts) == 1, f"expected one part file in {bd}, got {parts}"
        dst = os.path.join(replay, f"b{i:04d}.parquet")
        shutil.move(os.path.join(staged, bd, parts[0]), dst)
        os.utime(dst, (now + i, now + i))
    return replay


def file_replay(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """S2: replay a testdata parquet table as a stream.

    Uses the batch schema (streaming file sources need one declared);
    ``pathGlobFilter`` isolates the one table inside the shared sf dir.
    The events table's TIMESTAMP(NANOS) column arrives as long nanos
    (see tables.load) and is normalized to TimestampType here too.
    """
    from flink_scala_spark import tables

    batch = tables.load(spark, sf_dir, table)  # also sets nanosAsLong
    raw_schema = spark.read.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir).schema
    try:
        from flink_scala_spark.streaming import runner

        path = os.path.join(sf_dir, f"{table}.parquet")
        # a parquet DIRECTORY would getsize() its inode (no OSError)
        # and silently record a tiny hint (round-12 ADVICE) — route
        # directories through the recursive walk like the bucketed
        # replay paths
        runner.note_replay_input(
            _dir_bytes(path) if os.path.isdir(path) else os.path.getsize(path)
        )
    except OSError:
        pass
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    if table == "events":
        ts_type = dict(stream.dtypes).get("ts")
        if ts_type == "bigint":
            # ts DIV 1000: exact integer nanos->micros (see tables.load).
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # Watermarks require TIMESTAMP; with the session pinned to
            # UTC the cast is an exact identity on the stored micros.
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def file_replay_time_buckets(
    spark: SparkSession, sf_dir: str, table: str, bucket_seconds: int
) -> DataFrame:
    """S2 variant: replay a testdata table as TIME-ORDERED microbatches.

    ``file_replay`` yields ONE batch (one parquet file), which never
    advances the watermark mid-stream — fine for final-state aggs,
    useless for event-time TIMERS, which only fire when a later batch
    moves the watermark past their expiry. This source splits the
    table into epoch-aligned time buckets of ``bucket_seconds`` (one
    distributed partitionBy write), lays the bucket files out in
    ascending time order, and replays them one file per trigger — so
    batch k's rows all postdate batch k-1's, the watermark climbs
    deterministically between batches, and timer-based operators
    (streaming/tws.py) get the reference's multi-watermark timeline
    (ProcessAlarmTest.scala) from bounded testdata.

    Determinism: bucket boundaries are pure functions of the data
    (``unix_micros DIV bucket``), file order is forced by both name and
    mtime, and each bucket is a single part file — so the microbatch
    sequence, and therefore every watermark value, is reproducible
    bit-for-bit at any sf.
    """
    from flink_scala_spark import tables

    cache_key = ("time", sf_dir, table, bucket_seconds)
    with _REPLAY_LOCK:
        replay = _build_time_replay(spark, cache_key, sf_dir, table, bucket_seconds)
    _note_replay(replay)
    schema = spark.read.parquet(replay).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay)
    )


def _build_time_replay(spark, cache_key, sf_dir, table, bucket_seconds):
    from flink_scala_spark import tables

    replay = _REPLAY_CACHE.get(cache_key)
    if replay is None or not os.path.isdir(replay):
        batch = tables.load(spark, sf_dir, table)
        if dict(batch.dtypes).get("ts") == "timestamp_ntz":
            # Watermarks (and unix_micros) need TIMESTAMP; with the session
            # pinned to UTC the cast is an exact identity on stored micros.
            batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
        out = tempfile.mkdtemp(prefix=f"replay_{table}_")
        staged = os.path.join(out, "staged")
        (
            batch.withColumn(
                "bucket", F.expr(f"unix_micros(ts) DIV {bucket_seconds * 1_000_000}")
            )
            .repartition(1)  # one part file per bucket dir; testdata-sized
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(staged)
        )
        replay = _layout_replay_dir(staged, out)
        shutil.rmtree(staged, ignore_errors=True)
        _REPLAY_CACHE[cache_key] = replay
    return replay


def file_replay_id_buckets(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, n_buckets: int
) -> DataFrame:
    """S2 variant for tables WITHOUT an event-time column: replay in
    ascending ID-RANGE microbatches (bucket = id DIV width). Gives
    stateful operators a deterministic multi-batch arrival order —
    batch k's ids all exceed batch k-1's — so "seen earlier" means
    "smaller id", globally, which a batch oracle can express. Same
    determinism levers as :func:`file_replay_time_buckets` (pure
    function of the data, forced file order, one part file per
    bucket)."""
    from flink_scala_spark import tables

    cache_key = ("id", sf_dir, table, id_col, n_buckets)
    with _REPLAY_LOCK:
        replay = _build_id_replay(spark, cache_key, sf_dir, table, id_col, n_buckets)
    _note_replay(replay)
    schema = spark.read.parquet(replay).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay)
    )


def _build_id_replay(spark, cache_key, sf_dir, table, id_col, n_buckets):
    from flink_scala_spark import tables

    replay = _REPLAY_CACHE.get(cache_key)
    if replay is None or not os.path.isdir(replay):
        batch = tables.load(spark, sf_dir, table)
        max_id = batch.agg(F.max(id_col)).collect()[0][0]
        width = (int(max_id) // n_buckets) + 1
        out = tempfile.mkdtemp(prefix=f"replay_{table}_id_")
        staged = os.path.join(out, "staged")
        (
            batch.withColumn("bucket", F.expr(f"{id_col} DIV {width}"))
            .repartition(1)
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(staged)
        )
        replay = _layout_replay_dir(staged, out)
        shutil.rmtree(staged, ignore_errors=True)
        _REPLAY_CACHE[cache_key] = replay
    return replay


def socket_lines(spark: SparkSession, host: str = "localhost", port: int = 7777) -> DataFrame:
    """S3: unbounded lines from TCP (StreamWordCount.scala:25)."""
    return (
        spark.readStream.format("socket").option("host", host).option("port", port).load()
    )


def kafka_reader_options(
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    starting_timestamp_ms: int | None = None,
) -> dict[str, str]:
    """S5 option contract, broker-free and testable: the exact option
    map the Kafka reader is built with. ``startingTimestamp`` is the
    direct mirror of Flink's ``setStartFromTimestamp``
    (SourceFromKafka.scala:26-27 — all partitions start at the first
    offset whose record timestamp >= t); it takes precedence over
    ``startingOffsets`` exactly as the reference's commented-out
    variants are mutually exclusive. Offsets-under-checkpoint (F6,
    SourceFromKafka.scala:24) is Spark's default for streaming Kafka —
    the startingX option only applies to a fresh checkpoint."""
    opts = {"kafka.bootstrap.servers": bootstrap, "subscribe": topic}
    if starting_timestamp_ms is not None:
        opts["startingTimestamp"] = str(starting_timestamp_ms)
    else:
        opts["startingOffsets"] = starting_offsets
    return opts


def kafka_topic(
    spark: SparkSession,
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    starting_timestamp_ms: int | None = None,
) -> DataFrame:
    """S5: Kafka subscription; offsets live in the checkpoint (F6), and
    ``startingTimestamp`` mirrors ``setStartFromTimestamp``
    (SourceFromKafka.scala:27). Requires the kafka connector jar on the
    classpath — absent in this image, so calls fail fast with Spark's
    own missing-source error. The option map itself is pinned by test
    via :func:`kafka_reader_options`.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        topic, bootstrap, starting_offsets, starting_timestamp_ms
    ).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr("CAST(value AS STRING) AS value")


PROVINCES = ("BEIJING", "SHANGHAI", "GUANGZHOU", "SHENZHEN", "TIANJIN")


def rate_orders(spark: SparkSession, rows_per_second: int = 5) -> DataFrame:
    """S6: deterministic twin of the reference's OrderSource
    (OrderAnalysy.scala:338-362): ~5 orders/sec, random province with
    BEIJING double-weighted (:343), money in [10, 11) (:352), ascending
    payTime. Randomness is a pure seeded function of the rate source's
    monotone ``value``, so replays are bit-identical.
    """
    v = F.col("value")
    h = F.abs(F.xxhash64(v))
    # 6 slots, two map to BEIJING => double weight, mirroring the
    # reference's duplicated array entry.
    slot = (h % 6).cast("int")
    province = (
        F.when(slot <= 1, PROVINCES[0])
        .when(slot == 2, PROVINCES[1])
        .when(slot == 3, PROVINCES[2])
        .when(slot == 4, PROVINCES[3])
        .otherwise(PROVINCES[4])
    )
    money = F.round(F.lit(10.0) + (F.abs(F.xxhash64(v, F.lit(1))) % 100) / 100.0, 2)
    return spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load().select(
        v.alias("order_seq"),
        F.md5(v.cast("string")).alias("order_id"),
        F.md5((v + 1000000).cast("string")).alias("user_id"),
        province.alias("province"),
        money.cast("decimal(18,2)").alias("money"),
        F.col("timestamp").alias("pay_time"),
    )
