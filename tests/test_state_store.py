"""Large-state and observability surfaces.

- RocksDB state store provider: the backend a 100 TB streaming state
  actually runs on (the default HDFS-backed store holds state on the
  executor heap; RocksDB spills to local disk). Semantics must be
  byte-identical — the provider is configuration, not code.
- ``observe()`` metrics: Spark's analogue of the reference's runtime
  counters/metrics surface — per-batch aggregates collected without a
  second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _keyed_sum(spark, sf_dir):
    from flink_scala_spark.streaming import sources
    from flink_scala_spark.streaming.runner import run_bounded

    ev = sources.file_replay(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    return {
        (r["user_id"], r["total"]) for r in run_bounded(agg, "complete").collect()
    }


def test_rocksdb_state_store_matches_default_provider(spark, sf_dir):
    """The RocksDB provider must produce the identical final state as
    the default provider for the same keyed streaming aggregation —
    swapping the state backend is a config change, never a semantics
    change."""
    base = _keyed_sum(spark, sf_dir)
    assert base
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, ROCKSDB)
    try:
        rocks = _keyed_sum(spark, sf_dir)
    finally:
        spark.conf.unset(key)
    assert rocks == base


def test_observe_collects_metrics_without_second_pass(spark, sf_dir):
    """df.observe() must report the same aggregates a separate pass
    computes, piggybacked on the query's own execution — the runtime
    metrics/counters surface (Flink's Counter/Gauge analogue)."""
    from pyspark.sql import Observation

    from flink_scala_spark import tables

    ev = tables.load(spark, sf_dir, "events")
    obs = Observation("ev_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    n = observed.count()  # one action drives both the count and the metrics
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"), F.max("value").alias("hi")
    ).first()
    got = obs.get
    assert got["n_rows"] == n == direct["n"]
    assert got["min_v"] == direct["lo"]
    assert got["max_v"] == direct["hi"]


def test_ttl_dedup_expires_out_of_horizon_sources(spark, sf_dir):
    """The TTL'd streaming near-dup state must actually EVICT: its
    flagged pairs are a strict subset of the unbounded variant's —
    same in-horizon pairs, and at least one out-of-horizon source
    dropped (sf0.001 has near-dup pairs up to 470 ids apart vs a
    126-id horizon, so eviction is guaranteed non-vacuous here)."""
    from flink_scala_spark.queries.catalog import QUERIES

    plain = {
        (r["doc_id"], r["first_source"])
        for r in QUERIES["streaming_dedup_minhash"].fn(spark, sf_dir).collect()
    }
    ttl_rows = QUERIES["streaming_dedup_minhash_ttl"].fn(spark, sf_dir).collect()
    ttl_docs = {r["doc_id"] for r in ttl_rows}
    plain_docs = {d for d, _ in plain}
    assert ttl_docs <= plain_docs
    assert ttl_docs < plain_docs  # some doc's ONLY source expired
    # every surviving first_source is >= the plain one (earlier == more
    # likely expired; eviction can only move first_source later)
    plain_first = dict(plain)
    for r in ttl_rows:
        assert r["first_source"] >= plain_first[r["doc_id"]]


def test_ttl_delta_alarm_expires_idle_keys(spark, sf_dir):
    """The TTL'd delta alarm must actually EVICT idle-key state: its
    alarms are a strict subset of the unbounded fold's (computed here
    as a batch lag() under the identical (ts_l, event_id) ordering),
    every dropped alarm's predecessor gap exceeds the horizon (state
    can only be evicted once the watermark — which trails the current
    event — outruns the stored reading by the horizon), and every
    alarm whose gap is within the horizon survives (in-horizon state
    is never evicted)."""
    from pyspark.sql import Window as W

    from flink_scala_spark import tables
    from flink_scala_spark.functions.portable import epoch_seconds
    from flink_scala_spark.queries.catalog import QUERIES
    from flink_scala_spark.queries.streaming_queries import (
        _DELTA_TTL_HORIZON_S,
    )

    w = W.partitionBy("user_id").orderBy("ts_l", "event_id")
    base_df = (
        tables.load(spark, sf_dir, "events")
        .select("user_id", "event_id", epoch_seconds("ts").alias("ts_l"), "value")
        .withColumn("prev", F.lag("value").over(w))
        .withColumn("prev_ts", F.lag("ts_l").over(w))
        .where(F.abs(F.col("value") - F.col("prev")) > 10.0)
    )
    base = {
        r["event_id"]: r["ts_l"] - r["prev_ts"] for r in base_df.collect()
    }
    ttl = {
        r["event_id"]
        for r in QUERIES["streaming_delta_alarm_ttl"].fn(spark, sf_dir).collect()
    }
    assert ttl <= set(base)
    dropped = set(base) - ttl
    assert dropped  # eviction non-vacuous at every shipped sf
    assert all(base[e] > _DELTA_TTL_HORIZON_S for e in dropped)
    within = {e for e, gap in base.items() if gap <= _DELTA_TTL_HORIZON_S}
    assert within <= ttl


def test_ttl_alarm_survives_rows_later_than_horizon(spark, tmp_path):
    """This Spark build does NOT pre-filter late rows from stateful
    processors (measured in test_late_data.py), so a key whose batch
    rows sit more than `horizon` behind the watermark used to compute
    an event-time timeout <= watermark — an IllegalArgumentException
    that killed the whole query. The timeout is now clamped strictly
    above the watermark; the pathologically-late key just gets purged
    at the earliest legal instant."""
    import time

    from flink_scala_spark.streaming import stateful

    # batch 1 drives the watermark to t=200000; batch 2's only row
    # (key 2) is 100000 s older — far past the 600 s horizon
    rows1 = [(1, 10, 100000, 5.0), (1, 11, 200000, 50.0)]
    rows2 = [(2, 20, 100000, 7.0)]
    schema = "user_id long, event_id long, ts long, value double"

    def towrite(rows):
        return spark.createDataFrame(rows, schema).select(
            "user_id", "event_id", F.timestamp_seconds("ts").alias("ts"), "value"
        )

    in_dir = str(tmp_path / "in")
    towrite(rows1).coalesce(1).write.mode("append").parquet(in_dir)
    time.sleep(1.1)  # file-source ordering is by modification time
    towrite(rows2).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(in_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    out = stateful.delta_alarm_ttl(stream, 10.0, horizon_seconds=600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_late_clamp")
        .start()
    )
    try:
        q.processAllAvailable()  # crashed with unclamped timeouts
    finally:
        q.stop()
        q.awaitTermination(30)
    got = spark.table("ttl_late_clamp").collect()
    # key 1's 5.0 -> 50.0 jump alarms; key 2's lone late row cannot
    assert [(r["user_id"], r["event_id"]) for r in got] == [(1, 11)]
