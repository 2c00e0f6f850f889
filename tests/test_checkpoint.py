"""F1-F6 fault-tolerance smoke (SURVEY.md §2.8; CheckPointTest.scala:29-52).

The reference configures Flink checkpointing (60 s interval,
EXACTLY_ONCE, FsStateBackend, externalized retention); the Spark
equivalent is a ``checkpointLocation`` per streaming query — offsets
(F6) and state-store snapshots commit per microbatch, and a restarted
query resumes both. The test proves the guarantee end to end:

1. run a keyed streaming aggregation over input batch 1 with a
   checkpoint dir, stop it (planned shutdown = externalized retention,
   F5);
2. drop input batch 2, restart the SAME plan on the SAME checkpoint
   (fixed-delay-restart stand-in, F4);
3. the final totals must equal the batch ground truth over batch1+2 —
   only possible if the restart restored the aggregation state (F2) AND
   did not re-read batch-1 files (F6): re-reading would double-count,
   losing state would drop batch 1.

Also proves the K6 upsert sink stays exactly-once across a restart
(committed-batch markers survive and replays are skipped).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_scala_spark.streaming.sinks import DuckDBUpsertWriter


def _write_batch(spark, src, dest_dir, lo, hi):
    (
        src.where((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        .coalesce(1)
        .write.mode("append")
        .parquet(dest_dir)
    )


@pytest.fixture()
def split_input(spark, sf_dir, tmp_path):
    """The events table split into two parquet drops (by event_id)."""
    from flink_scala_spark import tables

    src = tables.load(spark, sf_dir, "events")
    mid = src.approxQuantile("event_id", [0.5], 0.0)[0]
    in_dir = str(tmp_path / "input")
    _write_batch(spark, src, in_dir, -(1 << 62), int(mid))
    return src, in_dir, int(mid)


def _start(spark, in_dir, schema, ckpt, writer):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total")
    )
    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(writer)
        .start()
    )


def test_restart_resumes_state_and_offsets(spark, sf_dir, tmp_path, split_input):
    src, in_dir, mid = split_input
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.duckdb")
    schema = spark.read.parquet(in_dir).schema
    # Update-mode emits per-key deltas each microbatch; the accumulate
    # upsert would double-count re-emitted keys, so the sink REPLACES
    # per-key rows (last write wins) — the OrderMysqlSink totals
    # pattern with the running aggregate carried by the engine's state.
    writer = DuckDBUpsertWriter(
        db,
        "totals",
        key_cols=["user_id"],
        add_cols=["cnt", "total"],
        ddl="CREATE TABLE IF NOT EXISTS totals("
        "user_id BIGINT PRIMARY KEY, cnt BIGINT, total DOUBLE)",
        mode="replace",
    )
    writer_fn = writer

    q = _start(spark, in_dir, schema, ckpt, writer_fn)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    # phase-1 sanity: sink holds batch-1 totals only
    con = duckdb.connect(db)
    n1 = con.execute("SELECT sum(cnt) FROM totals").fetchone()[0]
    con.close()
    exp1 = src.where(F.col("event_id") < mid).count()
    assert n1 == exp1

    # drop batch 2, restart on the same checkpoint
    _write_batch(spark, src, in_dir, mid, 1 << 62)
    q2 = _start(spark, in_dir, schema, ckpt, writer_fn)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination(30)

    expected = (
        src.groupBy("user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("user_id")
        .collect()
    )
    con = duckdb.connect(db)
    got = con.execute(
        "SELECT user_id, cnt, total FROM totals ORDER BY user_id"
    ).fetchall()
    con.close()
    assert len(got) == len(expected)
    for (g_uid, g_cnt, g_total), e in zip(got, expected):
        assert g_uid == e["user_id"]
        assert g_cnt == e["cnt"], f"user {g_uid}: restart lost or replayed rows"
        assert abs(g_total - float(e["total"])) < 1e-6

    # checkpoint dir externalized: offsets + commits + state survive (F5)
    assert os.path.isdir(os.path.join(ckpt, "offsets"))
    assert os.path.isdir(os.path.join(ckpt, "state"))


def test_restart_resumes_stream_stream_join_state(spark, sf_dir, tmp_path):
    """F2/F6 for JOIN state: an interval join's buffered rows must
    survive a restart. The input is split by TIME; matches whose click
    arrived in drop 1 and whose error arrives in drop 2 can only be
    emitted if the restarted query restored the click-side state AND
    did not re-read drop 1 (re-reading would duplicate pairs in the
    append sink)."""
    import duckdb as _dd

    from flink_scala_spark import tables

    from flink_scala_spark.functions.portable import epoch_seconds

    src = tables.load(spark, sf_dir, "events")
    mid_ts = src.select(
        F.percentile_approx(epoch_seconds("ts"), 0.5, 10000).alias("m")
    ).first()["m"]
    in_dir = str(tmp_path / "jinput")
    (
        src.where(epoch_seconds("ts") < mid_ts)
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )
    ckpt = str(tmp_path / "jckpt")
    db = str(tmp_path / "jsink.duckdb")
    schema = spark.read.parquet(in_dir).schema

    def build(stream):
        # watermarks need TIMESTAMP; the raw parquet may carry NTZ
        # (session pinned to UTC -> the cast is an exact identity)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        errors = (
            stream.where(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("error_id"),
                "user_id",
                F.col("ts").alias("e_ts"),
            )
            .withWatermark("e_ts", "1 minute")
        )
        clicks = (
            stream.where(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 minute")
        )
        return errors.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("e_ts") - F.expr("interval 10 minutes"))
            & (F.col("c_ts") <= F.col("e_ts")),
            "inner",
        ).select("error_id", "click_id")

    def writer(batch_df, batch_id):
        pdf = batch_df.toPandas()
        con = _dd.connect(db)
        try:
            con.execute(
                "CREATE TABLE IF NOT EXISTS pairs(error_id BIGINT, click_id BIGINT)"
            )
            con.execute(
                "CREATE TABLE IF NOT EXISTS _done(batch_id BIGINT PRIMARY KEY)"
            )
            if con.execute(
                "SELECT 1 FROM _done WHERE batch_id = ?", [batch_id]
            ).fetchone():
                return
            con.execute("BEGIN")
            con.register("_b", pdf)
            con.execute("INSERT INTO pairs SELECT error_id, click_id FROM _b")
            con.execute("INSERT INTO _done VALUES (?)", [batch_id])
            con.execute("COMMIT")
        finally:
            con.close()

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            build(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(writer)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    run_once()
    (
        src.where(epoch_seconds("ts") >= mid_ts)
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )
    run_once()

    errors_b = src.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    clicks_b = src.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    expected = {
        (r["error_id"], r["click_id"])
        for r in errors_b.join(
            clicks_b,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("e_ts") - F.expr("interval 10 minutes"))
            & (F.col("c_ts") <= F.col("e_ts")),
            "inner",
        ).collect()
    }
    con = _dd.connect(db)
    got = con.execute("SELECT error_id, click_id FROM pairs").fetchall()
    con.close()
    assert len(got) == len(set(got)), "replayed batches duplicated pairs"
    cross = {
        (e, c)
        for (e, c) in expected
        if e is not None and c is not None
    }
    assert set(got) == cross


def test_restart_serving_reloads_same_staged_index(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-11 verdict item 5: the seam between the persisted PQ
    index's manifest discipline (X143-style commit records) and the
    streaming checkpoint story. A ``streaming_ann_pq_serving``-shaped
    query is stopped mid-replay and restarted on the same checkpoint;
    the restarted run must (a) load the SAME staged index — same
    fingerprint dir, commit record untouched, no re-train — and (b)
    emit exactly the remaining batches' results, so the sink union
    equals the batch operator's answer with no duplicate or missing
    rows (duplicates would mean batch-1 files were re-read; gaps would
    mean the restart skipped offsets)."""
    import json as _json

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)

    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    qids = sorted(r["vec_id"] for r in queries.select("vec_id").collect())
    assert len(qids) >= 4, "fixture too small to split"
    mid = qids[len(qids) // 2]

    in_dir = str(tmp_path / "qin")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sink, exist_ok=True)
    (
        queries.where(F.col("vec_id") < mid)
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )
    schema = spark.read.parquet(in_dir).schema

    def run_phase():
        """Build the serving query exactly like the catalog entry:
        load-or-build the persisted index, then score each microbatch
        against it inside foreachBatch, appending to the sink."""
        enc, cb = similarity.pq_persisted_index(emb)

        def serve(batch_df, _bid):
            if batch_df.isEmpty():
                return
            q = similarity.flatten(batch_df, "e", "query_id")
            qdt = similarity.pq_query_tables(q, cb)
            top = similarity.pq_adc_topk(enc, qdt, k=5)
            top.coalesce(1).write.mode("append").parquet(sink)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(serve)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    # ---- phase 1: serve batch 1, then stop (mid-replay) -----------
    run_phase()
    dirs = os.listdir(home)
    assert len(dirs) == 1 and dirs[0].startswith("pq-")
    staged = os.path.join(home, dirs[0])
    manifest_path = os.path.join(staged, "MANIFEST.json")
    with open(manifest_path) as f:
        fp1 = _json.load(f)["fingerprint"]
    mtimes1 = {
        f: os.stat(os.path.join(staged, f)).st_mtime_ns
        for f in os.listdir(staged)
    }
    out_schema = "query_id long, neighbor_id long, approx_dist double, rank int"
    n_phase1 = spark.read.schema(out_schema).parquet(sink).count()
    assert n_phase1 == 5 * sum(1 for q_ in qids if q_ < mid)

    # ---- drop batch 2, restart the SAME plan on the SAME checkpoint
    (
        queries.where(F.col("vec_id") >= mid)
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )
    run_phase()

    # (a) same staged index: one dir, same fingerprint, commit record
    # and artifacts byte-untouched (the restart LOADED, never re-built)
    assert os.listdir(home) == dirs
    with open(manifest_path) as f:
        assert _json.load(f)["fingerprint"] == fp1
    mtimes2 = {
        f: os.stat(os.path.join(staged, f)).st_mtime_ns
        for f in os.listdir(staged)
    }
    assert mtimes1 == mtimes2, "restart re-staged the index"

    # (b) identical remaining results: the sink union over both runs
    # equals the batch operator's answer over ALL queries, exactly once
    got = sorted(
        map(tuple, spark.read.schema(out_schema).parquet(sink).collect())
    )
    qflat = similarity.flatten(queries, "e", "query_id")
    qdt = similarity.pq_query_tables(qflat, similarity.pq_codebook(emb))
    expected = sorted(
        map(
            tuple,
            similarity.pq_adc_topk(
                similarity.pq_encode(emb, similarity.pq_codebook(emb)), qdt, k=5
            ).collect(),
        )
    )
    assert got == expected
