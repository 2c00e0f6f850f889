"""W5 streaming semantics, measured: how Spark treats post-watermark rows.

Flink separates watermark delay from ``allowedLateness`` (late rows
re-fire the window, then drain to a side output). Spark's streaming
aggregation — verified here on a two-batch replay, late batch second —
admits late rows, re-creates the already-evicted window state, and
re-EMITS the window at the next eviction: one more output row for the
same window key. The watermark drives state eviction and append-mode
emission timing; it does not filter aggregation input
(numRowsDroppedByWatermark stays 0 for this operator).

That makes the end-to-end behavior equivalent to Flink's re-fire
pattern when the sink upserts by window key — exactly the reference
dashboard's accumulate-upsert JDBC sink (OrderAnalysy.scala:153-273).
The batch twin `late_data_accounting` covers the drop/route
*classification* analytics; this test pins down the live engine
contract so it can't silently change under us.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_late_rows_refire_windows(spark, sf_dir, tmp_path):
    from flink_scala_spark import tables

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    on_time = ev.where(F.col("event_id") >= mid)
    late = ev.where(F.col("event_id") < mid)
    wm_floor = on_time.agg(F.max("ts")).collect()[0][0]
    late = late.where(F.col("ts") < F.lit(wm_floor) - F.expr("INTERVAL 20 MINUTES"))
    assert late.count() > 0, "fixture must contain genuinely late rows"

    in_dir = str(tmp_path / "in")
    on_time.coalesce(1).write.mode("append").parquet(in_dir)
    time.sleep(1.1)  # file-source ordering is by modification time
    late.coalesce(1).write.mode("append").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_refire_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    emitted = spark.table("late_refire_test")

    # (1) late windows DID re-fire: the sink holds window rows from the
    # late batch, all below the watermark that was in effect then
    late_min = late.agg(F.min("ts")).collect()[0][0]
    assert emitted.where(F.col("w.start") <= F.lit(late_min)).count() > 0

    # (2) nothing was lost: emitted counts + the unclosed tail windows
    # (end above the final watermark, still in state) cover every row
    final_wm = wm_floor  # late batch is older, so max event time is unchanged
    all_windows = ev.where(
        (F.col("event_id") >= mid)
        | (F.col("ts") < F.lit(wm_floor) - F.expr("INTERVAL 20 MINUTES"))
    ).groupBy(F.window("ts", "5 minutes").alias("w")).agg(F.count("*").alias("cnt"))
    unclosed = (
        all_windows.where(
            F.col("w.end") > F.lit(final_wm) - F.expr("INTERVAL 10 MINUTES")
        )
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)))
        .collect()[0][0]
    )
    total_in = all_windows.agg(F.sum("cnt")).collect()[0][0]
    got = emitted.agg(F.sum("cnt")).collect()[0][0]
    assert got == total_in - unclosed

    # (3) an upsert keyed on the window reconciles re-fires: one row per
    # window key after the merge, counts matching the batch ground truth
    merged = emitted.groupBy("w").agg(F.sum("cnt").alias("cnt"))
    closed_truth = all_windows.where(
        F.col("w.end") <= F.lit(final_wm) - F.expr("INTERVAL 10 MINUTES")
    )
    diff = merged.join(closed_truth, "w").where(
        merged["cnt"] != closed_truth["cnt"]
    )
    assert diff.count() == 0


def test_chunked_prefix_max_matches_bruteforce(spark):
    """The two-phase distributed watermark must equal the naive global
    running max for every row, including chunk boundaries (chunk_size=4
    over 13 rows exercises partial final chunks and cross-chunk
    carryover)."""
    import datetime

    from flink_scala_spark.operators import windows

    ts = [5, 60, 18, 200, 7, 90, 210, 45, 300, 8, 299, 301, 12]
    rows = [
        (i, datetime.datetime.utcfromtimestamp(t), t) for i, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, raw long")
    out = {
        r["event_id"]: r["lateness"]
        for r in windows.classify_late(df, "ts", "event_id", 10, 50, chunk_size=4).collect()
    }

    def ref():
        res, mx = {}, None
        for i, t in enumerate(ts):
            wm = None if mx is None else mx - 10
            if wm is None or t >= wm:
                res[i] = "on_time"
            elif t >= wm - 50:
                res[i] = "late"
            else:
                res[i] = "dropped"
            mx = t if mx is None else max(mx, t)
        return res

    assert out == ref(), (out, ref())


def test_outer_interval_join_watermark_boundary_is_exclusive(spark, tmp_path):
    """Eviction (and thus null emission) for the outer stream-stream
    join is STRICT: an unmatched error exactly AT the final watermark
    must not emit, one strictly below must. Pins the `<` in the
    streaming_interval_join_outer oracle against a crafted corpus."""
    import duckdb

    from flink_scala_spark.queries.catalog import QUERIES

    base = 1_700_000_000
    rows = [
        # unmatched errors for user 1: below wm / at wm / above wm(max)
        (1, base + 900, 1, "error", 1.0, "{}"),
        (2, base + 1000, 1, "error", 1.0, "{}"),
        (3, base + 1060, 1, "error", 1.0, "{}"),
        # clicks for another user keep the click-side watermark ahead
        (4, base + 500, 2, "click", 1.0, "{}"),
        (5, base + 2000, 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_l long, user_id long, event_type string, "
        "value double, props string"
    ).select(
        "event_id",
        F.timestamp_seconds("ts_l").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(str(tmp_path / "raw"))
    import glob
    import os
    import shutil

    os.makedirs(sf)
    src = glob.glob(str(tmp_path / "raw") + "/*.parquet")[0]
    shutil.copy(src, os.path.join(sf, "events.parquet"))

    got = {
        (r["error_id"], r["click_id"])
        for r in QUERIES["streaming_interval_join_outer"].fn(spark, sf).collect()
    }
    # wm = min(max error ts, max click ts) - 60 = (base+1060) - 60
    assert (1, None) in got  # strictly below the watermark: emitted
    assert (2, None) not in got  # exactly at the watermark: still in state
    assert (3, None) not in got  # above the watermark
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = set(
        con.execute(QUERIES["streaming_interval_join_outer"].oracle).fetchall()
    )
    assert got == oracle


def test_window_close_boundary_is_inclusive_in_chained_aggs(spark, tmp_path):
    """Windowed-aggregation eviction is INCLUSIVE — a window whose end
    equals the final watermark emits, at BOTH levels of a chained
    windowed agg — the opposite boundary of stream-stream join state
    eviction (strict, pinned above). Pins the `<=` in the
    streaming_chained_windows oracle against a crafted corpus whose
    10-minute and 1-hour window ends land exactly on the watermark."""
    import glob
    import os
    import shutil

    from flink_scala_spark.queries.catalog import QUERIES

    base = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned
    rows = [
        (1, base + 100, 1, "view", 1.0, "{}"),
        (2, base + 3500, 1, "view", 1.0, "{}"),
        # flush: watermark = (base+3610) - 10 = base+3600 exactly — the
        # end of BOTH the [base+3000, base+3600) inner bucket and the
        # [base, base+3600) hour
        (3, base + 3610, 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_l long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_l").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(str(tmp_path / "raw"))
    os.makedirs(sf)
    shutil.copy(
        glob.glob(str(tmp_path / "raw") + "/*.parquet")[0],
        os.path.join(sf, "events.parquet"),
    )
    got = {
        (r["hour_start"] - base, r["event_type"], r["max_10min_cnt"], r["n_buckets"])
        for r in QUERIES["streaming_chained_windows"].fn(spark, sf).collect()
    }
    # hour end == watermark: emitted, with BOTH inner buckets (the
    # second bucket's end also == watermark and still feeds it);
    # the flusher's own hour (end base+7200 > wm) must not emit.
    assert got == {(0, "view", 1, 2)}


def test_full_outer_right_side_eviction_boundary_is_exclusive(spark, tmp_path):
    """The right (click) side of the FULL OUTER stream-stream join
    expires at wm > c_ts + range — also STRICT: an unmatched click
    whose c_ts + 10 min lands exactly on the final watermark stays in
    state, one strictly below emits its null row. Pins the second `<`
    in the streaming_interval_join_full_outer oracle."""
    import glob
    import os
    import shutil

    from flink_scala_spark.queries.catalog import QUERIES

    base = 1_700_000_000
    rows = [
        # user 1 unmatched clicks around the right-side boundary;
        # final wm = min(max error, max click) - 60 = base + 1940
        (11, base + 1200, 1, "click", 1.0, "{}"),  # c_ts+600 < wm: emits
        (12, base + 1340, 1, "click", 1.0, "{}"),  # c_ts+600 == wm: stays
        (13, base + 1400, 1, "click", 1.0, "{}"),  # c_ts+600 > wm: stays
        # user 2 drives the watermarks (its own rows don't match)
        (21, base + 2000, 2, "error", 1.0, "{}"),
        (22, base + 2660, 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_l long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_l").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(str(tmp_path / "raw"))
    os.makedirs(sf)
    shutil.copy(
        glob.glob(str(tmp_path / "raw") + "/*.parquet")[0],
        os.path.join(sf, "events.parquet"),
    )
    got = {
        (r["error_id"], r["click_id"])
        for r in QUERIES["streaming_interval_join_full_outer"]
        .fn(spark, sf)
        .collect()
    }
    assert got == {(None, 11)}


def test_join_delays_downstream_window_close_by_its_range(spark, tmp_path):
    """A windowed agg downstream of a stream-stream interval join
    closes only when the watermark passes window_end + the join's
    event-time range (the join certifies pair-completeness that much
    later), and the boundary is STRICT: wm == hour_end + 600 withholds
    the hour, anything beyond emits it. Pins the `+ 600 <` in the
    streaming_join_then_window oracle."""
    import glob
    import os
    import shutil

    from flink_scala_spark.queries.catalog import QUERIES

    base = 1_700_000_000 - (1_700_000_000 % 3600)

    def run_case(wm_anchor):
        rows = [
            (1, base + 1800, 1, "click", 1.0, "{}"),
            (2, base + 2000, 1, "error", 1.0, "{}"),  # pair in hour 0
            (21, wm_anchor, 2, "error", 1.0, "{}"),
            (22, wm_anchor, 2, "click", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_l long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds("ts_l").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        case_dir = tmp_path / f"case_{wm_anchor}"
        sf = str(case_dir / "sf")
        df.coalesce(1).write.parquet(str(case_dir / "raw"))
        os.makedirs(sf)
        shutil.copy(
            glob.glob(str(case_dir / "raw") + "/*.parquet")[0],
            os.path.join(sf, "events.parquet"),
        )
        return {
            (r["hour_start"] - base, r["pairs"])
            for r in QUERIES["streaming_join_then_window"].fn(spark, sf).collect()
        }

    # final wm = anchor - 60; the pair's hour ends at base + 3600
    assert run_case(base + 4260) == set()       # wm == end + 600: withheld
    assert run_case(base + 4320) == {(0, 1)}    # wm == end + 660: emitted


def test_dedup_does_not_delay_downstream_window_close(spark, tmp_path):
    """Unlike a stream-stream join (which delays the propagated
    watermark by its event-time range), dropDuplicatesWithinWatermark
    propagates the watermark UNCHANGED: the downstream window still
    closes inclusively at wm == window_end. Pins the `<=` in the
    streaming_dedup_then_window oracle — and the cnt of 1 (not 2)
    re-proves the dedup collapsed the doubled replay."""
    import glob
    import os
    import shutil

    from flink_scala_spark.queries.catalog import QUERIES

    base = 1_700_000_000 - (1_700_000_000 % 3600)

    def run_case(flush_ts):
        rows = [
            (1, base + 1800, 1, "view", 1.0, "{}"),
            (3, flush_ts, 2, "click", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_l long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds("ts_l").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        case_dir = tmp_path / f"case_{flush_ts}"
        sf = str(case_dir / "sf")
        df.coalesce(1).write.parquet(str(case_dir / "raw"))
        os.makedirs(sf)
        shutil.copy(
            glob.glob(str(case_dir / "raw") + "/*.parquet")[0],
            os.path.join(sf, "events.parquet"),
        )
        return sorted(
            (r["hour_start"] - base, r["event_type"], r["cnt"])
            for r in QUERIES["streaming_dedup_then_window"].fn(spark, sf).collect()
        )

    # watermark delay is 10 s; the view's hour ends at base + 3600
    assert run_case(base + 3609) == []                    # wm just below end
    assert run_case(base + 3610) == [(0, "view", 1)]      # wm == end: emits
