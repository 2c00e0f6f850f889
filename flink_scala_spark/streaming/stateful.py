"""Keyed per-record state machines and timers (SURVEY.md §2.6).

- ST1-ST3 (``hk/StateTest/StateTest.scala:51-75``, ``StateTest2.scala``,
  ``StateTest3.scala``): remember the last temperature per key; when a
  new reading differs by more than a threshold, emit an alarm row. All
  three reference variants (KeyedProcessFunction / RichFlatMapFunction
  / flatMapWithState) are the same semantics — one implementation here
  via ``applyInPandasWithState``: per-key ``GroupState`` holds the last
  value across microbatches, rows within a batch are folded in
  (ts, id) order for determinism.
- ST4 (``hk/processFunctionTest/ProcessAlarmTest.scala:76-108``):
  "value rising continuously for >= horizon seconds -> alarm", built on
  timers in Flink. The event-time twin keeps (streak_start_ts,
  last_value) in state and emits when the streak spans the horizon —
  equivalent to the timer firing, but deterministic on event time (the
  reference's processing-time timer is wall-clock-dependent;
  SURVEY.md §7.4 documents the substitution).

API choice: Spark 4's ``transformWithStateInPandas`` (StatefulProcessor
with first-class ValueState + register/delete/expire timers — the
closest match to Flink's KeyedProcessFunction) needs a protobuf
runtime its worker can import; this environment doesn't pip-ship one,
but a vendored public runtime exists and ``streaming/tws.py`` runs the
rising-streak alarm on the real timer API end-to-end when it is found
(``tests/test_tws_timers.py``). ``applyInPandasWithState`` expresses
the same per-key state machines — GroupState carries the state row,
timers become event-time horizon checks — runs without extra
dependencies, and remains the default driver-gate path.

Scale notes: state is per-key in the state store (RocksDB/HDFS at
scale), keys are hash-partitioned — the same layout Flink uses; the
Arrow batch boundary is the only Python crossing, amortized over whole
microbatches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

from flink_scala_spark.functions.portable import epoch_seconds
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DELTA_ALARM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("prev_value", DoubleType()),
        StructField("curr_value", DoubleType()),
    ]
)

_DELTA_STATE_SCHEMA = StructType([StructField("last_value", DoubleType())])


def _delta_alarm_fn(threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last = state.get[0] if state.exists else None
        out = {"user_id": [], "event_id": [], "prev_value": [], "curr_value": []}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                if last is not None and abs(val - last) > threshold:
                    out["user_id"].append(user_id)
                    out["event_id"].append(eid)
                    out["prev_value"].append(round(last, 2))
                    out["curr_value"].append(round(val, 2))
                last = val
        state.update((last,))
        yield pd.DataFrame(out)

    return fn


def delta_alarm(events_stream: DataFrame, threshold: float = 10.0) -> DataFrame:
    """ST1-ST3: |Δvalue| > threshold between consecutive per-key rows
    (StateTest.scala:69-74; threshold is the ctor param of
    MyProcessFunction(10.0))."""
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _delta_alarm_fn(threshold),
            outputStructType=DELTA_ALARM_SCHEMA,
            stateStructType=_DELTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RISING_ALARM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("streak_start", LongType()),
        StructField("streak_end", LongType()),
        StructField("n_rising", LongType()),
    ]
)

_RISING_STATE_SCHEMA = StructType(
    [
        StructField("last_value", DoubleType()),
        StructField("streak_start", LongType()),
        StructField("n_rising", LongType()),
        StructField("fired", LongType()),
    ]
)


def _rising_alarm_fn(horizon_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_value, streak_start, n_rising, fired = state.get
        else:
            last_value, streak_start, n_rising, fired = None, None, 0, 0
        out = {"user_id": [], "streak_start": [], "streak_end": [], "n_rising": []}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, ts_l, val in zip(pdf["event_id"], pdf["ts_l"], pdf["value"]):
                rising = last_value is not None and val > last_value
                if rising:
                    if streak_start is None:
                        streak_start = ts_l
                    n_rising += 1
                    # Flink registers a +horizon processing-time timer on
                    # the first rise (ProcessAlarmTest.scala:90-94); the
                    # event-time twin fires once the streak has spanned
                    # the horizon.
                    if not fired and ts_l - streak_start >= horizon_seconds:
                        out["user_id"].append(user_id)
                        out["streak_start"].append(streak_start)
                        out["streak_end"].append(ts_l)
                        out["n_rising"].append(n_rising)
                        fired = 1
                else:
                    # Fall (or first record) deletes the timer
                    # (ProcessAlarmTest.scala:95-100) and resets.
                    streak_start, n_rising, fired = None, 0, 0
                last_value = val
        state.update((last_value, streak_start, n_rising, fired))
        yield pd.DataFrame(out)

    return fn


def rising_alarm(events_stream: DataFrame, horizon_seconds: int = 600) -> DataFrame:
    """ST4 event-time twin of the rising-temperature timer alarm."""
    withts = events_stream.select(
        "user_id", "event_id", "ts", epoch_seconds("ts").alias("ts_l"), "value"
    )
    return withts.groupBy("user_id").applyInPandasWithState(
        _rising_alarm_fn(horizon_seconds),
        outputStructType=RISING_ALARM_SCHEMA,
        stateStructType=_RISING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COUNT_WINDOW_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("window_seq", LongType()),
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
    ]
)

_COUNT_WINDOW_STATE_SCHEMA = StructType(
    [
        StructField("n_closed", LongType()),
        StructField("cur_cnt", LongType()),
        StructField("cur_sum", DoubleType()),
    ]
)


def _count_window_fn(size: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n_closed, cur_cnt, cur_sum = state.get if state.exists else (0, 0, 0.0)
        out = {"user_id": [], "window_seq": [], "cnt": [], "total": []}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for val in pdf["value"]:
                cur_cnt += 1
                cur_sum += val
                if cur_cnt == size:
                    out["user_id"].append(user_id)
                    out["window_seq"].append(n_closed)
                    out["cnt"].append(cur_cnt)
                    out["total"].append(round(cur_sum, 2))
                    n_closed += 1
                    cur_cnt, cur_sum = 0, 0.0
        state.update((n_closed, cur_cnt, cur_sum))
        yield pd.DataFrame(out)

    return fn


def count_window(events_stream: DataFrame, size: int = 10) -> DataFrame:
    """Keyed streaming COUNT window: a counting ValueState accumulates
    (cnt, sum) per key and emits+resets every ``size``-th record — the
    live form of ``windows.count_window_agg`` (only COMPLETED windows
    emit; the in-flight partial stays in state, exactly Flink's
    countWindow firing rule).

    The per-batch fold runs in (ts, event_id) order so replays are
    deterministic; the running sum accumulates in that same order,
    making the emitted total reproducible (and oracle-comparable after
    a 2-dp round)."""
    withts = events_stream.select(
        "user_id", "event_id", "ts", "value"
    )
    return withts.groupBy("user_id").applyInPandasWithState(
        _count_window_fn(size),
        outputStructType=COUNT_WINDOW_SCHEMA,
        stateStructType=_COUNT_WINDOW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


NEAR_DUP_FLAG_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("src", LongType())]
)

_ND_SIG_STRUCT = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"mh{s}", LongType()) for s in range(8)]
)
_ND_STATE_SCHEMA = StructType(
    [StructField("sigs", ArrayType(_ND_SIG_STRUCT))]
)


def _near_dup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-LSH-bucket state: signatures of every doc seen so far in
    this bucket. Each arriving doc (ascending doc_id by the id-bucket
    replay contract) is compared against the EARLIER signatures; >= 6
    of 8 matching minhashes flags it as a near-dup of that source."""
    seen = [tuple(r) for r in state.get[0]] if state.exists else []
    out_doc, out_src = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")
        cols = ["doc_id"] + [f"mh{s}" for s in range(8)]
        for row in pdf[cols].itertuples(index=False):
            row = tuple(int(v) for v in row)
            for prev in seen:
                agree = sum(1 for a, b in zip(prev[1:], row[1:]) if a == b)
                if agree >= 6:
                    out_doc.append(row[0])
                    out_src.append(prev[0])
            seen.append(row)
    state.update((seen,))
    yield pd.DataFrame({"doc_id": out_doc, "src": out_src})


def near_dup_flags(docs_stream: DataFrame) -> DataFrame:
    """Streaming near-duplicate detection: row-local MinHash
    signatures -> 4x2 LSH band keys -> per-bucket keyed state of
    earlier signatures (ST1-ST3 machinery applied to X2's banding).
    Emits (doc_id, src) for every earlier same-bucket doc agreeing on
    >= 6 of 8 minhashes; by pigeonhole such a pair always shares at
    least one full band, so bucket-local checking is LOSSLESS for
    this threshold. State per bucket is the bucket's signature list —
    the LSH keys spread it uniformly; production would expire it with
    a watermark/TTL."""
    from flink_scala_spark.pipeline.dedup import (
        NUM_BANDS,
        ROWS_PER_BAND,
        minhash_signature_exprs,
    )

    sig = docs_stream.select("doc_id", *minhash_signature_exprs("text")).where(
        F.col("mh0").isNotNull()
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.col(f"mh{b * ROWS_PER_BAND}").cast("string"),
                        F.col(f"mh{b * ROWS_PER_BAND + 1}").cast("string"),
                    )
                ).alias("key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    banded = sig.withColumn("bk", F.explode(band_structs)).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
        *[f"mh{s}" for s in range(8)]
    )
    return banded.groupBy("band", "key").applyInPandasWithState(
        _near_dup_fn,
        outputStructType=NEAR_DUP_FLAG_SCHEMA,
        stateStructType=_ND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
