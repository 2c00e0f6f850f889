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
        # concat ALL Arrow chunks before the order-dependent fold: a
        # key's batch can arrive as several unordered chunks, and
        # per-chunk sorting would fold them out of (ts, event_id) order
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
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


_DELTA_TTL_STATE_SCHEMA = StructType(
    [
        StructField("last_value", DoubleType()),
        StructField("last_ts_l", LongType()),
    ]
)


def _delta_alarm_ttl_fn(threshold: float, horizon_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out = {"user_id": [], "event_id": [], "prev_value": [], "curr_value": []}
        if state.hasTimedOut:
            # The watermark outran the stored reading by more than the
            # horizon with no new input for this key — Flink's idle-key
            # state TTL, realized as an event-time timeout.
            state.remove()
            yield pd.DataFrame(out)
            return
        last, last_ts = state.get if state.exists else (None, None)
        # Lazy eviction on arrival: the same cutoff the timeout
        # encodes, applied when the key IS active this batch (the
        # timeout only reaches keys with no input).
        wm_sec = state.getCurrentWatermarkMs() // 1000
        if last is not None and last_ts < wm_sec - horizon_seconds:
            last, last_ts = None, None
        # concat ALL Arrow chunks before the order-dependent fold
        # (same hazard as _delta_alarm_fn); ts_l ties break on event_id
        # exactly like the oracle's window ordering.
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_l", "event_id"]
        )
        for eid, ts_l, val in zip(pdf["event_id"], pdf["ts_l"], pdf["value"]):
            if last is not None and abs(val - last) > threshold:
                out["user_id"].append(user_id)
                out["event_id"].append(eid)
                out["prev_value"].append(round(last, 2))
                out["curr_value"].append(round(val, 2))
            last, last_ts = val, int(ts_l)
        state.update((last, last_ts))
        # Timeout at last_ts + horizon + 1 s (expiry at exactly
        # wm - horizon matches the lazy cutoff's strict '<'), CLAMPED
        # strictly above the watermark: this Spark build does NOT
        # pre-filter late rows from stateful processors (measured,
        # tests/test_late_data.py), so a row more than `horizon` late
        # would otherwise set a timeout <= wm and crash the query.
        # Such state is already past-horizon — the clamp just schedules
        # its purge at the earliest legal instant.
        state.setTimeoutTimestamp(
            max(last_ts + horizon_seconds + 1, wm_sec + 1) * 1000
        )
        yield pd.DataFrame(out)

    return fn


def delta_alarm_ttl(
    events_stream: DataFrame,
    threshold: float = 10.0,
    horizon_seconds: int = 43_200,
) -> DataFrame:
    """ST1-ST3 with BOUNDED per-key state — the Flink state-TTL
    discipline (StateTtlConfig) the reference's ValueState alarms
    would need under unbounded key churn, realized deterministically
    on event time: a key whose last reading the watermark has outrun
    by ``horizon_seconds`` loses it (lazy eviction when the key is
    active, ``EventTimeTimeout`` when idle — identical cutoffs), so
    the next reading has no predecessor and raises no alarm. At 100 TB
    with ever-growing key spaces this is what keeps the state store
    O(live keys) instead of O(all keys ever). Timestamps are truncated
    to whole seconds so the watermark arithmetic is integer-exact and
    oracle-reproducible."""
    withts = events_stream.select(
        "user_id",
        "event_id",
        epoch_seconds("ts").alias("ts_l"),
        F.timestamp_seconds(epoch_seconds("ts")).alias("ts_sec"),
        "value",
    ).withWatermark("ts_sec", "0 seconds")
    return withts.groupBy("user_id").applyInPandasWithState(
        _delta_alarm_ttl_fn(threshold, horizon_seconds),
        outputStructType=DELTA_ALARM_SCHEMA,
        stateStructType=_DELTA_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
        # concat all chunks first — same ordering hazard as _delta_alarm_fn
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
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
        # concat all chunks first — same ordering hazard as _delta_alarm_fn
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
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


_ND_COLS = ["doc_id"] + [f"mh{s}" for s in range(8)]


def _near_dup_matches(seen_mat, batch_mat):
    """Vectorized >=6-of-8 agreement: returns (doc_idx, src_idx) pairs.

    ``seen_mat`` (n x 9, int64) holds earlier signatures, ``batch_mat``
    (m x 9) the new batch sorted ascending by doc_id (col 0 = doc_id,
    cols 1..8 = minhashes). Two broadcast compares replace the nested
    interpreted-Python loops: new-vs-state (m x n x 8) and the
    within-batch strict upper triangle (m x m), preserving the exact
    sequential 'compare against EARLIER rows' fold semantics."""
    import numpy as np

    out_doc: list[int] = []
    out_src: list[int] = []
    if seen_mat.shape[0] and batch_mat.shape[0]:
        agree = (
            (batch_mat[:, None, 1:] == seen_mat[None, :, 1:]).sum(axis=2)
        )
        di, si = np.nonzero(agree >= 6)
        out_doc.extend(batch_mat[di, 0].tolist())
        out_src.extend(seen_mat[si, 0].tolist())
    if batch_mat.shape[0] > 1:
        agree = (
            (batch_mat[:, None, 1:] == batch_mat[None, :, 1:]).sum(axis=2)
        )
        # strict upper triangle: src strictly earlier (smaller doc_id)
        di, si = np.nonzero((agree >= 6) & np.tri(len(batch_mat), k=-1, dtype=bool))
        out_doc.extend(batch_mat[di, 0].tolist())
        out_src.extend(batch_mat[si, 0].tolist())
    return out_doc, out_src


def _near_dup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-LSH-bucket state: signatures of every doc seen so far in
    this bucket. Each arriving doc (ascending doc_id by the id-bucket
    replay contract) is compared against the EARLIER signatures; >= 6
    of 8 matching minhashes flags it as a near-dup of that source.
    The whole batch is concatenated BEFORE the doc_id sort (a bucket's
    rows can span several Arrow chunks — per-chunk sorting would flip
    pair direction), and the agreement test is one numpy broadcast
    compare per batch, not a Python pair loop."""
    import numpy as np

    seen = [tuple(r) for r in state.get[0]] if state.exists else []
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    seen_mat = np.asarray(seen, dtype=np.int64).reshape(len(seen), 9)
    batch_mat = pdf[_ND_COLS].to_numpy(dtype=np.int64)
    out_doc, out_src = _near_dup_matches(seen_mat, batch_mat)
    seen.extend(tuple(int(v) for v in row) for row in batch_mat)
    state.update((seen,))
    yield pd.DataFrame(
        {"doc_id": pd.array(out_doc, dtype="int64"), "src": pd.array(out_src, dtype="int64")}
    )


_ND_TTL_SIG_STRUCT = StructType(
    [StructField("doc_id", LongType()), StructField("ts_l", LongType())]
    + [StructField(f"mh{s}", LongType()) for s in range(8)]
)
_ND_TTL_STATE_SCHEMA = StructType(
    [StructField("sigs", ArrayType(_ND_TTL_SIG_STRUCT))]
)
_ND_TTL_COLS = ["doc_id", "ts_l"] + [f"mh{s}" for s in range(8)]


def _near_dup_ttl_fn(horizon_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """TTL'd twin of :func:`_near_dup_fn`: per-bucket state holds
        (doc_id, ts_l, mh0..7) and each invocation first EVICTS the
        signatures the watermark has outrun (``ts_l < wm -
        horizon``) before matching — so state per bucket is bounded by
        the dedup horizon, the discipline ``WindowTest.scala:71-72``
        applies to window state via allowedLateness. A fully idle
        bucket is cleared wholesale by the event-time timeout (set to
        the newest signature's expiry), so even buckets that stop
        receiving traffic do not pin state forever."""
        import numpy as np

        if state.hasTimedOut:
            # Every signature's expiry predates the watermark (the
            # timeout was registered at the newest one's) — drop all.
            state.remove()
            yield pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"), "src": pd.array([], dtype="int64")}
            )
            return
        seen = [tuple(r) for r in state.get[0]] if state.exists else []
        wm_sec = state.getCurrentWatermarkMs() // 1000
        cutoff = wm_sec - horizon_seconds
        seen = [s for s in seen if s[1] >= cutoff]
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        seen_mat = np.asarray(
            [(s[0],) + s[2:] for s in seen], dtype=np.int64
        ).reshape(len(seen), 9)
        batch_mat9 = pdf[_ND_COLS].to_numpy(dtype=np.int64)
        out_doc, out_src = _near_dup_matches(seen_mat, batch_mat9)
        seen.extend(
            tuple(int(v) for v in row)
            for row in pdf[_ND_TTL_COLS].to_numpy(dtype=np.int64)
        )
        state.update((seen,))
        # timeout strictly above the current watermark (Spark requires
        # it): the newest signature's expiry, +1 s for the boundary —
        # CLAMPED above wm, since late rows are NOT pre-filtered from
        # stateful processors (measured) and a batch whose newest doc
        # is already past-horizon would otherwise crash the query.
        newest = max(s[1] for s in seen)
        state.setTimeoutTimestamp(
            max(newest + horizon_seconds + 1, wm_sec + 1) * 1000
        )
        yield pd.DataFrame(
            {"doc_id": pd.array(out_doc, dtype="int64"), "src": pd.array(out_src, dtype="int64")}
        )

    return fn


def near_dup_flags(docs_stream: DataFrame) -> DataFrame:
    """Streaming near-duplicate detection: row-local MinHash
    signatures -> 4x2 LSH band keys -> per-bucket keyed state of
    earlier signatures (ST1-ST3 machinery applied to X2's banding).
    Emits (doc_id, src) for every earlier same-bucket doc agreeing on
    >= 6 of 8 minhashes; by pigeonhole such a pair always shares at
    least one full band, so bucket-local checking is LOSSLESS for
    this threshold. State per bucket is the bucket's signature list
    and grows with history — this variant is the UNBOUNDED-retention
    semantics ("dedup against everything ever seen"); for unbounded
    production ingest use :func:`near_dup_flags_ttl`, whose per-bucket
    state expires at the watermark horizon."""
    from flink_scala_spark.pipeline.dedup import (
        NUM_BANDS,
        ROWS_PER_BAND,
        minhash_exprs_over_hashes,
        minhash_shingle_hashes,
    )

    # two-step projection (round 13): the shingle+md5 array is built
    # ONCE and the 8 minhash columns share it — the one-select form
    # re-hashed every shingle 8x (interpreted HOFs have no CSE) and
    # its 8x plan tree was re-analyzed every microbatch
    sig = (
        docs_stream.select(
            "doc_id", minhash_shingle_hashes("text").alias("_hs")
        )
        .select("doc_id", *minhash_exprs_over_hashes("_hs"))
        .where(F.col("mh0").isNotNull())
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


def near_dup_flags_ttl(docs_stream: DataFrame, horizon_seconds: int) -> DataFrame:
    """Bounded-state form of :func:`near_dup_flags`: the input stream
    must carry an event-time ``ts`` column; per-LSH-bucket state keeps
    only the signatures the watermark has NOT outrun by
    ``horizon_seconds`` (lazy eviction on arrival + an event-time
    timeout that clears wholly idle buckets). A doc therefore only
    matches sources still inside the dedup horizon — the state
    retention discipline the reference applies to windows via
    allowedLateness (``WindowTest.scala:71-72``), applied to LSH
    dedup state. State per bucket is O(docs per horizon), making the
    operator safe for unbounded 100 TB-scale ingest."""
    from flink_scala_spark.functions.portable import epoch_seconds
    from flink_scala_spark.pipeline.dedup import (
        NUM_BANDS,
        ROWS_PER_BAND,
        minhash_exprs_over_hashes,
        minhash_shingle_hashes,
    )

    # two-step projection — same rationale as near_dup_flags
    sig = (
        docs_stream.withWatermark("ts", "0 seconds")
        .select(
            "doc_id",
            epoch_seconds("ts").alias("ts_l"),
            "ts",
            minhash_shingle_hashes("text").alias("_hs"),
        )
        .select(
            "doc_id", "ts_l", "ts", *minhash_exprs_over_hashes("_hs")
        )
        .where(F.col("mh0").isNotNull())
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
        "doc_id", "ts_l", "ts",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
        *[f"mh{s}" for s in range(8)]
    )
    return banded.groupBy("band", "key").applyInPandasWithState(
        _near_dup_ttl_fn(horizon_seconds),
        outputStructType=NEAR_DUP_FLAG_SCHEMA,
        stateStructType=_ND_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
