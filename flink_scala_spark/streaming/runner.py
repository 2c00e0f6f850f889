"""Run-to-completion helpers for bounded streaming twins.

The reference's demos read bounded inputs through the streaming env and
terminate (``WordCount2.scala:7`` notes auto-termination). Spark's
equivalent: drive a streaming query over a bounded file source with
``processAllAvailable`` + memory sink, then read the result table.

Output-mode mapping (SURVEY.md §7.4):
- ``complete`` reproduces Flink's final window/agg contents even for
  windows the watermark never closed — right for bounded-replay
  correctness twins (state is not evicted; production unbounded runs
  use append/update where the watermark prunes state).
- ``update`` reproduces Flink's per-record running emission (A1-A3
  expected outputs in TransformTest.scala:38-52).
- ``append`` is for flatMap-style emissions (alarms, side outputs).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()

#: Executed physical plan of the most recent bounded run (and a bounded
#: history by query name) — captured so tests can pin streaming plan
#: shapes (state-store operator counts, join strategies) without
#: re-running the query. The streaming executedPlan only exists on a
#: LIVE query object, so this capture is the one chance to see it.
LAST_PLANS: dict[str, str] = {}
_LAST: list[str] = []

#: Accumulated replay statistics per catalog query name — input rows
#: and microbatch counts summed over every bounded run a catalog entry
#: performs (some entries drive several). bench_streaming.py clears
#: this between queries to compute replay throughput (rows/s).
REPLAY_STATS: dict[str, dict[str, int]] = {}


def last_plan() -> str:
    """Physical plan of the most recently completed bounded run."""
    return _LAST[-1] if _LAST else ""


def _capture_plan(q, name: str) -> None:
    from flink_scala_spark.queries import catalog

    key = catalog.current_query() or name
    try:
        progress = q.recentProgress
        stats = REPLAY_STATS.setdefault(key, {"input_rows": 0, "batches": 0})
        stats["input_rows"] += sum(int(p["numInputRows"]) for p in progress)
        stats["batches"] += len(progress)
    except Exception:
        pass
    try:
        plan = q._jsq.explainInternal(False)
    except Exception:
        return
    LAST_PLANS[key] = plan
    _LAST.append(plan)
    del _LAST[:-1]


def _widen_progress_buffer(spark) -> None:
    """REPLAY_STATS sums over q.recentProgress, which Spark caps at
    spark.sql.streaming.numRecentProgressUpdates entries (default 100)
    — a replay longer than 100 microbatches would silently undercount
    input_rows/batches and inflate bench_streaming's rows/s. Widen the
    buffer far past any shipped replay (sf0.1 time-bucket replays run
    well under 1k batches)."""
    try:
        cur = int(spark.conf.get("spark.sql.streaming.numRecentProgressUpdates"))
    except Exception:
        cur = 100
    if cur < 10_000:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")


def run_bounded(
    stream_df: DataFrame, output_mode: str = "complete", query_name: str | None = None
) -> DataFrame:
    """Execute a bounded streaming plan to completion; return the final
    memory-sink table as a batch DataFrame."""
    spark = stream_df.sparkSession
    _widen_progress_buffer(spark)
    name = query_name or f"fss_q{next(_counter)}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        _capture_plan(q, name)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.table(name)


def run_bounded_now(
    stream_df: DataFrame,
    output_mode: str = "append",
    query_name: str | None = None,
    timeout: int = 600,
) -> DataFrame:
    """Like :func:`run_bounded` but with ``trigger(availableNow=True)``.

    ``processAllAvailable`` only guarantees the SOURCE data is drained;
    it can stop the query before the trailing no-data microbatch that
    fires still-pending event-time TIMERS off the final watermark.
    ``availableNow`` termination includes that batch (measured: a timer
    whose expiry <= final watermark fires before the query ends), so
    timer-driven operators must run through this helper.
    """
    spark = stream_df.sparkSession
    _widen_progress_buffer(spark)
    name = query_name or f"fss_q{next(_counter)}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout)
        if not finished:
            # A hung query would otherwise return a silently-truncated
            # memory table (timer emissions missing) — fail loudly.
            raise TimeoutError(f"query {name} did not finish in {timeout}s")
        _capture_plan(q, name)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.table(name)


def run_bounded_foreach(stream_df: DataFrame, fn, output_mode: str = "update") -> None:
    """Execute a bounded streaming plan through foreachBatch ``fn``."""
    q = stream_df.writeStream.outputMode(output_mode).foreachBatch(fn).start()
    try:
        q.processAllAvailable()
        _capture_plan(q, q.name or "foreach")
    finally:
        q.stop()
        q.awaitTermination(30)
