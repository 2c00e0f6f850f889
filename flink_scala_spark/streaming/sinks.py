"""Sinks (SURVEY.md §2.7-2.8): console, kafka, and the exactly-once
upsert pattern of the reference's MySQL dashboard sinks.

- K1 print sink (``StreamWordCount.scala:33``): console writer with an
  optional label.
- K2 Kafka producer (``KafkaSinkTest.scala:39-44``): value column to a
  topic (connector jar required at runtime).
- K5/K6 JDBC sinks (``JdbcSinkTest.scala:42-72``;
  ``OrderAnalysy.scala:153-273``): the reference's RichSinkFunction
  does open/invoke/close with a check-then-insert-or-update per row.
  Spark-first shape: ``foreachBatch`` + a single set-based MERGE/upsert
  per microbatch (per-row probes would be a driver-side loop — the
  anti-pattern at scale). DuckDB stands in for MySQL in this image; the
  SQL is ANSI ``INSERT .. ON CONFLICT``.
- F1-F6 exactly-once: Spark retries a failed microbatch with the same
  ``batch_id``; the writer records the last committed batch per sink
  table and skips replays, making the upsert end-to-end exactly-once
  (the same idempotent-sink contract the reference configures via
  CheckpointingMode.EXACTLY_ONCE, CheckPointTest.scala:40).

K3 Redis / K4 Elasticsearch take the identical foreachBatch shape with
their clients; the clients aren't in this image so the builders raise
cleanly unless a writer callable is injected.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


def console_sink(stream_df: DataFrame, label: str | None = None, num_rows: int = 20):
    """K1: labeled print sink (labels 'in'/'out', WindowTest.scala:76-79)."""
    writer = stream_df.writeStream.format("console").option("numRows", str(num_rows))
    if label:
        writer = writer.queryName(label)
    return writer


def kafka_writer_options(topic: str, bootstrap: str = "localhost:9092") -> dict[str, str]:
    """K2 option contract, broker-free and testable: the exact option
    map the Kafka writer is built with (KafkaSinkTest.scala:39-44 —
    producer bootstrap + topic)."""
    return {"kafka.bootstrap.servers": bootstrap, "topic": topic}


def kafka_sink(stream_df: DataFrame, topic: str, bootstrap: str = "localhost:9092"):
    """K2: value column -> Kafka topic (KafkaSinkTest.scala:39-44).
    Option map pinned by test via :func:`kafka_writer_options`."""
    writer = stream_df.selectExpr("CAST(value AS STRING) AS value").writeStream.format(
        "kafka"
    )
    for k, v in kafka_writer_options(topic, bootstrap).items():
        writer = writer.option(k, v)
    return writer


class DuckDBUpsertWriter:
    """K6: exactly-once accumulate-upsert, the OrderMysqlSink pattern
    (OrderAnalysy.scala:215-273) re-expressed set-based.

    Each microbatch: (1) skip if this (table, batch_id) already
    committed — Spark replays batches on failure, the reference gets
    the same idempotency from upsert keys; (2) stage the batch rows;
    (3) one INSERT .. ON CONFLICT DO UPDATE folding ``add_cols`` into
    the target, mirroring ``update .. totalNum = totalNum + ?``
    (OrderAnalysy.scala:190-205). Commit of rows + batch marker is one
    transaction.

    ``mode`` must match what the upstream emits per key:
    ``"accumulate"`` (col += excluded.col) is for DELTA-producing
    upstreams — the reference's per-event invoke() path; ``"replace"``
    (col = excluded.col) is for Spark update-mode AGGREGATES, which
    re-emit a key's full running total every microbatch — accumulating
    those double-counts (the engine's state already carries the
    running sum, so last write wins).
    """

    def __init__(
        self,
        db_path: str,
        table: str,
        key_cols: Sequence[str],
        add_cols: Sequence[str],
        ddl: str,
        mode: str = "accumulate",
    ):
        if mode not in ("accumulate", "replace"):
            raise ValueError(f"mode must be 'accumulate' or 'replace', got {mode!r}")
        self.db_path = db_path
        self.table = table
        self.key_cols = list(key_cols)
        self.add_cols = list(add_cols)
        self.ddl = ddl
        self.mode = mode

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import duckdb

        pdf = batch_df.toPandas()  # one microbatch of aggregates: small by construction
        con = duckdb.connect(self.db_path)
        try:
            con.execute(self.ddl)
            con.execute(
                "CREATE TABLE IF NOT EXISTS _committed_batches("
                "sink VARCHAR, batch_id BIGINT, PRIMARY KEY (sink, batch_id))"
            )
            already = con.execute(
                "SELECT 1 FROM _committed_batches WHERE sink = ? AND batch_id = ?",
                [self.table, batch_id],
            ).fetchone()
            if already:
                return  # replayed batch: exactly-once skip
            con.execute("BEGIN")
            con.register("_batch", pdf)
            cols = self.key_cols + self.add_cols
            col_list = ", ".join(cols)
            if self.mode == "accumulate":
                updates = ", ".join(
                    f"{c} = {self.table}.{c} + excluded.{c}" for c in self.add_cols
                )
            else:
                updates = ", ".join(f"{c} = excluded.{c}" for c in self.add_cols)
            keys = ", ".join(self.key_cols)
            con.execute(
                f"INSERT INTO {self.table} ({col_list}) "
                f"SELECT {col_list} FROM _batch "
                f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
            )
            con.execute(
                "INSERT INTO _committed_batches VALUES (?, ?)", [self.table, batch_id]
            )
            con.execute("COMMIT")
        except Exception:
            try:
                con.execute("ROLLBACK")
            except Exception:
                pass
            raise
        finally:
            con.close()


def client_foreach_sink(write_partition: Callable, client_factory: Callable | None = None):
    """K3/K4 shape: per-partition client writes (RedisMapper /
    ES bulk, RedisSinkTest.scala:42-53, EsSinkTest.scala:35-54).

    ``client_factory`` opens the connection per partition (the rich
    function ``open()`` lifecycle, JdbcSinkTest.scala:51-55);
    ``write_partition(client, rows)`` sends one partition. Raises if no
    factory is supplied — the redis/es clients aren't in this image.
    """
    if client_factory is None:
        raise NotImplementedError(
            "redis/elasticsearch clients are not installed in this image; "
            "inject client_factory to use this sink"
        )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        def per_partition(rows):
            client = client_factory()
            try:
                write_partition(client, rows)
            finally:
                close = getattr(client, "close", None)
                if close:
                    close()

        batch_df.rdd.foreachPartition(per_partition)

    return fn
