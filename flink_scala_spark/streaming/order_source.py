"""S6 custom generator source as a Spark 4 Python Data Source.

The reference implements a custom source by subclassing Flink's
``SourceFunction`` — ``OrderSource`` emits 2,000 random orders, one per
200 ms, with random province and amount
(``hk/orderTest/OrderAnalysy.scala:338-362``). Spark's modern
equivalent is the Python Data Source API: ``spark.dataSource.register``
then ``spark.read.format("order_gen")`` (batch) or
``spark.readStream.format("order_gen")`` (microbatch stream with
checkpointable offsets).

Differences by design (SURVEY.md §2.1 S6):

- **Deterministic**: every field is a pure function of the row index
  (md5-derived), so runs are reproducible and testable — the
  reference's ``Random`` is not. Same shape, same rates, same schema.
- **Parallel**: the batch reader splits the index range into
  ``numPartitions`` input partitions (the Flink demo pins
  parallelism 1). The generator scales with the cluster.
- **Exactly-once replay**: the stream reader's offset is just the next
  row index; ``readBetweenOffsets`` regenerates any committed range
  bit-identically, so checkpoint recovery replays precisely (the
  WAL-offset pattern Kafka sources use — comment
  ``SourceFromKafka.scala:24``).

The reader classes are built inside a factory closure so cloudpickle
ships them BY VALUE to executor Python workers — no repo PYTHONPATH
needed on the cluster (same self-containment rule as the multimodal
Arrow UDFs).

The rate-source variant in ``sources.py`` remains the zero-custom-code
alternative; this module is the full custom-source extension point.
"""

from __future__ import annotations

import hashlib

PROVINCES = ("guangdong", "jiangsu", "shandong", "zhejiang", "sichuan", "henan")

#: Epoch millis of the first generated order; one order per 200 ms
#: (the reference's emission cadence, OrderAnalysy.scala:353).
T0_MILLIS = 1_600_000_000_000
STEP_MILLIS = 200

SCHEMA = (
    "order_id string, user_id string, province string, money double, pay_time long"
)


def order_row(k: int) -> tuple:
    """The k-th order — a pure function of k (no RNG state)."""
    h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
    return (
        f"order{k}",
        f"user{h % 97}",
        PROVINCES[h % len(PROVINCES)],
        round((h % 100_000) / 100.0, 2),  # 0.00 .. 999.99, 2dp
        T0_MILLIS + k * STEP_MILLIS,
    )


def make_datasource():
    """Build the DataSource class with every dependency closed over,
    so executors deserialize it without importing this module."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    provinces = PROVINCES
    t0, step = T0_MILLIS, STEP_MILLIS
    schema_str = SCHEMA

    def row(k: int) -> tuple:
        import hashlib as _hl

        h = int(_hl.md5(str(k).encode()).hexdigest()[:12], 16)
        return (
            f"order{k}",
            f"user{h % 97}",
            provinces[h % len(provinces)],
            round((h % 100_000) / 100.0, 2),
            t0 + k * step,
        )

    class OrderGenBatchReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 2000))
            self.num_partitions = int(options.get("numPartitions", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.num_partitions)]

        def read(self, partition):
            i = partition.value
            lo = self.n * i // self.num_partitions
            hi = self.n * (i + 1) // self.num_partitions
            for k in range(lo, hi):
                yield row(k)

    class OrderGenStreamReader(SimpleDataSourceStreamReader):
        """Offset = {"i": next row index}; each microbatch emits
        ``rowsPerBatch`` consecutive orders, EXHAUSTING at ``n`` like
        the batch reader (the reference source emits a bounded order
        book and terminates) — without the clamp, read() would report
        fresh data forever and any processAllAvailable-based bounded
        harness would hang."""

        def __init__(self, options):
            self.rows_per_batch = int(options.get("rowsPerBatch", 50))
            self.n = int(options.get("n", 2000))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            i = start["i"]
            end = min(i + self.rows_per_batch, self.n)
            # Spark consumes the exhausted (no-progress) read through a
            # path that requires a true iterator, not a list
            return (iter([row(k) for k in range(i, end)]), {"i": max(end, i)})

        def readBetweenOffsets(self, start, end):
            # deterministic regeneration == exactly-once replay
            return [row(k) for k in range(start["i"], end["i"])]

    class OrderGenDataSource(DataSource):
        """``spark.read.format("order_gen").option("n", 2000).load()``."""

        @classmethod
        def name(cls) -> str:
            return "order_gen"

        def schema(self) -> str:
            return schema_str

        def reader(self, schema):
            return OrderGenBatchReader(self.options)

        def simpleStreamReader(self, schema):
            return OrderGenStreamReader(self.options)

    return OrderGenDataSource


def register(spark) -> None:
    spark.dataSource.register(make_datasource())
