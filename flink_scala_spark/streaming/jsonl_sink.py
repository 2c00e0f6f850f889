"""Custom SINK as a Spark 4 Python Data Source writer (K5/K6's modern
extension point, ``hk/sink2Test/JdbcSinkTest.scala:42-72`` shape).

The reference's custom sinks subclass ``RichSinkFunction`` with
``open``/``invoke``/``close`` per task. Spark's modern equivalent is
the Python Data Source writer API: per-partition ``write(iterator)``
runs on executors and returns a commit message; the driver's
``commit(messages)`` / ``abort(messages)`` implements the two-phase
protocol (Flink's pattern: ``TwoPhaseCommitSinkFunction``; here a
file-manifest commit, the same shape object stores and transactional
metastores use).

Semantics:
- every partition writes ``part-<uuid>.jsonl`` under ``path`` and
  reports (file, row count) in its commit message;
- batch ``commit`` writes ``_committed-batch`` listing the files —
  readers that honor the manifest never see uncommitted/aborted tasks
  (task retries leave orphan files, excluded by the manifest — the
  idempotence argument the K6 upsert sink makes row-wise);
- streaming ``commit(messages, batchId)`` writes
  ``_committed-<batchId>`` per microbatch, giving exactly-once
  per-batch visibility on top of the checkpoint WAL (F1/F6).

Classes are built inside a factory closure so cloudpickle ships them
by value to executor workers (no repo PYTHONPATH needed) — the same
self-containment rule as the order_gen source.
"""

from __future__ import annotations


def make_datasource():
    import json
    import os
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class JsonlCommit(WriterCommitMessage):
        def __init__(self, file: str, rows: int):
            self.file = file
            self.rows = rows

    def write_partition(path: str, it) -> JsonlCommit:
        os.makedirs(path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(path, fname)
        n = 0
        with open(full, "w") as f:
            for row in it:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommit(fname, n)

    def write_manifest(path: str, tag: str, messages) -> None:
        manifest = {
            "files": [m.file for m in messages if m is not None],
            "rows": sum(m.rows for m in messages if m is not None),
        }
        # temp + atomic rename: a crash mid-dump must never leave a
        # truncated _committed-* file that poisons every later
        # read_committed with a JSONDecodeError
        final = os.path.join(path, f"_committed-{tag}")
        # the tmp name must NOT carry the _committed- prefix readers
        # scan for, or a partial tmp would be parsed as a manifest
        tmp = os.path.join(path, f".manifest-tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)

    class JsonlBatchWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            return write_partition(self.path, iterator)

        def commit(self, messages):
            # unique tag per commit: read_committed unions manifests,
            # so append-mode saves accumulate instead of a fixed
            # "batch" tag silently superseding earlier commits
            os.makedirs(self.path, exist_ok=True)
            prior = [
                e for e in os.listdir(self.path) if e.startswith("_committed-")
            ]
            write_manifest(self.path, f"batch-{uuid.uuid4().hex}", messages)
            if self.overwrite:
                # supersede: drop prior manifests (and their now-
                # unreferenced data files) AFTER the new commit is
                # visible. Within each prior commit, the MANIFEST goes
                # first: once it's gone its data files are invisible to
                # the manifest-honoring reader, so a crash between the
                # two merely strands orphan files. Deleting data first
                # would leave a live manifest pointing at deleted files
                # and break every later read_committed.
                for e in prior:
                    mpath = os.path.join(self.path, e)
                    try:
                        with open(mpath) as f:
                            rels = json.load(f)["files"]
                    except FileNotFoundError:
                        continue  # a concurrent cleanup got there first
                    try:
                        os.remove(mpath)
                    except FileNotFoundError:
                        continue  # racer removed it (and owns its files)
                    # any OTHER remove failure propagates: silently
                    # keeping a stale manifest would turn this
                    # overwrite into an append with no error anywhere
                    for rel in rels:
                        try:
                            os.remove(os.path.join(self.path, rel))
                        except OSError:
                            pass

        def abort(self, messages):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.file))
                    except OSError:
                        pass

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            return write_partition(self.path, iterator)

        def commit(self, messages, batchId):
            write_manifest(self.path, str(batchId), messages)

        def abort(self, messages, batchId):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.file))
                    except OSError:
                        pass

    class JsonlSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsonl_sink"

        def writer(self, schema, overwrite):
            return JsonlBatchWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite):
            return JsonlStreamWriter(self.options)

    return JsonlSinkDataSource


def register(spark) -> None:
    """Register the ``jsonl_sink`` format on this session."""
    spark.dataSource.register(make_datasource())


def read_committed(spark, path: str):
    """Read back ONLY committed files (manifest-honoring reader)."""
    import json
    import os

    files = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_committed-"):
            with open(os.path.join(path, entry)) as f:
                files += [os.path.join(path, x) for x in json.load(f)["files"]]
    return spark.read.json(files) if files else None
