"""Concurrent query execution on ONE SparkSession.

A real deployment multiplexes many queries over a shared session
(thread pools, notebook users, schedulers). Results must not depend on
what else is running: no shared mutable state inside operator builders,
no temp-view name collisions, no cross-query config bleed. This runs a
diverse slice of the catalog — scans, aggs, a bounded STREAMING query,
the binned range join — from worker threads simultaneously and checks
every result equals its serial run.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from flink_scala_spark.queries.catalog import QUERIES

NAMES = [
    "word_count",
    "keyed_sum",
    "dedup_exact",
    "value_histogram",
    "range_join_binned",
    "streaming_word_count",
]


def _run(spark, sf_dir, name):
    rows = QUERIES[name].fn(spark, sf_dir).collect()
    return sorted(tuple(r) for r in rows)


def test_concurrent_queries_match_serial(spark, sf_dir):
    serial = {n: _run(spark, sf_dir, n) for n in NAMES}
    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        futures = {n: pool.submit(_run, spark, sf_dir, n) for n in NAMES}
        concurrent = {n: f.result(timeout=600) for n, f in futures.items()}
    for n in NAMES:
        assert concurrent[n] == serial[n], n


def test_worker_package_import_from_foreign_cwd(tmp_path, sf_dir):
    """The driver harness may run from ANY cwd with only its own
    sys.path patched; Python workers un-pickle module-level stateful
    functions BY REFERENCE and must still import flink_scala_spark.
    tune_existing ships the repo dir via sc.environment (the local-mode
    --py-files equivalent) — without it this subprocess dies with
    ModuleNotFoundError in the worker (caught live in round 5)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[2]').getOrCreate()\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "import __spark_entry__ as se\n"
        "rows = se.queries()['streaming_dedup_minhash'](spark, %r).collect()\n"
        "assert len(rows) > 0, 'no rows'\n"
        "print('WORKER_IMPORT_OK', len(rows))\n" % (repo, sf_dir)
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER_IMPORT_OK" in proc.stdout
