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
