"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's OrderAnalysy
dashboard aggregation, SURVEY.md §7.2 M0) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full catalog from
``flink_scala_spark.queries.catalog`` — one entry per implemented
operator of SURVEY.md §2 plus the LLM-pipeline extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from flink_scala_spark.queries import catalog  # noqa: E402
from flink_scala_spark.session import tune_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return catalog.q_order_dashboard_province(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = {}
    for name, spec in catalog.QUERIES.items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=spec.fn) -> DataFrame:
            tune_existing(spark)
            return _fn(spark, sf_dir)

        fns[name] = wrapped
    return fns


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-able query."""
    return catalog.oracle_sql_map()
