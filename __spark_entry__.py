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


# The driver's correctness gate checks the FIRST 50 queries() entries.
# Round-10 rotation: (a) the eight round-10 additions (no driver row
# yet); (b) value_deciles — rebuilt this round on the histogram-CDF
# kernel, so the driver re-proves the changed plan (verdict item 2's
# "passing CORRECTNESS entry"); (c) ALL 41 entries whose latest
# driver-green row is round 5 (the full stale tail — after this round
# no entry's latest driver row predates round 6). That fills the head
# exactly: customer_rfm_segments' round-10 threshold rebuild (byte-
# identical selected values, r9 driver row) is instead re-proven by
# the end-of-round full-registry oracle sweeps at sf0.01 AND sf0.1
# recorded in BASELINE.md. Everything below slot 50 stays
# oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) round-10 additions, no driver row yet
    "rolling_distinct_users",
    "rolling_distinct_users_hll",
    "value_trend_ols",
    "product_type_profit",
    "large_volume_customers",
    "revenue_gini",
    "snapshot_diff_audit",
    "streaming_rolling_distinct_daily",
    # (b) plan changed this round
    "value_deciles",
    # (c) the full round-5 stale tail (41, alphabetical)
    "connect_co_map",
    "corpus_budget_sampler",
    "corpus_token_budget",
    "dedup_clusters",
    "dedup_keep_best",
    "event_value_quantiles",
    "events_json_props",
    "events_type_pivot",
    "filter_threshold",
    "hybrid_retrieval_rrf",
    "incremental_agg_maintenance",
    "keyed_sum",
    "keyed_sum_salted",
    "latest_event_per_key",
    "length_outliers",
    "lineitem_pricing_summary",
    "multimodal_features",
    "ngram_lm_score",
    "order_dashboard_rollup",
    "ordered_fold",
    "ordered_fold_general",
    "orders_without_recent_shipments",
    "rising_streak_alarm",
    "running_sum",
    "sensor_parse",
    "sliding_window_counts",
    "source_reputation_filter",
    "split_contamination_audit",
    "streaming_dedup_events",
    "streaming_dedup_minhash",
    "streaming_dedup_minhash_ttl",
    "streaming_interval_join",
    "streaming_latest_event",
    "streaming_token_budget",
    "top_events_per_user",
    "tumbling_window_counts",
    "tumbling_window_min_by",
    "tumbling_window_unique_users",
    "unified_backfill_daily",
    "word_count",
    "zorder_roundtrip",
]


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY if n in catalog.QUERIES]
    return head + [n for n in catalog.QUERIES if n not in set(head)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = {}
    for name in _ordered_names():
        spec = catalog.QUERIES[name]

        def wrapped(spark: SparkSession, sf_dir: str, _fn=spec.fn) -> DataFrame:
            tune_existing(spark)
            return _fn(spark, sf_dir)

        fns[name] = wrapped
    return fns


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-able query."""
    omap = catalog.oracle_sql_map()
    return {n: omap[n] for n in _ordered_names() if n in omap}
