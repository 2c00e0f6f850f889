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
# Round-5 rotation: (a) the 21 entries with NO driver row yet — the 5
# round-4 late additions (added after round 4's head was frozen, so
# never gate-checked despite being pytest-green since) and the 16
# round-5 additions (TTL near-dup, FIRE_AND_PURGE trigger twin,
# maintenance roundtrips, hybrid RRF retrieval, PQ rerank, live
# token-budget monitor, keep-best dedup, n-gram LM score,
# streaming PQ serving, budget sampler, source-reputation filter,
# bitext mining exact+LSH, incremental IVF index, length
# outliers); after
# round 5 every catalog entry has earned a driver row in some
# CORRECTNESS_r0N.json. (b) the 26 entries whose only green row is
# round 1 — four rounds stale — re-earn current evidence (one,
# big_order_customers, yields its refresh slot to a new entry); (c) the
# remaining 4 slots refresh the stalest round-<=2 rows, one per
# operator family. Everything rotated out stays oracle-checked at
# sf0.001 on every pytest run (tests/test_catalog_oracle.py), and the
# head contract is pinned by
# tests/test_catalog_oracle.py::test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) no driver row yet: round-4 late additions...
    "streaming_dedup_minhash",
    "unified_backfill_daily",
    "incremental_agg_maintenance",
    "split_contamination_audit",
    "corpus_token_budget",
    # ...and round-5 additions
    "streaming_dedup_minhash_ttl",
    "streaming_trigger_fire_purge",
    "compaction_roundtrip",
    "zorder_roundtrip",
    "hybrid_retrieval_rrf",
    "ann_pq_refined",
    "streaming_token_budget",
    "dedup_keep_best",
    "ngram_lm_score",
    "streaming_ann_pq_serving",
    "corpus_budget_sampler",
    "source_reputation_filter",
    "bitext_mining_margin",
    "ann_ivf_index_incremental",
    "bitext_mining_lsh",
    "length_outliers",
    # (b) green in round 1 only — refresh
    "order_dashboard_rollup",
    "lineitem_pricing_summary",
    "revenue_by_region_parttype",
    "orders_without_recent_shipments",
    "top_events_per_user",
    "word_count",
    "sensor_parse",
    "filter_threshold",
    "connect_co_map",
    "keyed_sum",
    "keyed_sum_salted",
    "event_value_quantiles",
    "events_json_props",
    "events_type_pivot",
    "latest_event_per_key",
    "running_sum",
    "ordered_fold",
    "ordered_fold_general",
    "arg_min_row",
    "tumbling_window_counts",
    "tumbling_window_unique_users",
    "tumbling_window_min_by",
    "sliding_window_counts",
    "streaming_interval_join",
    "streaming_latest_event",
    # (c) stalest round-<=2 rows, one per operator family
    "rising_streak_alarm",
    "streaming_dedup_events",
    "dedup_clusters",
    "multimodal_features",
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
