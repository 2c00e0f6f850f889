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
# Round-9 rotation: (a) the eight round-9 additions (no driver row
# yet); (b) the ten r4-era survivors earmarked by the round-8 verdict
# (after this round every entry has >= round-5 gate evidence); (c) the
# plan-changed queries with pre-round-8 evidence — five of the
# fourteen de-hinted broadcast queries (the other nine have r8 rows or
# sit in (b)), streaming_trigger_fire_purge (re-bucketed replay), and
# dedup_minhash_lsh/dedup_simhash (pair-enumeration rewrite); outputs
# of all of these are verified unchanged, so these are gate re-proofs,
# not forced re-entries; (d) 6 of the 47 remaining round-5 rows
# (alphabetical; the other 41 are round-10's head). Everything below
# slot 50 stays oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) round-9 additions, no driver row yet
    "k_anonymity_audit",
    "right_to_erasure_audit",
    "lsh_parameter_planner",
    "join_cardinality_planner",
    "embedding_covariance_report",
    "event_lag_features",
    "customer_ltv_cohorts",
    "streaming_k_anonymity_daily",
    "user_transition_matrix",
    "customer_rfm_segments",
    "shuffle_skew_planner",
    "incremental_join_maintenance",
    "streaming_cusum_daily",
    "interval_union_coverage",
    "knn_label_audit",
    "embedding_health_audit",
    "chunk_stitch_candidates",
    "revenue_cusum_changepoint",
    "dedup_substring_scrub",
    "value_mad_outlier_report",
    "negative_pool_sampler",
    "sequence_packing_bins",
    "lang_mismatch_audit",
    "streaming_value_mad_daily",
    "value_percentile_rank",
    "value_winsorized_stats",
    # (b) the ten r4-era survivors
    "bracketed_revenue",
    "dataset_split_leakage_safe",
    "forecast_revenue_change",
    "local_supplier_volume",
    "nation_market_share",
    "nation_trade_flow",
    "range_join_binned",
    "revenue_cube",
    "ship_latency_priority_counts",
    "value_deciles",
    # (c) plan-changed with pre-r8 evidence
    "revenue_by_region_parttype",
    "min_cost_supplier_per_part",
    "promo_revenue_share",
    "returned_revenue_top_customers",
    "part_supplier_diversity",
    "streaming_trigger_fire_purge",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # (d) 24 stalest round-5 rows (alphabetical)
    "ann_ivf_index_incremental",
    "ann_pq_refined",
    "arg_min_row",
    "bitext_mining_lsh",
    "bitext_mining_margin",
    "compaction_roundtrip",
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
