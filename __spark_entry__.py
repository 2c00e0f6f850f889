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
# Round-8 rotation: (a) the nine entries with NO driver row ever (this
# round's additions: weighted_corpus_sample, mmr_rerank,
# distribution_drift_report, bloom_semi_join, pareto_frontier,
# revenue_grouping_sets, schema_evolution_roundtrip,
# streaming_drift_report, sketch_set_cardinality);
# (b) the four remaining round-3-evidence rows (the named survivors of
# the r7 rotation: copurchase_pairs, small_quantity_part_revenue,
# idle_high_balance_customers, sole_late_supplier_waits);
# (c) the 37 stalest of the 47 remaining round-4 rows. After this round
# every entry except ten r4-era relational shapes (local_supplier_volume,
# bracketed_revenue, forecast_revenue_change, ship_latency_priority_counts,
# nation_market_share, range_join_binned, revenue_cube, nation_trade_flow,
# value_deciles, dataset_split_leakage_safe — round-9's rotation head) has
# >= round-5 gate evidence. No existing entry's output changed this
# round (the round-8 code changes are guards/cache/publish-path
# hardening), so no forced re-entries. Everything below slot 50 stays
# oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) no driver row yet
    "weighted_corpus_sample",
    "mmr_rerank",
    "distribution_drift_report",
    "bloom_semi_join",
    "pareto_frontier",
    "revenue_grouping_sets",
    "schema_evolution_roundtrip",
    "streaming_drift_report",
    "sketch_set_cardinality",
    # (b) last round-3-evidence rows
    "copurchase_pairs",
    "small_quantity_part_revenue",
    "idle_high_balance_customers",
    "sole_late_supplier_waits",
    # (c) the 37 stalest round-4 rows
    "order_dashboard_total",
    "shipping_priority_topk",
    "scd2_history",
    "temporal_join_scd2",
    "cdc_apply_changelog",
    "events_variant_props",
    "events_type_unpivot",
    "streaming_delta_alarm",
    "streaming_static_enrichment",
    "streaming_dedup_within_watermark",
    "streaming_windowed_topk",
    "streaming_interval_join_outer",
    "streaming_cms_heavy_hitters",
    "streaming_cdc_apply",
    "streaming_chained_windows",
    "streaming_interval_join_full_outer",
    "streaming_dedup_then_window",
    "streaming_join_then_window",
    "text_token_stats",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "pii_scrub",
    "approx_ndv_hll",
    "decontamination_bloom",
    "sample_events_per_type",
    "ann_pq_topk",
    "udtf_bigram_topk",
    "udaf_second_largest",
    "corpus_curation_pipeline",
    "dedup_triangles",
    "semantic_dedup",
    "text_rare_token_novelty",
    "dedup_clusters_star",
    "bm25_search",
    "entity_clusters",
    "approx_quantiles_certified",
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
