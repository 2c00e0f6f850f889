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
# Round-4 rotation: (a) every entry with NO green driver row across
# rounds 1-3 — the 29 round-3 additions VERDICT r3 listed, the two
# round-3 hash-FAILs whose oracles are now cast to BIGINT
# (ship_latency_priority_counts, text_rare_token_novelty), the
# reshaped approx_ndv_hll (now fully oracle-checked), and the new
# first-class-timer query streaming_rising_alarm_tws — after round 4
# the driver-green union covers all 155 catalog entries; (b) the ten
# queries whose ORACLES changed this round (integer-width casts from
# the typed-gate sweep) re-earn green rows against the new SQL;
# (c) the remaining slots refresh the stalest round-1-only rows, one
# per operator family. Everything else stays oracle-checked at
# sf0.001 on every pytest run (tests/test_catalog_oracle.py), and the
# head contract is pinned by
# tests/test_catalog_oracle.py::test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) never driver-green in rounds 1-3
    "ship_latency_priority_counts",
    "text_rare_token_novelty",
    "approx_ndv_hll",
    "streaming_rising_alarm_tws",
    "streaming_session_summary_tws",
    "streaming_session_gap_tws",
    "approx_quantiles_certified",
    "range_join_binned",
    "dataset_split_leakage_safe",
    "scd2_history",
    "temporal_join_scd2",
    "cdc_apply_changelog",
    "events_variant_props",
    "events_type_unpivot",
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
    "decontamination_bloom",
    "sample_events_per_type",
    "ann_pq_topk",
    "udtf_bigram_topk",
    "udaf_second_largest",
    "corpus_curation_pipeline",
    "dedup_triangles",
    "semantic_dedup",
    "dedup_clusters_star",
    "bm25_search",
    "entity_clusters",
    "local_supplier_volume",
    "bracketed_revenue",
    "forecast_revenue_change",
    # (b) oracle changed this round (typed-gate casts) — re-earn
    "shipping_priority_topk",
    "text_quality",
    "value_deciles",
    "nation_market_share",
    "text_token_stats",
    "pii_scrub",
    "revenue_cube",
    "nation_trade_flow",
    "text_lang_id",
    "text_fingerprint",
    # (c) stalest round-1-only rows, one per operator family
    "order_dashboard_total",
    "streaming_delta_alarm",
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
