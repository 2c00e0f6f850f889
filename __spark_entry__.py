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
# Round-13 rotation (round-12 verdict item 8, the standing cadence):
# (a) streaming_ann_pq_serving — this round's headline rewrite (the
# per-batch ADC tables now build on the driver), so the driver gate
# re-proves it directly; (b) ALL 49 entries whose latest driver-green
# row is round 8 (the full stale tail, alphabetical — after this round
# no entry's latest driver row predates round 9). That fills the head
# exactly (50). The other round-13-touched entries
# (dedup_clusters_star is IN the r8 cohort; dedup_pagerank and the
# materialize-helper migration sites have round-11/12 driver rows and
# value-identical results) are re-proved by the full-registry
# check_oracle sweeps recorded in BASELINE.md plus the suite's
# all-catalog sf0.001 oracle test. Everything below slot 50 stays
# oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    "streaming_ann_pq_serving",
    "ann_pq_topk",
    "approx_ndv_hll",
    "bloom_semi_join",
    "bm25_search",
    "cdc_apply_changelog",
    "copurchase_pairs",
    "corpus_curation_pipeline",
    "decontamination_bloom",
    "dedup_clusters_star",
    "dedup_triangles",
    "distribution_drift_report",
    "entity_clusters",
    "events_type_unpivot",
    "events_variant_props",
    "idle_high_balance_customers",
    "mmr_rerank",
    "order_dashboard_total",
    "pareto_frontier",
    "pii_scrub",
    "revenue_grouping_sets",
    "sample_events_per_type",
    "scd2_history",
    "schema_evolution_roundtrip",
    "semantic_dedup",
    "shipping_priority_topk",
    "sketch_set_cardinality",
    "small_quantity_part_revenue",
    "sole_late_supplier_waits",
    "streaming_cdc_apply",
    "streaming_chained_windows",
    "streaming_cms_heavy_hitters",
    "streaming_dedup_then_window",
    "streaming_dedup_within_watermark",
    "streaming_delta_alarm",
    "streaming_drift_report",
    "streaming_interval_join_full_outer",
    "streaming_interval_join_outer",
    "streaming_join_then_window",
    "streaming_static_enrichment",
    "streaming_windowed_topk",
    "temporal_join_scd2",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_rare_token_novelty",
    "text_token_stats",
    "udaf_second_largest",
    "udtf_bigram_topk",
    "weighted_corpus_sample",
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
