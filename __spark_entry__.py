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
# Round-3 rotation: (a) the seven queries whose round-3 changes touch
# their results or hardening (quantize digest, blocked near-dup,
# fixed-k IVF, containment blocking, incremental_dedup profile
# versioning, late_data_accounting's order-key guard, gap_fill's
# tie-break) lead; (b) the 22 entries never driver-verified in rounds
# 1-2 follow, so the union of driver-green rows approaches the full
# catalog (the other three never-verified entries —
# embedding_quantize_int8, dedup_containment, gap_fill_forward — are
# already in (a)); (b2) the eight operators added mid-round-3
# (duplicate-passage dedup, rarity scoring, Q17/Q22/Q21/Q12/Q8/Q16
# shapes); (c) the
# remaining slots refresh round-1-only entries across the window /
# streaming / keyed-agg families.
# Everything else stays covered by tests/test_catalog_oracle.py at
# sf0.001 every pytest run, and the head contract is pinned by
# tests/test_catalog_oracle.py::test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) changed this round — must re-earn green driver rows
    "embedding_quantize_int8",
    "embedding_near_dup",
    "ann_ivf_topk",
    "dedup_containment",
    "incremental_dedup",
    "late_data_accounting",
    "gap_fill_forward",
    # (b) never driver-checked in r1/r2
    "count_window_sliding",
    "skew_join_salted",
    "value_histogram",
    "windowed_topk_types",
    "session_stats",
    "rolling_window_avg",
    "revenue_day_over_day",
    "streaming_funnel",
    "streaming_cohort_retention",
    "dedup_ngram_jaccard",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "dataset_split",
    "stratified_sample_events",
    "multimodal_frame_sample",
    "multimodal_resize",
    "approx_ndv_hll",
    "asof_join_cogrouped",
    "value_deciles",
    "copurchase_pairs",
    "value_outliers",
    # (b2) eight operators added this session — never driver-checked
    "dedup_substring_spans",
    "text_rare_token_novelty",
    "small_quantity_part_revenue",
    "idle_high_balance_customers",
    "sole_late_supplier_waits",
    "ship_latency_priority_counts",
    "nation_market_share",
    "part_supplier_diversity",
    # (c) round-1-only entries refreshed across operator families
    "day_window_offset_utc8",
    "window_all_minute",
    "trigger_per_element_fire",
    "evictor_prefilter",
    "delta_alarm",
    "side_output_alarm",
    "split_select_bands",
    "generated_order_dashboard",
    "streaming_word_count",
    "streaming_keyed_sum",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_order_dashboard",
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
