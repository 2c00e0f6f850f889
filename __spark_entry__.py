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
# Round-12 rotation (verdict item 1): (a) the three round-12 additions
# (no driver row yet: the live SCD2 maintenance, the KMV join-size
# planner, the longest-run contamination score); (b) ALL 47 entries
# whose latest driver-green row is round 7 (the full stale tail,
# alphabetical — after this round no entry's latest driver row
# predates round 8). That fills the head exactly (50). The four
# round-12 plan-touched entries (spacesaving_topk_certified's
# vectorized MG fold, streaming_ann_pq_serving's hardened index home,
# revenue_dow_seasonality's zero-guard, the quantile pair's tiebreak
# deprecation) all have round-11 driver rows and value-identical
# results; their re-proof this round is the full-registry sf0.01 +
# sf0.1 check_oracle sweeps recorded in BASELINE.md plus the suite's
# all-catalog sf0.001 oracle test. Everything below slot 50 stays
# oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    "streaming_scd2_maintenance",
    "join_size_kmv_certified",
    "contamination_longest_run",
    "ann_ivf_pq_topk",
    "ann_ivf_topk",
    "ann_recall_report",
    "asof_join_cogrouped",
    "bpe_encode",
    "contrastive_triplets_ivf",
    "count_window_sliding",
    "dataset_split",
    "day_window_offset_utc8",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_substring_spans",
    "delta_alarm",
    "embedding_near_dup",
    "embedding_quantize_int8",
    "evictor_prefilter",
    "gap_fill_forward",
    "generated_order_dashboard",
    "hard_negative_mining_ivf",
    "incremental_dedup",
    "late_data_accounting",
    "multimodal_frame_sample",
    "multimodal_resize",
    "revenue_day_over_day",
    "rolling_window_avg",
    "semantic_decontamination",
    "session_stats",
    "side_output_alarm",
    "skew_join_salted",
    "split_select_bands",
    "stratified_sample_events",
    "streaming_cohort_retention",
    "streaming_delta_alarm_ttl",
    "streaming_funnel",
    "streaming_keyed_sum",
    "streaming_order_dashboard",
    "streaming_rising_alarm_tws",
    "streaming_session_gap_tws",
    "streaming_session_summary_tws",
    "streaming_session_windows",
    "streaming_tumbling_counts",
    "streaming_word_count",
    "trigger_per_element_fire",
    "value_histogram",
    "value_outliers",
    "window_all_minute",
    "windowed_topk_types",
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
