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
# Round-7 rotation: (a) the four entries with NO driver row ever
# (bpe_encode — added after the r6 head froze, VERDICT r6 ask #1 —
# plus this round's contrastive_triplets_ivf, ann_ivf_pq_topk, and
# semantic_decontamination);
# (b) the NINE entries whose semantics, outputs, or implementation
# changed this round — the IVF family moved to the Lloyd's-trained
# C=16 quantizer, streaming_ann_pq_serving now sinks via
# foreachBatch, and the TWS/TTL replay re-bucketing (5-day buckets)
# changed those five entries' watermark sequences and therefore their
# outputs — their older green rows prove the OLD code, so they all
# re-enter the gate; (c) the 37 stalest of the 41 remaining round-3
# rows. After this round everything outside four r3-era relational
# survivors (small_quantity_part_revenue, idle_high_balance_customers,
# sole_late_supplier_waits, copurchase_pairs — stable shapes, next
# round's slot-1 candidates) has >= round-4 gate evidence, and every
# entry whose
# behavior changed in round 7 has round-7 evidence. Everything below
# slot 50 stays oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) no driver row yet
    "bpe_encode",
    "contrastive_triplets_ivf",
    "ann_ivf_pq_topk",
    "semantic_decontamination",
    # (b) changed this round — re-prove under the new semantics
    "ann_ivf_topk",
    "hard_negative_mining_ivf",
    "ann_recall_report",
    "streaming_ann_pq_serving",
    "streaming_rising_alarm_tws",
    "streaming_session_summary_tws",
    "streaming_session_gap_tws",
    "streaming_trigger_fire_purge",
    "streaming_delta_alarm_ttl",
    # (c) latest green row is r3 — the 37 stalest of 41
    "split_select_bands",
    "side_output_alarm",
    "generated_order_dashboard",
    "day_window_offset_utc8",
    "window_all_minute",
    "evictor_prefilter",
    "trigger_per_element_fire",
    "late_data_accounting",
    "delta_alarm",
    "count_window_sliding",
    "skew_join_salted",
    "value_histogram",
    "windowed_topk_types",
    "session_stats",
    "rolling_window_avg",
    "revenue_day_over_day",
    "gap_fill_forward",
    "streaming_tumbling_counts",
    "streaming_keyed_sum",
    "streaming_word_count",
    "streaming_order_dashboard",
    "streaming_session_windows",
    "streaming_funnel",
    "streaming_cohort_retention",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "dataset_split",
    "stratified_sample_events",
    "multimodal_frame_sample",
    "multimodal_resize",
    "embedding_quantize_int8",
    "incremental_dedup",
    "asof_join_cogrouped",
    "dedup_containment",
    "dedup_substring_spans",
    "value_outliers",
    "part_supplier_diversity",
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
