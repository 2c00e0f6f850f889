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
    # (a) round-11 additions, no driver row yet (5)
    "spacesaving_topk_certified",
    "revenue_dow_seasonality",
    "revenue_autocorr_lag1",
    "cross_type_quantile_norm",
    "streaming_two_stream_reconcile_tws",
    # (b) plan changed this round with CHANGED semantics surface: the
    # binned-CDF quantile rebuild (2) + the persisted-index serving
    # path (1). Three further entries were touched by the round-10
    # ADVICE items with value-identical edits on BOTH engine sides
    # (value_deciles NULL pin, corpus_budget_sampler toks guard,
    # snapshot_diff_audit high-bit shift) — the 42-entry stale-tail
    # rotation leaves them no seat; their re-proof this round is the
    # full-registry sf0.01/sf0.1 check_oracle sweeps recorded in
    # BASELINE.md plus the suite's all-catalog sf0.001 oracle test.
    "event_value_quantiles",
    "approx_quantiles_certified",
    "streaming_ann_pq_serving",
    # (c) the full round-6 stale tail (42, alphabetical)
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "approx_ndv_kmv",
    "asof_join_purchase_click",
    "big_order_customers",
    "bitext_mining_ann",
    "boilerplate_shingle_flags",
    "bpe_merges",
    "chunk_documents",
    "cms_heavy_hitters",
    "cohort_retention",
    "contrastive_triplets",
    "corpus_mixture",
    "count_window_sum",
    "curation_summary",
    "customer_order_distribution",
    "decontamination",
    "dedup_exact",
    "dedup_pagerank",
    "dq_audit",
    "embedding_label_centroids",
    "funnel_conversion",
    "fuzzy_name_pairs",
    "hard_negative_mining",
    "interval_join_error_clicks",
    "inverted_index",
    "kmeans_assignments",
    "order_dashboard_province",
    "order_priority_pipeline",
    "sequence_packing",
    "session_windows",
    "snapshot_diff",
    "streaming_approx_ndv_hll",
    "streaming_count_window",
    "streaming_rising_alarm",
    "streaming_union_counts",
    "streaming_value_quantiles",
    "temperature_mixture",
    "text_repetition",
    "text_tfidf_top_terms",
    "top_supplier_revenue",
    "vocab_oov_rate",
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
