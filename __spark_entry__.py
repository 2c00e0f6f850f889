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
# Round-6 rotation (VERDICT r5 ask #1: after round 6 no entry's latest
# green driver row may predate round 3): (a) the 11 round-6 additions
# with no driver row yet; (b) ALL 39 entries whose latest green row is
# round 1 or 2 — four-plus rounds stale. That fills the head exactly;
# the round-3-era refreshes listed below slot 50 keep their r3 green
# rows (still within the "nothing predates r3" bar). Everything below
# slot 50 stays oracle-checked at sf0.001 on every pytest run
# (tests/test_catalog_oracle.py), and the head contract is pinned by
# tests/test_catalog_oracle.py::test_driver_priority_head_is_valid.
_PRIORITY = [
    # (a) round-6 additions, no driver row yet
    "streaming_delta_alarm_ttl",
    "bitext_mining_ann",
    "hard_negative_mining",
    "hard_negative_mining_ivf",
    "contrastive_triplets",
    "streaming_approx_ndv_hll",
    "streaming_value_quantiles",
    "ann_recall_report",
    "boilerplate_shingle_flags",
    "vocab_oov_rate",
    "temperature_mixture",
    # (b) latest green row is r1/r2 — refresh all 39
    "big_order_customers",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "approx_ndv_kmv",
    "asof_join_purchase_click",
    "bpe_merges",
    "chunk_documents",
    "cms_heavy_hitters",
    "cohort_retention",
    "corpus_mixture",
    "count_window_sum",
    "curation_summary",
    "customer_order_distribution",
    "decontamination",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_pagerank",
    "dedup_simhash",
    "dq_audit",
    "embedding_label_centroids",
    "funnel_conversion",
    "fuzzy_name_pairs",
    "interval_join_error_clicks",
    "inverted_index",
    "kmeans_assignments",
    "min_cost_supplier_per_part",
    "order_dashboard_province",
    "order_priority_pipeline",
    "promo_revenue_share",
    "returned_revenue_top_customers",
    "sequence_packing",
    "session_windows",
    "snapshot_diff",
    "streaming_count_window",
    "streaming_rising_alarm",
    "streaming_union_counts",
    "text_repetition",
    "text_tfidf_top_terms",
    "top_supplier_revenue",
    # round-3-era rows, now all below slot 50 (the round-6 additions
    # filled the head) — their families stay represented in (b) and
    # they keep their r3 green rows plus the per-pytest sf0.001 check
    "ann_ivf_topk",
    "dataset_split",
    "delta_alarm",
    "embedding_near_dup",
    "skew_join_salted",
    "side_output_alarm",
    # (three more r3 rows demoted below slot 50 for the late round-6
    # text/sampling additions — generated_order_dashboard,
    # late_data_accounting, multimodal_resize keep their r3 green rows
    # plus the per-pytest sf0.001 oracle check)
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
