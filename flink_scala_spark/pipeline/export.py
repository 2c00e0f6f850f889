"""Training-corpus materialization: the step that SHIPS the data.

Everything upstream (curation, chunking, splitting) is a catalog
query with an exact oracle; this module composes them into a write:
kept documents -> overlapping chunk rows -> train/val/test hash-split
-> Hive-partitioned parquet
(``split=...``) plus a JSON manifest with the per-split row counts and
an integrity digest.

Scale shape: the only new work over the member operators is the final
write. ``partitionBy('split')`` writes each split under its own
directory (directory-pruned reads, `tests/test_partitioning.py`'s
layout); within a split, file count follows the (split, doc_id) hash
repartition above. The manifest is
written LAST, from already-aggregated counts (a few rows to the
driver), so a reader that honors the manifest never sees a partial
export — the same contract as the X62 two-phase-commit sink.

No oracle entry: a write is a side effect; `tests/test_export.py`
round-trips the export and checks it against the catalog queries'
own outputs instead.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curated_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept docs -> overlapping chunk rows with split labels.

    Composes the cataloged operators verbatim (same parameters), so
    each stage's correctness is already oracle-proven; this function
    only chains them on doc_id-keyed joins.
    """
    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import text
    from flink_scala_spark.queries.pipeline_queries import (
        q_corpus_curation_pipeline,
    )

    docs = tables.load(spark, sf_dir, "documents")
    keep = (
        q_corpus_curation_pipeline(spark, sf_dir)
        .where(F.col("keep") == 1)
        .select("doc_id")
    )
    kept_docs = docs.join(keep, "doc_id")
    chunks = text.chunk_documents(kept_docs)  # doc_id, chunk_id, chunk digest/text
    split = text.dataset_split(kept_docs).select("doc_id", "split")
    return chunks.join(split, "doc_id")


def export_training_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, files_per_split: int = 4
) -> dict:
    """Materialize the curated corpus; returns the manifest dict.

    Layout: ``{out_dir}/data/split=train/part-*.parquet`` etc., plus
    ``{out_dir}/MANIFEST.json`` (written last) with per-split row
    counts and an order-insensitive content digest the reader can
    verify.
    """
    seqs = curated_sequences(spark, sf_dir)
    data_dir = os.path.join(out_dir, "data")
    (
        # hash on (split, doc_id): rows of ONE split spread over
        # multiple partitions -> multiple files per split directory
        # (repartition on split alone would hash every split to a
        # single partition and cap write parallelism at n_splits)
        seqs.repartition(files_per_split, "split", "doc_id")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(data_dir)
    )
    # integrity: per-split counts + xor-of-row-hashes (order-free),
    # computed from the files just written (read-back, not the plan),
    # so the manifest certifies what is actually on disk
    written = spark.read.parquet(data_dir)
    from flink_scala_spark.functions.portable import h60

    non_part = [c for c in written.columns if c != "split"]
    # explicit NULL sentinel: concat_ws silently SKIPS nulls, which
    # would give ('a', NULL, 'b') and ('a', 'b', NULL) equal digests
    row_h = h60(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in sorted(non_part)
            ],
        )
    )
    stats = (
        written.select("split", row_h.alias("h"))
        .groupBy("split")
        .agg(
            F.count("*").alias("rows"),
            # xor-fold: order-insensitive and overflow-free (a sum of
            # 60-bit hashes overflows BIGINT under ANSI mode)
            F.expr("bit_xor(h)").alias("digest"),
        )
        .collect()
    )
    manifest = {
        "table": "curated_chunks",
        "source_sf_dir": sf_dir,
        "splits": {
            r["split"]: {"rows": r["rows"], "digest": str(r["digest"])}
            for r in stats
        },
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
