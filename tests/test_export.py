"""Round-trip proof for the training-corpus export (pipeline/export.py):
the written Hive-partitioned parquet must agree with the cataloged
operators it composes, the manifest must certify exactly what is on
disk, and split pruning must reach the directory layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_export_roundtrip_matches_operators_and_manifest(spark, sf_dir, tmp_path):
    from flink_scala_spark.pipeline.export import (
        curated_sequences,
        export_training_corpus,
    )

    out = str(tmp_path / "corpus")
    manifest = export_training_corpus(spark, sf_dir, out)

    # 1. manifest certifies the on-disk rows exactly
    data = spark.read.parquet(os.path.join(out, "data"))
    disk_counts = {
        r["split"]: r["n"]
        for r in data.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert {s: v["rows"] for s, v in manifest["splits"].items()} == disk_counts
    on_disk_total = sum(disk_counts.values())
    assert on_disk_total > 0

    # 2. the export equals the operator composition it claims to write
    expected = curated_sequences(spark, sf_dir)
    cols = sorted(expected.columns)
    assert sorted(data.columns) == cols
    a = {tuple(r) for r in expected.select(*cols).collect()}
    b = {tuple(r) for r in data.select(*cols).collect()}
    assert a == b

    # 3. the persisted manifest file parses and matches the return
    with open(os.path.join(out, "MANIFEST.json")) as f:
        assert json.load(f) == manifest

    # 4. split predicate prunes to the partition directory: the scan
    # must carry a NON-EMPTY partition filter on split ("PartitionFilters"
    # prints even when empty, so match the filter content)
    import re

    pruned = data.where(F.col("split") == "train")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*split", plan), plan
    assert pruned.count() == disk_counts.get("train", 0)

    # files_per_split spreads one split over multiple files
    import glob as _glob

    train_files = _glob.glob(os.path.join(out, "data", "split=train", "*.parquet"))
    assert len(train_files) > 1

    # 5. a second export overwrites cleanly and re-certifies
    manifest2 = export_training_corpus(spark, sf_dir, out)
    assert manifest2["splits"] == manifest["splits"]
