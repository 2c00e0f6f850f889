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

import errno
import json
import os
import uuid

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


# ---------------------------------------------------------------------------
# Versioned exports + vacuum (snapshot retention for the shipped corpus)
# ---------------------------------------------------------------------------

def _list_data_files(data_dir: str) -> set[str]:
    out = set()
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(root, f), data_dir))
    return out


def export_versioned(
    spark: SparkSession, df: DataFrame, out_dir: str, files_per_split: int = 4
) -> dict:
    """Append ``df`` (carrying a ``split`` column) as a NEW SNAPSHOT of
    the export: data files land under a snapshot-private subdirectory
    of ``data/`` (``data/snap-<uuid>/split=.../part-*`` — earlier
    snapshots' directories are untouched), and ``MANIFEST-v{N}.json``
    — written LAST, claimed with O_EXCL so two concurrent exporters
    can never publish the same version — lists exactly this snapshot's
    files plus row counts and digests. The file list is derived from
    the snapshot's OWN directory (never a diff of the shared pool), so
    a concurrent exporter's files or stray leftovers from a crashed
    write can never be claimed by this manifest; a crash before the
    manifest write strands an unreferenced ``snap-*`` directory that
    vacuum collects once it ages past the orphan grace window (the
    window is what keeps vacuum from destroying an export that is
    merely IN FLIGHT here). Readers pin a manifest and read only its
    file list, so a snapshot stays byte-stable no matter how many
    newer snapshots (or vacuums of OLDER ones) happen after it — the
    same manifest-as-source-of-truth contract Iceberg/Delta snapshots
    give a 100 TB lakehouse, built from primitives.
    """
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    snap_rel = f"snap-{uuid.uuid4().hex}"
    snap_dir = os.path.join(data_dir, snap_rel)
    (
        df.repartition(files_per_split, "split", "doc_id")
        .write.mode("error")
        .partitionBy("split")
        .parquet(snap_dir)
    )
    new_files = sorted(
        os.path.join(snap_rel, f) for f in _list_data_files(snap_dir)
    )
    # digest the snapshot from the files just written (read-back);
    # basePath keeps the split=... partition column on direct-file reads
    written = spark.read.option("basePath", snap_dir).parquet(
        *[os.path.join(data_dir, f) for f in new_files]
    )
    from flink_scala_spark.functions.portable import h60

    non_part = sorted(c for c in written.columns if c != "split")
    row_h = h60(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in non_part
            ],
        )
    )
    stats = (
        written.select(row_h.alias("h"))
        .agg(F.count("*").alias("rows"), F.expr("bit_xor(h)").alias("digest"))
        .collect()[0]
    )
    # publish: claim the next free version number exclusively. The
    # manifest file IS the commit record, so the publish must be BOTH
    # exclusive (race-free version assignment across processes) and
    # atomic (a crash or ENOSPC mid-dump must never leave a truncated
    # MANIFEST-vN.json that existing_versions() counts but every later
    # read_snapshot/vacuum chokes on). Write + fsync a tmp file once,
    # then os.link(tmp, final) — link fails with EEXIST exactly like
    # O_EXCL but publishes fully-written bytes or nothing.
    seen_versions = existing_versions(out_dir)
    version = (max(seen_versions) + 1) if seen_versions else 1
    tmp = os.path.join(out_dir, f".manifest-tmp-{uuid.uuid4().hex}")
    try:
        while True:
            manifest = {
                "version": version,
                "base": snap_rel,
                "files": new_files,
                "rows": stats["rows"],
                "digest": str(stats["digest"]),
            }
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=2, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            path = os.path.join(out_dir, f"MANIFEST-v{version}.json")
            try:
                os.link(tmp, path)
            except FileExistsError:
                version += 1
                continue
            except OSError as e:
                # filesystems without hardlink support (object-store
                # FUSE mounts, some network shares) raise EPERM /
                # EOPNOTSUPP / ENOTSUP here — fall back to the O_EXCL
                # claim: still race-free on the version number, merely
                # not crash-atomic on the byte write (the tmp+link form
                # is preferred exactly for that). Anything else is a
                # real error and propagates.
                if e.errno not in (
                    errno.EPERM, errno.EOPNOTSUPP, errno.ENOTSUP
                ):
                    raise
                # O_EXCL claims the version number race-free, but the
                # bytes must still publish atomically: dump into the
                # already-fsynced tmp's sibling and os.rename() it over
                # the claimed path — rename needs no hardlink support
                # and readers observe either nothing or the full
                # manifest, never a truncation. (The only residue a
                # crash can leave is the zero-byte claim between the
                # two syscalls below — no partially-written JSON.)
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    version += 1
                    continue
                os.close(fd)
                os.rename(tmp, path)
            return manifest
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def existing_versions(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    out = []
    for f in os.listdir(out_dir):
        if f.startswith("MANIFEST-v") and f.endswith(".json"):
            out.append(int(f[len("MANIFEST-v"):-len(".json")]))
    return sorted(out)


def read_snapshot(spark: SparkSession, out_dir: str, version: int) -> DataFrame:
    """Read exactly one snapshot's files (time travel)."""
    with open(os.path.join(out_dir, f"MANIFEST-v{version}.json")) as f:
        manifest = json.load(f)
    data_dir = os.path.join(out_dir, "data")
    # basePath at the snapshot root so split=... stays a partition column
    base = os.path.join(data_dir, manifest["base"]) if "base" in manifest else data_dir
    return spark.read.option("basePath", base).parquet(
        *[os.path.join(data_dir, p) for p in manifest["files"]]
    )


def vacuum_exports(
    out_dir: str, keep_versions: int = 1, orphan_grace_s: float = 86400.0
) -> dict:
    """Retention: drop all but the newest ``keep_versions`` snapshots.

    Safety order mirrors a production vacuum: (1) compute the KEEP set
    from the retained manifests; (2) delete the EXPIRED manifests'
    files (plus their snapshot directories' write markers — _SUCCESS,
    .crc — so vacuumed ``snap-*`` dirs leave no skeleton); (3) delete
    the expired manifests LAST — so a crash mid-vacuum can strand
    garbage files (re-vacuum collects them) but can never leave a live
    manifest pointing at deleted data. Files referenced by ANY retained
    manifest are never touched.

    Files referenced by NO manifest at all are collected only once
    older than ``orphan_grace_s`` (mtime) — a CONCURRENT exporter's
    snapshot is exactly such a file set between its parquet write and
    its O_EXCL manifest publish, and an eager delete would destroy a
    healthy in-flight export or, worse, land between its digest pass
    and its manifest write and publish a version whose files are gone.
    The grace window is the same retention compromise Delta/Iceberg
    vacuums make; crashed exports are collected by any vacuum run
    after the window. Returns a summary dict."""
    import time

    versions = existing_versions(out_dir)
    keep = set(versions[-keep_versions:]) if keep_versions > 0 else set()
    data_dir = os.path.join(out_dir, "data")

    def _manifest(v: int) -> dict:
        with open(os.path.join(out_dir, f"MANIFEST-v{v}.json")) as f:
            return json.load(f)

    referenced: set[str] = set()
    keep_bases: set[str] = set()
    for v in keep:
        try:
            m = _manifest(v)
        except FileNotFoundError:
            # a concurrent vacuum with a smaller retention already
            # expired this version (only non-newest manifests are ever
            # removed) — adopting its decision is the consistent move
            continue
        referenced.update(m["files"])
        if "base" in m:
            keep_bases.add(m["base"])
    expired_files: set[str] = set()
    expired_bases: set[str] = set()
    for v in versions:
        if v in keep:
            continue
        try:
            m = _manifest(v)
        except FileNotFoundError:
            continue  # a concurrent vacuum already collected it
        expired_files.update(m["files"])
        if "base" in m:
            expired_bases.add(m["base"])
    expired_bases -= keep_bases

    removed_files = []
    for rel in sorted(expired_files - referenced):
        p = os.path.join(data_dir, rel)
        try:
            os.remove(p)
            removed_files.append(rel)
        except FileNotFoundError:
            pass  # a concurrent vacuum got it between listing and here
    # expired snapshots' non-data residue (write markers) + true
    # orphans past the grace window
    cutoff = time.time() - orphan_grace_s
    known = referenced | expired_files
    if os.path.isdir(data_dir):
        for root, _dirs, files in os.walk(data_dir):
            for f in files:
                p = os.path.join(root, f)
                rel = os.path.relpath(p, data_dir)
                if rel in known:
                    continue
                top = rel.split(os.sep)[0]
                if top in keep_bases:
                    continue  # a live snapshot's own markers
                try:
                    if top in expired_bases or os.path.getmtime(p) <= cutoff:
                        os.remove(p)
                        removed_files.append(rel)
                except FileNotFoundError:
                    pass  # a concurrent vacuum got it first
    # prune now-empty split/snapshot directories; a concurrent exporter
    # may be creating its snap-* dir (ENOTEMPTY) or a concurrent vacuum
    # may have pruned it first (ENOENT) — both are benign races, same
    # tolerance the data-file path above applies
    for root, dirs, files in os.walk(data_dir, topdown=False):
        if root != data_dir:
            try:
                if not os.listdir(root):
                    os.rmdir(root)
            except OSError:
                pass
    removed_versions = [v for v in versions if v not in keep]
    for v in removed_versions:
        try:
            os.remove(os.path.join(out_dir, f"MANIFEST-v{v}.json"))
        except FileNotFoundError:
            pass  # a concurrent vacuum removed it first
    # crashed exports (kill -9 between tmp write and publish) strand
    # .manifest-tmp-* at the out_dir top level — collect them past the
    # same grace window as data orphans. ASSUMPTION (same contract as
    # the data-orphan window above): no healthy exporter stalls longer
    # than orphan_grace_s between writing its tmp manifest and linking
    # it — one that does loses its tmp to this reaper and dies with
    # FileNotFoundError at the link. Size orphan_grace_s above the
    # slowest plausible publish pause (default 24 h), exactly as
    # Delta/Iceberg vacuum retention is sized above the slowest writer.
    for f in os.listdir(out_dir):
        if f.startswith(".manifest-tmp-"):
            p = os.path.join(out_dir, f)
            try:
                if os.path.getmtime(p) <= cutoff:
                    os.remove(p)
            except (FileNotFoundError, OSError):
                pass
    return {
        "kept_versions": sorted(keep),
        "removed_versions": removed_versions,
        "removed_files": removed_files,
    }
