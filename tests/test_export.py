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


def _mini_corpus(spark, n=40, tag="a"):
    rows = [(i, f"doc {tag} {i} body", "train" if i % 4 else "test") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


def test_versioned_export_snapshots_are_immutable(spark, tmp_path):
    """A pinned snapshot must read back byte-identically no matter how
    many NEWER snapshots append into the shared data pool afterwards —
    the manifest-as-source-of-truth contract."""
    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    m1 = export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    v1_rows = {
        tuple(r) for r in export.read_snapshot(spark, out, 1).collect()
    }
    m2 = export.export_versioned(spark, _mini_corpus(spark, 60, "b"), out)
    assert m1["version"] == 1 and m2["version"] == 2
    assert not set(m1["files"]) & set(m2["files"])  # append never rewrites
    # v1 unchanged after v2 appended
    again = {tuple(r) for r in export.read_snapshot(spark, out, 1).collect()}
    assert again == v1_rows and len(v1_rows) == 40
    assert len({tuple(r) for r in export.read_snapshot(spark, out, 2).collect()}) == 60


def test_versioned_export_publishes_without_hardlink_support(
    spark, tmp_path, monkeypatch
):
    """Object-store FUSE mounts and some network shares reject
    os.link (EPERM/EOPNOTSUPP); the publish must fall back to the
    O_EXCL claim — still race-free on the version number — instead of
    failing the export. Real link errors must still propagate."""
    import errno
    import os as _os

    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    real_link = _os.link

    def no_link(src, dst, *a, **kw):
        raise OSError(errno.EPERM, "Operation not permitted", dst)

    monkeypatch.setattr(_os, "link", no_link)
    m1 = export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    m2 = export.export_versioned(spark, _mini_corpus(spark, 24, "b"), out)
    assert (m1["version"], m2["version"]) == (1, 2)
    # the fallback-published manifests are complete, valid JSON that
    # read_snapshot trusts end-to-end
    assert export.read_snapshot(spark, out, 1).count() == 40
    assert export.read_snapshot(spark, out, 2).count() == 24
    # no stranded tmp files once publish returns
    assert not [
        f for f in _os.listdir(out) if f.startswith(".manifest-tmp-")
    ]

    # an unrelated link failure is NOT swallowed
    def bad_link(src, dst, *a, **kw):
        raise OSError(errno.EIO, "I/O error", dst)

    monkeypatch.setattr(_os, "link", bad_link)
    try:
        export.export_versioned(spark, _mini_corpus(spark, 8, "c"), out)
        raised = False
    except OSError as e:
        raised = e.errno == errno.EIO
    assert raised
    monkeypatch.setattr(_os, "link", real_link)


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    """Vacuum keep=1: the old snapshot's files and manifest go, the
    retained snapshot still reads fully and matches its manifest
    digest; a second vacuum is a no-op (idempotent)."""
    from flink_scala_spark.functions.portable import h60
    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    m2 = export.export_versioned(spark, _mini_corpus(spark, 60, "b"), out)

    summary = export.vacuum_exports(out, keep_versions=1)
    assert summary["kept_versions"] == [2]
    assert summary["removed_versions"] == [1]
    assert summary["removed_files"]  # v1's files actually deleted
    assert export.existing_versions(out) == [2]
    # retained snapshot intact: row count and digest re-verify
    snap = export.read_snapshot(spark, out, 2)
    non_part = sorted(c for c in snap.columns if c != "split")
    row_h = h60(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in non_part
            ],
        )
    )
    got = snap.select(row_h.alias("h")).agg(
        F.count("*").alias("rows"), F.expr("bit_xor(h)").alias("digest")
    ).collect()[0]
    assert got["rows"] == m2["rows"]
    assert str(got["digest"]) == m2["digest"]
    # idempotent
    again = export.vacuum_exports(out, keep_versions=1)
    assert again["removed_versions"] == [] and again["removed_files"] == []


def test_vacuum_under_concurrent_pinned_reader(spark, tmp_path):
    """A reader holding a PINNED old manifest while vacuum deletes that
    snapshot must observe all-or-nothing: every read attempt either
    returns the snapshot's full row set or fails cleanly — never a
    silent partial result (the corruption mode of a reader racing
    retention). Checked both as explicit interleavings (pin -> vacuum
    -> collect must raise; pin -> collect -> vacuum sees full rows)
    and as a live thread race."""
    import threading

    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    export.export_versioned(spark, _mini_corpus(spark, 60, "b"), out)

    # interleaving 1: reader pins v1 and drains it BEFORE vacuum — full
    pinned = export.read_snapshot(spark, out, 1)
    full = {tuple(r) for r in pinned.collect()}
    assert len(full) == 40

    # live race: a reader thread re-collecting the pinned v1 frame
    # while the main thread vacuums it away; every iteration must be
    # full-or-clean-failure
    results: list[tuple[str, object]] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                rows = {tuple(r) for r in pinned.collect()}
                results.append(("ok", rows))
            except Exception as e:  # clean, surfaced failure
                results.append(("err", type(e).__name__))
                return

    t = threading.Thread(target=reader)
    t.start()
    summary = export.vacuum_exports(out, keep_versions=1)
    stop.set()
    t.join(120)
    assert summary["removed_versions"] == [1]
    for kind, payload in results:
        if kind == "ok":
            assert payload == full  # never a partial subset
    # interleaving 2: post-vacuum reads of the dead snapshot fail
    # cleanly — the manifest died WITH its files, so the pin itself is
    # impossible, and a stale pinned frame raises rather than
    # silently shrinking
    import pytest as _pytest

    with _pytest.raises(Exception):
        export.read_snapshot(spark, out, 1)
    with _pytest.raises(Exception):
        pinned.collect()
    # the survivor is untouched
    assert len(export.read_snapshot(spark, out, 2).collect()) == 60


def test_vacuum_spares_in_flight_export_until_grace(spark, tmp_path):
    """An unreferenced snap-* directory (exactly what a CONCURRENT
    exporter looks like between its parquet write and its manifest
    publish) must SURVIVE vacuum inside the orphan grace window and be
    collected — skeleton included — once past it (grace=0)."""
    import os

    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    # simulate an in-flight exporter: snapshot written, manifest not yet
    data_dir = os.path.join(out, "data")
    inflight = os.path.join(data_dir, "snap-inflight")
    _mini_corpus(spark, 20, "b").write.partitionBy("split").parquet(inflight)
    n_files = sum(len(fs) for _, _, fs in os.walk(inflight))
    assert n_files > 0

    summary = export.vacuum_exports(out, keep_versions=1)  # default grace
    assert summary["removed_versions"] == []
    assert os.path.isdir(inflight)
    assert sum(len(fs) for _, _, fs in os.walk(inflight)) == n_files

    # the exporter crashed; past the grace window the orphan goes
    summary = export.vacuum_exports(out, keep_versions=1, orphan_grace_s=0)
    assert not os.path.exists(inflight)  # no skeleton left either
    assert any(r.startswith("snap-inflight") for r in summary["removed_files"])


def test_vacuum_leaves_no_snapshot_skeleton(spark, tmp_path):
    """Vacuuming an expired snapshot must also remove its _SUCCESS /
    .crc write markers and the snap-* directory itself — not just the
    parquet files."""
    import os

    from flink_scala_spark.pipeline import export

    out = str(tmp_path / "exp")
    m1 = export.export_versioned(spark, _mini_corpus(spark, 40, "a"), out)
    m2 = export.export_versioned(spark, _mini_corpus(spark, 60, "b"), out)
    data_dir = os.path.join(out, "data")
    dead = os.path.join(data_dir, m1["base"])
    assert os.path.isdir(dead)

    export.vacuum_exports(out, keep_versions=1)
    assert not os.path.exists(dead), os.listdir(dead)
    # the kept snapshot (markers and all) is untouched and still reads
    live = os.path.join(data_dir, m2["base"])
    assert os.path.isdir(live)
    assert export.read_snapshot(spark, out, m2["version"]).count() == m2["rows"]


def test_pq_persisted_index_is_bit_identical_and_reused(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The persisted PQ serving index (round 11, verdict item 5) must
    (a) publish atomically with a MANIFEST.json commit record, (b) load
    bit-identical to an in-session build so every downstream oracle is
    unchanged, and (c) be REUSED — a second call must not re-encode
    (proven by deleting nothing and checking the staged dir's mtimes
    stay put), while a rewritten source must key a NEW directory."""
    import os

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)
    emb = tables.load(spark, sf_dir, "embeddings")

    enc1, cb1 = similarity.pq_persisted_index(emb)
    dirs = os.listdir(home)
    assert len(dirs) == 1 and dirs[0].startswith("pq-")
    staged = os.path.join(home, dirs[0])
    assert os.path.isfile(os.path.join(staged, "MANIFEST.json"))

    # bit-identical to the in-session builders
    cb_mem = similarity.pq_codebook(emb)
    enc_mem = similarity.pq_encode(emb, cb_mem)
    assert sorted(map(tuple, enc1.collect())) == sorted(
        map(tuple, enc_mem.collect())
    )
    assert sorted(map(tuple, cb1.collect())) == sorted(
        map(tuple, cb_mem.collect())
    )

    # reuse: second call loads the same staged dir (no new dirs, no
    # rewrite of the committed artifacts)
    before = {
        f: os.path.getmtime(os.path.join(staged, f)) for f in os.listdir(staged)
    }
    enc2, _ = similarity.pq_persisted_index(emb)
    assert os.listdir(home) == dirs
    after = {
        f: os.path.getmtime(os.path.join(staged, f)) for f in os.listdir(staged)
    }
    assert before == after
    assert enc2.count() == enc1.count()

    # a DIFFERENT source (content fingerprint) keys a different dir
    rewritten = str(tmp_path / "emb2")
    emb.limit(50).write.parquet(rewritten)
    enc3, _ = similarity.pq_persisted_index(spark.read.parquet(rewritten))
    assert len(os.listdir(home)) == 2
    assert enc3.count() == 50


def test_pq_persisted_index_keys_columns_and_repairs_corruption(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-11 review pass 3: (a) the on-disk key must include
    id_col/vec_col — the SAME frame encoded over a different vector
    column is a different index, so two encodings may never alias one
    staged dir; (b) a staged dir whose artifacts are gone (manifest
    intact, codes deleted) must degrade to the in-session build AND be
    removed so the next call re-stages, never crash or short-circuit
    on the bad path forever."""
    import os
    import shutil

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)
    emb = tables.load(spark, sf_dir, "embeddings")
    two = emb.select(
        "vec_id",
        F.col("embedding").alias("e1"),
        F.col("embedding").alias("e2"),
    )

    similarity.pq_persisted_index(two, vec_col="e1")
    similarity.pq_persisted_index(two, vec_col="e2")
    # identical frame + plan, different vec_col -> two distinct keys
    assert len(os.listdir(home)) == 2

    # corrupt one staged dir: manifest stays, codes vanish
    staged = sorted(os.listdir(home))
    victim = None
    enc_ok, _ = similarity.pq_persisted_index(two, vec_col="e1")
    n_expected = enc_ok.count()
    for d in staged:
        shutil.rmtree(os.path.join(home, d, "codes"))
        victim = d
        break
    enc4, cb4 = similarity.pq_persisted_index(two, vec_col="e1")
    enc5, _ = similarity.pq_persisted_index(two, vec_col="e2")
    # both calls survive and return full-size indexes
    assert {enc4.count(), enc5.count()} == {n_expected}
    assert cb4.count() == similarity.PQ_K
    # the corrupted dir was repaired away (removed by whichever call
    # owned it) and at most re-staged fresh: every surviving dir has
    # its artifacts back
    for d in os.listdir(home):
        assert os.path.isfile(os.path.join(home, d, "MANIFEST.json"))
        for sub in ("codebook", "codes"):
            part = os.path.join(home, d, sub)
            assert os.path.isdir(part) and any(
                n.startswith("part-") for n in os.listdir(part)
            ), (d, sub, victim)


def test_pq_index_home_vacuum_keeps_newest_k(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-11 verdict item 2: the persisted-index home must not
    accumulate staged dirs forever. Staging K+1 versions of the same
    lineage (same id/vec cols + geometry, rewritten source content)
    must leave exactly PQ_INDEX_KEEP dirs, the least-recently-used one
    removed — and the removal must follow the export.py discipline
    (commit record first, artifacts second)."""
    import time

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)
    emb = tables.load(spark, sf_dir, "embeddings")

    assert similarity.PQ_INDEX_KEEP == 2
    staged_order = []
    for i, n in enumerate((40, 44, 48)):
        src = str(tmp_path / f"emb_v{i}")
        emb.limit(n).write.parquet(src)
        enc, _ = similarity.pq_persisted_index(spark.read.parquet(src))
        assert enc.count() == n
        new = [
            d
            for d in os.listdir(home)
            if d.startswith("pq-") and os.path.join(home, d) not in staged_order
        ]
        assert len(new) == 1
        p = os.path.join(home, new[0])
        staged_order.append(p)
        # pin distinct, strictly increasing LRU stamps OLDER than the
        # vacuum's lru_grace_s: a recently-used dir is never evicted
        # (live lazy frames may reference it), so eviction in this
        # test requires genuinely stale last-use times
        t = time.time() - 7200 + i
        os.utime(p, (t, t))

    live = [os.path.join(home, d) for d in os.listdir(home) if d.startswith("pq-")]
    # the third load's built-in vacuum removed the oldest version
    assert sorted(live) == sorted(staged_order[1:])
    assert not os.path.isdir(staged_order[0])
    # the survivors are complete, loadable indexes
    for p in live:
        assert os.path.isfile(os.path.join(p, "MANIFEST.json"))
        for sub in ("codebook", "codes"):
            assert any(
                n.startswith("part-")
                for n in os.listdir(os.path.join(p, sub))
            )

    # LRU grace (round-12 review pass 1): a RECENTLY-USED dir past
    # keep-K is never evicted — live lazy frames may reference it
    lru, mru = sorted(live, key=os.path.getmtime)
    now = time.time()
    os.utime(lru, (now - 10, now - 10))
    os.utime(mru, (now, now))
    res = similarity.vacuum_index_home(home, keep=1)
    assert res["removed"] == [] and sorted(res["kept"]) == sorted(live)
    res = similarity.vacuum_index_home(home, keep=1, lru_grace_s=0.0)
    assert res["removed"] == [lru]
    assert os.path.isdir(mru) and not os.path.isdir(lru)


def test_pq_index_vacuum_crash_safety_and_grace(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A crash mid-vacuum strands a manifest-less dir (the commit
    record is removed FIRST); the live index must keep serving through
    that state, a later vacuum must collect the remnant past the grace
    window, and a RECENT ``.tmp-*`` sibling (a concurrent stager
    in-flight) must never be collected."""
    import shutil

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)
    emb = tables.load(spark, sf_dir, "embeddings")

    enc, _ = similarity.pq_persisted_index(emb)
    n_live = enc.count()
    (live_dir,) = [d for d in os.listdir(home) if d.startswith("pq-")]
    live = os.path.join(home, live_dir)

    # fabricate the crash state: an expired version whose manifest was
    # removed but whose artifacts were not (vacuum order = manifest
    # first), plus an in-flight stager's temp dir
    remnant = os.path.join(home, "pq-" + "0" * 32)
    shutil.copytree(live, remnant)
    os.remove(os.path.join(remnant, "MANIFEST.json"))
    tmp_sibling = os.path.join(home, f"pq-{'1' * 32}.tmp-deadbeef")
    os.makedirs(tmp_sibling)

    # serving is unaffected by the remnant (different fingerprint)
    enc2, _ = similarity.pq_persisted_index(emb)
    assert enc2.count() == n_live

    # within the grace window neither the remnant nor the temp dir is
    # touched (a concurrent stager could own either shape)
    res = similarity.vacuum_index_home(home, protect=(live,))
    assert res["removed"] == []
    assert os.path.isdir(remnant) and os.path.isdir(tmp_sibling)

    # past the grace window both are collected; the live index is not
    res = similarity.vacuum_index_home(home, protect=(live,), grace_s=0.0)
    assert sorted(res["removed"]) == sorted([remnant, tmp_sibling])
    assert not os.path.isdir(remnant) and not os.path.isdir(tmp_sibling)
    enc3, cb3 = similarity.pq_persisted_index(emb)
    assert enc3.count() == n_live and cb3.count() == similarity.PQ_K


def test_pq_index_home_refuses_untrusted_and_repairs_mode(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-11 ADVICE: the home itself must be an OWNED 0700 dir
    before anything under it is trusted or staged. A symlinked home and
    a foreign-uid home fall back to the in-session build (staging
    nothing); an owned home with loose modes is chmod-repaired."""
    import stat

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    emb = tables.load(spark, sf_dir, "embeddings")
    n = emb.count()

    # (a) symlinked home: refuse — build in-session, stage nothing
    target = tmp_path / "elsewhere"
    target.mkdir()
    link = tmp_path / "link_home"
    link.symlink_to(target)
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", str(link))
    enc, _ = similarity.pq_persisted_index(emb)
    assert enc.count() == n
    assert list(target.iterdir()) == []

    # (b) foreign-owned home: refuse (simulated by shifting our euid)
    owned_by_other = tmp_path / "foreign_home"
    owned_by_other.mkdir(mode=0o700)
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", str(owned_by_other))
    real_euid = os.geteuid()
    monkeypatch.setattr(os, "geteuid", lambda: real_euid + 1)
    try:
        enc, _ = similarity.pq_persisted_index(emb)
        assert enc.count() == n
        assert list(owned_by_other.iterdir()) == []
    finally:
        monkeypatch.setattr(os, "geteuid", lambda: real_euid)

    # (c) owned home with group/other bits: repaired to 0700, staging
    # proceeds normally
    loose = tmp_path / "loose_home"
    loose.mkdir(mode=0o755)
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", str(loose))
    enc, _ = similarity.pq_persisted_index(emb)
    assert enc.count() == n
    assert stat.S_IMODE(os.stat(loose).st_mode) == 0o700
    assert any(d.name.startswith("pq-") for d in loose.iterdir())


def test_pq_index_configured_home_is_trusted_as_is(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-12 review pass 3: an EXPLICITLY configured
    SPARK_GRAFT_INDEX_HOME is the operator's trust decision — a
    group-shared store must be accepted without the 0700 chmod repair
    (which would lock out its other readers), and a symlinked store
    path must resolve (stat, not lstat). The strict default-path
    behavior is covered by the refuses-untrusted test above."""
    import os
    import stat as _stat

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    store = str(tmp_path / "shared_store")
    os.makedirs(store, mode=0o770)
    os.chmod(store, 0o770)  # umask-proof
    link = str(tmp_path / "store_link")
    os.symlink(store, link)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_HOME", link)
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", link)

    emb = tables.load(spark, sf_dir, "embeddings")
    enc, cb = similarity.pq_persisted_index(emb)
    assert enc.count() > 0 and cb.count() == similarity.PQ_K
    # staged INTO the store through the symlink, mode untouched
    assert any(d.startswith("pq-") for d in os.listdir(store))
    assert _stat.S_IMODE(os.stat(store).st_mode) == 0o770


def test_pq_index_read_failure_degrades_and_self_heals(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-12 review pass 3: a staged dir with a valid manifest but
    a CORRUPT parquet artifact must (a) fall back to the in-session
    build instead of raising, and (b) REMOVE the broken dir so the
    next call re-stages — otherwise stage_once short-circuits on the
    bad path forever and persistence is silently disabled for that
    fingerprint."""
    import glob
    import os

    from flink_scala_spark import tables
    from flink_scala_spark.pipeline import similarity

    home = str(tmp_path / "idx")
    monkeypatch.setattr(similarity, "PQ_INDEX_HOME", home)
    emb = tables.load(spark, sf_dir, "embeddings")

    enc, _ = similarity.pq_persisted_index(emb)
    n = enc.count()
    (d,) = [x for x in os.listdir(home) if x.startswith("pq-")]
    staged = os.path.join(home, d)
    # corrupt the codebook artifact: filename survives _has_parquet,
    # the eager read throws
    (part,) = glob.glob(os.path.join(staged, "codebook", "part-*"))
    with open(part, "wb") as f:
        f.write(b"not parquet")

    enc2, cb2 = similarity.pq_persisted_index(emb)
    assert enc2.count() == n and cb2.count() == similarity.PQ_K
    assert not os.path.isdir(staged), "broken dir must be removed"

    # the NEXT call re-stages a healthy index under the same key
    enc3, _ = similarity.pq_persisted_index(emb)
    assert enc3.count() == n
    dirs = [x for x in os.listdir(home) if x.startswith("pq-")]
    assert dirs == [d]
    assert os.path.isfile(os.path.join(home, d, "MANIFEST.json"))
