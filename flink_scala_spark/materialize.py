"""Materialization primitives for multiply-referenced intermediates.

Round 12 found the engine's central plan pathology: a DataFrame
referenced from several branches re-derives its whole subtree per
reference (per-branch column pruning de-canonicalizes the subplans, so
exchange reuse never fires), turning bounded intermediates —
histograms, day tables, key-grain counts, sketch flags, cohort
rollups — into repeated corpus scans. The fix was to materialize such
frames exactly once. Round 13 (verdict item 2) centralizes the
primitive here so the fault-tolerance trade is made — and documented —
in ONE place instead of 55 call sites.

Why the default is ``localCheckpoint``: it both materializes AND
truncates lineage, so iterative plans stay constant-size and the
multi-branch consumers all read the same block-backed leaf. The trade
the raw call never stated: **local checkpoint blocks live on executors
only** — on a real cluster, losing one executor makes every dependent
job fail unrecoverably (Spark cannot recompute a truncated lineage).
``local[N]`` has exactly one "executor", so the bench/test environment
can never surface that; at 100 TB with node churn it is a reliability
regression. Deployments choose per environment:

- ``SPARK_GRAFT_SHARED_BOUNDED=persist``: lineage-preserving
  ``persist(MEMORY_AND_DISK)`` — the CacheManager gives the same
  single-materialization sharing for every reference to the same
  DataFrame, and a lost executor's partitions are recomputed from
  lineage. Plans are no longer truncated, which is fine for the
  bounded one-shot frames :func:`shared_bounded` is for, but NOT for
  loop state (plans would grow per iteration) — hence the separate
  :func:`loop_checkpoint`.
- ``SPARK_GRAFT_LOOP_CHECKPOINT=reliable``: iterative lineage
  truncation via ``DataFrame.checkpoint`` to the job's configured
  checkpoint directory (``SparkContext.setCheckpointDir`` — typically
  HDFS/object storage). Survives executor loss; costs a write to
  reliable storage per round.

Both knobs are read per call (not at import), so a long-lived driver
can flip them between jobs and tests can monkeypatch the environment.
Results are identical in every mode — these helpers only choose WHERE
the materialized bytes live and whether lineage survives; the
partition-count fuzz and the oracle gate pin that invariance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Valid modes, checked loudly: a typo'd env value silently running the
#: local default on a cluster would defeat the whole point of the knob.
_SHARED_MODES = ("localCheckpoint", "persist")
_LOOP_MODES = ("local", "reliable")


def _mode(env: str, valid: tuple[str, ...]) -> str:
    v = os.environ.get(env, valid[0])
    if v not in valid:
        raise ValueError(f"{env}={v!r}: expected one of {valid}")
    return v


def shared_bounded(df: DataFrame) -> DataFrame:
    """Materialize a BOUNDED, multiply-referenced intermediate once.

    Lazy: nothing runs until a downstream action; the first action
    computes the frame and every later reference (and every branch of
    the same plan) reads the materialized copy instead of re-deriving
    the subtree. Call it on frames whose size is bounded by the
    DOMAIN (histogram bins, calendar days, key-grain rollups, sketch
    summaries) or on compact per-unit projections measurably cheaper
    to store than to re-derive (grams tables: ids plus hashes) — never
    on payload-proportional data, where the round-12 measurements
    (dedup_substring_scrub 6.6x slower, vocab_oov_rate 2.3x) showed
    materialization costs more than the re-scan it saves.

    Mode (``SPARK_GRAFT_SHARED_BOUNDED``): ``localCheckpoint`` (lazy;
    the local/bench default) or ``persist`` (lineage-preserving
    MEMORY_AND_DISK for clusters with node churn) — trade documented in
    the module header.
    """
    if _mode("SPARK_GRAFT_SHARED_BOUNDED", _SHARED_MODES) == "persist":
        from pyspark.storagelevel import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)


def loop_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage for ITERATIVE state (label propagation,
    alternating-star rounds, PageRank mass tables): without the cut,
    round i's plan embeds round i-1's and planning time grows without
    bound (the round-12 BPE finding). ``eager=True`` (default)
    materializes now — required when a driver decision (convergence
    check) reads the frame immediately; pass ``eager=False`` when the
    next round's first action should fold the materialization into its
    own job.

    Mode (``SPARK_GRAFT_LOOP_CHECKPOINT``): ``local`` (executor-block
    checkpoint; the local/bench default) or ``reliable``
    (``DataFrame.checkpoint`` to the configured checkpoint dir —
    required on clusters where an executor loss mid-loop must not kill
    the job). See the module header for the trade.
    """
    if _mode("SPARK_GRAFT_LOOP_CHECKPOINT", _LOOP_MODES) == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def loop_checkpoint_lazy(df: DataFrame) -> DataFrame:
    """:func:`loop_checkpoint` with ``eager=False`` — a named form so
    ``.transform(loop_checkpoint_lazy)`` reads at the call site."""
    return loop_checkpoint(df, eager=False)
