"""Loud scale guards for the documented exact-baseline paths.

Three catalog entries are deliberately retained in their
quadratic/unbounded ground-truth form because they anchor the oracles
of their scale-safe twins (`bitext_mining_margin` → all-pairs margin,
`dedup_ngram_jaccard` → all-candidate Jaccard, `streaming_dedup_minhash`
→ unbounded per-bucket state). At test scale they are cheap; at 100 TB
they would silently broadcast or accumulate half the corpus. Rather
than prune them (they ARE the cross-reference oracles), each now
refuses to run past a documented input bound with an error naming its
production twin — turning the failure mode from a silent
cluster-melter into an immediate, actionable exception.

The bounds are generous multiples of the shipped test scales (sf0.1 is
~2 orders of magnitude below every bound), so no test or bench run
pays more than the one COUNT aggregate the guard needs — a metadata-
cheap action against parquet row-group stats, never a full scan of
column data.

``SPARK_GRAFT_ALLOW_QUADRATIC=1`` overrides every guard for deliberate
ground-truth runs at larger scales.
"""

from __future__ import annotations

import os

#: Max candidate-pair evaluations for an exact all-pairs stage
#: (~1e8 ≈ minutes of single-node float math; far past it the ANN/LSH
#: twins are strictly better).
MAX_EXACT_PAIRS = 100_000_000

#: Max corpus rows whose per-key state an unbounded streaming
#: baseline may accumulate before the TTL twin is mandatory.
MAX_UNBOUNDED_STATE_ROWS = 1_000_000

#: Max rows a "small by contract" side (benchmark/reference embedding
#: set, centroid seeds) may have before we refuse to collect it to the
#: driver as one dense float64 matrix (~100 MB at 64 dims — far past
#: any real eval benchmark, far under driver OOM).
MAX_REFERENCE_ROWS = 200_000


def _allowed() -> bool:
    return os.environ.get("SPARK_GRAFT_ALLOW_QUADRATIC") == "1"


def guard_exact_pairs(pairs: int, name: str, twin: str) -> None:
    """Refuse an all-pairs exact stage beyond MAX_EXACT_PAIRS."""
    if pairs <= MAX_EXACT_PAIRS or _allowed():
        return
    raise RuntimeError(
        f"{name}: ~{pairs:,} candidate pairs exceeds the "
        f"{MAX_EXACT_PAIRS:,}-pair bound for this EXACT ground-truth "
        f"baseline. Use its scale path `{twin}`, or set "
        f"SPARK_GRAFT_ALLOW_QUADRATIC=1 for a deliberate oracle run."
    )


def guard_reference_rows(rows: int, name: str) -> None:
    """Refuse to driver-collect a 'small by contract' broadcast side
    that turned out not to be small — BEFORE the toPandas()."""
    if rows <= MAX_REFERENCE_ROWS or _allowed():
        return
    raise RuntimeError(
        f"{name}: the reference side has at least {rows:,} rows, past the "
        f"{MAX_REFERENCE_ROWS:,}-row small-by-contract bound for a "
        "driver-collected broadcast matrix. Shrink the reference "
        "(it should be an eval benchmark, not a corpus), or set "
        "SPARK_GRAFT_ALLOW_QUADRATIC=1 for a deliberate oversize run."
    )


def guard_unbounded_state(rows: int, name: str, twin: str) -> None:
    """Refuse an unbounded-state streaming baseline beyond
    MAX_UNBOUNDED_STATE_ROWS input rows."""
    if rows <= MAX_UNBOUNDED_STATE_ROWS or _allowed():
        return
    raise RuntimeError(
        f"{name}: {rows:,} input rows would accumulate unbounded "
        f"streaming state (> {MAX_UNBOUNDED_STATE_ROWS:,}) in this "
        f"ground-truth baseline. Use its TTL twin `{twin}`, or set "
        f"SPARK_GRAFT_ALLOW_QUADRATIC=1 for a deliberate oracle run."
    )
