"""2-D skyline (Pareto frontier) operator.

A row survives when no other row is at-least-as-good on both
dimensions and strictly better on one (here: minimize ``min_col``,
maximize ``max_col``). The reference has no skyline operator; this is
part of the extension surface (SURVEY.md §8) a general analytics
engine needs for price/performance-style curation queries.

Scale design — the skyline is DISTRIBUTIVE:
``skyline(S) = skyline(union of skyline(P_i))`` for any partitioning,
so the operator runs as two passes of the same local sweep:

1. a scan-parallel ``mapInPandas`` computes each Arrow batch's local
   skyline (an O(n log n) sort + linear sweep) — for non-adversarial
   data the local frontier is tiny (expected O(log n) points under any
   independence assumption), so this pass discards almost everything
   without a shuffle;
2. the surviving points (union of local frontiers) coalesce to one
   partition for a final identical sweep. This single-partition step
   is justified the same way the centroid collects are: its input is
   the already-reduced frontier union, not the corpus. Adversarial
   inputs (every point on the frontier) degrade to a single-partition
   sort of the full data — the same worst case every skyline algorithm
   has.

Determinism: the skyline SET is unique (independent of partitioning
and sweep order); ties on both dimensions keep BOTH rows (domination
requires one strict inequality), so the operator is exactly
oracle-able with a window-based SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _sweep(pdf, id_col: str, min_col: str, max_col: str):
    """Local skyline of one pandas frame: keep rows whose max_col is
    (a) the maximum within their min_col group and (b) strictly above
    the best max_col among all strictly-smaller min_col values."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values([min_col, max_col], ascending=[True, False])
    gmax = pdf.groupby(min_col, sort=False)[max_col].transform("max")
    # one row per distinct min_col value, in ascending order
    firsts = pdf.drop_duplicates(subset=[min_col], keep="first")
    prev_best = firsts[max_col].cummax().shift(1)
    prev_map = dict(zip(firsts[min_col], prev_best))
    prev = pdf[min_col].map(prev_map).to_numpy(dtype="float64")
    mx = pdf[max_col].to_numpy(dtype="float64")
    keep = (mx == gmax.to_numpy(dtype="float64")) & (
        np.isnan(prev) | (mx > prev)
    )
    return pdf[keep]


def pareto_frontier_2d(
    df: DataFrame, id_col: str, min_col: str, max_col: str
) -> DataFrame:
    """Skyline of ``df`` minimizing ``min_col`` and maximizing
    ``max_col``; returns the (id, min, max) columns of the frontier."""
    src = df.select(id_col, min_col, max_col)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )

    def local(batches):
        for pdf in batches:
            out = _sweep(pdf, id_col, min_col, max_col)
            if len(out):
                yield out

    def final(batches):
        # the FINAL pass must see every surviving point at once: Arrow
        # re-batches the coalesced partition at maxRecordsPerBatch, and
        # a per-batch sweep here would let a row dominated only by a
        # row in ANOTHER batch survive (silent superset). Concatenating
        # is safe by the same argument as coalesce(1): the input is the
        # already-reduced frontier union, not the corpus.
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        out = _sweep(
            pd.concat(pdfs, ignore_index=True), id_col, min_col, max_col
        )
        if len(out):
            yield out

    locals_ = src.mapInPandas(local, schema)
    # final sweep over the (tiny) union of local frontiers
    return locals_.coalesce(1).mapInPandas(final, schema)
