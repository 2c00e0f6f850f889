"""Keyed aggregations — running sums, arbitrary folds, arg-min.

Mirrors SURVEY.md §2.3 (A1-A4):

- A1 ``keyBy + sum`` (``TransformTest.scala:27-29``,
  ``StreamWordCount.scala:30-31``): Flink emits one output per input
  (running aggregate); the batch twin is the final per-key total, the
  per-record emission is ``running_sum`` (window cumsum) — both below.
- A2 ``reduce`` (``TransformTest.scala:30-34``): the reference fold
  ``(x, y) => Sensor(x.id, x.timestamp + 1, y.temperature + 1)`` is
  order-dependent (not commutative); over an ordered run of n records
  it provably yields ``(first.timestamp + (n-1), last.temperature + 1)``
  — expressible with min_by/max_by + count, no UDF needed. The general
  arbitrary ordered fold is provided via applyInPandas
  (``ordered_fold_general``).
- A3 ``min``/``minBy`` (``WindowTest.scala:73``): arg-min keeping the
  whole row = ``min_by`` with a deterministic tiebreak.

Scale notes: all shapes are single-shuffle hash aggregations with
map-side combine. ``keyed_sum_salted`` shows the two-phase salted
variant for skewed keys at 100 TB (AQE covers moderate skew; extreme
hot keys want explicit salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from flink_scala_spark.materialize import shared_bounded


def keyed_sum(df: DataFrame, key: str, value: str) -> DataFrame:
    """A1 batch twin: final per-key sum (TransformTest.scala:27-29)."""
    return df.groupBy(key).agg(F.round(F.sum(value), 2).alias("total"))


def keyed_sum_salted(df: DataFrame, key: str, value: str, salt_buckets: int = 32) -> DataFrame:
    """A1 at 100 TB with hot keys: two-phase salted aggregation.

    Phase 1 aggregates on (key, salt) spreading a hot key over
    ``salt_buckets`` reducers; phase 2 combines the partials. Same
    result as ``keyed_sum`` (associative agg), strictly more shuffle
    tolerance.
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.round(F.sum("_partial"), 2).alias("total"))


def running_sum(df: DataFrame, key: str, order: str, value: str) -> DataFrame:
    """A1 exact semantics: Flink's per-record running aggregate
    (expected-output comments TransformTest.scala:38-44).

    One row out per row in, carrying the running per-key sum in arrival
    order (``order`` = a monotone id standing in for arrival order).
    Scale: window with partitionBy(key) — one shuffle, per-key sort;
    no global ordering required.
    """
    w = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        F.col(key),
        F.col(order),
        F.round(F.sum(value).over(w), 2).alias("running_total"),
    )


def ordered_fold(df: DataFrame, key: str, order: str, ts: str, value: str) -> DataFrame:
    """A2: the reference's reduce fold, closed-form.

    ``reduce((x, y) => Sensor(x.id, x.timestamp + 1, y.temperature + 1))``
    (TransformTest.scala:30-34) over records ordered by ``order``:
    timestamp folds to first.timestamp + (n-1); temperature folds to
    last.temperature + 1 (n >= 2) or last.temperature (n == 1).
    Expressed with min_by/max_by — single shuffle, no UDF, no sort.
    """
    n = F.count("*")
    first_ts = F.min_by(F.col(ts), F.col(order))
    last_val = F.max_by(F.col(value), F.col(order))
    return df.groupBy(key).agg(
        (first_ts + n - F.lit(1)).alias("folded_ts"),
        F.round(
            F.when(n > 1, last_val + F.lit(1)).otherwise(last_val), 2
        ).alias("folded_value"),
    )


def ordered_fold_general(df: DataFrame, key: str, order: str, ts: str, value: str) -> DataFrame:
    """A2 general form: arbitrary order-dependent fold via applyInPandas.

    For folds with no closed form this is the scalable fallback: one
    shuffle on the key, per-group pandas sort + iterative fold. Kept
    for parity demonstration; same output as ``ordered_fold``.
    SURVEY.md §7.4 documents the determinism caveat (explicit ``order``
    column, never partition arrival order).
    """
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        acc_ts, acc_val = None, None
        for _, row in pdf.iterrows():
            if acc_ts is None:
                acc_ts, acc_val = row[ts], row[value]
            else:
                acc_ts, acc_val = acc_ts + 1, row[value] + 1
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "folded_ts": [acc_ts], "folded_value": [round(acc_val, 2)]}
        )

    out_schema = f"{key} bigint, folded_ts bigint, folded_value double"
    return df.groupBy(key).applyInPandas(fold, schema=out_schema)


def _column_exists(df: DataFrame, name: str) -> bool:
    """Does ``name`` resolve to a column of ``df`` under the SESSION's
    resolution rules? Case-insensitive by default, exact when
    spark.sql.caseSensitive=true — a lowered-set check alone would
    accept 'ID' for column 'id' in a case-sensitive session where the
    resolver rejects it (round-12 review pass 3)."""
    sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
        or "false"
    ).lower() == "true"
    if sensitive:
        return name in df.columns
    return name.lower() in {c.lower() for c in df.columns}


def arg_min(df: DataFrame, key: str, value: str, tiebreak: str, keep: list[str]) -> DataFrame:
    """A3 minBy: per-key row with the minimum ``value``
    (WindowTest.scala:73 ``minBy(1)``).

    Deterministic under ties via ``tiebreak``; implemented as min_by on
    a struct so the whole thing is one hash aggregate (no sort, no
    window) — the cheapest arg-min shape at scale.
    """
    chosen = F.min_by(F.struct(*[F.col(c) for c in keep]), F.struct(F.col(value), F.col(tiebreak)))
    agg = df.groupBy(key).agg(chosen.alias("_row"))
    return agg.select(key, *[F.col(f"_row.{c}").alias(c) for c in keep])


def _quantile_cdf(
    df: DataFrame, key: str, value: str, bin_width: float = 1.0
) -> DataFrame:
    """Shared substrate of the exact quantile ops: the per-key exact
    CDF over DISTINCT NON-NULL values via the two-level binned kernel
    (value_cdf_over_bins). Bin = floor(value / bin_width) — monotone
    in the value for any double; with the default width the repo's
    2-dp money-like columns bound a bin at <= 100 distinct cents
    values, so BOTH windows the kernel runs are over hard-bounded
    tables (level 1: the per-key bin histogram; level 2: within one
    bin). CALLER CONTRACT: pick ``bin_width`` so a single bin holds at
    most ~thousands of distinct values — a score column concentrated
    in [0, 1) under the default width would funnel each key's whole
    distinct-value set through one level-2 task (round-11 review).

    NULL VALUES are excluded on BOTH engines (review pass 2: Spark
    NULLS FIRST vs DuckDB NULLS LAST ordering made NULL ranks
    engine-divergent in the old row_number shape; the mirrored filter
    is the repo's standard NULL pin). n counts non-NULL values; keys
    with no non-NULL value are absent from the output. NULL KEYS are
    KEPT — the kernel's rejoin is null-safe (review pass 3), so a NULL
    key group ranks its values like any other, exactly as the oracles'
    GROUP BY does. Output columns: key, v, cnt, cum, below, n."""
    pre = (
        df.where(F.col(value).isNotNull())
        .select(F.col(key), F.col(value).alias("v"))
        .withColumn("b", F.floor(F.col("v") / F.lit(float(bin_width))))
    )
    return value_cdf_over_bins(pre, keys=(key,))


def _pick_rank(rank_expr, out_col: str):
    """Conditional agg selecting the value whose rank span
    [below+1, cum] covers ``rank_expr`` — exactly one histogram row
    matches for any rank in [1, n], so max() is a plain selector."""
    return F.max(
        F.when(
            (F.col("below") < rank_expr) & (rank_expr <= F.col("cum")),
            F.col("v"),
        )
    ).alias(out_col)


def group_quantiles(
    df: DataFrame,
    key: str,
    value: str,
    tiebreak: str | None = None,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bin_width: float = 1.0,
) -> DataFrame:
    """Exact distributed per-group quantiles by rank selection: row r
    of n sorted values is the q-quantile when r = ceil(q * n).

    Engine-portable by construction — ``percentile_approx`` (Spark) and
    ``quantile_disc`` (DuckDB) each bake in their own interpolation and
    sketch layout, so cross-engine checks would need tolerances; the
    rank rule is the same arithmetic everywhere (one IEEE multiply +
    ceil).

    Round 11 rebuild (round-10 verdict item 1): rank selection now runs
    over the binned-CDF of DISTINCT values (_quantile_cdf →
    value_cdf_over_bins) instead of row_number over the raw rows. The
    old shape sorted corpus-scale rows inside one task per key — the
    low-cardinality-key funnel the key-skew lint exists to kill; the
    new shape's only windows run over the bounded per-key histogram.
    The q-quantile VALUE is tiebreak-invariant (every row of the
    matching histogram group shares the value), so results are
    hash-identical to the row_number oracle.

    .. deprecated:: round 12
       ``tiebreak`` is DEPRECATED and ignored — the binned-CDF rebuild
       made the result tiebreak-invariant, so the parameter no longer
       influences duplicate-value resolution (round-11 ADVICE: the
       signature must stop implying an ordering contract the
       implementation does not consume). It is validated when passed
       (must name an existing column) so stale callers fail loudly
       rather than believing a bogus column name ordered anything.

    Shape: one hash-agg histogram shuffle (map-side combinable) + two
    bounded-histogram windows + a bounded final agg. The corpus is
    scanned once and never sorted.
    """
    if tiebreak is not None and not _column_exists(df, tiebreak):
        raise ValueError(
            f"group_quantiles: deprecated tiebreak column {tiebreak!r} "
            f"does not exist in the frame (columns: {df.columns}); the "
            "parameter is ignored by the binned-CDF implementation — "
            "drop it"
        )
    cdf = _quantile_cdf(df, key, value, bin_width)
    aggs = [
        _pick_rank(F.ceil(F.lit(q) * F.col("n")), f"p{int(q * 100)}")
        for q in qs
    ]
    return cdf.groupBy(key).agg(F.max("n").alias("n"), *aggs)


def group_quantiles_certified(
    df: DataFrame,
    key: str,
    value: str,
    tiebreak: str | None = None,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 1000,
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-group quantiles via the GK sketch (``percentile_approx``)
    WITH a proof the sketch honored its error bound — the 100 TB
    quantile path made oracle-checkable.

    ``percentile_approx`` is the production choice at scale (fixed-size
    mergeable summaries, no global sort), but its returned value is
    engine-specific AND may vary with partition merge order, so it can
    never be hash-compared directly. Same resolution as the HLL row
    (`approx_ndv_hll`): emit the EXACT rank-selected quantiles plus a
    certificate boolean — the GK guarantee says the approximate value's
    rank lies within n/accuracy of the target, so the value must fall
    between the exact order statistics at target ∓ (n/accuracy + 1)
    ranks; that bound holds under ANY partitioning, making the boolean
    deterministically TRUE while the sketch genuinely runs and is
    genuinely checked.

    Round 11 rebuild: the exact branch now rides the same binned-CDF
    kernel as group_quantiles (no corpus-scale sort inside a
    low-cardinality key task — see group_quantiles' docstring); the GK
    sketch runs as its own map-side-combinable hash agg over the raw
    rows and joins the bounded exact frame on the key (per-key result
    rows — broadcast-sized by construction).

    Shape: one histogram hash-agg + two bounded windows (exact branch)
    + one sketch hash-agg (approx branch) + a key-equi join of two
    bounded frames. At true 100 TB one would drop the exact branch and
    keep only the sketch; here the exact branch IS the checker.

    ``tiebreak`` is DEPRECATED and ignored, exactly as in
    :func:`group_quantiles` — validated-if-passed, never consumed.
    """
    if tiebreak is not None and not _column_exists(df, tiebreak):
        raise ValueError(
            f"group_quantiles_certified: deprecated tiebreak column "
            f"{tiebreak!r} does not exist in the frame (columns: "
            f"{df.columns}); the parameter is ignored — drop it"
        )
    cdf = _quantile_cdf(df, key, value, bin_width)
    slack = F.ceil(F.col("n") / F.lit(accuracy)) + F.lit(1)
    aggs = [F.max("n").alias("n")]
    ps = [int(q * 100) for q in qs]
    for q, p in zip(qs, ps):
        target = F.ceil(F.lit(q) * F.col("n"))
        lo_r = F.greatest(F.lit(1).cast("long"), target - slack)
        hi_r = F.least(F.col("n"), target + slack)
        aggs += [
            _pick_rank(target, f"p{p}"),
            _pick_rank(lo_r, f"_lo{p}"),
            _pick_rank(hi_r, f"_hi{p}"),
        ]
    exact = cdf.groupBy(key).agg(*aggs)
    approx = df.groupBy(key).agg(
        *[
            F.percentile_approx(value, q, accuracy).alias(f"_apx{p}")
            for q, p in zip(qs, ps)
        ]
    )
    # Null-safe: both branches keep a NULL key group (groupBy), and the
    # oracle's GROUP BY does too — a plain equi-join would lose it here
    # (round-11 review pass 3).
    approx_r = approx.withColumnRenamed(key, "_r_key")
    out = exact.join(approx_r, F.col(key).eqNullSafe(F.col("_r_key")))
    cert = None
    for p in ps:
        ok = (F.col(f"_apx{p}") >= F.col(f"_lo{p}")) & (
            F.col(f"_apx{p}") <= F.col(f"_hi{p}")
        )
        cert = ok if cert is None else (cert & ok)
    return out.select(
        key, "n", *[f"p{p}" for p in ps], cert.alias("within_gk_bound")
    )


def binned_value_cdf(df: DataFrame, value_col: str, bin_width: int) -> DataFrame:
    """Two-level exact CDF over the distinct values of a non-negative
    integer column — the scale-safe rank-selection substrate shared by
    customer_rfm_segments' quartile thresholds and revenue_gini's
    Lorenz sums (round 10; factored out after the closing review found
    the kernel duplicated).

    Level 1 groups values into fixed-width integer bins, so the ONLY
    unpartitioned window runs over the bin table — hard-bounded at
    <= domain/bin_width rows regardless of input cardinality. Level 2
    ranks values WITHIN each bin (window partitioned by bin; <=
    bin_width distinct integer values per partition by construction).
    Because b1 < b2 implies every value of b1 < every value of b2,
    bin-below + within-bin cumulative IS the global cumulative.

    Returns one row per distinct value: ``v``, ``cnt`` (occurrences),
    ``cum`` (values <= v), ``below`` (values < v), ``n`` (total rows —
    constant, carried per row so downstream arithmetic stays
    single-lineage, no count branch or 1-row cross join)."""
    pre = df.select(F.col(value_col).alias("v")).withColumn(
        "b", F.expr(f"v DIV {bin_width}")
    )
    return value_cdf_over_bins(pre)


def value_cdf_over_bins(
    df: DataFrame, keys: tuple[str, ...] = (), weight: str | None = None
) -> DataFrame:
    """Keyed core of binned_value_cdf: ``df`` already carries ``v``
    (the value) and ``b`` (its bin — any expression monotone in v, so
    callers can mix per-key bin widths, e.g. the RFM thresholds bin
    monetary by $1,000 and recency/frequency by 1). With ``keys``, the
    CDF is computed independently per key group in ONE stacked lineage
    — the round-10 RFM rework runs all three metrics through a single
    pair of windows instead of three separate histogram branches (and
    drops the SinglePartition windows entirely: level 1 partitions by
    the keys). With ``weight``, input rows are PRE-AGGREGATED
    (value, count) pairs and cnt sums that column instead of counting
    rows — so a CDF can be derived from another CDF's histogram
    without rescanning the corpus (round-11 review pass 2)."""
    cnt_agg = (
        F.count("*") if weight is None else F.sum(weight).cast("long")
    )
    # The histogram is the kernel's ONLY corpus-sized computation and it
    # feeds BOTH levels (h1's bin rollup and c2's within-bin ranks).
    # Checkpoint it lazily (round 12, guide §3.3/§5): a lazily shared
    # h2 re-derived the whole scan+agg subtree per reference — the
    # before plans showed the corpus scanned twice per kernel call and
    # up to 14x per query for multi-kernel callers, with NO runtime
    # exchange reuse (per-branch column pruning de-canonicalizes the
    # copies). eager=False shares ONE materialized RDD across every
    # reference without a separate construction-time job (measured:
    # lazy ckpt 1.48 s vs eager ckpt 2.0 s vs plain lazy 3.6 s on the
    # MAD report under identical load). The frame is bounded by the
    # value DOMAIN (distinct (key, bin, value) triples), so the
    # materialization is small regardless of corpus size.
    h2 = df.groupBy(*keys, "b", "v").agg(cnt_agg.alias("cnt")).transform(shared_bounded)
    h1 = h2.groupBy(*keys, "b").agg(F.sum("cnt").alias("bcnt"))
    w1 = Window.partitionBy(*keys).orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c1 = (
        h1.withColumn("bcum", F.sum("bcnt").over(w1))
        .withColumn("n", F.sum("bcnt").over(Window.partitionBy(*keys)))
        .select(*keys, "b", (F.col("bcum") - F.col("bcnt")).alias("bbelow"), "n")
    )
    w2 = Window.partitionBy(*keys, "b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c2 = h2.withColumn("vcum", F.sum("cnt").over(w2))
    # NULL-SAFE key join (round-11 review pass 3, checklist rule 9 for
    # GROUPING keys): groupBy and the windows above both KEEP a NULL
    # key group — exactly like the oracles' GROUP BY — so the rejoin
    # must not silently drop it the way a plain equi-join would
    # (NULL != NULL). eqNullSafe stays an equi-join predicate for the
    # planner (hash/sort-merge, never BNLJ). NULL bins (NULL v) get
    # the same treatment for keyed callers that don't pre-pin values.
    jk = [*keys, "b"]
    c1r = c1.select(
        *[F.col(k).alias(f"_r_{k}") for k in jk], "bbelow", "n"
    )
    cond = None
    for k in jk:
        e = F.col(k).eqNullSafe(F.col(f"_r_{k}"))
        cond = e if cond is None else (cond & e)
    return (
        c2.join(c1r, cond)
        .withColumn("cum", F.col("bbelow") + F.col("vcum"))
        .select(
            *keys,
            "v",
            "cnt",
            "cum",
            (F.col("cum") - F.col("cnt")).alias("below"),
            "n",
        )
    )
