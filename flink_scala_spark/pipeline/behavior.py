"""User-behavior analytics over the event stream: cohort retention and
ordered-step funnels — the keyed-aggregation family (reference §2.3/
§2.6 semantics: per-user state folded in event-time order) applied to
the product-analytics shapes a migrating user expects.

Scale notes: both ops shuffle exactly once on user_id, fold each
user's history with order-independent aggregates (min / conditional
min), and only then aggregate to the tiny (day × day) or (step) key
space with map-side combine. No windows over unbounded frames, no
per-user arrays — state per user is O(#steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_scala_spark.functions.portable import epoch_seconds
from flink_scala_spark.materialize import shared_bounded

_DAY = 86400


def _day(col) -> F.Column:
    return (F.floor(epoch_seconds(col) / _DAY) * _DAY).cast("long")


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort matrix: users grouped by first-seen day; for each
    (cohort_day, activity_day) the count of cohort members active that
    day and the fraction of the cohort they represent.

    Two shuffles total: ONE on user_id builds each user's distinct
    active-day set (bounded by the calendar, not by event volume —
    collect_set dedups inside the agg, so the heavy event stream
    collapses map-side), from which the cohort day is a row-local
    array_min; then ONE rollup on (cohort_day, activity_day), whose
    key space is days² — tiny at any data scale. Cohort sizes are a
    map-side-combinable agg of the per-user rows, broadcast back."""
    # Round 12 (guide §3.3/§5): per_user feeds both the cohort-size agg
    # and the matrix explode; lazily each re-derived the corpus
    # scan+collect_set (the before plan scanned events 2x). The frame
    # is user-grain with calendar-bounded day sets, so one lazy
    # localCheckpoint makes the docstring's two-shuffle claim physical.
    per_user = (
        events.select("user_id", _day("ts").alias("activity_day"))
        .groupBy("user_id")
        .agg(F.collect_set("activity_day").alias("days"))
        .select(
            "user_id", "days", F.array_min("days").alias("cohort_day")
        )
        .transform(shared_bounded)
    )
    cohort_sizes = per_user.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    matrix = per_user.select(
        "cohort_day", F.explode("days").alias("activity_day")
    ).groupBy("cohort_day", "activity_day").agg(
        F.count("*").alias("active_users")
    )
    return (
        matrix.join(F.broadcast(cohort_sizes), "cohort_day")
        .select(
            "cohort_day",
            "activity_day",
            ((F.col("activity_day") - F.col("cohort_day")) / _DAY)
            .cast("int")
            .alias("day_offset"),
            "active_users",
            "cohort_size",
            (
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-step funnel: a user reaches step k if their earliest
    qualifying step-k event is strictly after the earliest event that
    reached step k-1. Emits one row per step with the surviving-user
    count and conversion from the previous step.

    One shuffle on user_id computes every step's earliest-reach time
    as a chain of conditional ``min`` aggregates (order-independent,
    map-side combinable); the per-step rollup is a tiny conditional
    count. No per-user event arrays, no window sorts — per-user state
    is one timestamp per step regardless of history length."""
    ts_l = epoch_seconds("ts")
    base = events.select("user_id", "event_type", ts_l.alias("ts_l"))
    step_mins = base.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts_l"))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reach{i}: earliest time the user completed steps 0..i in order.
    # A later step only counts if strictly after the previous reach —
    # expressed per row, so this is still one aggregation pass.
    reach = step_mins
    prev = F.col("t0")
    reach = reach.withColumn("r0", prev)
    for i in range(1, len(steps)):
        cur = F.when(
            F.col(f"r{i-1}").isNotNull() & (F.col(f"t{i}") > F.col(f"r{i-1}")),
            F.col(f"t{i}"),
        )
        reach = reach.withColumn(f"r{i}", cur)
    counts = reach.agg(
        *[
            F.count(F.col(f"r{i}")).alias(f"c{i}")
            for i in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"c{i}").alias("users"),
                        (
                            F.col(f"c{i}").cast("double")
                            / F.col("c0").cast("double")
                        ).alias("pct_of_entry"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step_idx", "r.step", "r.users", "r.pct_of_entry")


def distribution_drift(
    events: DataFrame,
    split_epoch_s: int,
    value_col: str = "value",
    bin_width: float = 50.0,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution-drift report between a baseline period (event time
    before ``split_epoch_s``) and the current period (at/after): the
    per-bin rate shift of ``value_col`` over fixed-width bins, plus two
    ln-free divergence terms — the total-variation contribution
    ``|q-p|/2`` and the chi-square contribution ``(q-p)²/p``. (The
    conventional PSI's ``ln(p/q)`` is deliberately avoided: libm
    transcendentals are not bit-stable across engines — same house
    rule as BM25's rational idf — while |·|, ·², / are IEEE-exact, so
    this report hash-matches its oracle.)

    Rates are add-one (Laplace) smoothed over the fixed bin count, so
    an empty bin on either side contributes a finite, nonzero-
    denominator term instead of a 0/0.

    Scale: two scan-parallel conditional counts into a FIXED key space
    (n_bins rows) with map-side combine — one tiny shuffle, no joins
    against the corpus, constant output size. The monitoring shape a
    100 TB ingest pipeline runs per batch."""
    # clamp BOTH ends: without greatest(0), a negative value falls out
    # of the bin grid's left join AND out of both totals — the monitor
    # silently shrinks its population exactly when the distribution
    # shifts below range, the regime it exists to catch. NULL values
    # are excluded EXPLICITLY (they are missing data, not values — and
    # least/greatest skip NULL args, which would otherwise misbin every
    # NULL row into the TOP bin and fabricate a high-value drift
    # alarm); completeness/null-rate monitoring is `dq_audit`'s job.
    ev = events.where(F.col(value_col).isNotNull()).select(
        F.greatest(
            F.least(
                F.floor(F.col(value_col) / F.lit(float(bin_width))).cast(
                    "double"
                ),
                F.lit(float(n_bins - 1)),
            ),
            F.lit(0.0),
        )
        .cast("int")
        .alias("bin"),
        (epoch_seconds("ts") < F.lit(int(split_epoch_s))).alias("is_base"),
    )
    counts = ev.groupBy("bin").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(~F.col("is_base"), 1).otherwise(0)).alias("n_cur"),
    )
    spark = events.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = (
        bins.join(counts, "bin", "left")
        .na.fill({"n_base": 0, "n_cur": 0})
    )
    # totals via an unpartitioned window over the FIXED n_bins-row
    # frame (not a crossJoin against a re-aggregated copy, which would
    # scan the corpus twice) — single-partition is safe here because
    # the input is the already-reduced bin table, never the corpus
    from pyspark.sql import Window

    w = Window.partitionBy()
    j = full.withColumn("t_base", F.sum("n_base").over(w)).withColumn(
        "t_cur", F.sum("n_cur").over(w)
    )
    p = (F.col("n_base") + F.lit(1)).cast("double") / (
        F.col("t_base") + F.lit(n_bins)
    ).cast("double")
    q = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.col("t_cur") + F.lit(n_bins)
    ).cast("double")
    return j.select(
        "bin",
        "n_base",
        "n_cur",
        p.alias("p_base"),
        q.alias("p_cur"),
        (F.abs(q - p) / F.lit(2.0)).alias("tv_term"),
        ((q - p) * (q - p) / p).alias("chi2_term"),
    )


def _cents_histogram(events: DataFrame, key: str = "event_type") -> DataFrame:
    """The repo-wide integer-cents value histogram ``(key, cents, cnt)``
    — ONE corpus scan, map-side-combinable, NULL values excluded.
    Single source of truth for every histogram-selection statistic
    below (MAD, percentile ranks, winsorized bounds)."""
    return (
        events.where(F.col("value").isNotNull())
        .select(
            key,
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy(key, "cents")
        .agg(F.count("*").alias("cnt"))
    )


def mad_outlier_report(events: DataFrame, k_mad: int = 5) -> DataFrame:
    """Robust per-type outlier report: exact (quantized) median, median
    absolute deviation, and the count of rows deviating more than
    ``k_mad`` MADs — the monitoring primitive that survives the heavy
    tails that wreck mean/stddev z-scores (cf. `value_zscore_outliers`'
    docstring caveat).

    Exactness: values quantize to integer cents (floor(value*100), the
    repo-wide convention), so both medians are SELECTIONS on integer
    histograms — no float folds, no interpolation, bit-identical in any
    engine. Lower-median convention: the smallest cents value whose
    cumulative count reaches ceil(n/2).

    Scale shape — the histogram-selection median, NOT a per-type sort:
    the corpus is scanned ONCE into a (type, cents) hash-agg histogram
    (map-side combinable; size bounded by the value domain, not the row
    count). Median, deviation histogram, MAD, and the outlier count are
    all computed on that small frame (the deviation histogram is a
    re-keying of the value histogram — no second corpus scan). A naive
    ``Window.partitionBy(type).orderBy(value)`` median funnels every
    row of a type through one task — dead at 100 TB; this shape's only
    corpus-sized stage is the initial agg."""
    return mad_report_from_histogram(
        _cents_histogram(events), "event_type", k_mad=k_mad
    )


def mad_report_from_histogram(h: DataFrame, key: str, k_mad: int = 5) -> DataFrame:
    """MAD selection arithmetic on an already-built integer histogram
    ``(key, cents, cnt)`` — shared by the batch per-type report and the
    streaming per-closed-day twin so the two can never diverge. Every
    window below runs over the HISTOGRAM partitioned by ``key`` (rows
    bounded by the value domain, never the corpus).

    Round 12 (guide §3.3/§5 + §2.4): the old branch-and-join-back form
    referenced ``h`` four times (total, median, deviation histogram,
    outlier count) and each reference lazily re-derived the caller's
    corpus scan+agg — the before plan of `value_mad_outlier_report`
    scanned events 14x. Rewritten as a straight-line fold: the total
    and both medians are same-partitioning WINDOW selections carried
    along as columns (min of a conditional over the whole key
    partition = the old filter+groupBy+join-back, with no second
    lineage of ``h``), so ``h`` is referenced exactly once and the
    corpus is scanned once. Selected values are unchanged."""
    from pyspark.sql import Window

    # lower median: smallest cents with running count >= ceil(n/2)
    wc = Window.partitionBy(key).orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wk = Window.partitionBy(key)
    hc = h.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wk)
    )
    hm = hc.withColumn(
        "med_cents",
        F.min(
            F.when(
                F.col("cum") * 2 >= F.col("n") + (F.col("n") % 2),
                F.col("cents"),
            )
        ).over(wk),
    )
    # deviation histogram: a re-keying of the value histogram (n and
    # med_cents are constant per key, so max() just carries them)
    dev = (
        hm.select(
            key,
            F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
            "cnt",
            "n",
            "med_cents",
        )
        .groupBy(key, "dev")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.max("n").alias("n"),
            F.max("med_cents").alias("med_cents"),
        )
    )
    wd = Window.partitionBy(key).orderBy("dev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dm = dev.withColumn("cum", F.sum("cnt").over(wd)).withColumn(
        "mad_cents",
        F.min(
            F.when(
                F.col("cum") * 2 >= F.col("n") + (F.col("n") % 2),
                F.col("dev"),
            )
        ).over(wk),
    )
    return dm.groupBy(key).agg(
        F.max("n").cast("long").alias("n"),
        F.max("med_cents").cast("long").alias("median_cents"),
        F.max("mad_cents").cast("long").alias("mad_cents"),
        F.sum(
            F.when(
                F.col("dev") > F.lit(int(k_mad)) * F.col("mad_cents"),
                F.col("cnt"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        key,
        "n",
        "median_cents",
        "mad_cents",
        "n_outliers",
        # integer DIV, not float-divide-then-floor: exact in both
        # engines at any magnitude
        F.expr("(1000 * n_outliers) DIV n").cast("long").alias(
            "outlier_permille"
        ),
    )


def value_percentile_ranks(events: DataFrame) -> DataFrame:
    """Per-event permille rank of ``value`` within its event type —
    rank-based feature normalization (the quantile-normalization prep
    step) computed WITHOUT any per-type sort of the corpus: ranks come
    from the cents-histogram CDF (strictly-below count), joined back to
    the rows on (type, cents). permille = (1000 * below) DIV n —
    integer-exact.

    Scale: one hash-agg histogram (domain-bounded), one join of the
    corpus against that small frame (AQE broadcasts it), zero sorts of
    corpus-sized data — versus the textbook percent_rank() window that
    funnels each type through one task."""
    from pyspark.sql import Window

    ev = events.where(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        "value",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    # histogram derives from ev (not _cents_histogram) so the per-row
    # frame and its histogram share one scan lineage; the cents
    # convention stays identical by construction (same floor(x*100)).
    # Round 12: the per-type total folds into a second window over the
    # SAME partitioning instead of a separate agg branch + join — the
    # histogram is now referenced exactly once, so nothing re-derives
    # the corpus agg (the before plan scanned events 3x; now 2x — the
    # histogram build plus the inherent rank join-back).
    h = ev.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hc = (
        h.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("below", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("event_type")))
    )
    cdf = hc.select(
        "event_type", "cents", F.expr("(1000 * below) DIV n").alias("permille")
    )
    return ev.join(cdf, ["event_type", "cents"]).select(
        "event_id", "event_type", "value", F.col("permille").cast("long").alias("permille")
    )


def value_winsorized_stats(events: DataFrame) -> DataFrame:
    """Per-type winsorized (5%/95%-clamped) robust statistics: the
    exact quantile bounds come from the same integer histogram
    SELECTION as the MAD report (p05 = smallest cents whose cumulative
    count reaches ceil(n/20), p95 at ceil(19n/20)), and the winsorized
    sum/mean fold over the HISTOGRAM with clamped cents — the corpus is
    scanned once, nothing corpus-sized is sorted or re-scanned. All
    outputs integer-exact."""
    from pyspark.sql import Window

    # Round 12 (guide §3.3/§5 + §2.4): the old form referenced the
    # histogram three times (cumulative branch, total branch, clamp
    # fold) and each reference lazily re-derived the corpus scan+agg —
    # the before plan scanned events 8x. Now both rank picks are
    # same-partitioning WINDOW selections carried along as columns
    # (min of a conditional over the whole type partition = the old
    # filter+groupBy+join-back) and the clamp fold runs in the same
    # final agg, so the histogram is referenced exactly once and the
    # corpus is scanned once. Selected values, and so the oracle, are
    # unchanged.
    h = _cents_histogram(events)
    wc = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wk = Window.partitionBy("event_type")
    hc = h.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wk)
    )
    hm = hc.withColumn(
        "p05_cents",
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 19) DIV 20"), F.col("cents"))
        ).over(wk),
    ).withColumn(
        "p95_cents",
        F.min(
            F.when(F.col("cum") >= F.expr("(19 * n + 19) DIV 20"), F.col("cents"))
        ).over(wk),
    )
    return hm.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("p05_cents").cast("long").alias("p05_cents"),
        F.max("p95_cents").cast("long").alias("p95_cents"),
        F.sum(
            F.greatest(
                F.least(F.col("cents"), F.col("p95_cents")),
                F.col("p05_cents"),
            )
            * F.col("cnt")
        )
        .cast("long")
        .alias("winsorized_sum_cents"),
    ).select(
        "event_type",
        "n",
        "p05_cents",
        "p95_cents",
        "winsorized_sum_cents",
        # one double division of two exact integers — identical
        # IEEE result in any engine (integer DIV would diverge on
        # negative sums: Spark truncates, DuckDB floors)
        (
            F.col("winsorized_sum_cents").cast("double")
            / F.col("n").cast("double")
        ).alias("winsorized_mean_cents"),
    )


def interval_union_coverage(events: DataFrame, duration_s: int = 300) -> DataFrame:
    """Merged-interval union coverage per user: each event claims the
    interval ``[ts, ts + duration_s)``; overlapping/adjacent claims are
    merged into islands and the per-user report is the union length,
    island count, and longest island — the "how much wall-clock was
    this user actually active" statistic that a plain count or
    gap-session grouping cannot produce (sessions group POINTS by gap;
    this merges INTERVALS by overlap, the textbook
    sweep-line/gaps-and-islands kernel).

    An interval starts a new island iff its start lies strictly past
    the running max of all PRECEDING ends (running max, not lag(end):
    an interval can be swallowed whole by an earlier, longer one, and
    lag would reopen a still-covered island). Island ids are the
    running sum of those flags; per island coverage = max(end) -
    min(start). All arithmetic on epoch-seconds BIGINTs — exact.

    Scale: one shuffle keyed by user_id; both windows are running
    (ROWS UNBOUNDED PRECEDING) aggregates over each user's bounded
    event history — no per-user arrays, no corpus-wide sort. Adjacent
    intervals (next start == running end) merge, matching half-open
    interval semantics.
    """
    from pyspark.sql import Window

    iv = events.select(
        "user_id",
        "event_id",
        epoch_seconds("ts").alias("s"),
        (epoch_seconds("ts") + F.lit(int(duration_s))).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn("prev_max_e", F.max("e").over(wprev)).withColumn(
        "new_island",
        (F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))).cast("int"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("island", F.sum("new_island").over(wrun))
    islands = numbered.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_s")
    )
    return islands.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum("len_s").cast("long").alias("covered_s"),
        F.max("len_s").cast("long").alias("max_island_s"),
    )


def cusum_over_daily(daily: DataFrame, day_col: str, cents_col: str) -> DataFrame:
    """Shared CUSUM-changepoint arithmetic over an already-aggregated
    per-day table (the batch revenue scan and its live twin both feed
    this, so the two monitors cannot diverge): cumulative deviation
    from the floored-cents daily mean, s_t = cum_t - t*(total DIV n),
    ranked by |s_t| (ties -> earlier day). The floored mean keeps every
    term in BIGINT at any scale (an n*cum - t*total scaling overflows
    int64 near 100 TB totals; total DIV n never does).

    Every window here runs over the DAY-cardinality input (bounded by
    the calendar at any SF) — the corpus_token_budget justification
    for the unpartitioned frames."""
    from pyspark.sql import Window

    wtot = Window.partitionBy()
    wrun = Window.partitionBy().orderBy(day_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = (
        daily.withColumn("total", F.sum(cents_col).over(wtot))
        .withColumn("n", F.count("*").over(wtot))
        .withColumn(
            "t", F.row_number().over(Window.partitionBy().orderBy(day_col))
        )
        .withColumn("cum_cents", F.sum(cents_col).over(wrun))
        .select(
            day_col,
            cents_col,
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.expr("cum_cents - t * (total DIV n)")
            .cast("long")
            .alias("cusum_cents"),
        )
    )
    wdev = Window.partitionBy().orderBy(
        F.abs(F.col("cusum_cents")).desc(), F.col(day_col)
    )
    return cs.withColumn("dev_rank", F.row_number().over(wdev).cast("int"))


def rolling_distinct_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Per event day, EXACT distinct users active in the trailing
    ``window_days`` days (inclusive) plus that day's own distinct count
    — the sliding-distinct dashboard number that is famously
    shuffle-hostile at scale because COUNT(DISTINCT) does not decompose
    across overlapping windows.

    Shape: corpus → ONE distinct to (user, day) grain; each (user, day)
    row fans out to the <= window_days later days it can serve (a
    bounded x7 fan-out of the ALREADY-REDUCED day grain, never the
    corpus); a second user-keyed distinct collapses multi-day users per
    target day; target days are then restricted to days that actually
    occur (semi-join against the bounded day grid). Both distincts
    shuffle on user_id — a corpus-scaling key, no low-cardinality
    funnel. The HLL twin (rolling_distinct_users_hll) is the
    sketch-state path this exact form audits."""
    # Round 12 (guide §3.3/§5): ud feeds THREE branches (day grid,
    # rolling fan-out, same-day counts) and lazily each re-derived the
    # corpus scan+distinct (the before plan scanned events 3x). ud is
    # the ALREADY-REDUCED (user, day) grain the docstring promises is
    # computed once — one lazy localCheckpoint makes that physical.
    ud = events.select(
        "user_id", F.floor(epoch_seconds("ts") / _DAY).cast("long").alias("d")
    ).distinct().transform(shared_bounded)
    grid = ud.select("d").distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(window_days - 1))
        ).alias("td"),
    ).distinct()
    roll = (
        fan.join(grid.select(F.col("d").alias("td")), "td", "leftsemi")
        .groupBy("td")
        .agg(F.count("*").cast("long").alias(f"users_{window_days}d"))
    )
    one = ud.groupBy("d").agg(F.count("*").cast("long").alias("users_1d"))
    return roll.join(one, roll["td"] == one["d"]).select(
        (F.col("td") * _DAY).cast("long").alias("day_s"),
        "users_1d",
        f"users_{window_days}d",
    )


def rolling_distinct_users_hll(events: DataFrame, window_days: int = 7) -> DataFrame:
    """The 100 TB path for rolling_distinct_users: ONE corpus scan
    builds a fixed-size Datasketches HLL sketch per day
    (``hll_sketch_agg``); the rolling union then MERGES the day-grain
    sketches (``hll_union_agg`` over a bounded x7 fan-out of the day
    table) — distinct-counting work per window is O(sketch), not
    O(users). Because the raw estimate is engine-specific, the
    oracle-able projection emits the EXACT rolling count plus the
    within-5% certificate (the approx_ndv_hll / X124 resolution): the
    union sketch is genuinely built and its estimate genuinely checked.

    Scale: the corpus is touched exactly once (the per-day sketch agg,
    map-side combinable); everything downstream is day-grain. The
    exact branch exists only to AUDIT the sketch — at true 100 TB one
    keeps the sketch branch alone."""
    # Round 12 (guide §3.3/§5): the day-grain sketch table feeds both
    # the rolling fan-out and the day grid — lazily each reference
    # re-derived the corpus sketch agg (the before plan scanned events
    # 5x). Day-grain is calendar-bounded, so one lazy localCheckpoint
    # shares a single materialization; the corpus is now scanned once
    # for the sketch branch (plus once in the exact audit branch).
    day_sk = (
        events.select(
            "user_id", F.floor(epoch_seconds("ts") / _DAY).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .transform(shared_bounded)
    )
    grid = day_sk.select("d")
    fan = day_sk.select(
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(window_days - 1))
        ).alias("td"),
        "sk",
    )
    est = (
        fan.join(grid.select(F.col("d").alias("td")), "td", "leftsemi")
        .groupBy("td")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("long")
            .alias("approx_users")
        )
        .select((F.col("td") * _DAY).cast("long").alias("day_s"), "approx_users")
    )
    exact = rolling_distinct_users(events, window_days).select(
        "day_s", F.col(f"users_{window_days}d").alias("exact_users")
    )
    return exact.join(est, "day_s").select(
        "day_s",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) * 20
            <= F.col("exact_users")
        ).alias("estimate_within_5pct"),
    )


def daily_mean_trend(events: DataFrame) -> DataFrame:
    """Per-type OLS trend of the daily mean value vs day index —
    distributed linear regression via exact integer sufficient
    statistics: the corpus reduces in ONE map-side-combinable agg to
    (type, day, total_cents, n); y = the floored daily mean cents
    (total DIV n — both operands non-negative, so Spark truncation ==
    DuckDB floor); x = day - min(day of type), because with ABSOLUTE
    epoch days (~2e4) the n*Sxy term overflows int64 once daily means
    reach ~1e7 cents — shifted, the envelope is n*Sxy <= span^3 * y
    ~ 2.5e3^3 * y, BIGINT-safe for daily mean cents up to ~5.9e8
    ($5.9M/event; the events domain is <= 1e5 cents).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and intercept =
    (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2) are each ONE IEEE division of
    two exact BIGINTs — bit-identical in any engine. Single-day types
    (den = 0) emit NULL slope/intercept identically."""
    daily = (
        events.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(epoch_seconds("ts") / _DAY).cast("long").alias("d"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("tot"), F.count("*").alias("cnt"))
        .withColumn("y", F.expr("tot DIV cnt"))
        # Round 12 (guide §3.3/§5): daily feeds both the per-type min
        # and the xy join; lazily each re-derived the corpus agg (the
        # before plan scanned events 2x). Day x type grain is
        # calendar-bounded, so the lazy checkpoint is tiny.
        .transform(shared_bounded)
    )
    d0 = daily.groupBy("event_type").agg(F.min("d").alias("d0"))
    xy = daily.join(d0, "event_type").select(
        "event_type", (F.col("d") - F.col("d0")).alias("x"), "y"
    )
    st = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return st.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("slope_cents_per_day"),
        F.when(
            den != 0, inum.cast("double") / den.cast("double")
        ).alias("intercept_cents"),
    )


def _daily_revenue_cents(orders: DataFrame) -> DataFrame:
    """(d, rev) — epoch-day index and exact summed order cents: the
    shared day-grain reduction of the seasonality and autocorrelation
    ops (one map-side-combinable agg; the day table is calendar-
    bounded at ~2.5k rows per 7 shipped years regardless of SF)."""
    # Round 12 (guide §3.3/§5): both callers reference the day table
    # twice (baseline agg + join in the seasonality; the d/d+1 self-
    # join in the autocorr), and lazily each reference re-derived the
    # corpus agg (both before plans scanned orders 2x). The frame is
    # calendar-bounded (~2.5k rows), so the shared lazy checkpoint
    # makes the "one corpus agg" contract physical for every caller.
    return (
        orders.select(
            F.floor(epoch_seconds("o_orderdate") / _DAY).cast("long").alias("d"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("rev"))
        .transform(shared_bounded)
    )


def revenue_dow_seasonality(orders: DataFrame) -> DataFrame:
    """Day-of-week seasonality + residual anomaly report (round 11):
    daily revenue vs its weekday baseline, every step exact-integer so
    the DuckDB oracle hash-matches.

    - dow = (d + 4) % 7 (epoch day 0 = Thursday; d >= 0 here so Spark
      % and DuckDB % agree — checklist rule 3 on negative operands);
    - weekday baseline = floored mean, tot DIV n (non-negative);
    - residual = rev - baseline; deviation_ppm = (1e6*|residual|) DIV
      nullif(baseline, 0) (BIGINT-safe while daily cents <= 9.2e12 —
      $92 B/day; the DIV's operands are non-negative). The nullif
      mirrors the oracle exactly: shipped revenue is strictly
      positive so the guard never fires on real data, but WITHOUT it
      an ALL-ZERO weekday would make Spark's DIV return NULL while
      DuckDB's // raises — the zero case now fails identically in
      both engines (round-11 ADVICE). A NEGATIVE baseline (a
      net-refund weekday) remains OUT of the envelope: the numerator
      is abs() but a negative denominator makes the quotient negative
      and non-integral, where Spark DIV truncates and DuckDB //
      floors (divergence checklist rule 3) — NON-NEGATIVE daily
      revenue is a documented precondition, like the autocorr
      envelope;
    - is_anomaly: deviation > 100% of the weekday mean (NULL when the
      baseline is 0, in both engines).

    Scale: one corpus agg to the bounded day table; the 7-row baseline
    joins back broadcast-style; output is day-table-bounded."""
    daily = _daily_revenue_cents(orders)
    dowed = daily.withColumn("dow", F.expr("(d + 4) % 7").cast("int"))
    base = dowed.groupBy("dow").agg(
        F.expr("sum(rev) DIV count(*)").alias("dow_mean_cents")
    )
    j = dowed.join(F.broadcast(base), "dow")
    res = F.col("rev") - F.col("dow_mean_cents")
    dev = F.expr(
        "(1000000 * abs(rev - dow_mean_cents)) DIV nullif(dow_mean_cents, 0)"
    )
    return j.select(
        F.col("d").alias("day_idx"),
        "dow",
        F.col("rev").alias("rev_cents"),
        "dow_mean_cents",
        res.cast("long").alias("residual_cents"),
        dev.cast("long").alias("deviation_ppm"),
        (dev > 1_000_000).alias("is_anomaly"),
    )


def revenue_autocorr_lag1(orders: DataFrame) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue (round 11; pairs with
    X206's OLS trend): is today's revenue predictive of tomorrow's?

    Pairs are CONSECUTIVE day indexes only (a self-equi-join of the
    bounded day table on d+1 — gap days produce no pair, the honest
    series treatment). Sufficient statistics accumulate as
    DECIMAL(38,0) — checklist rule 8: Spark DECIMAL(38,0) arithmetic
    equals DuckDB HUGEINT exactly for non-overflowing integers, and
    daily cents up to ~1e12 keep n*Sxy ~ 6e30 far under 1e38 (BIGINT
    would overflow at sf0.1 already: Sxx ~ 2.4e3 * (9e8)^2 ~ 2e21).
    r1 = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))
    evaluates the identical IEEE expression tree over exactly-equal
    inputs in both engines (DECIMAL/HUGEINT -> DOUBLE casts are
    correctly rounded; sqrt/div/mul are IEEE ops), so the doubles
    agree bit-for-bit. Degenerate series (constant side, < 2 pairs)
    emit NULL r1 identically.

    Scale: one corpus agg to the day table; the pair join and the
    stats agg run on day-table-bounded input."""
    daily = _daily_revenue_cents(orders)
    nxt = daily.select((F.col("d") - 1).alias("d"), F.col("rev").alias("y"))
    pair = daily.select("d", F.col("rev").alias("x")).join(nxt, "d")
    dec = "decimal(38,0)"
    st = pair.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    mean_x = F.expr("CAST(sx DIV n AS BIGINT)")
    mean_y = F.expr("CAST(sy DIV n AS BIGINT)")
    return st.select(
        F.col("n").cast("long").alias("n_pairs"),
        mean_x.alias("mean_prev_cents"),
        mean_y.alias("mean_next_cents"),
        F.when(
            (d1 > 0) & (d2 > 0), num / (F.sqrt(d1) * F.sqrt(d2))
        ).alias("r1"),
    )


def cross_type_quantile_norm(events: DataFrame) -> DataFrame:
    """Cross-type quantile normalization report (round 11): where does
    each event type's value distribution sit inside the GLOBAL one?
    Per type: exact p25/p50/p75 cents (rank selection over the type's
    binned CDF) plus each quartile's global mid-rank percentile and
    the type's MEAN global mid-rank — the normalization table a
    feature pipeline uses to map per-type scores onto one scale.

    All integer-exact: mid-rank x2 = below + cum from the global
    cents-histogram CDF (integers, no halves); percentiles in ppm via
    DECIMAL(38,0) products and the integral DIV (checklist rule 8 —
    1e6 * sum(mid-rank x2) reaches ~2e31 at 100 TB, past BIGINT).

    Scale: the corpus is hash-aggregated ONCE — to the per-type
    (type, cents, cnt) histogram. Everything else derives from that
    bounded frame (round-11 review pass 2 removed two extra corpus
    scans): the GLOBAL CDF re-runs the kernel over the histogram with
    cnt as the weight, and the per-type mean global mid-rank is
    sum(cnt * mr2) over the histogram joined to the broadcast global
    CDF — no event row is touched twice. The global kernel's
    unpartitioned windows run over the hard-bounded $1 bin table only
    (the revenue_gini justification)."""
    from flink_scala_spark.operators.aggregations import (
        _pick_rank,
        value_cdf_over_bins,
    )

    ev = events.where(F.col("value").isNotNull()).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    pre = ev.select(
        "event_type", F.col("cents").alias("v")
    ).withColumn("b", F.expr("v DIV 100"))
    # Round 12: both CDF frames are referenced several times below
    # (cdf_t 3x, g 4x) — materialize them once (domain-bounded frames;
    # the before plan was 1,786 lines with the corpus re-scanned per
    # reference, now ONE corpus scan total via the kernel's own
    # checkpointed histogram).
    cdf_t = value_cdf_over_bins(pre, keys=("event_type",)).transform(shared_bounded)
    g = value_cdf_over_bins(
        cdf_t.select("v", F.expr("v DIV 100").alias("b"), "cnt"),
        weight="cnt",
    ).select(
        F.col("v"),
        (F.col("below") + F.col("cum")).alias("mr2"),
        F.col("n").alias("gn"),
    ).transform(shared_bounded)
    qs = ((25, 0.25), (50, 0.5), (75, 0.75))
    exact = cdf_t.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        *[
            _pick_rank(F.ceil(F.lit(q) * F.col("n")), f"p{p}_cents")
            for p, q in qs
        ],
    )
    out = exact
    for p, _ in qs:
        side = g.select(
            F.col("v").alias(f"p{p}_cents"), F.col("mr2").alias(f"_mr{p}")
        )
        out = out.join(F.broadcast(side), f"p{p}_cents")
    mean_t = (
        cdf_t.join(F.broadcast(g), "v")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * F.col("mr2").cast("decimal(38,0)")
            ).alias("s"),
            F.sum("cnt").cast("decimal(38,0)").alias("nt"),
            F.max("gn").alias("gn"),
        )
        .select(
            "event_type",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * s)"
                " DIV (2 * nt * CAST(gn AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("mean_rank_ppm"),
            F.col("gn"),
        )
    )
    out = out.join(mean_t, "event_type")
    ppm = lambda p: F.expr(  # noqa: E731
        f"CAST((CAST(1000000 AS DECIMAL(38,0)) * _mr{p})"
        " DIV (2 * CAST(gn AS DECIMAL(38,0))) AS BIGINT)"
    ).alias(f"g{p}_ppm")
    return out.select(
        "event_type",
        "n_events",
        *[c for p, _ in qs for c in (f"p{p}_cents", ppm(p))],
        "mean_rank_ppm",
    )
