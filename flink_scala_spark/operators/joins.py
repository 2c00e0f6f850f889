"""Join operators beyond Spark's built-ins: as-of join and interval
join (SURVEY.md §2.4 notes the reference has no joins; these are the
stream-adjacent extensions a time-series pipeline needs).

- **As-of join**: for each left row, the latest right row of the same
  key with ts <= left ts. Spark lacks this natively; the scalable
  shape is a union of the two sides with a per-key running
  ``last(..., ignorenulls)`` window carrying the most recent right
  timestamp forward — ONE shuffle on the key, one in-partition sort,
  all JVM/whole-stage-codegen. (A cogrouped ``applyInPandas`` +
  ``pandas.merge_asof`` variant was ~20x slower: ``applyInPandas``
  invokes Python once per key group, and per-group interpreter/Arrow
  overhead dominates with thousands of small keys.)
- **Interval join**: equi-join on the key plus a time-range predicate;
  Catalyst executes it as a sort-merge join on the key with the range
  as a residual filter — the standard Spark plan for bounded-interval
  correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner backward as-of join per key: each left row matched to the
    latest right row with right.ts <= left.ts; unmatched left rows are
    dropped (DuckDB's ASOF JOIN inner semantics).

    Timestamps travel as epoch-microsecond longs so ordering and gaps
    are exact. Right rows sort before left rows at equal timestamps
    (``side`` tiebreak), which realizes allow-exact-match semantics.
    Inputs may carry TIMESTAMP or TIMESTAMP_NTZ: the cast to timestamp
    is an exact identity because the session timezone is pinned to UTC
    (session.py), so both types hold the same epoch micros.
    """
    l2 = left.select(
        F.col(key).alias("k"),
        F.col(left_id).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.lit(1).alias("side"),
    )
    r2 = right.select(
        F.col(key).alias("k"),
        F.lit(None).cast("long").alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.lit(0).alias("side"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).withColumn(
        "match_ts_us",
        F.last(F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True).over(w),
    )
    return (
        carried.where((F.col("side") == 1) & F.col("match_ts_us").isNotNull())
        .select(
            "event_id",
            "ts_us",
            "match_ts_us",
            (F.col("ts_us") - F.col("match_ts_us")).alias("gap_us"),
        )
    )


def interval_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str = "event_id",
    ts_col: str = "ts",
    lookback: str = "10 minutes",
) -> DataFrame:
    """For each left row, count right rows of the same key within
    [left.ts - lookback, left.ts]. Left rows with no matches keep a
    zero count (left join + count of non-null)."""
    l2 = left.select(
        F.col(key).alias("k"),
        F.col(left_id).alias("left_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r2 = right.select(
        F.col(key).alias("k"),
        F.col(left_id).alias("right_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (l2["k"] == r2["k"])
        & (r2["r_ts"] >= l2["l_ts"] - F.expr(f"interval {lookback}"))
        & (r2["r_ts"] <= l2["l_ts"])
    )
    joined = l2.join(r2, cond, "left")
    return joined.groupBy(l2["left_id"].alias("left_id")).agg(
        F.count(r2["right_id"]).alias("match_cnt")
    )


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_col_src: str | None = None,
) -> DataFrame:
    """Equi-join where the big side's key distribution is skewed:
    salt the big side into ``salt_buckets`` sub-keys (deterministic
    content hash of ``salt_col_src``, NOT rand() — reproducible under
    retries/speculation) and replicate the small side once per bucket,
    so a hot key's rows spread across ``salt_buckets`` tasks instead
    of one straggler.

    This is the manual form of what AQE skew-join does at runtime;
    ship it as an operator because (a) AQE only splits SORT-MERGE
    joins post-shuffle and (b) pre-salting also de-skews the
    downstream aggregation on the same key. The join result is
    row-identical to the unsalted join (oracle: the plain join)."""
    from flink_scala_spark.functions import h60

    src = salt_col_src or key
    salted_big = big.withColumn(
        "_salt", (h60(F.col(src).cast("string")) % salt_buckets).cast("int")
    )
    salts = big.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("_salt")
    )
    salted_small = small.crossJoin(F.broadcast(salts))
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` + ``merge_asof`` —
    the two-sided Arrow co-processing extension point (the general
    form for per-key logic that genuinely needs both sides in pandas:
    model scoring, stateful reconciliation, custom interpolation).

    Semantics identical to :func:`asof_join` (each left row matched to
    the latest right row with ``right.ts <= left.ts`` per key) and
    checked against the same oracle. For THIS operation prefer
    :func:`asof_join` — its window formulation stays JVM-side and is
    ~20x faster; this variant exists to exercise and document the
    cogroup path the reference's connect/CoProcessFunction family
    (ConnectAndUnion.scala:39-52) maps to when logic outgrows SQL."""
    import pandas as pd

    schema = (
        f"{id_col} long, ts_us long, match_ts_us long, gap_us long"
    )

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(
                {c: [] for c in (id_col, "ts_us", "match_ts_us", "gap_us")}
            )
        ldf = ldf.sort_values(ts_col)
        out = pd.DataFrame(
            {
                id_col: ldf[id_col].values,
                "ts_us": ldf[ts_col].astype("int64") // 1000,
            }
        )
        if rdf.empty:
            out["match_ts_us"] = pd.array([None] * len(out), dtype="Int64")
        else:
            rdf = rdf.sort_values(ts_col)
            m = pd.merge_asof(
                ldf[[ts_col]],
                rdf[[ts_col]].rename(columns={ts_col: "_rts"}),
                left_on=ts_col,
                right_on="_rts",
                direction="backward",
            )
            rts = m["_rts"]
            vals = pd.Series(pd.NA, index=rts.index, dtype="Int64")
            mask = rts.notna()
            # datetime64[ns] -> int64 ns is only valid NaT-free, hence
            # the masked assignment (a whole-column astype('Int64')
            # rejects datetimes outright).
            vals[mask] = rts[mask].astype("int64") // 1000
            out["match_ts_us"] = vals.values
        out["gap_us"] = out["ts_us"] - out["match_ts_us"]
        return out

    lsel = left.select(key, id_col, ts_col)
    rsel = right.select(key, ts_col)
    return (
        lsel.groupBy(key)
        .cogroup(rsel.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )


def binned_range_join_count(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    left_id: str = "event_id",
    lookback_seconds: int = 21_600,
) -> DataFrame:
    """KEYLESS time-range correlation — for each left row, count right
    rows anywhere in ``[left.ts - lookback, left.ts]`` — executed as an
    EQUI-join via time binning.

    Without an equi-key Catalyst can only run a range predicate as
    BroadcastNestedLoopJoin (or a cartesian product): O(|L|*|R|)
    comparisons, a guaranteed 100 TB killer. Binning restores a
    shuffle join: with bin width equal to the lookback, a right row in
    ``[l - W, l]`` can only live in the left row's bin or the one
    before it, so each left row expands to exactly TWO candidate bins,
    both sides shuffle on the bin key, and the range check runs as a
    residual filter inside sort-merge join. Cost: one 2x fan-out of
    the left side + a hash-partitioned join whose per-task load is the
    bin population — bounded, tunable, skew-visible (plan pinned by
    tests/test_plans.py: no BroadcastNestedLoopJoin, no
    CartesianProduct).
    """
    w_us = int(lookback_seconds * 1_000_000)
    l2 = left.select(
        F.col(left_id).alias("left_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("l_us"),
    ).withColumn(
        # integer DIV, not double division: epoch-micro values exceed
        # the 52-bit double mantissa's exact-integer range headroom
        "bin",
        F.explode(
            F.array(
                F.expr(f"l_us DIV {w_us}") - 1, F.expr(f"l_us DIV {w_us}")
            )
        ),
    )
    r2 = right.select(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("r_us")
    ).withColumn("bin", F.expr(f"r_us DIV {w_us}"))
    # Round 12 (guide §2.4 + §3.3): the join is LEFT OUTER with the
    # range check folded into the count, so left rows with an empty
    # window survive as zero counts directly — the old inner-join +
    # join-back against a second `left` scan re-derived the left side
    # twice (the before plan scanned events 3x) and paid an extra
    # left_id shuffle. Every left row appears in >= 1 bin group, so
    # the conditional sum is never NULL; counts are identical.
    in_range = (F.col("r_us") >= F.col("l_us") - w_us) & (
        F.col("r_us") <= F.col("l_us")
    )
    return (
        l2.join(r2, "bin", "left")
        .groupBy("left_id")
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0))
            .cast("long")
            .alias("n_in_window")
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi join (runtime-filter pushdown, built from primitives)
# ---------------------------------------------------------------------------

#: Bloom geometry: 2^16 bits packed into 1024 BIGINT words. Production
#: sizing is ~10 bits/key (fpr ~1% at 2 hashes); the fixed test-scale
#: constant keeps the broadcast literal ~8 KiB. The filter only PRUNES —
#: the exact join behind it removes every false positive, so geometry
#: affects cost, never results.
BLOOM_BITS = 1 << 16
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 2


def _bloom_positions(key) -> list:
    """BLOOM_HASHES bit positions carved as disjoint 16-bit slices of
    ONE native ``xxhash64`` — a single codegen-native hash per row.
    The bloom needs no cross-engine portability (the trailing exact
    join makes results independent of the bitmap, so the oracle never
    replays it): the portable-but-slow md5 ``h60`` was measured 4x
    slower on the fact-scan hot path (6.2 s -> 1.1 s per 600k-row
    prune at sf0.1). Build and probe share this function, which is the
    only agreement the filter needs."""
    h = F.xxhash64(key)
    return [
        F.shiftright(h, 16 * i).bitwiseAND(F.lit(BLOOM_BITS - 1).cast("long"))
        for i in range(BLOOM_HASHES)
    ]


def bloom_words(keys: DataFrame, key_col: str) -> list:
    """Aggregate the build side's bloom bitmap distributedly: each key
    contributes BLOOM_HASHES bit positions (the shared xxhash64 slices,
    so the probe side recomputes the same positions), which fold into 64-bit
    words with a map-side-combined ``bit_or`` — only the FIXED-SIZE
    word table (<= 1024 rows) ever reaches the driver, never the keys.
    Returns the dense word list (index = word_idx)."""
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[int(r["w"])] = int(r["word"])
    return words


def bloom_might_contain(words: list, key) -> F.Column:
    """Row-local membership test against the broadcast word array —
    pure JVM expressions (array literal + shiftright + bit-and), stays
    inside whole-stage codegen; no Python in the hot path."""
    # F.lit(list) emits ONE ArrayType Literal; F.array(*lits) would
    # plan a CreateArray rebuilt per row (measured ~1.7x slower)
    arr = F.lit([int(w) for w in words])
    cond = F.lit(True)
    for pos in _bloom_positions(key):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_join(
    fact: DataFrame, dim_keys: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Exact semi join with a bloom runtime filter in front: the classic
    100 TB join-reduction — the filtered dimension's bloom bitmap (8 KiB
    regardless of key count) broadcasts to every fact scan task and
    prunes non-matching fact rows BEFORE the join shuffle, so the
    exchange carries only true matches + the bloom's false-positive
    tail. The trailing exact ``leftsemi`` join removes false positives:
    results are identical to the plain semi join (the oracle), only the
    shuffled volume changes. This is what Spark's AQE runtime filters /
    DPP do for equi-joins on partition columns, built from primitives
    so it applies to ANY key."""
    ft = fact.schema[fact_key].dataType
    dt = dim_keys.schema[dim_key].dataType
    if ft != dt:
        # xxhash64 hashes the PHYSICAL type: int 5 and long 5 land on
        # different bits, so a type mismatch silently prunes TRUE
        # matches — a false negative the trailing exact join cannot
        # recover. Refuse loudly; the caller casts one side.
        raise ValueError(
            f"bloom_semi_join: key types differ ({fact_key}: "
            f"{ft.simpleString()} vs {dim_key}: {dt.simpleString()}) — "
            "xxhash64 would place matching values on different bloom "
            "bits and drop true matches; cast one side first"
        )
    words = bloom_words(dim_keys, dim_key)
    pruned = fact.where(bloom_might_contain(words, F.col(fact_key)))
    return pruned.join(
        dim_keys.withColumnRenamed(dim_key, fact_key), fact_key, "leftsemi"
    )
