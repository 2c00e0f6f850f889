"""Join operators beyond Spark's built-ins: as-of join and interval
join (SURVEY.md §2.4 notes the reference has no joins; these are the
stream-adjacent extensions a time-series pipeline needs).

- **As-of join**: for each left row, the latest right row of the same
  key with ts <= left ts. Spark lacks this natively; the scalable
  shape is a cogrouped ``applyInPandas`` running ``pandas.merge_asof``
  per key partition — one shuffle on the key for each side, sorted
  merge within partitions, Arrow-batched, no driver involvement.
- **Interval join**: equi-join on the key plus a time-range predicate;
  Catalyst executes it as a sort-merge join on the key with the range
  as a residual filter — the standard Spark plan for bounded-interval
  correlation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

ASOF_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("match_ts_us", LongType()),
        StructField("gap_us", LongType()),
    ]
)


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

    Timestamps travel as epoch-microsecond longs so the pandas merge
    is exact (no tz/unit coercion).
    """
    l2 = left.select(
        F.col(key).alias("k"),
        F.col(left_id).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    r2 = right.select(
        F.col(key).alias("k"), F.unix_micros(F.col(ts_col)).alias("match_ts_us")
    )

    # out_cols captured by value: the closure must stay self-contained
    # (no module globals) so executors don't need this package on
    # their PYTHONPATH.
    out_cols = tuple(f.name for f in ASOF_SCHEMA.fields)

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        if len(lpdf) == 0:
            return _pd.DataFrame(columns=list(out_cols))
        lpdf = lpdf.sort_values("ts_us")
        rpdf = rpdf.sort_values("match_ts_us")
        m = _pd.merge_asof(
            lpdf,
            rpdf[["match_ts_us"]],
            left_on="ts_us",
            right_on="match_ts_us",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["match_ts_us"])
        if len(m) == 0:
            return _pd.DataFrame(columns=list(out_cols))
        return _pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "ts_us": m["ts_us"].astype("int64"),
                "match_ts_us": m["match_ts_us"].astype("int64"),
                "gap_us": (m["ts_us"] - m["match_ts_us"]).astype("int64"),
            }
        )

    return (
        l2.groupBy("k")
        .cogroup(r2.groupBy("k"))
        .applyInPandas(fn, ASOF_SCHEMA)
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
