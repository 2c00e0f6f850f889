"""Word count — the reference's hello-world, batch and "stream" form.

Mirrors ``hk/helloWorldTest/WordCount.scala:20-26`` (batch
``readTextFile -> flatMap(split) -> map((_,1)) -> groupBy(0).sum(1)``)
and ``StreamWordCount.scala:25-31`` (same over a socket, with
``filter(_.nonEmpty)``). T2 flatMap = ``explode(split())``; A1 keyed
running sum's batch twin is the final count per word.

Scale notes: explode + groupBy(word) is one shuffle with partial
aggregation; word skew (stopwords) is handled by AQE skew handling or
two-phase salted aggregation (see ``keyed_sum_salted`` in
aggregations.py) — at 100 TB the two-phase form is the safe default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "value") -> DataFrame:
    """flatMap(_.split(" ")) + filter(_.nonEmpty)
    (WordCount.scala:25, StreamWordCount.scala:27-28)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )


def word_count(df: DataFrame, text_col: str = "value") -> DataFrame:
    """groupBy(0).sum(1) — per-word totals (WordCount.scala:25)."""
    return tokenize(df, text_col).groupBy("word").agg(F.count("*").alias("cnt"))
