"""Stateless transforms: map/flatMap/filter and the CSV-line parser.

Mirrors SURVEY.md §2.2 (T1-T3): the reference's chief ``map`` use is
parsing a CSV line into a typed ``Sensor(id, timestamp, temperature)``
(``hk/transformTest/TransformTest.scala:23-26`` and five other files);
``filter`` is predicates like ``temperature >= 20``
(``SourceFromListOrFile.scala:28``).

All of these stay JVM-side (``split``/``trim``/``cast`` — whole-stage
codegen), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_sensor_csv(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """CSV line -> Sensor(id STRING, timestamp LONG, temperature DOUBLE).

    TransformTest.scala:23-26: ``split(",")`` + ``trim`` + casts.
    """
    parts = F.split(F.col(text_col), ",")
    return lines.select(
        F.trim(parts.getItem(0)).alias("id"),
        F.trim(parts.getItem(1)).cast("long").alias("timestamp"),
        F.trim(parts.getItem(2)).cast("double").alias("temperature"),
    )


def filter_min_value(df: DataFrame, col: str, threshold: float) -> DataFrame:
    """filter(_.temperature >= t) (SourceFromListOrFile.scala:28)."""
    return df.filter(F.col(col) >= threshold)
