"""User-extensibility surface (SURVEY.md §2.10) as first-class,
oracle-checked operators — the three UD* extension points a reference
user would reach for when the built-ins run out:

- **UDTF** (table function; Flink's ``flatMap``/TableFunction
  analogue): a Python class whose ``eval`` yields rows, registered for
  SQL ``LATERAL`` use. Row-at-a-time by contract — demonstrated on the
  bigram explode where the engine's PRODUCTION path is the codegen'd
  sequence+explode (X42); the UDTF is the extension-point proof, not
  the hot path.
- **UDAF** (grouped aggregate; Flink's AggregateFunction analogue): an
  Arrow-batched ``pandas_udf`` GROUPED_AGG. The demo aggregate
  (second-largest by selection) is ORDER-INSENSITIVE and arithmetic-
  free, so it is bit-reproducible under any shuffle order and the
  DuckDB oracle matches exactly — the same determinism discipline the
  fixed-point sums follow.
- **Scalar pandas UDF**: exercised throughout the pipeline modules
  (mapInPandas / applyInPandas / applyInPandasWithState); see
  ``pipeline/`` and ``streaming/stateful.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="pos: int, bigram: string")
class BigramUDTF:
    """Word-bigram table function: one input text row fans out to its
    consecutive word pairs. The Spark 4 Python UDTF extension point
    (register + SQL LATERAL), equivalent to the reference's flatMap
    tokenizers (TransformTest.scala flatMap / WordCount splitter)."""

    def eval(self, text: str):  # noqa: D102 - contract defined by Spark
        words = [w for w in (text or "").split(" ") if w]
        for i in range(len(words) - 1):
            yield i, words[i] + " " + words[i + 1]


@pandas_udf("double")
def second_largest(values: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: the second-largest value of the group
    (NaN-free selection; None when the group has < 2 rows).

    Selection (sort + index), not arithmetic — order-insensitive, so
    the result is identical under any partitioning/arrival order and
    hash-comparable against the SQL oracle."""
    import numpy as np

    arr = values.to_numpy(dtype="float64")
    arr = arr[~np.isnan(arr)]
    if len(arr) < 2:
        return None
    return float(np.sort(arr)[-2])
