"""flink_scala_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference repo
(herokangvip/flink-scala, a Flink 1.7.2 DataStream API tour — see
SURVEY.md) on Spark's DataFrame / SQL / Structured Streaming stack,
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design principles (see README.md):
- DataFrame/SQL first: declare the logical plan, let Catalyst pick the
  physical strategy (pushdown, pruning, broadcast, AQE).
- Operators are pure ``DataFrame -> DataFrame`` builder functions.
- Python only on the slow path, and then Arrow-vectorized
  (pandas_udf / applyInPandas / mapInPandas), never row-at-a-time.
- Every operator designed for 100 TB: no driver-side collects in the
  data path, shuffle-minimal formulations, broadcast for small dims.
"""

__version__ = "0.1.0"
