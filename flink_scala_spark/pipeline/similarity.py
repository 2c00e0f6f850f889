"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Query set is
  broadcast; candidates stream through a nested-loop join that stays
  entirely in whole-stage codegen (``zip_with`` + ``aggregate`` dot
  products — no Python, no UDF).
- Random-hyperplane LSH bucketing: the 100 TB path. Each vector gets
  an 8-bit bucket from the signs of 8 hyperplane projections; pairs
  are only compared within a bucket (equi-join shuffle on the bucket
  id), cutting the pair space ~256x. Hyperplane components are fixed
  Python-computed constants baked into the plan, so the DuckDB oracle
  replays the identical bucketing.
- Brute-force near-dup pairs: ground truth for the bucketed variant.

All float math uses the in-order fold of
:mod:`flink_scala_spark.functions.portable`, so cosines are
bit-identical between Spark and the DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_scala_spark.functions import inorder_dot_fixed, inorder_dot_literal

NUM_PLANES = 8
DIM = 64

#: Deterministic pseudo-random hyperplanes: component (p, d) is
#: sin(p*DIM + d + 1). Quasi-uniform in [-1, 1], reproducible as SQL
#: literals on the oracle side.
HYPERPLANES: list[list[float]] = [
    [math.sin(p * DIM + d + 1) for d in range(DIM)] for p in range(NUM_PLANES)
]


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the squared L2 norm (computed once per vector, reused by
    every pair — avoids recomputing 64 multiplies per comparison)."""
    return emb.withColumn("nsq", inorder_dot_fixed(F.col(vec_col), F.col(vec_col), DIM))


def _cosine(a_vec, b_vec, a_nsq, b_nsq):
    return inorder_dot_fixed(a_vec, b_vec, DIM) / F.sqrt(a_nsq * b_nsq)


def cosine_topk(
    emb: DataFrame,
    query_pred,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the query subset.

    The query side is broadcast (small by construction); ranking is a
    per-query window — the shuffle is keyed by query id only.
    """
    base = with_norm(emb, vec_col)
    q = base.where(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("nsq").alias("q_nsq"),
    )
    c = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("nsq").alias("c_nsq"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_nsq"), F.col("c_nsq")).alias(
            "cosine"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force all-pairs cosine filter — the exact baseline."""
    base = with_norm(emb, vec_col)
    a = base.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"), F.col("nsq").alias("a_nsq")
    )
    b = base.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"), F.col("nsq").alias("b_nsq")
    )
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    return _score_and_filter(pairs, threshold)


def _score_and_filter(pairs: DataFrame, threshold: float) -> DataFrame:
    """Project the cosine, then filter — with a pushdown barrier.

    Without the barrier Catalyst pushes ``cosine >= t`` into the join
    condition, where BroadcastNestedLoopJoin evaluates the 64-term dot
    product INTERPRETED per candidate pair (~20x slower). The
    nondeterministic no-op column keeps the projection un-pushable, so
    scoring stays in a whole-stage-codegen Project/Filter above the
    join. Output is unchanged (the column is dropped).
    """
    scored = pairs.select(
        "vec_a",
        "vec_b",
        _cosine(F.col("a_vec"), F.col("b_vec"), F.col("a_nsq"), F.col("b_nsq")).alias(
            "cosine"
        ),
        F.monotonically_increasing_id().alias("_barrier"),
    )
    return scored.where(F.col("cosine") >= threshold).drop("_barrier")


def lsh_bucket(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the 8-bit sign-random-projection bucket id."""
    out = with_norm(emb, vec_col)
    bucket = F.lit(0)
    for p in range(NUM_PLANES):
        proj = inorder_dot_literal(F.col(vec_col), HYPERPLANES[p])
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.withColumn("bucket", bucket.cast("int"))


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed near-dup: pairs are compared only inside an LSH bucket
    (equi-join on bucket id -> shuffle partitioned by bucket; the
    quadratic blowup is bounded per-bucket)."""
    base = lsh_bucket(emb, vec_col)
    a = base.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("a_vec"),
        F.col("nsq").alias("a_nsq"),
        "bucket",
    )
    b = base.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("b_vec"),
        F.col("nsq").alias("b_nsq"),
        "bucket",
    )
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    return _score_and_filter(pairs, threshold)
