"""Scale guards on the retained ground-truth baselines: the quadratic
/ unbounded-state paths must refuse loudly past their documented
bounds, naming their scale-safe twins — and the guard must actually be
wired into the catalog entries, not just exist as a helper."""

import pytest

from flink_scala_spark.pipeline import guards
from flink_scala_spark.queries.catalog import QUERIES


def test_guard_passes_under_bound_and_env_overrides(monkeypatch):
    guards.guard_exact_pairs(guards.MAX_EXACT_PAIRS, "x", "y")
    guards.guard_unbounded_state(guards.MAX_UNBOUNDED_STATE_ROWS, "x", "y")
    with pytest.raises(RuntimeError, match="scale path `the_twin`"):
        guards.guard_exact_pairs(guards.MAX_EXACT_PAIRS + 1, "q", "the_twin")
    with pytest.raises(RuntimeError, match="TTL twin `the_twin`"):
        guards.guard_unbounded_state(
            guards.MAX_UNBOUNDED_STATE_ROWS + 1, "q", "the_twin"
        )
    monkeypatch.setenv("SPARK_GRAFT_ALLOW_QUADRATIC", "1")
    guards.guard_exact_pairs(guards.MAX_EXACT_PAIRS + 1, "q", "t")
    guards.guard_unbounded_state(guards.MAX_UNBOUNDED_STATE_ROWS + 1, "q", "t")


@pytest.mark.parametrize(
    "name,twin",
    [
        ("bitext_mining_margin", "bitext_mining_ann"),
        ("dedup_ngram_jaccard", "dedup_minhash_lsh"),
        ("streaming_dedup_minhash", "streaming_dedup_minhash_ttl"),
    ],
)
def test_baselines_are_guard_wired(spark, sf_dir, name, twin, monkeypatch):
    """With the bounds forced to zero, each retained baseline must
    refuse before doing any pair/state work, and the error must point
    at the production twin."""
    monkeypatch.setattr(guards, "MAX_EXACT_PAIRS", 0)
    monkeypatch.setattr(guards, "MAX_UNBOUNDED_STATE_ROWS", 0)
    with pytest.raises(RuntimeError, match=twin):
        QUERIES[name].fn(spark, sf_dir)
