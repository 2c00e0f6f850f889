"""Large-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal column plumbing.

These extend the reference's capability surface (SURVEY.md §7.2 M6)
with the operations a 100 TB LLM-data pipeline needs. Everything is
expressed shuffle-consciously: candidate generation via bucketing
(LSH bands / simhash bands / hyperplane buckets) so the quadratic
pair space is never materialized, exact verification only on the
bucketed candidates, no driver-side collects.
"""
