"""Structured Streaming layer: sources, windowed aggs, keyed state,
timers, and exactly-once sinks — the streaming half of the reference's
capability surface (SURVEY.md §2.5-2.8)."""
