"""Operator library: pure ``DataFrame -> DataFrame`` builders.

Each module mirrors a section of SURVEY.md §2 (the reference's operator
inventory) or the LLM-data-pipeline extension set. Builders never
trigger actions; composition stays lazy so Catalyst optimizes the whole
pipeline at once.
"""
