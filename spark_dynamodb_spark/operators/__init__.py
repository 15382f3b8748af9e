"""Operator modules — one per SURVEY.md §2 category.

Part B (delegated relational surface): relational, joins, aggregates,
windows, setops, scalars, udfs.
Part C (LLM-pipeline): dedup, similarity, text_analysis, multimodal.
"""
