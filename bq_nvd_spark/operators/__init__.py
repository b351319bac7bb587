"""Reusable operator library (EXT surface, SURVEY.md §2.11).

Implementation modules for the LLM-data-pipeline operators; the
oracle-checked queries that exercise them live in ``bq_nvd_spark.plans``.
"""
