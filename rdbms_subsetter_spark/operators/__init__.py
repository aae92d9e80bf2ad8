"""LLM-data-pipeline operators (BASELINE.json north star):
deduplication, similarity search, multimodal columns, text analysis.

All hot-path logic is built-in ``pyspark.sql.functions`` column
expressions (JVM-side, whole-stage codegen); Python only appears in
the clearly-marked multimodal decode stubs (Pandas-UDF plumbing).
"""
