"""Column-level function kernels for the LLM-data-pipeline extension
layer (BASELINE.json north star): text analysis, deduplication,
similarity search, multimodal columns. Everything here returns Column
expressions built from pyspark.sql.functions (JVM-side, codegen'd) —
Python only where genuinely unavoidable (multimodal decode stubs).
"""
