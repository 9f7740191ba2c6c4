"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing.

These go beyond the reference's own operator surface (SURVEY.md §2) — they
are the operations a 100 TB training-data pipeline needs, built Spark-first:
shuffle-aware inverted-index joins for near-dup detection, banded LSH for
candidate generation, JVM-side higher-order functions for vector math, and
Arrow-batched ``mapInPandas`` only where Python is genuinely required.
"""
