"""LLM-training-data pipeline operators (extension surface).

The reference engine has none of these (SURVEY §2.11); they are the
driver-mandated extension: dedup (exact / n-gram Jaccard / MinHash-LSH /
SimHash / embedding), similarity search (brute-force + LSH ANN), text
analysis (lang-id, quality, tokens, fingerprints), sessionization /
time-window analytics, and multimodal column plumbing — every operator
expressed as JVM-side DataFrame transformations designed for 100 TB
(no driver-side loops, no row-at-a-time Python in hot paths).
"""

from kineo_spark.pipeline import dedup, multimodal, sessions, similarity, text  # noqa: F401
