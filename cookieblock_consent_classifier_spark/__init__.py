"""PySpark-native feature-engineering engine.

From-scratch re-expression of the query/data-processing semantics of
dibollinger/CookieBlock-Consent-Classifier (reference at /root/reference,
MIT) as lazy pyspark.sql DataFrame plans: point-in-time as-of joins,
window lag/lead + backfill + gap sessionization, config-driven
per-entity / per-update / per-diff feature families, broadcast lookup
joins, vectorized pandas UDFs for the non-relational kernels
(entropy, zlib, gestalt, str-classes, image decode / phash-delta),
and sparse (indices, values) feature-vector assembly.

NOT a port: the reference is an eager single-process row-at-a-time
interpreter (reference: feature_extraction/processor.py:400-455); this
engine compiles the same declared feature schema into one Catalyst
DataFrame DAG and lets Spark pick the physical plan.
"""

__version__ = "0.1.0"
