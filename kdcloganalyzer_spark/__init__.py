"""kdcloganalyzer_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query surface of the reference
Hadoop MapReduce engine (cg2v/kdcloganalyzer) on Apache Spark, plus the
relational + LLM-data-pipeline operators a large-scale training-data
pipeline needs (SURVEY.md §2).

Design rules (SURVEY.md §0, §4):
- DataFrame/SQL first; Catalyst owns the physical plan.
- Python UDFs only where built-in functions can't express the semantics,
  and then always Arrow-batched (pandas_udf / mapInPandas).
- Every operator id in SURVEY.md §2 maps to ``plans.registry.QUERIES``.
"""

__version__ = "0.1.0"
