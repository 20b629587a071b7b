"""irio2024_mapreduce_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing
capabilities of the reference MapReduce framework
(fstachura/irio2024-mapreduce) on the Spark DataFrame/Catalyst stack,
plus the relational / streaming / LLM-data-pipeline operator surface
declared in SURVEY.md §2.3.

Design stance (SURVEY.md §3.4, §4.2):

* DataFrame-first — every operator is a declarative Catalyst logical
  plan; no hand-rolled scheduling, shuffle, or persistence (the
  reference's coordinator/worker/Postgres/GCS machinery collapses
  into Spark's own scheduler + shuffle + lineage recovery).
* No custom Catalyst rules are needed; operators are plan shapes.
* Python stays out of the hot path — built-in ``pyspark.sql.functions``
  everywhere; Arrow-batched pandas UDFs only where the semantics
  genuinely require Python (multimodal decode, custom steps).
"""

from irio2024_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
