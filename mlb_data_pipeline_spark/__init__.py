"""mlb_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference batch ELT + retrieval pipeline (``dejiandrew/mlb-data-pipeline``),
re-expressed Spark-first: DataFrame/SQL relational core, document (text)
operators, vector similarity / dedup operators, date-partitioned lake
storage, and Structured Streaming for incremental data.

Design principles (SURVEY.md §7.1):

* Every operator is a pure ``DataFrame -> DataFrame`` function with an
  explicit output schema.
* Declarative first — Catalyst handles pushdown, pruning, join selection,
  AQE; we never hand-schedule what the optimizer already does.
* Python is the slow path: built-in ``pyspark.sql.functions`` everywhere,
  Arrow-batched pandas UDFs only where semantics genuinely need Python.
* External effects (HTTP, embedding models, LLMs) live behind interfaces
  with deterministic fakes; never in the correctness tier.
"""

__version__ = "0.1.0"
