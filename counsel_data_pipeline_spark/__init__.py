"""counsel_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch Spark engine with the query / data-processing capabilities of
the reference ETL pipeline ``hsilan-sui/counsel-data-pipeline`` (surveyed in
/root/repo/SURVEY.md), re-expressed as idiomatic DataFrame / SQL / Structured
Streaming plans, plus the LLM-training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
  session.py    SparkSession factory (AQE on, sane shuffle partitioning)
  catalog.py    query registry: name -> (spark_fn, duckdb oracle SQL)
  schemas.py    StructTypes for the clinic domain + TPC-H-ish test tables
  io/           polymorphic sources and envelope/CSV-parity sinks
  ops/          operator library (clean, dedup, merge, diff, text, enrich, ...)
  plans/        registered query plans the driver harness executes
  streaming/    Structured Streaming variants (windows, watermarks, state)
"""

__version__ = "0.1.0"
