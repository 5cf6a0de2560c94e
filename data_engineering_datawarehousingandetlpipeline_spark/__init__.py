"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ELT pipeline (FMI weather → Kafka → clean/dedup
→ warehouse → dashboard queries), rebuilt Spark-first.

The reference (surveyed in SURVEY.md) is an eager pandas + BigQuery + Kafka
pipeline; this package replaces all three layers with DataFrame/SQL plans
optimized by Catalyst, a partitioned-Parquet lakehouse table, and Structured
Streaming. Beyond reference parity it adds LLM-data-pipeline operators
(dedup families, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
    session       SparkSession factory with scale-aware defaults
    schema        typed schemas + lenient (try_cast) coercion
    sources       readers (parquet/JSON fixture/Kafka) and sinks
    operators     cleaning, quality, dedup, similarity, text, sessionize
    plans         the query surface (reference-parity + TPC-H-ish analytics)
    warehouse     append/merge/verify semantics over partitioned Parquet
    streaming     micro-batch pipeline with idempotent foreachBatch sink
"""

__version__ = "0.1.0"
