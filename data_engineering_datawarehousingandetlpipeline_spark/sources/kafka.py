"""Kafka-shaped encode/decode + stream wiring (reference S3/S4, F1/F2).

The reference hand-rolls a JSON-serializing producer and a poll-loop
consumer (``kafka_stream.py:53-72``, ``:287-361``). In Spark both collapse
to column expressions around the Kafka connector:

- encode: ``to_json(struct(*))`` → a ``value`` byte column (F1)
- decode: ``from_json(value, schema)`` → typed columns (F2)

The encode/decode transforms are pure DataFrame functions — testable with
no broker — and the same expressions serve batch and streaming. The
connector entry points (``read_stream``/``write_stream``) need the
spark-sql-kafka jars on the classpath; this image does not bundle them, so
tests drive the identical pipeline through file/memory streams instead
(streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    OBSERVATION_SCHEMA,
)

DEFAULT_TOPIC = "fmi_observations"


def encode_json(df: DataFrame) -> DataFrame:
    """F1/S3: rows → one UTF-8 JSON ``value`` column (producer payload)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def decode_json(
    df: DataFrame, schema: T.StructType = OBSERVATION_SCHEMA, value_col: str = "value"
) -> DataFrame:
    """F2/S4: JSON ``value`` column → typed columns (consumer payload).

    Malformed messages become NULL-field rows (PERMISSIVE mode), matching
    the reference's tolerance for dirty payloads; required-field cleaning
    drops them downstream.
    """
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("obs")
    )
    return parsed.select("obs.*")


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S4: Kafka streaming source (requires spark-sql-kafka jars).

    ``startingOffsets=earliest`` mirrors the reference consumer's
    ``auto_offset_reset`` (kafka_stream.py:300); ``maxOffsetsPerTrigger``
    is the batch-size bound (T1). Connection retry/backoff (S9) is built
    into the connector.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_json(reader.load())


def write_batch(
    df: DataFrame, bootstrap_servers: str, topic: str = DEFAULT_TOPIC
) -> None:
    """S3: publish a batch to Kafka (requires spark-sql-kafka jars)."""
    (
        encode_json(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
