"""Structured-Streaming ingest — the reference's stream.py (S3) analog.

The reference consumes a push stream (tweepy) and upserts idempotently;
here the same semantics are Structured Streaming over a file source:
watermarked event-time windows, idempotent by window key. A live
deployment swaps the file source for Kafka — the query is unchanged.

``windowed_counts_batch_equivalent`` is the exact batch form of the
streaming aggregation: used as the DuckDB-checkable oracle twin (the
streaming result over a static dir equals the batch result).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_counter = itertools.count()


def stream_windowed_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the streaming windowed count over the static events dir to
    completion (availableNow) and return the result as a DataFrame."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"stream_out_{next(_counter)}"
    events = (
        spark.readStream.schema(schema)
        # file stream source needs a directory; glob selects the table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # parquet stores TIMESTAMP_NTZ; event-time semantics need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def windowed_counts_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming aggregation (for tests/oracles)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


O_STREAM_WINDOWED = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""
