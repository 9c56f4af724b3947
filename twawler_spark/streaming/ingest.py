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


def stream_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop's discover→dedup→admit path as a NATIVE streaming
    query (S3+S12+P5): candidates stream in (file source standing in
    for the push stream), stateful ``dropDuplicates`` gives the
    dup-tolerant insert semantics, a stream-static LEFT ANTI join
    against the broadcast seen-set is the admission filter, and the
    windowless per-host rollup runs in complete mode. No foreachBatch
    side effects — the whole path is declarative streaming operators.

    Candidate key = event_id % 3000 (collisions exercise the stateful
    dedup; host is derived from the key so dedup is deterministic);
    seen = 19·custkey for custkey < 150."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"stream_out_{next(_counter)}"
    kid = F.col("event_id") % 3000
    cand = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("o:"), kid.cast("string"))), 1, 15),
                16,
                10,
            ).cast("long").alias("url_hash"),
            F.concat(F.lit("h"), (kid % 20).cast("string")).alias("host"),
        )
        .dropDuplicates(["url_hash"])
    )
    seen = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") < 150)
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("o:"), (F.col("c_custkey") * 19).cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long").alias("url_hash")
        )
    )
    admitted = cand.join(F.broadcast(seen), "url_hash", "left_anti")
    agg = admitted.groupBy("host").agg(F.count(F.lit(1)).alias("n_admitted"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


O_STREAM_CRAWL_ADMISSION = """
WITH cand AS (SELECT DISTINCT event_id % 3000 AS kid FROM events),
seen AS (SELECT c_custkey * 19 AS kid FROM customer WHERE c_custkey < 150),
adm AS (SELECT kid FROM cand WHERE kid NOT IN (SELECT kid FROM seen))
SELECT 'h' || cast(kid % 20 as varchar) AS host, count(*) AS n_admitted
FROM adm GROUP BY 1
"""
