"""Stateful streaming sessionization — gap-based sessions per user.

The reference's stream loop (stream.py, S3) keeps no state beyond
idempotent upserts; this operator supplies the stateful piece a modern
pipeline needs: per-user sessions with a 30-minute inactivity gap.

Implementation choice: Spark's native ``session_window`` aggregation —
JVM-managed state, merge-on-late-data, no per-row Python (the north
rule's preference over a hand-rolled ``applyInPandasWithState``; the
Python state protocol is also the slow path). The exact batch twin
(entry_queries.q_w_sessionize: lag + gap + cumsum) is the oracle.

Session end is reported as the LAST EVENT's time (session_window.end
minus the gap), so streaming and batch agree exactly.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAP_S = 1800

_counter = itertools.count()


def sessionize_batch(events: DataFrame) -> DataFrame:
    """session_window over a static frame (same engine op, batch mode)."""
    return _agg(events)


def _agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{GAP_S} seconds").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_e"),
            (F.unix_timestamp(F.col("w.end")) - GAP_S).alias("session_end_e"),
            "n_events",
        )
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming sessionizer over the static events dir to
    completion and return all sessions."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"sessions_out_{next(_counter)}"
    events = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts")
    )
    q = (
        _agg(events)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
