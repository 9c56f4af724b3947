"""Custom stateful streaming operator — applyInPandasWithState.

The reference's crawl checkpoint is driver-side mutable state: each
fetched page advances ``crawlerdata.lastid`` and bumps counters
(twkit/crawler/dumpall.py:63-87). Here that per-user checkpoint is a
KEYED STREAMING STATE: as events arrive, each user's state carries
(n_events, last_id = max event id, distinct event-type set) and emits
the running checkpoint after every batch. The accumulators are
monotone, so the batch-final row per user equals max() over emissions —
which is what the query returns (and what the DuckDB oracle checks).
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_counter = itertools.count()

_OUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("last_id", LongType(), False),
        StructField("n_types", IntegerType(), False),
    ]
)
# state: counters + the seen event-type set (comma-joined; 5 types total)
_STATE = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("last_id", LongType(), False),
        StructField("types", StringType(), False),
    ]
)


def _advance(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, last, types = state.get if state.exists else (0, -1, "")
    seen = set(types.split(",")) - {""}
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last = max(last, int(pdf["event_id"].max()))
            seen.update(pdf["event_type"].unique().tolist())
    state.update((n, last, ",".join(sorted(seen))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_id": [last],
            "n_types": [len(seen)],
        }
    )


def stream_checkpoint_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful checkpoint stream over the static events dir to
    completion; return the final per-user checkpoint (max over the
    monotone per-batch emissions)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"ckpt_out_{next(_counter)}"
    events = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_id", "event_type")
    )
    updates = events.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_id").alias("last_id"),
            F.max("n_types").alias("n_types"),
        )
    )


O_STREAM_CHECKPOINT = """
SELECT user_id, count(*) AS n_events, max(event_id) AS last_id,
       cast(count(DISTINCT event_type) as int) AS n_types
FROM events GROUP BY user_id
"""
