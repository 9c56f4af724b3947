"""Streaming: windowed counts == batch twin; stateful sessionizer ==
batch sessionization (the custom-stateful-operator gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twawler_spark.streaming.ingest import (
    stream_windowed_counts,
    windowed_counts_batch_equivalent,
)
from twawler_spark.streaming.sessions import stream_sessionize

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    got = {tuple(r) for r in stream_windowed_counts(spark, SF).collect()}
    want = {tuple(r) for r in windowed_counts_batch_equivalent(spark, SF).collect()}
    assert got == want
    assert len(got) > 10


def test_stateful_sessionizer_matches_batch(spark):
    sessions = stream_sessionize(spark, SF)
    got = (
        sessions.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got}

    from twawler_spark.entry_queries import q_w_sessionize

    batch = {
        r["user_id"]: r["n_sessions"] for r in q_w_sessionize(spark, SF).collect()
    }
    totals = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
        .collect()
    )
    totals = {r["user_id"]: r["count"] for r in totals}
    assert set(got) == set(batch)
    for uid, (n_sessions, n_events) in got.items():
        assert n_sessions == batch[uid], uid
        assert n_events == totals[uid], uid


def test_stateful_checkpoint_stream(spark):
    sf_dir = SF
    """applyInPandasWithState checkpoint advance equals the batch agg."""
    from pyspark.sql import functions as F

    from twawler_spark.streaming.checkpoints import stream_checkpoint_state

    got = {
        r["user_id"]: (r["n_events"], r["last_id"], r["n_types"])
        for r in stream_checkpoint_state(spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["user_id"]: (r["n"], r["last"], r["nt"])
        for r in e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").alias("last"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }
    assert got == want


def test_stream_near_dup_finds_every_planted_variant(spark):
    """Every streamed mutated doc shares >= 1 LSH band with its own
    original (drop-first-token keeps most 5-gram shingles), so the
    stream-static band join must surface the (X_nd, X) pair for all
    docs long enough to have stable shingles."""
    sf_dir = SF
    from pyspark.sql import functions as F

    from twawler_spark.streaming.ingest import stream_near_dup

    pairs = stream_near_dup(spark, sf_dir)
    self_pairs = pairs.where(
        F.col("nd_doc") == F.concat(F.col("orig_doc"), F.lit("_nd"))
    ).count()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # at the fixture scale every planted pair collides in >= 1 band
    assert self_pairs == n_docs, (self_pairs, n_docs)


def test_stream_host_budget_admits_exactly_budget(spark):
    """Each host admits exactly min(budget, candidates) rows with dense
    ranks from 1, and the admitted set is the lowest event_ids per host."""
    from pyspark.sql import functions as F

    from twawler_spark.streaming.checkpoints import HOST_BUDGET, stream_host_budget

    out = stream_host_budget(spark, SF)
    per_host = out.groupBy("host").agg(
        F.count("*").alias("n"),
        F.min("admit_rank").alias("lo"),
        F.max("admit_rank").alias("hi"),
    )
    avail = {
        r["host"]: r["cnt"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.concat(F.lit("h"), (F.col("event_id") % 50).cast("string")).alias("host"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    rows = per_host.collect()
    assert len(rows) == 50
    for r in rows:
        want = min(HOST_BUDGET, avail[r["host"]])
        assert (r["n"], r["lo"], r["hi"]) == (want, 1, want), r
    # priority order: the admitted set is the LOWEST event_ids per host
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.concat(F.lit("h"), (F.col("event_id") % 50).cast("string")).alias("host"),
        "event_id",
    )
    from pyspark.sql import Window as W

    want = ev.withColumn(
        "rn", F.row_number().over(W.partitionBy("host").orderBy("event_id"))
    ).where(F.col("rn") <= HOST_BUDGET)
    assert out.select("host", "event_id").exceptAll(
        want.select("host", "event_id")
    ).count() == 0
