"""Two-phase salted budget rank == naive single-window rank (skew-safe
top-k correctness), plus determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from twawler_spark.operators.budget import fetch_plan


def _scored(spark, n=5000, hosts=7):
    return spark.range(n).select(
        F.concat(F.lit("h"), F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(hosts)).cast("string")).alias("host"),
        F.xxhash64((F.col("id") + 1).cast("string")).alias("url_hash"),
        (F.pmod(F.xxhash64((F.col("id") + 2).cast("string")), F.lit(1000)) / 10.0).alias("expected"),
    )


def _budgets(spark, hosts=7):
    return spark.range(hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        (2 + F.col("id") % 5).cast("int").alias("budget_per_round"),
        F.lit(1).alias("min_delay_s"),
    )


def test_matches_naive_window(spark):
    scored, budgets = _scored(spark), _budgets(spark)
    plan = fetch_plan(scored, budgets, salt_buckets=4)
    naive = (
        scored.join(budgets.select("host", "budget_per_round"), "host")
        .withColumn(
            "fetch_rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("expected").desc(), F.col("url_hash").asc()
                )
            ),
        )
        .where(F.col("fetch_rank") <= F.col("budget_per_round"))
        .drop("budget_per_round")
    )
    got = {(r["host"], r["fetch_rank"]): r["url_hash"] for r in plan.collect()}
    want = {(r["host"], r["fetch_rank"]): r["url_hash"] for r in naive.collect()}
    assert got == want


def test_deterministic_under_repartition(spark):
    scored, budgets = _scored(spark), _budgets(spark)
    a = fetch_plan(scored.repartition(3), budgets, salt_buckets=4).collect()
    b = fetch_plan(scored.repartition(17, "url_hash"), budgets, salt_buckets=8).collect()
    key = lambda rows: sorted((r["host"], r["fetch_rank"], r["url_hash"]) for r in rows)
    assert key(a) == key(b)


def test_respects_budget(spark):
    scored, budgets = _scored(spark), _budgets(spark)
    plan = fetch_plan(scored, budgets, salt_buckets=4)
    per_host = {
        r["host"]: r["n"]
        for r in plan.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    caps = {r["host"]: r["budget_per_round"] for r in budgets.collect()}
    for h, n in per_host.items():
        assert n <= caps[h]
