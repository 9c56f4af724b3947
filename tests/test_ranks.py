"""with_global_rank must equal the single-partition window it replaces."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from twawler_spark.operators.ranks import with_global_rank


@pytest.fixture(scope="module")
def df(spark):
    # skewed keys with heavy ties: k in a small range, unique id tiebreak
    return spark.range(5000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(37)).alias("k"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1000)) / 250.0).alias(
            "x"
        ),
    )


def _as_map(rows, key, val):
    return {r[key]: r[val] for r in rows}


def test_rank_with_ties_matches_window(df):
    want = _as_map(
        df.withColumn("rk", F.rank().over(W.orderBy("k")).cast("long")).collect(),
        "id",
        "rk",
    )
    got = _as_map(
        with_global_rank(df, [("k", True)], "rk", method="rank").collect(),
        "id",
        "rk",
    )
    assert got == want


def test_row_number_unique_key_matches_window(df):
    w = W.orderBy(F.col("k").desc(), F.col("id").asc())
    want = _as_map(
        df.withColumn("rk", F.row_number().over(w).cast("long")).collect(),
        "id",
        "rk",
    )
    got = _as_map(
        with_global_rank(
            df, [("k", False), ("id", True)], "rk", method="row_number"
        ).collect(),
        "id",
        "rk",
    )
    assert got == want


def test_bucketed_continuous_key(df):
    w = W.orderBy(F.col("x").asc(), F.col("id").asc())
    want = _as_map(
        df.withColumn("rk", F.row_number().over(w).cast("long")).collect(),
        "id",
        "rk",
    )
    got = _as_map(
        with_global_rank(
            df,
            [("x", True), ("id", True)],
            "rk",
            method="row_number",
            bucket=F.floor(F.col("x") * 16).cast("long"),
        ).collect(),
        "id",
        "rk",
    )
    assert got == want
