"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl-scheduling plan over the
sf0.001 tables; ``queries()``/``oracle_sql()`` expose the operator
suite (SURVEY.md §2 + training-pipeline ops) with DuckDB oracles.
Implementations live in twawler_spark/{entry_queries,training_queries,
streaming}.py; the registry maps names to both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twawler_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl-scheduling pass (score → budget-rank) over a
    frontier derived from the sf0.001 events table — docs planned per
    host. Exercises scan, agg, window, filter, join-free rank path."""
    from pyspark.sql import functions as F

    from twawler_spark.entry_queries import q_crawl_budget_rank

    plan = q_crawl_budget_rank(spark, "/root/testdata/sf0.001")
    return plan.groupBy("host").agg(
        F.count("*").alias("n_scheduled"),
        F.round(F.sum("expected"), 4).alias("sum_expected"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every query above."""
    return dict(ORACLES)
