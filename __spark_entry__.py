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
    """Flagship: one REAL scheduling round (score → robots gate →
    salted two-phase budget rank → deterministic fetch) over a frontier
    derived from the sf0.001 events table — fetched documents per host.
    This is the engine's own plan path (plans/round.py
    build_two_phase_plan + plans/fetcher.py), not a simplified twin."""
    from pyspark.sql import functions as F

    from twawler_spark.crawl_queries import q_crawl_round_docs

    docs = q_crawl_round_docs(spark, "/root/testdata/sf0.001")
    return docs.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_spans").alias("n_spans"),
        F.countDistinct("url_hash").alias("n_urls_fetched"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every query above."""
    return dict(ORACLES)
