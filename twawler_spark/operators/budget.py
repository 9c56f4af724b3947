"""Per-host politeness budget ranking — skew-safe top-k per host.

Reference: each crawl phase takes the top-N of the ``frequences`` queue
(dumpall.py:106-117, ``--crawl-expected`` / ``--crawl-late``) and the
rate-limit ledger gates the phases (limits.py:36-86). Here the budget is
a per-host row limit applied to the scored frontier.

A naive ``row_number() over (partition by host order by expected desc)``
serializes each host into one task — the north rule's hot-domain skew
case (log-uniform host popularity means the top host can hold a large
fraction of all URLs). Instead, a two-phase ranked take:

  phase 1: partition by (host, salt=pmod(url_hash, S)) — every host's
           candidates split across S parallel tasks; keep per-salt
           top-budget. Correct because the global per-host top-B is a
           subset of the union of per-salt top-Bs.
  phase 2: partition by host over the ≤ S*B survivors — tiny.

Tie-break is (expected DESC, url_hash ASC) everywhere so the plan is a
deterministic function of the snapshot — the property the ordering-
equality test vs the sequential simulator relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_plan(
    scored: DataFrame,
    host_budget: DataFrame,
    salt_buckets: int = 16,
    order_col: str = "expected",
    default_budget: int = 4,
) -> DataFrame:
    """Top-``budget_per_round`` rows per host by ``order_col``.

    Output = input columns + ``fetch_rank`` (1-based per host).
    """
    with_budget = scored.join(
        F.broadcast(host_budget.select("host", "budget_per_round")), "host", "left"
    ).withColumn(
        "budget_per_round",
        F.coalesce(F.col("budget_per_round"), F.lit(default_budget)),
    )
    order = [F.col(order_col).desc(), F.col("url_hash").asc()]
    pre = (
        with_budget.withColumn(
            "__salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
        )
        .withColumn(
            "__rn1", F.row_number().over(Window.partitionBy("host", "__salt").orderBy(*order))
        )
        .where(F.col("__rn1") <= F.col("budget_per_round"))
        .drop("__rn1", "__salt")
    )
    plan = (
        pre.withColumn(
            "fetch_rank", F.row_number().over(Window.partitionBy("host").orderBy(*order))
        )
        .where(F.col("fetch_rank") <= F.col("budget_per_round"))
        .drop("budget_per_round")
    )
    return plan
