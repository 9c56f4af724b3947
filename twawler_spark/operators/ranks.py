"""Exact global ranks without a single-partition sort.

``Window.orderBy(...)`` with no partition spec executes as ``Exchange
SinglePartition`` + one sorted task — the classic 100 TB scale-killer
(every row funnels through one core). The scale-safe exact equivalent
here is the histogram/two-phase shape the engine already uses for
prefix sums (sequence_packing) and threshold cuts (token_budget_select):

  1. bucket rows by a MONOTONE coarse key derived from the leading sort
     column (by default the column itself — right whenever its distinct
     count is bounded; pass an explicit ``bucket`` expression such as
     ``value DIV 8192`` for wide/continuous keys);
  2. one map-side-combinable ``groupBy(bucket).count()`` plus a running
     sum over the TINY aggregated bucket table gives each bucket's
     prior row count (the only unpartitioned window runs over that
     aggregated list — the sanctioned bounded shape);
  3. a window PARTITIONED BY bucket (distributed) ranks locally;
     global rank = bucket prior + local rank.

Because the bucket is a function of the leading key, equal sort keys
share a bucket, so both SQL ``rank()`` (ties share the smallest
position) and ``row_number()`` (unique keys) compose exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order: list[tuple[str, bool]],
    out_col: str = "rk",
    method: str = "rank",
    bucket: Column | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = exact global rank over ``order``.

    order: [(column_name, ascending)] — real columns of df; the first
    entry is the coarse key the bucketing derives from.
    method: "rank" (SQL competition rank) or "row_number" (positional;
    use only when the order key is unique, where the two coincide).
    bucket: optional monotone function of the leading sort column (same
    direction); defaults to the column itself.
    """
    k1, k1_asc = order[0]
    b = bucket if bucket is not None else F.col(k1)
    df2 = df.withColumn("__b", b)
    cnt = df2.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    wb = W.orderBy(F.col("__b").asc() if k1_asc else F.col("__b").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = cnt.withColumn("__prior", F.sum("__c").over(wb) - F.col("__c")).select(
        "__b", "__prior"
    )
    sort_cols = [(F.col(n).asc() if a else F.col(n).desc()) for n, a in order]
    wl = W.partitionBy("__b").orderBy(*sort_cols)
    local = (
        F.row_number() if method == "row_number" else F.rank()
    ).over(wl).cast("long")
    return (
        df2.join(F.broadcast(cum), "__b")
        .withColumn(out_col, F.col("__prior") + local)
        .drop("__b", "__prior")
    )
