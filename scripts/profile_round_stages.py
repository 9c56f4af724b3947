"""Cumulative sub-plan timings for one scheduling round at 100M URLs:
where does the time actually go? Each step materializes a strict prefix
of the round's plan (count only — no collect), so step N minus step N-1
approximates that stage's cost.

Usage: python scripts/profile_round_stages.py <cpus> [n_urls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from twawler_spark.operators.admission import gate_robots
from twawler_spark.operators.scoring import score
from twawler_spark.plans.round import build_two_phase_plan
from twawler_spark.session import get_spark
from twawler_spark.synth import NOW_EPOCH


def main():
    cpus = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    n_hosts = max(100, n_urls // 200)
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_hosts}"
    spark = get_spark(
        "prof-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(512 * 1024 * 1024),
            "spark.driver.memory": "48g",
            "spark.sql.files.maxPartitionBytes": str(48 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(32 * 1024 * 1024),
        },
    )
    frontier = spark.read.parquet(f"{root}/frontier_seed")
    seen = spark.read.parquet(f"{root}/seen_seed").select("url_hash")
    budgets = spark.read.parquet(f"{root}/host_budget")
    robots = spark.read.parquet(f"{root}/robots")
    now = NOW_EPOCH + 3600

    out = {"cpus": cpus, "n_urls": n_urls}

    def timed(name, df, reps=2):
        df.count()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df.count()
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 2)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)

    active = frontier.where(F.col("state") == "active")
    # 1. bare scan of the columns the round needs (no url)
    timed("scan_narrow", active.select(
        "url_hash", "host", "last_id", "first_id", "reached", "rate_tph",
        "latest_ts"))
    # 2. + url scan + parse_url path extraction
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    narrow = active.select(
        "url_hash", "host", "last_id", "first_id", "reached", "rate_tph",
        "latest_ts", path.alias("__path"))
    timed("scan_plus_parseurl", narrow.where(F.col("__path").isNotNull()))
    # 3. + broadcast-anti dedup
    adm = narrow.join(F.broadcast(seen), "url_hash", "left_anti")
    timed("plus_dedup_bcast", adm)
    # 4. + score + robots gate (still no exchange)
    gated = gate_robots(score(adm, now), robots, path_col="__path").drop(
        "__path", "rate_tph", "latest_ts")
    timed("plus_score_gate", gated)
    # 5. + stage-A exchange + ONE sort/row_number
    wb = gated.join(
        F.broadcast(budgets.select("host", "budget_per_round")), "host", "left"
    ).withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(16)).cast("int"))
    w_es = Window.partitionBy("host", "__salt").orderBy(
        F.col("expected").desc(), F.col("url_hash").asc())
    one_sort = wb.withColumn("__rne", F.row_number().over(w_es)).where(
        F.col("__rne") <= 10)
    timed("plus_stageA_1sort", one_sort)
    # 6. + second stage-A sort
    w_hs = Window.partitionBy("host", "__salt").orderBy(
        F.col("hours_idle").desc(), F.col("url_hash").asc())
    two_sort = (
        wb.withColumn("__rne", F.row_number().over(w_es))
        .withColumn("__rnh", F.row_number().over(w_hs))
        .where((F.col("__rne") <= 10) | (F.col("__rnh") <= 10))
    )
    timed("plus_stageA_2sorts", two_sort)
    # 7. full plan (adaptive salting)
    host_stats = active.groupBy("host").agg(F.count(F.lit(1)).alias("n_urls"))
    timed("full_plan_adaptive", build_two_phase_plan(
        adm, robots, budgets, now, 16, dict_encode_hosts=True,
        host_stats=host_stats))

    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
