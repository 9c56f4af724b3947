"""A/B: host dictionary-encoding through the ranking exchanges, 100M.

Times ONE scheduling round (broadcast-anti dedup, so the two ranking
exchanges dominate) with dict_encode_hosts on vs off at a given
parallelism. Usage: python scripts/ab_host_encoding.py <cpus> [n_urls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from twawler_spark.plans.round import build_two_phase_plan
from twawler_spark.session import get_spark
from twawler_spark.synth import NOW_EPOCH


def main():
    cpus = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    n_hosts = max(100, n_urls // 200)
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_hosts}"
    spark = get_spark(
        "ab-hostenc",
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
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    narrow = frontier.where(F.col("state") == "active").select(
        "url_hash", "host", "last_id", "first_id", "reached", "rate_tph",
        "latest_ts", path.alias("__path"),
    )
    adm = narrow.join(F.broadcast(seen), "url_hash", "left_anti")

    host_stats = frontier.where(F.col("state") == "active").groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    out = {"cpus": cpus, "n_urls": n_urls}
    for label, enc, hs in (
        ("adaptive", True, True),
        ("encoded", True, False),
        ("plain", False, False),
    ):
        plan = build_two_phase_plan(
            adm, robots, budgets, NOW_EPOCH + 3600, 16, dict_encode_hosts=enc,
            host_stats=host_stats if hs else None,
        )
        plan.count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            plan.count()
            ts.append(time.time() - t0)
        out[label] = round(min(ts), 2)
        print(f"  {label}: best {out[label]}s of {[round(t,2) for t in ts]}",
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
