"""One-off: time the scheduling round's dedup variants at 100M URLs,
local[8] vs local[32], to pick the headline plan and quantify scaling.

Usage: python scripts/profile_round_100m.py <cpus> [n_urls]
Prints one JSON line: {"cpus": N, "variant": sec, ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from twawler_spark.operators.seen_filter import BroadcastBloom
from twawler_spark.plans.round import build_two_phase_plan
from twawler_spark.session import get_spark
from twawler_spark.synth import NOW_EPOCH


def main():
    cpus = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    n_hosts = max(100, n_urls // 200)
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_hosts}"
    spark = get_spark(
        "prof100m",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(512 * 1024 * 1024),
            "spark.driver.memory": "64g",
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

    def plan_of(adm):
        return build_two_phase_plan(adm, robots, budgets, NOW_EPOCH + 3600, 16)

    out = {"cpus": cpus, "n_urls": n_urls}

    def timed(name, df, reps=2):
        df.count()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df.count()
            ts.append(time.time() - t0)
        out[name] = round(statistics.median(ts), 2)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)

    # 1. broadcast anti (seen keys fit the raised threshold)
    timed("round_bcast", plan_of(narrow.join(F.broadcast(seen), "url_hash", "left_anti")))

    # 2. SMJ anti (the no-broadcast-tier plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("round_smj", plan_of(narrow.join(seen, "url_hash", "left_anti")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))

    # 3. persisted bloom probe + SMJ confirm (maybe-set is ~20% here, too
    #    big to broadcast-confirm; production outlink admission uses the
    #    broadcast confirm because its candidate set is plan-bounded)
    t0 = time.time()
    bloom = BroadcastBloom.build(seen, n_keys=n_urls // 5)
    print(f"  bloom build: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    flagged = bloom.probe(narrow.select("url_hash"))
    maybe = flagged.where(F.col("maybe_seen")).select("url_hash")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    confirmed = maybe.join(seen, "url_hash", "left_semi")
    admitted = narrow.join(confirmed, "url_hash", "left_anti")
    timed("round_bloom", plan_of(admitted))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))

    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
