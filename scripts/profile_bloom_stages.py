"""Decompose the bloom-round's serial floor at 100M: time cumulative
sub-pipelines at a given parallelism. Usage: profile_bloom_stages.py CPUS [SP]
"""

from __future__ import annotations

import json
import os
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
    sp = int(sys.argv[2]) if len(sys.argv) > 2 else cpus
    n_urls = 100_000_000
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_urls // 200}"
    spark = get_spark(
        "bloomstages", master=f"local[{cpus}]", shuffle_partitions=sp,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.driver.memory": "64g"},
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
    bloom = BroadcastBloom.build(seen, n_keys=n_urls // 5)
    out = {"cpus": cpus, "sp": sp}

    def timed(name, df):
        df.count()
        t0 = time.time()
        df.count()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)

    timed("scan_narrow", narrow)
    flagged = bloom.probe(narrow.select("url_hash"))
    maybe = flagged.where(F.col("maybe_seen")).select("url_hash")
    timed("scan_probe", maybe)
    confirmed = maybe.join(seen, "url_hash", "left_semi")
    admitted = narrow.join(confirmed, "url_hash", "left_anti")
    timed("scan_probe_confirm_anti", admitted)
    plan = build_two_phase_plan(admitted, robots, budgets, NOW_EPOCH + 3600, 16)
    timed("full_round", plan)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
