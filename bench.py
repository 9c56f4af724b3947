"""Benchmark harness — prints ONE JSON line.

Primary metric (BASELINE.json): frontier URLs scheduled+deduped per
second per scheduling round — the count of active frontier rows pushed
through score → robots gate → seen anti-join → per-host budget rank →
plan emission, divided by round wall time (median of 3 warm
iterations, JVM startup and input generation excluded).

Also times the headline operator queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_CPUS        parallelism (default 32) -> local[N]
  SPARK_GRAFT_SF_DIR      driver-table dir for query timings
  SPARK_GRAFT_BENCH_URLS  synthetic frontier size (default 4_000_000)
  SPARK_GRAFT_BENCH_SKIP_QUERIES  "1" -> scheduling bench only
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from twawler_spark.operators.admission import admit
from twawler_spark.operators.seen_filter import build_sharded_bloom
from twawler_spark.plans.round import build_two_phase_plan
from twawler_spark.session import get_spark
from twawler_spark.synth import NOW_EPOCH, write_inputs

HEADLINE_QUERIES = (
    "crawl_budget_rank",
    "q1_pricing_summary",
    "j1_pair_selfjoin",
    "j8_synchrotrap",
    "a7_interval_stats",
    "w5_running_max",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "ann_cosine_topk",
    "text_quality",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_inputs(spark, n_urls: int, n_hosts: int) -> str:
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_hosts}"
    marker = f"{root}/.complete"
    if not os.path.exists(marker):
        log(f"generating bench frontier: {n_urls} urls, {n_hosts} hosts -> {root}")
        t0 = time.time()
        # noise=False: canonical URLs straight from JVM expressions — the
        # Arrow canonicalization path is correctness-tested elsewhere and
        # would dominate generation time at 10^7 rows
        write_inputs(spark, root, n_urls, n_hosts, noise=False)
        open(marker, "w").write("ok")
        log(f"generated in {time.time()-t0:.1f}s")
    return root


def sched_round_once(spark, root: str, use_bloom: bool) -> tuple[int, float]:
    """One scheduling round (no fetch, no writes): returns (n_active, sec)."""
    frontier = spark.read.parquet(f"{root}/frontier_seed")
    seen = spark.read.parquet(f"{root}/seen_seed")
    budgets = spark.read.parquet(f"{root}/host_budget")
    robots = spark.read.parquet(f"{root}/robots")

    t0 = time.time()
    active = frontier.where(F.col("state") == "active")
    bloom = build_sharded_bloom(seen, n_buckets=64) if use_bloom else None
    admitted = admit(active, seen, bloom=bloom)
    plan = build_two_phase_plan(
        admitted, robots, budgets, NOW_EPOCH + 3600, salt_buckets=16
    )
    n_planned = plan.count()
    dt = time.time() - t0
    n_active = active.count()
    log(f"  round: {n_active} active -> {n_planned} planned in {dt:.2f}s "
        f"(bloom={use_bloom})")
    return n_active, dt


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "4000000"))
    n_hosts = max(100, n_urls // 200)
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    root = ensure_inputs(spark, n_urls, n_hosts)

    # scheduling bench: 1 warmup + 3 timed, median
    log("warmup…")
    sched_round_once(spark, root, use_bloom=False)
    times_exact, n_active = [], 0
    for _ in range(3):
        n_active, dt = sched_round_once(spark, root, use_bloom=False)
        times_exact.append(dt)
    _, bloom_dt = sched_round_once(spark, root, use_bloom=True)
    med = statistics.median(times_exact)
    throughput = n_active / med

    queries: dict[str, float] = {
        "sched_round_exact": round(med, 3),
        "sched_round_bloom": round(bloom_dt, 3),
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_QUERIES") != "1":
        from twawler_spark.registry import QUERIES

        for name in HEADLINE_QUERIES:
            t0 = time.time()
            n = QUERIES[name](spark, sf_dir).count()
            queries[name] = round(time.time() - t0, 3)
            log(f"  query {name}: {n} rows in {queries[name]}s")

    out = {
        "metric": "frontier_urls_scheduled_plus_deduped_per_sec",
        "value": round(throughput, 1),
        "unit": "urls/sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "config": {
            "cpus": cpus,
            "frontier_urls": n_urls,
            "hosts": n_hosts,
            "n_active": n_active,
            "iterations": 3,
        },
    }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
