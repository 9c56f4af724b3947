"""Benchmark harness — prints ONE JSON line.

Primary metric (BASELINE.json): frontier URLs scheduled+deduped per
second per scheduling round — the count of active frontier rows pushed
through score → robots gate → seen anti-join → per-host budget rank →
plan emission, divided by round wall time (1 warmup + best of 3 timed
rounds per variant — symmetric; JVM startup and input generation
excluded).

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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from twawler_spark.io_catalog import register_bucketed, write_bucketed
from twawler_spark.operators.admission import admit
from twawler_spark.operators.seen_filter import BroadcastBloom
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
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "dedup_clusters",
    "token_budget_select",
    "text_quality",
    "crawl_round_docs",
    "graph_stats",
    "dsir_select",
    "ccnet_lm_buckets",
    "semdedup",
    "crawl_to_corpus",
    "media_phash_dedup",
    # round-5c tier
    "quality_classifier",
    "dedup_cdc",
    "dedup_containment",
    "boilerplate_strip",
    "recrawl_schedule",
    "warc_ingest",
    "span_corruption",
    "inverted_index_export",
    # round-5d tier
    "crawl_bfs_depth",
    "dust_rules",
    "bpe_merges",
    "graph_hits",
    "corpus_sample",
    "crawl_backlog",
    "dust_apply",
    "host_graph_rank",
    "ivf_balance",
    "word_bursts",
    # round-5e tier
    "anchor_text",
    "interleaved_filter",
    "url_blocklist",
    "opic_priority",
    "mirror_detect",
    # round-5f tier
    "span_dedup",
    "dup_ngram_coverage",
    # round-5g tier
    "weighted_sample",
    "winnow_fingerprint",
    "frontier_shard_balance",
    "fetcher_assignment",
    # round-5h tier
    "redirect_resolve",
    "heavy_hitters",
    "soft404_detect",
    # round-5i tier
    "repopulate_batches",
    "cattweet_lookup",
    # round-5j tier
    "kcore_hosts",
    "host_latency_quantiles",
    "tld_lang_mismatch",
    # round-5k tier
    "span_patterns",
    "politeness_audit",
    "snapshot_diff",
    # round-5l tier
    "hll_distinct",
    "cms_freq",
    # round-5m tier
    "hdr_quantiles",
    "hll_merge_rounds",
    "triangle_hosts",
    # round-5n tier
    "hll_intersect",
    "host_ewma_latency",
    "embed_quantize",
    # round-5o tier
    "kmeans_lloyd",
    "ucb_host_schedule",
    "lsh_s_curve",
    # round-5p tier
    "degree_assortativity",
    "bloom_fpr_audit",
    "stratified_sample",
    # round-5q tier
    "ball2_hosts",
    "span_transitions",
    "index_varint_estimate",
    # round-5r tier
    "wl_host_hash",
    "ring_rebalance",
    "sched_fairness",
    # round-5s tier
    "host_robustness",
    "vocab_growth",
    "priority_rank_corr",
    # round-5t tier
    "topk_overlap_curve",
    "ucb_regret_audit",
    "bigram_branching",
    # round-5u tier
    "link_reciprocity",
    "edge_support",
    "mixture_independence",
    # round-5v tier
    "batch_drift",
    "join_size_estimate",
    "skyline_hosts",
    # round-5w tier
    "seed_coverage_greedy",
    "timeout_sweep",
    "host_rate_shrunk",
    # round-5x tier
    "modularity_audit",
    "source_overlap",
    "crawl_yield_curve",
    # round-5y tier
    "burn_rate_alerts",
    "maxmin_budget_alloc",
    "link_prediction_features",
    # round-5z tier
    "doc_novelty",
    "timing_regularity",
    "link_locality",
    # round-6a tier
    "queue_backlog_lindley",
    "littles_law_audit",
    "weight_sweep_winners",
    # round-6b tier
    "crawl_round2_delta",
    "span_budget_fit",
    "rank_normalize",
    # round-6c tier
    "lsh_config_chooser",
    "span_position_profile",
    "alloc_gini",
    # round-6d tier
    "column_stats_for_encoding",
    "retry_cost_forecast",
    "host_reputation",
    # round-6e tier
    "ks_latency_drift",
    "rich_club",
    "metronome_roc",
    # round-6f tier
    "host_rate_wilson",
    "random_percolation",
    "dedup_keeper_quality",
    # round-6g tier
    "katz3_centrality",
    "page_stitch_detect",
    "theil_sen_slope",
    # round-6h tier
    "equidepth_edges",
    "rate_policy_agreement",
    "export_manifest",
    # round-6i tier
    "session_threshold_sweep",
    "p95_slo_conformance",
    "minhash_estimator_bias",
    # round-6j tier
    "quality_novelty_quadrants",
    "arrival_seasonality",
    "storage_tiering",
    # round-6k tier
    "failure_streaks",
    "postings_intersection",
    "median_ci_rank",
    # round-6l tier
    "bm25_tf_exact",
    "bigram_hit_score",
    "anchor_content_agreement",
    # round-6m tier
    "emd_latency_drift",
    "term_concentration",
    "timeout_retry_cost",
    # round-6n tier
    "media_runs_test",
    "cost_per_doc",
    "id_gap_islands",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_BUCKETS = 64


INPUT_LAYOUT_VERSION = 2  # v2: FRONTIER.path decomposed at generation


def ensure_inputs(spark, n_urls: int, n_hosts: int) -> str:
    root = f"/tmp/twawler_bench/u{n_urls}_h{n_hosts}"
    marker = f"{root}/.complete"
    marker_want = f"v{INPUT_LAYOUT_VERSION}"
    if os.path.exists(marker) and open(marker).read() != marker_want:
        log("stale input layout -> regenerating")
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    if not os.path.exists(marker):
        log(f"generating bench frontier: {n_urls} urls, {n_hosts} hosts -> {root}")
        t0 = time.time()
        # noise=False: canonical URLs straight from JVM expressions — the
        # Arrow canonicalization path is correctness-tested elsewhere and
        # would dominate generation time at 10^7 rows
        write_inputs(spark, root, n_urls, n_hosts, noise=False)
        open(marker, "w").write(marker_want)
        log(f"generated in {time.time()-t0:.1f}s")
    bmarker = f"{root}/.bucketed"
    # marker content encodes the layout contract; a marker written for a
    # different N_BUCKETS or writer version is stale -> rewrite the layout
    from twawler_spark.io_catalog import BUCKET_LAYOUT_VERSION
    bmarker_want = f"v{BUCKET_LAYOUT_VERSION}:n_buckets={N_BUCKETS}"
    if os.path.exists(bmarker) and open(bmarker).read() != bmarker_want:
        log("stale bucketed layout marker -> rewriting bucketed tables")
        os.remove(bmarker)
    if not os.path.exists(bmarker):
        # the production storage layout: frontier AND seen hash-bucketed
        # + sorted on url_hash at write time, so the whole-frontier dedup
        # anti-join is a zero-exchange zero-sort per-bucket merge.
        # repartition(N, key) aligns with bucketBy's murmur3 pmod, so each
        # task holds exactly one bucket -> one file per bucket -> the
        # planner trusts the SORTED BY metadata (no Sort node either).
        log("writing bucketed frontier/seen layout…")
        t0 = time.time()
        for src, name in (("frontier_seed", "frontier_b"), ("seen_seed", "seen_b")):
            write_bucketed(
                spark.read.parquet(f"{root}/{src}"),
                f"{root}/{src}_bucketed",
                f"{name}_gen",
                n_buckets=N_BUCKETS,
            )
        open(bmarker, "w").write(bmarker_want)
        log(f"bucketed in {time.time()-t0:.1f}s")
    register_bucketed(spark, "frontier_b", f"{root}/frontier_seed_bucketed", n_buckets=N_BUCKETS)
    register_bucketed(spark, "seen_b", f"{root}/seen_seed_bucketed", n_buckets=N_BUCKETS)
    return root


def sched_round_once(
    spark,
    root: str,
    bloom: BroadcastBloom | None,
    exact_broadcast: bool = False,
    bucketed: bool = False,
) -> tuple[int, float]:
    """One scheduling round (no fetch, no writes): returns (n_active, sec).

    Production/headline shape at the 10^10 design point (``bucketed``):
    frontier and seen are both stored hash-bucketed + sorted on
    ``url_hash``, so the whole-frontier dedup anti-join is a
    zero-exchange zero-sort per-bucket merge — no shuffle ever touches
    either 10^10-row table, and scaling is bounded only by scan
    bandwidth. The wide ``url`` column is projected away (path
    pre-extracted) BEFORE ranking, so no shuffle carries the URL string.
    Comparison variants: exact SMJ anti-join over unbucketed storage
    (shuffles both sides), exact broadcast anti-join (valid only while
    seen keys fit executor memory — cannot exist at 10^10), and the
    persisted-bloom probe + co-partitioned confirm (the tier built for
    |seen| >> |candidates| admission, timed here for completeness)."""
    if bucketed:
        frontier = spark.table("frontier_b")
        seen = spark.table("seen_b")
    else:
        frontier = spark.read.parquet(f"{root}/frontier_seed")
        seen = spark.read.parquet(f"{root}/seen_seed")
    budgets = spark.read.parquet(f"{root}/host_budget")
    robots = spark.read.parquet(f"{root}/robots")

    t0 = time.time()
    # FRONTIER.path was decomposed at generation: the round never reads
    # the wide url column (the largest column in the table)
    narrow = frontier.where(F.col("state") == "active").select(
        "url_hash", "host", "last_id", "first_id", "reached", "rate_tph",
        "latest_ts", F.col("path").alias("__path"),
    )
    if bloom is None and exact_broadcast:
        admitted = narrow.join(
            F.broadcast(seen.select("url_hash")), "url_hash", "left_anti"
        )
    else:
        admitted = admit(narrow, seen, bloom=bloom, confirm_broadcast=False)
    # adaptive-salt stats: column-pruned scan + partial agg on the
    # frontier (timed inside the round — production maintains these
    # incrementally in the host dim)
    host_stats = frontier.where(F.col("state") == "active").groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    plan = build_two_phase_plan(
        admitted, robots, budgets, NOW_EPOCH + 3600, salt_buckets=16,
        dict_encode_hosts=True, host_stats=host_stats,
    )
    n_planned = plan.count()
    dt = time.time() - t0
    n_active = frontier.where(F.col("state") == "active").count()
    log(f"  round: {n_active} active -> {n_planned} planned in {dt:.2f}s "
        f"(bloom={'on' if bloom else 'off'}, bcast={exact_broadcast}, "
        f"bucketed={bucketed})")
    return n_active, dt


IVF_N = 500_000
IVF_DIM = 64
IVF_CELLS = 256  # centroid_mod = IVF_N // IVF_CELLS -> ~256 cells
IVF_NPROBE = 4


def _ivf_synth(spark, n: int):
    """Deterministic n x IVF_DIM float corpus (hash-derived, no RNG)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(IVF_DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * IVF_DIM + i), F.lit(2000)) / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )


def bench_ivf_storage(spark) -> dict[str, float]:
    """The IVF scale path, measured: corpus stored PARTITIONED BY cell,
    so probing n_probe cells is parquet partition pruning — the scan
    reads ~n_probe/C of the data. Times the pruned probe against the
    full-scan exact re-rank on the same storage and logs the pruning
    ratio. Corpus is deterministic and cached under /tmp/twawler_bench
    (one-time write, like the frontier inputs)."""
    from twawler_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_probe_cells,
    )

    centroid_mod = IVF_N // IVF_CELLS
    root = f"/tmp/twawler_bench/ivf_{IVF_N}x{IVF_DIM}_c{IVF_CELLS}"
    marker = f"{root}/.complete"
    if not os.path.exists(marker):
        log(f"writing cell-partitioned IVF corpus: {IVF_N}x{IVF_DIM}, "
            f"~{IVF_CELLS} cells -> {root}")
        t0 = time.time()
        corpus = _ivf_synth(spark, IVF_N)
        cents = ivf_centroids(corpus, centroid_mod)
        cells = ivf_assign(corpus, cents)
        corpus.join(cells, "vec_id").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(f"{root}/corpus_by_cell")
        open(marker, "w").write("v1")
        log(f"ivf corpus written in {time.time()-t0:.1f}s")
    stored = spark.read.parquet(f"{root}/corpus_by_cell")
    queries = _ivf_synth(spark, IVF_N).where(
        F.pmod(F.col("vec_id"), F.lit(IVF_N // 16)) == 17
    )
    cents = ivf_centroids(_ivf_synth(spark, IVF_N), centroid_mod)
    probes = ivf_probe_cells(queries, cents, n_probe=IVF_NPROBE)
    probed_cells = [r["cell"] for r in probes.select("cell").distinct().collect()]

    def topk(cand_corpus):
        qv = queries.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("__qv")
        )
        pairs = cand_corpus.join(F.broadcast(qv), F.col("q_id") != F.col("vec_id"))
        dot = F.aggregate(
            F.zip_with(
                F.col("__qv"), F.col("embedding"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(
            F.col("__dot").desc(), F.col("vec_id").asc()
        )
        return (
            pairs.withColumn("__dot", dot)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= 5)
        )

    # warmup + best-of-2 each, symmetric
    pruned_df = topk(stored.where(F.col("cell").isin(probed_cells)))
    full_df = topk(stored)
    pruned_df.count(), full_df.count()

    def best_of_2(df):
        times = []
        for _ in range(2):
            t0 = time.time()
            df.count()
            times.append(time.time() - t0)
        return min(times)

    t_pruned = best_of_2(pruned_df)
    t_full = best_of_2(full_df)
    n_read = stored.where(F.col("cell").isin(probed_cells)).count()
    ratio = n_read / IVF_N
    log(f"  ivf storage: pruned probe {t_pruned:.2f}s vs full scan "
        f"{t_full:.2f}s; rows read {n_read}/{IVF_N} = {ratio:.3f} "
        f"({len(probed_cells)} cells probed)")
    return {
        "ivf_probe_pruned": round(t_pruned, 3),
        "ivf_full_scan": round(t_full, 3),
        "ivf_pruning_ratio": round(ratio, 4),
    }


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "4000000"))
    n_hosts = max(100, n_urls // 200)
    # Confs scale with the INPUT, not just the core count. The 100M-URL
    # sweep wants many small tasks (stage tails idle a bounded fraction of
    # the machine; AQE coalesces the excess), but at the driver's 4M-URL
    # config those same knobs add fixed per-task scheduling overhead to
    # ~3-second rounds and regress the headline (r2: 1.11M -> 680k
    # urls/sec). Below the 10M-URL tier, use one shuffle partition per
    # core and the default 128 MB splits (the r1-proven values).
    big_input = n_urls >= 10_000_000
    if big_input:
        # 4x cores: a straggler task idles 1/(4*cpus) of capacity instead
        # of 1/cpus; smaller splits keep task counts well above core count
        # at every level of a scaling pair (proportional at N and 4N).
        size_conf = {
            "spark.sql.files.maxPartitionBytes": str(48 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(32 * 1024 * 1024),
        }
        shuffle_parts = 4 * cpus
    else:
        size_conf = {
            "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 * 1024 * 1024),
        }
        shuffle_parts = cpus
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
        # seen keys at 20% of the frontier fit a (raised) broadcast: the
        # exact dedup tier then needs no shuffle at all. On a cluster the
        # same conf trades executor memory for shuffle elimination.
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": str(512 * 1024 * 1024),
                    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
                    **size_conf,
                    # safe because ensure_inputs writes EXACTLY one file
                    # per bucket (repartition(N, key) aligned with
                    # bucketBy's hash): the bucketed scan then reports
                    # its SORTED BY ordering and the co-bucketed
                    # anti-join needs neither Exchange nor Sort
                    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"},
    )

    root = ensure_inputs(spark, n_urls, n_hosts)

    # ------------------------------------------------- scheduling round
    # Protocol: every variant gets exactly 1 warmup (codegen + worker
    # spawn) + 3 timed rounds, best-of-3 — symmetric across variants so
    # no variant gets extra draws against sandbox timing noise.
    seen_for_bloom = spark.read.parquet(f"{root}/seen_seed").select("url_hash")
    t0 = time.time()
    n_seen = seen_for_bloom.count()
    round_bloom = BroadcastBloom.build(seen_for_bloom, n_keys=n_seen)
    log(f"persisted seen-filter (one-time bootstrap build): {n_seen} keys, "
        f"{round_bloom.m_bits >> 23} MiB in {time.time()-t0:.1f}s")
    K_TIMED = 3
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    log("warmup…")
    sched_round_once(spark, root, round_bloom)
    times_bloom, n_active = [], 0
    for _ in range(K_TIMED):
        n_active, dt = sched_round_once(spark, root, round_bloom)
        times_bloom.append(dt)
    sched_round_once(spark, root, None)
    dt_smj = min(sched_round_once(spark, root, None)[1] for _ in range(K_TIMED))
    # production storage layout: co-bucketed anti-join, no exchange/sort
    sched_round_once(spark, root, None, bucketed=True)
    dt_bucketed = min(
        sched_round_once(spark, root, None, bucketed=True)[1] for _ in range(K_TIMED)
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))
    sched_round_once(spark, root, None, exact_broadcast=True)
    dt_bcast = min(
        sched_round_once(spark, root, None, exact_broadcast=True)[1]
        for _ in range(K_TIMED)
    )
    # headline = the engine's storage/tier choice: fastest correct
    # variant at THIS scale. The co-bucketed layout is the production
    # answer for whole-frontier dedup (zero-shuffle at any scale); bloom
    # is the per-round admission tier (|seen| >> |candidates|).
    med = min(min(times_bloom), dt_smj, dt_bcast, dt_bucketed)
    throughput = n_active / med

    # -------------------------------- admission at the 10^10-seen shape
    # seen = EVERY frontier key (the tracked set); candidates = ~2% of
    # the frontier's volume of fresh outlinks, half already-seen. This is
    # run_round's per-round admission: |seen| >> |candidates|, where the
    # exact anti-join must shuffle the full seen-set but the persisted
    # bloom only scans it (confirm pass) — the tier the filter exists for.
    # at the 10^10 design point the seen keys are ~80 GB — no broadcast
    # tier exists for the exact join, so pin the at-scale plan (SMJ)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    frontier = spark.read.parquet(f"{root}/frontier_seed")
    seen_big = frontier.select("url_hash")
    cands = (
        frontier.where(F.pmod(F.col("url_hash"), F.lit(100)) == 7)
        .select("url_hash")
        .unionByName(
            spark.range(n_urls // 100).select(
                F.xxhash64(F.concat(F.lit("fresh"), F.col("id").cast("string"))).alias("url_hash")
            )
        )
    ).localCheckpoint(eager=True)

    from twawler_spark.operators.admission import admit as admit_op

    t0 = time.time()
    bloom = BroadcastBloom.build(seen_big, n_keys=n_urls)
    log(f"one-time persisted-filter build: {n_urls} keys, "
        f"{bloom.m_bits >> 23} MiB in {time.time()-t0:.1f}s")
    t0 = time.time()
    bloom.update(
        spark.range(n_urls // 100).select(
            F.xxhash64(F.concat(F.lit("delta"), F.col("id").cast("string"))).alias("url_hash")
        ),
        n_delta=n_urls // 100,
    )
    update_dt = time.time() - t0
    log(f"bloom delta update (1% of frontier): {update_dt:.2f}s")

    # warmup both variants (python-UDF worker spawn, code paths), then time
    cands.join(seen_big, "url_hash", "left_anti").count()
    admit_op(cands, seen_big, bloom=bloom).count()
    t0 = time.time()
    n_admit_exact = cands.join(seen_big, "url_hash", "left_anti").count()
    admit_exact_dt = time.time() - t0
    log(f"admit exact anti-join (SMJ): {n_admit_exact} admitted in {admit_exact_dt:.2f}s")
    t0 = time.time()
    n_admit_bloom = admit_op(cands, seen_big, bloom=bloom).count()
    admit_bloom_dt = time.time() - t0 + update_dt
    log(f"admit bloom probe+confirm (+delta update): {n_admit_bloom} admitted "
        f"in {admit_bloom_dt:.2f}s")
    assert n_admit_bloom == n_admit_exact, "bloom admission must equal exact"

    # cuckoo tier: same broadcast probe protocol, uint16 fingerprints —
    # ~80x lower fpp shrinks the exact-confirm remainder, and the table
    # supports in-place retraction (no rebuild on purge/retry sweeps).
    # The timed arm includes a 0.1%-of-frontier delete+reinsert cycle,
    # the per-round retraction cost the Bloom tier cannot express.
    from twawler_spark.operators.cuckoo_filter import BroadcastCuckoo

    t0 = time.time()
    cuckoo = BroadcastCuckoo.build(seen_big, n_keys=n_urls)
    log(f"one-time cuckoo build: {n_urls} keys, "
        f"{cuckoo.table.nbytes >> 20} MiB in {time.time()-t0:.1f}s")
    retract = (
        frontier.where(F.pmod(F.col("url_hash"), F.lit(1000)) == 3)
        .select("url_hash").toPandas()["url_hash"].to_numpy()
    )
    t0 = time.time()
    cuckoo.delete_keys(retract)
    cuckoo.insert_keys(retract)
    retract_dt = time.time() - t0
    log(f"cuckoo retract+reinsert ({len(retract)} keys): {retract_dt:.2f}s")
    admit_op(cands, seen_big, bloom=cuckoo).count()
    t0 = time.time()
    n_admit_cuckoo = admit_op(cands, seen_big, bloom=cuckoo).count()
    admit_cuckoo_dt = time.time() - t0 + retract_dt
    log(f"admit cuckoo probe+confirm (+retraction cycle): {n_admit_cuckoo} "
        f"admitted in {admit_cuckoo_dt:.2f}s")
    assert n_admit_cuckoo == n_admit_exact, "cuckoo admission must equal exact"

    # sharded-cogroup tier: the >=10^9-key path where the filter no longer
    # broadcasts (~15 GB of bits at 10^10) — co-partitioned shard probe,
    # shuffle-join confirm. Benchmarked at the same shape so the tier
    # choice is measured, not asserted.
    from twawler_spark.operators.seen_filter import build_sharded_bloom

    t0 = time.time()
    sharded = build_sharded_bloom(seen_big, n_buckets=4 * cpus)
    sharded.shards.persist()
    sharded.shards.count()
    sharded_build_dt = time.time() - t0
    log(f"one-time sharded-filter build: {n_urls} keys, {4 * cpus} shards "
        f"in {sharded_build_dt:.2f}s")
    admit_op(cands, seen_big, bloom=sharded).count()
    t0 = time.time()
    n_admit_sharded = admit_op(cands, seen_big, bloom=sharded).count()
    admit_sharded_dt = time.time() - t0
    log(f"admit sharded cogroup probe+confirm: {n_admit_sharded} admitted "
        f"in {admit_sharded_dt:.2f}s")
    assert n_admit_sharded == n_admit_exact, "sharded admission must equal exact"
    sharded.shards.unpersist()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))

    queries: dict[str, float] = {
        "sched_round_bloom": round(min(times_bloom), 3),
        "sched_round_exact": round(dt_smj, 3),
        "sched_round_exact_bcast": round(dt_bcast, 3),
        "sched_round_bucketed": round(dt_bucketed, 3),
        "sched_round_headline": round(med, 3),
        "admit_seenbig_exact": round(admit_exact_dt, 3),
        "admit_seenbig_bloom": round(admit_bloom_dt, 3),
        "admit_seenbig_cuckoo": round(admit_cuckoo_dt, 3),
        "admit_seenbig_sharded": round(admit_sharded_dt, 3),
        "bloom_delta_update": round(update_dt, 3),
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_QUERIES") != "1":
        queries.update(bench_ivf_storage(spark))

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
