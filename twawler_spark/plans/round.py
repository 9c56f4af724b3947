"""One scheduling round — the flagship batch job.

Rebuild of the reference's 4-phase crawl cycle
(scripts/crawl-tweets.sh:37-160): score -> schedule under per-host
budget -> fetch -> classify/transition -> discover/admit, as ONE Spark
batch over snapshot tables. Plan shape per round:

  frontier snapshot (scan, pruned)           [parquet min-max on state]
    -> score                                  [column exprs, codegen]
    -> robots gate                            [broadcast join + exists()]
    -> per-host budget rank                   [two-phase salted window]
    -> fetch                                  [grouped Arrow UDF, ≤ Σbudgets rows]
    -> documents append (dedup doc_id)        [hash agg]
    -> outlink discovery -> seen filter       [persisted broadcast bloom probe
                                               + scan-only confirm; sharded
                                               cogroup tier beyond ~10^9 keys]
    -> state MERGE + snapshot write           [broadcast join, atomic manifest]

Per-round counters ride Observations on the round's own writes and
eager checkpoints — zero standalone count() jobs (the r1 scaling fix).

State machine (reference utils.py:351-446 set-mutation protocol):
  404 -> dead: row leaves the frontier, url_hash joins ``seen`` as
  'dead' (bury, utils.py:430-446). 403/429 -> protected/suspended with
  TTL revival after REVIVE_TTL_ROUNDS (utils.py:369-412 self-expiring
  checks). 200 -> checkpoint advance (dumpall.py:83-87).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..io_catalog import Catalog
from ..operators.admission import admit, gate_robots
from ..operators.budget import fetch_plan
from ..operators.scoring import score
from ..operators.seen_filter import BroadcastBloom
from ..schemas import FRONTIER
from ..synth import NOW_EPOCH
from .fetcher import discover_outlinks, fetch_documents, fetch_results

REVIVE_TTL_ROUNDS = 3
ROUND_SECONDS = 3600
BLOOM_REBUILD_FACTOR = 4


def _count_obs() -> tuple[Observation, F.Column]:
    return Observation(), F.count(F.lit(1)).alias("n")


def bloom_prefix(catalog: Catalog, round_no: int) -> str:
    return f"{catalog.root}/bloom/{round_no}"


def round_now_epoch(round_no: int) -> int:
    return NOW_EPOCH + round_no * ROUND_SECONDS


@dataclass
class RoundStats:
    round: int
    n_active: int
    n_scheduled: int
    n_docs: int
    n_candidates: int
    n_admitted: int
    n_dead: int
    n_frontier: int
    n_seen: int

    def as_rows(self):
        return [
            (self.round, k, int(v))
            for k, v in vars(self).items()
            if k != "round"
        ]


COMPACT_EVERY = 4  # frontier compaction cadence (rounds)


def read_frontier(catalog: Catalog, upto_round: int) -> DataFrame:
    """Current frontier as of ``upto_round``: latest compaction snapshot
    + versioned deltas (SCD2 current view — Iceberg MERGE semantics on
    the parquet fallback).

    Per-round frontier writes are O(|changed rows|) (fetched, revived,
    admitted, dead-tombstoned), not O(|frontier|); every COMPACT_EVERY
    rounds the view is materialized so the delta chain stays bounded.
    The read plan is scale-friendly: the window runs only over the
    SMALL delta union; the base is touched by one anti-join against the
    changed-key set (broadcastable — it's bounded by rounds×plan size).
    """
    comps = [r for r in catalog.compaction_rounds("frontier") if r <= upto_round]
    base_round = comps[-1]
    base = catalog.read_snapshot("frontier", base_round)
    if base_round == upto_round:
        return base
    deltas = catalog.read_appended("frontier_v").where(
        (F.col("round") > base_round) & (F.col("round") <= upto_round)
    )
    w = Window.partitionBy("url_hash").orderBy(F.col("round").desc())
    latest = (
        deltas.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(latest.select("url_hash"), "url_hash", "left_anti")
    keep = latest.where(F.col("op") == "upsert").select(
        [f.name for f in FRONTIER.fields]
    )
    return survivors.select([f.name for f in FRONTIER.fields]).unionByName(keep)


def expire_frontier_history(catalog: Catalog) -> list[int]:
    """Drop manifests/snapshots/deltas older than the latest compaction
    (safe: reads only ever need the latest compaction + later deltas)."""
    import shutil

    comps = catalog.compaction_rounds("frontier")
    latest_comp = comps[-1]
    expired = [r for r in catalog.committed_rounds("frontier") if r < latest_comp]
    for r in expired:
        os.remove(catalog._manifest_path("frontier", r))
        shutil.rmtree(catalog._snap_dir("frontier", r), ignore_errors=True)
        shutil.rmtree(f"{catalog.root}/frontier_v/data/round={r}", ignore_errors=True)
    return expired


def read_seen(catalog: Catalog, upto_round: int) -> DataFrame:
    """The seen-set as of ``upto_round`` — union of per-round DELTAS.

    The seen table is append-only (each round adds only its newly
    tracked/dead keys), so the per-round write is O(|delta|), not
    O(|seen|) — at the 10^10 design point rewriting the full set every
    round would dominate. Crash safety: deltas beyond the last COMMITTED
    frontier round are excluded by the ``round <= upto_round`` filter,
    so a partial append from a killed round is invisible until its
    frontier manifest commits.
    """
    return catalog.read_appended("seen").where(F.col("round") <= upto_round)


def bootstrap(
    catalog: Catalog,
    frontier_seed: DataFrame,
    seen_seed: DataFrame,
    build_bloom: bool = True,
) -> None:
    """Round-0 state: seen = seed sets ∪ all tracked frontier keys;
    frontier rows already in a seed set are not tracked (can_follow).

    The persisted seen-filter is built HERE, once, from the full set
    (distributed sharded build + treeAggregate merge); every later round
    only ORs in its delta — never an O(|seen|) rebuild."""
    seed_keys = seen_seed.select("url_hash").distinct()
    fresh = frontier_seed.join(seed_keys, "url_hash", "left_anti")
    # rows already in a terminal state belong in the sets, not the frontier
    # (cemetery/ignored are separate collections in the reference)
    frontier0 = fresh.where(~F.col("state").isin("dead", "ignored"))
    seen0 = seen_seed.unionByName(
        fresh.select(
            "url_hash",
            F.when(F.col("state").isin("dead", "ignored"), F.col("state"))
            .otherwise(F.lit("tracked"))
            .alias("set_name"),
            F.lit(0).alias("added_round"),
        )
    )
    obs, n = _count_obs()
    catalog.append(seen0.observe(obs, n), "seen", 0)
    n_seen = int(obs.get["n"])
    catalog.commit_round("seen", 0, n_seen)
    if build_bloom:
        bloom = BroadcastBloom.build(
            read_seen(catalog, 0).select("url_hash"), n_keys=n_seen
        )
        bloom.save(bloom_prefix(catalog, 0))
    catalog.write_snapshot(frontier0, "frontier", 0)


def build_two_phase_plan(
    active: DataFrame,
    robots: DataFrame,
    budgets: DataFrame,
    now: int,
    salt_buckets: int = 16,
    default_budget: int = 4,
    default_late_budget: int = 2,
    dict_encode_hosts: bool = False,
    host_stats: DataFrame | None = None,
    hot_threshold: int = 5000,
) -> DataFrame:
    """The per-round scheduling plan (crawl-tweets.sh phases 1+2):
    score → robots gate → per-host budget rank by ``expected`` (phase 1),
    then the leftover ranked by staleness at half budget (--crawl-late).

    Shuffle discipline (the 100 TB shape): exactly TWO exchanges touch
    the candidate set —
      stage A: partition by (host, salt); BOTH phase orders are
        row_number'd in one pass (two sorts, one exchange); per-salt
        keep expected-rank <= B and staleness-rank <= B + B_late (the
        +B covers late winners displaced by phase-1 picks), so the
        survivor set per host is <= salt_buckets*(2B + B_late);
      stage B: partition by host over the survivors only; phase-1 =
        expected-rank <= B; the late pool is a FILTER (not an
        anti-join — no url_hash re-shuffle of the full set) and its
        staleness window reuses stage B's partitioning.
    Tie-breaks are (order DESC, url_hash ASC) throughout, keeping the
    plan a deterministic function of the snapshot.

    The URL string itself stays OUT of the ranking pipeline (it is the
    widest column and no plan consumer needs it — the fetch stage keys
    on url_hash/host; a production fetcher resolves the string by
    joining the tiny plan back to the frontier on url_hash). Robots
    gating therefore evaluates the path BEFORE the projection.

    ``dict_encode_hosts``: additionally dictionary-encode the host
    string into a dense int for the two ranking exchanges (the host
    name is the second-widest column; ~20 bytes -> 8 through every
    shuffle and a cheaper partitioner hash), restoring the string on
    the SMALL plan output via a broadcast join. Sound only when
    ``budgets`` covers every frontier host — which the engine
    guarantees by design: the politeness/budget table IS the host
    dimension (per-host crawl state must exist for every host admitted
    to the frontier), so callers that own the budget table set this.
    If ``budgets`` already carries a ``host_id`` column it is used
    as-is; otherwise a deterministic dense id is derived once over the
    tiny dim.

    ``host_stats`` (host, n_urls — per-host frontier row counts, e.g.
    maintained incrementally in the host dimension, or one column-pruned
    scan+partial-agg) turns the salting ADAPTIVE: only hosts above
    ``hot_threshold`` rows get ``salt_buckets``-way salting; cold hosts
    rank in a single stage-A bucket. With uniform salting and ~B rows
    kept per (host, salt), a host with fewer than ``salt_buckets * (2B
    + B_late)`` rows is not pruned AT ALL by stage A, so stage B
    re-shuffles nearly the whole candidate set (measured at 100M URLs /
    500k hosts: ~80M of 92M rows survive stage A). Adaptive salting
    prunes every cold host to ~2B+B_late rows in stage A — stage B's
    exchange and sorts then touch only ~1/10 the rows — while hot hosts
    (the log-uniform head) keep full skew protection. Stage A's
    per-bucket top-B keep is a superset of the per-host top-B for ANY
    bucket count, so results are bit-identical.
    """
    narrow = ["url_hash", "host", "last_id", "first_id",
              "reached", "rate_tph", "latest_ts"]
    if "__path" in active.columns:  # caller already projected the url away
        sched_cols = [F.col(c) for c in narrow] + [F.col("__path")]
    elif "path" in active.columns:
        # FRONTIER.path: decomposed once at admission — the scan never
        # reads the wide url column at all (biggest column in the table)
        sched_cols = [F.col(c) for c in narrow] + [F.col("path").alias("__path")]
    else:
        path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
        sched_cols = [F.col(c) for c in narrow] + [path.alias("__path")]
    scored = score(active.select(*sched_cols), now)
    # rate_tph/latest_ts are consumed by score(); __path by the robots
    # gate — none of them may ride the ranking shuffles and sorts.
    # first_id/reached are pure passengers (no ranking consumer): pack
    # them into ONE long for the exchanges and unpack on the small plan
    # output. FRONTIER.first_id is nullable (schemas.py) — a plain
    # first_id*2+reached would go NULL and drag the non-null reached bit
    # with it, so bit 1 carries an explicit null flag:
    #   coalesce(first_id,0)*4 | is_null<<1 | reached   (ids < 2^61)
    gated = (
        gate_robots(scored, robots, path_col="__path")
        .withColumn(
            "__fi_r",
            F.coalesce(F.col("first_id"), F.lit(0)) * 4
            + F.col("first_id").isNull().cast("long") * 2
            + F.col("reached").cast("long"),
        )
        .drop("__path", "rate_tph", "latest_ts", "first_id", "reached")
    )
    if host_stats is not None:
        hot = (
            host_stats.where(F.col("n_urls") > hot_threshold)
            .select("host", F.lit(True).alias("__hot"))
        )
        gated = gated.join(F.broadcast(hot), "host", "left")
    if dict_encode_hosts:
        if "host_id" in budgets.columns:
            dim = budgets.select("host", "host_id", "budget_per_round")
        else:
            # one tiny single-partition window over the dim (n_hosts
            # rows); at 10^8+ hosts ship a precomputed host_id instead
            dim = budgets.select("host", "budget_per_round").withColumn(
                "host_id", F.row_number().over(Window.orderBy("host")).cast("long")
            )
        # budgets must cover every frontier host under dict encoding —
        # a miss would leave host_id NULL and silently merge all such
        # hosts into ONE ranking partition (and a NULL host in the
        # output). Fail fast instead: raise on the first unmatched row.
        joined = (
            gated.join(F.broadcast(dim), "host", "left")
            .withColumn(
                "host_id",
                F.when(
                    F.col("host_id").isNull(),
                    F.raise_error(F.concat(
                        F.lit("build_two_phase_plan: frontier host '"),
                        F.col("host"),
                        F.lit("' missing from budgets dim "
                              "(dict_encode_hosts=True requires full "
                              "budget coverage)"),
                    )).cast("long"),
                ).otherwise(F.col("host_id")),
            )
            .drop("host")
        )
        hkey = "host_id"
    else:
        dim = None
        joined = gated.join(
            F.broadcast(budgets.select("host", "budget_per_round")), "host", "left"
        )
        hkey = "host"
    wb = (
        joined
        .withColumn(
            "__b", F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
        )
        .withColumn(
            "__b2",
            F.when(
                F.col("budget_per_round").isNotNull(),
                F.greatest(F.floor(F.col("budget_per_round") / 2), F.lit(1)).cast("int"),
            ).otherwise(F.lit(default_late_budget)),
        )
        .drop("budget_per_round")
    )
    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
    if host_stats is not None:
        salt = (
            F.when(F.col("__hot").isNotNull(), salt).otherwise(F.lit(0)).cast("int")
        )
    order_e = [F.col("expected").desc(), F.col("url_hash").asc()]
    order_h = [F.col("hours_idle").desc(), F.col("url_hash").asc()]
    wb = wb.withColumn("__salt", salt)
    if host_stats is not None:
        wb = wb.drop("__hot")
    w_es = Window.partitionBy(hkey, "__salt").orderBy(*order_e)
    w_hs = Window.partitionBy(hkey, "__salt").orderBy(*order_h)
    pre = (
        wb.withColumn("__rne", F.row_number().over(w_es))
        .withColumn("__rnh", F.row_number().over(w_hs))
        .where(
            (F.col("__rne") <= F.col("__b"))
            | (F.col("__rnh") <= F.col("__b") + F.col("__b2"))
        )
        .drop("__rne", "__rnh", "__salt")
    )
    # stage B in ONE pass — no union of filtered branches (a union would
    # duplicate the whole ranking subtree in the physical plan; only the
    # stage-A exchange gets reused, so the sorts and the stage-B exchange
    # would run twice). Phase-2's rank among NON-phase-1 rows comes from a
    # mixed-order row_number (phase-1 rows first) minus the host's
    # phase-1 count — identical ordering semantics, half the sort work.
    w_e = Window.partitionBy(hkey).orderBy(*order_e)
    ranked = pre.withColumn("__rank_e", F.row_number().over(w_e))
    is_p1 = F.col("__rank_e") <= F.col("__b")
    w_mixed = Window.partitionBy(hkey).orderBy(
        is_p1.cast("int").desc(), *order_h
    )
    w_host = Window.partitionBy(hkey).orderBy(
        is_p1.cast("int").desc(), *order_h
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    keep = ["url_hash", "host", "last_id",
            F.when(
                F.col("__fi_r").bitwiseAND(F.lit(2)) == 0,
                F.shiftright(F.col("__fi_r"), 2),
            ).alias("first_id"),
            (F.col("__fi_r").bitwiseAND(F.lit(1)) == 1).alias("reached"),
            "expected", "hours_idle"]
    staged = (
        ranked.withColumn("__rn_mixed", F.row_number().over(w_mixed))
        .withColumn("__n_p1", F.sum(is_p1.cast("int")).over(w_host))
        .withColumn("__rank_h", F.col("__rn_mixed") - F.col("__n_p1"))
    )
    out = staged.where(is_p1 | (F.col("__rank_h") <= F.col("__b2")))
    if dict_encode_hosts:
        # restore the host string on the SMALL plan output only
        out = out.join(F.broadcast(dim.select("host_id", "host")), "host_id", "left")
    return out.select(
        *keep,
        F.when(is_p1, F.col("__rank_e")).otherwise(F.col("__rank_h")).alias("fetch_rank"),
        F.when(is_p1, F.lit("expected")).otherwise(F.lit("late")).alias("phase"),
    )


def merge_fetch_results(
    frontier: DataFrame, results: DataFrame, round_no: int, now: int
) -> DataFrame:
    """State MERGE (reference utils.py:351-446 set-mutation protocol):
    apply per-URL fetch outcomes to the frontier — status-driven state
    transitions (404→dead, 403→protected, 429→suspended), checkpoint
    advances (dumpall.py:83-87 last_id; load-past.py:69-77
    first_id/reached) and the latest_ts touch on success. Unscheduled
    rows pass through unchanged (status NULL). Extracted from
    ``run_round`` so the driver-contract queries oracle the exact
    engine code path."""
    res = F.broadcast(
        results.select("url_hash", "status", "new_last_id", "new_first_id", "new_reached")
    )
    return (
        frontier.join(res, "url_hash", "left")
        .withColumn(
            "state",
            F.when(F.col("status") == 404, "dead")
            .when(F.col("status") == 403, "protected")
            .when(F.col("status") == 429, "suspended")
            .otherwise(F.col("state")),
        )
        .withColumn(
            "state_round",
            F.when(
                F.col("status").isNotNull() & (F.col("status") != 200), F.lit(round_no)
            ).otherwise(F.col("state_round")),
        )
        .withColumn(
            "last_id", F.coalesce(F.col("new_last_id"), F.col("last_id"))
        )
        .withColumn(
            "first_id", F.coalesce(F.col("new_first_id"), F.col("first_id"))
        )
        .withColumn(
            "reached", F.coalesce(F.col("new_reached"), F.col("reached"))
        )
        .withColumn(
            "latest_ts",
            F.when(F.col("status") == 200, F.timestamp_seconds(F.lit(now))).otherwise(
                F.col("latest_ts")
            ),
        )
    )


def run_round(
    catalog: Catalog,
    round_no: int,
    n_hosts: int,
    salt_buckets: int = 16,
    use_bloom: bool = True,
) -> RoundStats:
    """One scheduling round.

    Driver-action discipline (the scaling-efficiency fix): every counter
    rides an ``Observation`` on a job the round runs ANYWAY (a write or
    an eager checkpoint) — no standalone ``count()`` jobs, no re-reads
    of freshly written parquet. The seen-filter is LOADED from the
    catalog (persisted at bootstrap) and updated with this round's
    delta only — never rebuilt from the full seen-set.
    """
    spark = catalog.spark
    now = round_now_epoch(round_no)
    frontier = read_frontier(catalog, round_no - 1)
    seen = read_seen(catalog, round_no - 1)
    budgets = catalog.read_input("host_budget")
    robots = catalog.read_input("robots")

    # TTL revival (protected/suspended re-checks, utils.py:369-412) —
    # flagged so revived-but-unscheduled rows still persist as deltas
    revive_cond = F.col("state").isin("suspended", "protected") & (
        F.lit(round_no) - F.col("state_round") >= REVIVE_TTL_ROUNDS
    )
    frontier = frontier.withColumn("__revived", revive_cond).withColumn(
        "state", F.when(revive_cond, "active").otherwise(F.col("state"))
    )

    obs_active, n_a = _count_obs()
    active = frontier.where(F.col("state") == "active").observe(obs_active, n_a)
    obs_plan, n_p = _count_obs()
    # per-host load for adaptive salting: a column-pruned scan + partial
    # agg over the frontier (production would maintain these counts in
    # the host dimension incrementally)
    host_stats = frontier.where(F.col("state") == "active").groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    # the budget table covers every frontier host by construction (it is
    # the per-host politeness state), so host dictionary-encoding is sound
    plan = build_two_phase_plan(
        active, robots, budgets, now, salt_buckets,
        dict_encode_hosts=True, host_stats=host_stats,
    )
    # one job materializes the plan AND surfaces both counters
    plan = plan.observe(obs_plan, n_p).localCheckpoint(eager=True)
    n_active = int(obs_active.get["n"])
    n_scheduled = int(obs_plan.get["n"])

    # ------------------------------------------------------------- fetch
    obs_docs, n_d = _count_obs()
    docs = fetch_documents(plan, round_no).dropDuplicates(["doc_id"]).observe(obs_docs, n_d)
    catalog.append(docs, "documents", round_no)
    n_docs = int(obs_docs.get["n"])
    results = fetch_results(plan).localCheckpoint(eager=True)

    # crawl-order lineage (golden for ordering-equality tests)
    catalog.append(
        plan.select("url_hash", "host", "phase", "expected", "fetch_rank"),
        "crawl_order",
        round_no,
    )

    # -------------------------------------------------- discovery + admit
    links = discover_outlinks(results, n_hosts).withColumn(
        "url_hash", F.xxhash64(F.col("url"))
    )
    # follow-edge table (addfollowers.py:39 shape: follower -> followee)
    catalog.append(
        links.select(
            F.col("src_hash"),
            F.col("url_hash").alias("dst_hash"),
        )
        .dropDuplicates(["src_hash", "dst_hash"])
        .withColumn("discovered_round", F.lit(round_no)),
        "follow_edges",
        round_no,
    )
    obs_cands, n_c = _count_obs()
    # checkpoint: the dedup shuffle + outlink UDF run once, not once per
    # consumer (the admit plan references candidates in two branches)
    cands = (
        links.dropDuplicates(["url_hash"])  # within-round dedup
        .observe(obs_cands, n_c)
        .localCheckpoint(eager=True)
    )
    n_candidates = int(obs_cands.get["n"])
    bloom = BroadcastBloom.load(bloom_prefix(catalog, round_no - 1)) if use_bloom else None
    obs_adm, n_ad = _count_obs()
    admitted = (
        admit(cands, seen, bloom=bloom).observe(obs_adm, n_ad).localCheckpoint(eager=True)
    )
    n_admitted = int(obs_adm.get["n"])

    new_rows = admitted.select(
        "url",
        "url_hash",
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        # decompose once at admission; every later round reads only this
        F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/")).alias("path"),
        F.lit("active").alias("state"),
        F.lit(round_no).alias("state_round"),
        F.lit(0).cast("long").alias("last_id"),
        F.lit(0).cast("long").alias("first_id"),
        F.lit(False).alias("reached"),
        F.timestamp_seconds(F.lit(now)).alias("latest_ts"),
        F.timestamp_seconds(F.lit(now)).alias("earliest_ts"),
        F.lit(1.0).alias("rate_tph"),
        F.lit(round_no).alias("discovered_round"),
    )

    # --------------------------------------------------------- state MERGE
    merged = merge_fetch_results(frontier, results, round_no, now)
    changed = merged.where(F.col("status").isNotNull() | F.col("__revived"))
    frontier_cols = [f.name for f in FRONTIER.fields]
    obs_delta = Observation()
    delta = (
        changed.select(*frontier_cols)
        .withColumn(
            "op", F.when(F.col("state") == "dead", "delete").otherwise("upsert")
        )
        .unionByName(new_rows.withColumn("op", F.lit("upsert")))
        .observe(
            obs_delta,
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_dead"),
        )
    )
    catalog.append(delta, "frontier_v", round_no)
    n_dead = int(obs_delta.get["n_dead"] or 0)
    # dead keys re-read from the just-written (small) delta partition —
    # cheaper than recomputing the frontier-results merge a second time
    dead_keys = (
        spark.read.parquet(f"{catalog.root}/frontier_v/data/round={round_no}")
        .where(F.col("op") == "delete")
        .select("url_hash")
    )

    # append-only seen delta (O(|delta|)/round; see read_seen)
    seen_delta = admitted.select(
        "url_hash", F.lit("tracked").alias("set_name"), F.lit(round_no).alias("added_round")
    ).unionByName(
        dead_keys.select(
            "url_hash", F.lit("dead").alias("set_name"), F.lit(round_no).alias("added_round")
        )
    )
    catalog.append(seen_delta, "seen", round_no)
    n_seen = catalog.read_manifest("seen", round_no - 1)["n_rows"] + n_admitted + n_dead
    catalog.commit_round("seen", round_no, n_seen)

    # persist the updated seen-filter: OR in this round's delta only.
    # Idempotent under crash-replay (set-OR), saved BEFORE the frontier
    # manifest so every committed round has its filter.
    if use_bloom:
        bloom.update(
            spark.read.parquet(f"{catalog.root}/seen/data/round={round_no}").select(
                "url_hash"
            ),
            n_delta=n_admitted + n_dead,
        )
        if bloom.needs_rebuild:
            bloom = BroadcastBloom.build(
                read_seen(catalog, round_no).select("url_hash"),
                n_keys=bloom.n_keys,
                capacity=BLOOM_REBUILD_FACTOR * bloom.n_keys,
            )
        bloom.save(bloom_prefix(catalog, round_no))

    # manifest write = the round's COMMIT point; compaction every K
    # rounds bounds the delta chain. n_dead/n_admitted already counted
    # (localCheckpointed inputs), so nothing below re-reads expired deltas.
    if round_no % COMPACT_EVERY == 0:
        fm = catalog.write_snapshot(read_frontier(catalog, round_no), "frontier", round_no)
        n_frontier = fm["n_rows"]
        expire_frontier_history(catalog)
    else:
        prev_n = catalog.read_manifest("frontier", round_no - 1)["n_rows"]
        n_frontier = prev_n - n_dead + n_admitted
        catalog.commit_round("frontier", round_no, n_frontier)

    stats = RoundStats(
        round=round_no,
        n_active=n_active,
        n_scheduled=n_scheduled,
        n_docs=n_docs,
        n_candidates=n_candidates,
        n_admitted=n_admitted,
        n_dead=n_dead,
        n_frontier=n_frontier,
        n_seen=n_seen,
    )
    metrics = spark.createDataFrame(stats.as_rows(), "round int, metric string, value long")
    catalog.append(metrics, "round_metrics", round_no)
    return stats


def run_rounds(
    catalog: Catalog,
    n_rounds: int,
    n_hosts: int,
    resume: bool = True,
    **kw,
) -> list[RoundStats]:
    """Run/resume rounds up to ``n_rounds`` from the latest committed
    snapshot (the reference's kill-safe restart, README Stopping)."""
    start = (catalog.latest_round("frontier") or 0) + 1 if resume else 1
    return [run_round(catalog, r, n_hosts, **kw) for r in range(start, n_rounds + 1)]
