"""Frontier admission + robots gating.

``admit`` is the rebuild of the reference's ``can_follow``
(twkit/utils.py:672-692): a candidate is admitted iff it is in none of
the eligibility sets (tracked/dead/ignored/suspended/protected — here
one ``seen`` table). Expressed as a Bloom prefilter (zero false
negatives) + exact LEFT ANTI join on the ~1% "maybe seen" remainder, so
the exact join's probe side shrinks by ~99% at scale.

``gate_robots`` is the crawl-politeness analog the reference lacks
(its "robots" are Twitter error codes, utils.py:496-554): deny rules
are pre-aggregated to one array per host and broadcast, so gating is a
single broadcast hash join + an ``exists()`` lambda over the prefix
array — no skewed shuffle by host, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cuckoo_filter import BroadcastCuckoo
from .seen_filter import BroadcastBloom, ShardedBloom


def admit(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: BroadcastBloom | BroadcastCuckoo | ShardedBloom | None = None,
    key_col: str = "url_hash",
    confirm_broadcast: bool = True,
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen``.

    Exact path (bloom=None): plain LEFT ANTI — shuffles BOTH sides by
    key, O(|seen|) shuffle per round. Correct, but the seen-set is the
    10^10 table; reshuffling it every round is the scale killer.

    BroadcastBloom path (production default): ZERO shuffles —
      1. probe candidate keys map-side (broadcast bits + Arrow UDF);
         bloom-ABSENT keys are definitely new (no false negatives);
      2. exact-confirm the "maybe seen" remainder with a broadcast SEMI
         join where ``seen`` is the STREAM side: the seen table is
         column-pruned-scanned once but never shuffled;
      3. anti-join candidates against the broadcast CONFIRMED set —
         sized |seen ∩ candidates| + fpp, bounded by the round's
         candidate count, never by |seen|.

    ShardedBloom path: same protocol but the probe cogroups candidates
    with co-partitioned shard filters — for filters too big to
    broadcast (>=10^10 keys ≈ 15 GB of bits).
    """
    seen_keys = seen.select(key_col)
    if bloom is None:
        # LEFT ANTI ignores duplicate build-side keys, so no distinct()
        # (it cost a whole extra exchange + agg). SHUFFLE_HASH skips the
        # sort on BOTH sides that SMJ would pay — the candidate side is
        # the wide one, and hashing the seen side's per-partition slice
        # is cheaper than sorting it as long as shuffle partitioning
        # keeps slices in memory (size shuffle partitions ∝ |seen|; the
        # hint is advisory and AQE still re-plans skew).
        return candidates.join(
            seen_keys.hint("SHUFFLE_HASH"), key_col, "left_anti"
        )
    if isinstance(bloom, (BroadcastBloom, BroadcastCuckoo)):
        # cuckoo shares the protocol; its ~0.01% fpp shrinks the maybe
        # set ~80x further, and delete_keys lets retraction rounds skip
        # the full rebuild the Bloom tier would need
        flagged = bloom.probe(
            candidates.select(key_col), key_col=key_col, flag_col="__maybe_seen"
        )
        maybe = flagged.where(F.col("__maybe_seen")).select(key_col)
        if confirm_broadcast:
            # plan-bounded candidate sets (run_round's outlinks): seen is
            # the stream side — scanned (pruned to the key column), never
            # shuffled; dupes in `confirmed` dedupe inside the hash relation
            confirmed = seen_keys.join(F.broadcast(maybe), key_col, "left_semi")
            return candidates.join(F.broadcast(confirmed), key_col, "left_anti")
        # frontier-scale candidate sets (whole-frontier dedup): the maybe
        # set is a constant fraction of the candidates — confirm with a
        # co-partitioned shuffle join instead of a driver-built broadcast
        confirmed = maybe.join(seen_keys, key_col, "left_semi")
        return candidates.join(confirmed, key_col, "left_anti")
    # sharded tier: maybe-set can itself be huge, so confirm stays a
    # co-partitioned shuffle join rather than a broadcast
    flagged = bloom.probe(candidates.select(key_col), flag_col="__maybe_seen")
    maybe = flagged.where(F.col("__maybe_seen")).select(key_col)
    confirmed = maybe.join(seen_keys.distinct(), key_col, "left_semi")
    return candidates.join(confirmed, key_col, "left_anti")


def robots_deny_map(robots: DataFrame) -> DataFrame:
    """(host, deny_prefixes array) — one row per host with deny rules."""
    return (
        robots.where(F.col("rule") == "deny")
        .groupBy("host")
        .agg(F.collect_list("path_prefix").alias("deny_prefixes"))
    )


def gate_robots(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    path_col: str | None = None,
) -> DataFrame:
    """Drop candidates whose canonical path matches any deny prefix.

    ``path_col`` lets the caller pass a pre-extracted path column so the
    wide URL string can be projected away before downstream shuffles.
    """
    deny = robots_deny_map(robots)
    path = (
        F.col(path_col)
        if path_col
        else F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    )
    joined = candidates.join(F.broadcast(deny), "host", "left")
    blocked = F.when(
        F.col("deny_prefixes").isNull(), F.lit(False)
    ).otherwise(
        F.exists(
            F.col("deny_prefixes"),
            lambda p: F.startswith(path, p),
        )
    )
    return joined.where(~blocked).drop("deny_prefixes")
