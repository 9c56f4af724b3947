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

from .seen_filter import ShardedBloom


def admit(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: ShardedBloom | None = None,
    key_col: str = "url_hash",
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen``.

    Bloom path: probe KEYS only (8 bytes/row across the Arrow boundary,
    not the full candidate row), exact-confirm the ~fpp "maybe seen"
    remainder against the seen table, then a single anti-join of the
    candidates against the CONFIRMED-seen keys — whose size is
    |seen ∩ candidates|, not |seen|. That's the 10^10-seen-set win: the
    exact set is only ever probed with the bloom survivors, and the
    final anti-join's build side shrinks from the full seen-set to the
    true overlap.
    """
    seen_keys = seen.select(key_col).distinct()
    if bloom is None:
        return candidates.join(seen_keys, key_col, "left_anti")
    flagged_keys = bloom.probe(
        candidates.select(key_col), flag_col="__maybe_seen"
    )
    maybe = flagged_keys.where(F.col("__maybe_seen")).select(key_col)
    confirmed = maybe.join(seen_keys, key_col, "left_semi")
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
