"""Intent tests for the round-6k wave: gaps-and-islands failure
streaks, postings intersection cost, and distribution-free median
confidence bands — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus structural guarantees: the island
grouping equals a direct streak scan, intersections are bounded by
the smaller posting list, and the CI brackets the median with width
shrinking in sample size.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.training_queries import (
    PIX_PPM,
    PIX_TOP_TERMS,
    q_postings_intersection,
)
from twawler_spark.web_queries import (
    MCI_HOSTS,
    STREAK_CAP,
    STREAK_HOSTS,
    TMO_VALUE_MOD,
    q_failure_streaks,
    q_median_ci_rank,
)

SF = "/root/testdata/sf0.001"
_ERR = set("135")


# ---------------------------------------------------------- failure_streaks


def test_streaks_match_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    seqs: dict[int, list] = {}
    for r in rows:
        h = r["user_id"] % STREAK_HOSTS
        e = hashlib.md5(f"brn:{r['event_id']}".encode()).hexdigest()[0] in _ERR
        seqs.setdefault(h, []).append((r["event_id"], 1 if e else 0))
    got = {r["host"]: r for r in q_failure_streaks(spark, SF).collect()}
    assert set(got) == set(seqs)
    for h, evs in seqs.items():
        evs.sort()
        longest = cur = 0
        for _, e in evs:
            cur = cur + 1 if e else 0
            longest = max(longest, cur)
        current = cur
        g = got[h]
        assert g["longest_err_streak"] == longest, h
        assert g["current_err_streak"] == current
        k = min(current, STREAK_CAP)
        assert g["backoff_exp"] == k
        assert g["backoff_delay_rounds"] == 2**k


def test_streaks_regimes(spark):
    """Both tail states occur (some hosts end mid-streak, some end
    clean) and longest >= current always."""
    rows = q_failure_streaks(spark, SF).collect()
    assert any(r["current_err_streak"] > 0 for r in rows)
    assert any(r["current_err_streak"] == 0 for r in rows)
    for r in rows:
        assert r["longest_err_streak"] >= r["current_err_streak"]
        assert r["backoff_delay_rounds"] == 2 ** r["backoff_exp"]


# ---------------------------------------------------- postings_intersection


def test_postings_match_python(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    postings: dict[str, set] = {}
    for doc_id, text in docs:
        for t in set(text.lower().split(" ")):
            if t:
                postings.setdefault(t, set()).add(doc_id)
    top = sorted(postings, key=lambda t: (-len(postings[t]), t))[:PIX_TOP_TERMS]
    n_docs = len(docs)
    got = {
        (r["term_a"], r["term_b"]): r
        for r in q_postings_intersection(spark, SF).collect()
    }
    expected_pairs = {
        (a, b) for i, a in enumerate(sorted(top)) for b in sorted(top)[i + 1 :]
        if len(postings[a] & postings[b]) > 0
    }
    assert set(got) == expected_pairs
    for (a, b), g in got.items():
        inter = len(postings[a] & postings[b])
        assert g["df_a"] == len(postings[a])
        assert g["df_b"] == len(postings[b])
        assert g["n_both"] == inter
        mn = min(len(postings[a]), len(postings[b]))
        assert g["selectivity_ppm"] == (inter * PIX_PPM) // mn
        assert g["independence_ppm"] == (
            len(postings[a]) * len(postings[b]) * PIX_PPM
        ) // (n_docs * mn)


def test_postings_bounds(spark):
    """Intersection never exceeds the smaller list; on the dense
    31-word vocabulary the top terms co-occur heavily (selectivity
    near 1e6), matching the independence prediction closely."""
    rows = q_postings_intersection(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_both"] <= min(r["df_a"], r["df_b"])
        assert abs(r["selectivity_ppm"] - r["independence_ppm"]) <= 200_000


# ---------------------------------------------------------- median_ci_rank


def test_median_ci_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    by_host: dict[int, list[int]] = {}
    for r in rows:
        h = r["user_id"] % MCI_HOSTS
        v = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        by_host.setdefault(h, []).append(v)
    got = {r["host"]: r for r in q_median_ci_rank(spark, SF).collect()}
    assert set(got) == set(by_host)
    for h, vs in by_host.items():
        vs.sort()
        n = len(vs)
        isq = math.isqrt(n)
        med = vs[(n + 1) // 2 - 1]
        lo = vs[max(n // 2 - isq, 1) - 1]
        hi = vs[min(n // 2 + 1 + isq, n) - 1]
        g = got[h]
        assert g["n_fetches"] == n
        assert g["median_us"] == med
        assert g["ci_lo_us"] == lo
        assert g["ci_hi_us"] == hi
        assert g["ci_width_us"] == hi - lo


def test_median_ci_brackets(spark):
    """lo <= median <= hi on every host, width positive."""
    for r in q_median_ci_rank(spark, SF).collect():
        assert r["ci_lo_us"] <= r["median_us"] <= r["ci_hi_us"]
        assert r["ci_width_us"] > 0
