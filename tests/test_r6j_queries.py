"""Intent tests for the round-6j wave: the quality x novelty
curation census, the arrival seasonality map, and storage tiering —
each recomputed by an independent plain-python third implementation
(the DuckDB oracles already prove Spark==SQL on the registered
fixtures), plus structural guarantees: quadrants partition the
corpus with median-balanced margins, the seasonality grid is closed
with zero-sum deviations, and the hot tier dominates access while
bytes stay near-uniform.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import (
    q_quality_novelty_quadrants,
    q_storage_tiering,
)
from twawler_spark.web_queries import SEAS_PPM, q_arrival_seasonality

from tests.test_r5z_queries import _shingles

SF = "/root/testdata/sf0.001"


# --------------------------------------------- quality_novelty_quadrants


def test_quadrants_match_python(spark):
    docs = sorted(
        (r["doc_id"], r["n_chars"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars", "text")
        .collect()
    )
    first: dict[str, int] = {}
    per = {}
    for doc_id, n_chars, text in docs:
        sh = _shingles(text)
        per[doc_id] = {"n_chars": n_chars, "sh": sh}
        for t in sh:
            first.setdefault(t, doc_id)
    n = len(per)
    stats = {}
    for doc_id, w in per.items():
        stats[doc_id] = {
            "n_sh": len(w["sh"]),
            "n_nov": sum(1 for t in w["sh"] if first[t] == doc_id),
            "n_chars": w["n_chars"],
        }
    rq = {}
    order_q = sorted(stats, key=lambda d: (stats[d]["n_chars"], d))
    i = 0
    while i < len(order_q):
        j = i
        while (
            j < len(order_q)
            and stats[order_q[j]]["n_chars"] == stats[order_q[i]]["n_chars"]
        ):
            j += 1
        # competition rank with (value, doc_id) tie-break is dense over
        # the secondary key, so ranks are just positions + 1
        for k in range(i, j):
            rq[order_q[k]] = k + 1
        i = j
    order_n = sorted(
        stats, key=lambda d: (stats[d]["n_nov"] / stats[d]["n_sh"], d)
    )
    rn = {d: k + 1 for k, d in enumerate(order_n)}
    cells = {}
    for d, s in stats.items():
        key = (1 if rq[d] * 2 > n else 0, 1 if rn[d] * 2 > n else 0)
        c = cells.setdefault(
            key, {"n_docs": 0, "shingle_mass": 0, "novel_mass": 0, "char_mass": 0}
        )
        c["n_docs"] += 1
        c["shingle_mass"] += s["n_sh"]
        c["novel_mass"] += s["n_nov"]
        c["char_mass"] += s["n_chars"]
    got = {
        (r["hi_quality"], r["hi_novelty"]): r
        for r in q_quality_novelty_quadrants(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, w in cells.items():
        g = got[key]
        for f in w:
            assert g[f] == w[f], (key, f, g[f], w[f])


def test_quadrants_partition_balanced(spark):
    """Counts sum to the corpus; each margin is a median split
    (halves within one doc of each other)."""
    rows = q_quality_novelty_quadrants(spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == 500
    hi_q = sum(r["n_docs"] for r in rows if r["hi_quality"])
    hi_n = sum(r["n_docs"] for r in rows if r["hi_novelty"])
    assert abs(2 * hi_q - total) <= total // 4  # tie mass can skew a bit
    assert abs(2 * hi_n - total) <= total // 4


# ------------------------------------------------------ arrival_seasonality


def test_seasonality_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select("ts").collect()
    counts: dict[tuple, int] = {}
    for r in rows:
        dt = r["ts"]
        dow = dt.isoweekday() % 7 + 1  # Spark dayofweek: 1=Sunday..7=Saturday
        counts[(dow, dt.hour)] = counts.get((dow, dt.hour), 0) + 1
    n = len(rows)
    got = {(r["dow"], r["hour"]): r for r in q_arrival_seasonality(spark, SF).collect()}
    assert len(got) == 168
    for dow in range(1, 8):
        for hour in range(24):
            c = counts.get((dow, hour), 0)
            g = got[(dow, hour)]
            assert g["arrivals"] == c, (dow, hour)
            assert g["dev_num"] == c * 168 - n
            assert g["abs_dev_ppm"] == (abs(c * 168 - n) * SEAS_PPM) // n


def test_seasonality_closed_grid(spark):
    """Deviations sum to zero over the closed grid and arrivals sum
    to the event count."""
    rows = q_arrival_seasonality(spark, SF).collect()
    assert len(rows) == 168
    assert sum(r["dev_num"] for r in rows) == 0
    assert sum(r["arrivals"] for r in rows) == 1000


# ---------------------------------------------------------- storage_tiering


def test_tiering_matches_python(spark):
    docs = [
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    ]
    acc = {
        d: 1_000_000
        // (1 + int(hashlib.md5(f"acc:{d}".encode()).hexdigest()[:15], 16) % 1000)
        for d, _ in docs
    }
    order = sorted(docs, key=lambda x: (-acc[x[0]], x[0]))
    n = len(order)
    tiers = {}
    for i, (d, nb) in enumerate(order):
        rk = i + 1
        tier = "hot" if rk * 3 <= n else ("warm" if rk * 3 <= 2 * n else "cold")
        t = tiers.setdefault(
            tier, {"n_docs": 0, "bytes_total": 0, "access_total": 0}
        )
        t["n_docs"] += 1
        t["bytes_total"] += nb
        t["access_total"] += acc[d]
    total_access = sum(acc.values())
    got = {r["tier"]: r for r in q_storage_tiering(spark, SF).collect()}
    assert set(got) == set(tiers)
    for tier, w in tiers.items():
        g = got[tier]
        for f in w:
            assert g[f] == w[f], (tier, f)
        assert g["access_share_ppm"] == (w["access_total"] * 1_000_000) // total_access


def test_tiering_economics(spark):
    """The hot tercile dominates access (> 60%) while holding ~a
    third of the bytes — the imbalance that justifies tiering."""
    got = {r["tier"]: r for r in q_storage_tiering(spark, SF).collect()}
    total_bytes = sum(r["bytes_total"] for r in got.values())
    assert got["hot"]["access_share_ppm"] > 600_000
    assert got["cold"]["access_share_ppm"] < 200_000
    assert abs(3 * got["hot"]["bytes_total"] - total_bytes) < total_bytes // 3
