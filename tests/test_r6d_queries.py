"""Intent tests for the round-6d wave: column encoding statistics,
the exact retry amplification forecast, and the composite host
reputation panel — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus structural guarantees: run counts are
bounded by distinct and row counts, the geometric series sits in
[1, R+1] and grows with the error rate, and the composite rank is
the exact mean of the three per-signal rank scores.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import (
    ENC_COLUMNS,
    ENC_PPM,
    q_column_stats_for_encoding,
)
from twawler_spark.web_queries import (
    BURN_HOSTS,
    REP_PPM,
    RETRY_MAX,
    RETRY_PPM,
    q_host_reputation,
    q_retry_cost_forecast,
)

SF = "/root/testdata/sf0.001"
_ERR = set("135")


# ------------------------------------------------ column_stats_for_encoding


def test_column_stats_match_python(spark):
    rows = sorted(
        (r["doc_id"], r["lang"], r["source"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "source")
        .collect()
    )
    got = {r["column_name"]: r for r in q_column_stats_for_encoding(spark, SF).collect()}
    assert set(got) == set(ENC_COLUMNS)
    for idx, col in (("lang", 1), ("source", 2)):
        vals = [r[col] for r in rows]
        n = len(vals)
        nd = len(set(vals))
        runs = 1 + sum(1 for a, b in zip(vals, vals[1:]) if a != b)
        g = got[idx]
        assert g["n_rows"] == n
        assert g["n_distinct"] == nd
        assert g["distinct_ppm"] == (nd * ENC_PPM) // n
        assert g["n_runs"] == runs
        assert g["runs_ppm"] == (runs * ENC_PPM) // n


def test_column_stats_bounds(spark):
    """n_distinct <= n_runs <= n_rows always (each new distinct value
    opens at least one run; runs cannot exceed rows)."""
    for r in q_column_stats_for_encoding(spark, SF).collect():
        assert r["n_distinct"] <= r["n_runs"] <= r["n_rows"]
        assert 0 < r["distinct_ppm"] <= ENC_PPM


# -------------------------------------------------------- retry_cost_forecast


def test_retry_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    tot: dict[int, int] = {}
    err: dict[int, int] = {}
    for r in rows:
        h = r["user_id"] % BURN_HOSTS
        tot[h] = tot.get(h, 0) + 1
        e = hashlib.md5(f"brn:{r['event_id']}".encode()).hexdigest()[0] in _ERR
        err[h] = err.get(h, 0) + (1 if e else 0)
    got = {r["host"]: r for r in q_retry_cost_forecast(spark, SF).collect()}
    assert set(got) == set(tot)
    for h in tot:
        t, x = tot[h], err[h]
        series = sum(x**k * t ** (RETRY_MAX - k) for k in range(RETRY_MAX + 1))
        ap = (series * RETRY_PPM) // (t**RETRY_MAX)
        g = got[h]
        assert g["tot"] == t and g["err"] == x
        assert g["attempts_ppm"] == ap
        assert g["extra_attempts"] == (t * ap) // RETRY_PPM - t


def test_retry_amplification_bounds(spark):
    """Expected attempts per URL lie in [1, R+1]; amplification is
    monotone in the error rate (checked by exact cross-products)."""
    rows = q_retry_cost_forecast(spark, SF).collect()
    for r in rows:
        assert RETRY_PPM <= r["attempts_ppm"] <= (RETRY_MAX + 1) * RETRY_PPM
        assert r["extra_attempts"] >= 0
    by_rate = sorted(rows, key=lambda r: (r["err"] * 10**9) // r["tot"])
    for a, b in zip(by_rate, by_rate[1:]):
        if a["err"] * b["tot"] < b["err"] * a["tot"]:
            assert a["attempts_ppm"] <= b["attempts_ppm"]


# ------------------------------------------------------------ host_reputation


def test_reputation_composite_identity(spark):
    """The composite is EXACTLY the integer mean of the three rank
    scores, and the final ordering follows (composite desc, host)."""
    rows = q_host_reputation(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["composite_ppm"] == (
            r["err_score"] + r["lat_score"] + r["disc_score"]
        ) // 3
        for f in ("err_score", "lat_score", "disc_score"):
            assert 0 <= r[f] <= REP_PPM
    order = sorted(rows, key=lambda r: (-r["composite_ppm"], r["host"]))
    for i, r in enumerate(order):
        assert r["rep_rank"] == i + 1


def test_reputation_direction(spark):
    """Good = high: the worst-error host scores 1e6 on err_score
    ... wait, errors rank DESCENDING so the HIGHEST error rate gets
    rank 1 -> score 0 and the lowest error rate scores 1e6; verify
    the direction concretely on the extremes."""
    rows = q_host_reputation(spark, SF).collect()
    worst_err = max(rows, key=lambda r: (r["err_ppm"], -r["host"]))
    best_err = min(rows, key=lambda r: (r["err_ppm"], r["host"]))
    assert worst_err["err_score"] <= best_err["err_score"]
    best_disc = max(rows, key=lambda r: (r["disc_ppm"], -r["host"]))
    worst_disc = min(rows, key=lambda r: (r["disc_ppm"], r["host"]))
    assert best_disc["disc_score"] >= worst_disc["disc_score"]
