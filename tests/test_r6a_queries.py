"""Intent tests for the round-6a wave: closed-form Lindley backlog
forecasting, Little's-law pool sizing, and the scalarization sweep —
each recomputed by an independent plain-python third implementation
(the DuckDB oracles already prove Spark==SQL on the registered
fixtures), plus structural guarantees: the window closed form equals
the iterative Lindley recurrence exactly, Little's law reconciles
with raw busy time, and every sweep winner lies on the skyline.
"""

from __future__ import annotations

import hashlib

from twawler_spark.web_queries import (
    LL_HOSTS,
    LL_LAT_MOD,
    LL_REPLAY_FACTOR,
    QBL_HOSTS,
    QBL_ROUNDS,
    WSW_STEPS,
    q_littles_law_audit,
    q_queue_backlog_lindley,
    q_weight_sweep_winners,
)

from tests.test_r5t_queries import _signatures

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- queue_backlog_lindley


def test_lindley_matches_iterative(spark):
    """The window closed form must equal the step-by-step Lindley
    recurrence backlog_r = max(0, backlog_{r-1} + a_r - c)."""
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    arr: dict[tuple, int] = {}
    for r in rows:
        k = (r["user_id"] % QBL_HOSTS, r["event_id"] % QBL_ROUNDS)
        arr[k] = arr.get(k, 0) + 1
    cap = len(rows) // (QBL_HOSTS * QBL_ROUNDS)
    got = {(r["host"], r["round"]): r for r in q_queue_backlog_lindley(spark, SF).collect()}
    assert set(got) == set(arr)
    hosts = {h for h, _ in arr}
    for h in hosts:
        backlog = 0
        for rnd in sorted(r for hh, r in arr if hh == h):
            backlog = max(0, backlog + arr[(h, rnd)] - cap)
            g = got[(h, rnd)]
            assert g["arrivals"] == arr[(h, rnd)]
            assert g["capacity"] == cap
            assert g["backlog"] == backlog, (h, rnd, g["backlog"], backlog)


def test_lindley_both_regimes(spark):
    """The fixture must exercise both branches of the max: some rows
    with positive backlog (overload) and some at zero (drain)."""
    rows = q_queue_backlog_lindley(spark, SF).collect()
    assert any(r["backlog"] > 0 for r in rows)
    assert any(r["backlog"] == 0 for r in rows)
    for r in rows:
        assert r["backlog"] >= 0


# ---------------------------------------------------- littles_law_audit


def test_littles_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    ).collect()
    busy: dict[int, int] = {}
    nf: dict[int, int] = {}
    ss = []
    for r in rows:
        h = r["user_id"] % LL_HOSTS
        lat = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % LL_LAT_MOD
        busy[h] = busy.get(h, 0) + lat
        nf[h] = nf.get(h, 0) + 1
        ss.append(int(r["ts"].timestamp()))
    span = (max(ss) - min(ss)) * 1_000_000
    got = {r["host"]: r for r in q_littles_law_audit(spark, SF).collect()}
    assert set(got) == set(busy)
    for h in busy:
        g = got[h]
        assert g["n_fetches"] == nf[h]
        assert g["busy_us"] == busy[h]
        assert g["span_us"] == span
        assert g["concurrency_nano"] == (busy[h] * 1_000_000_000) // span
        assert g["replay_slots"] == (busy[h] * LL_REPLAY_FACTOR + span - 1) // span


def test_littles_slots_cover_busy_time(spark):
    """replay_slots is the exact ceiling: slots * span >= busy *
    factor > (slots - 1) * span."""
    for r in q_littles_law_audit(spark, SF).collect():
        lhs = r["busy_us"] * LL_REPLAY_FACTOR
        assert r["replay_slots"] * r["span_us"] >= lhs
        assert (r["replay_slots"] - 1) * r["span_us"] < lhs


# ------------------------------------------------- weight_sweep_winners


def test_weight_sweep_matches_python(spark):
    sig = _signatures(spark)
    got = {r["k"]: r for r in q_weight_sweep_winners(spark, SF).collect()}
    assert set(got) == set(range(WSW_STEPS))
    for k in range(WSW_STEPS):
        best = min(
            sig, key=lambda n: (-(k * sig[n][0] + (4 - k) * sig[n][1]), n)
        )
        g = got[k]
        assert g["node"] == best, (k, g["node"], best)
        assert g["score"] == k * sig[best][0] + (4 - k) * sig[best][1]
        assert g["degree"] == sig[best][0]
        assert g["n_tri"] == sig[best][1]


def test_weight_sweep_winners_on_skyline(spark):
    """Every scalarization winner is Pareto-undominated — the
    constructive half of the skyline theorem, pinned per row."""
    rows = q_weight_sweep_winners(spark, SF).collect()
    assert all(r["on_skyline"] == 1 for r in rows)
    # the sweep must actually move: pure-closure and pure-degree
    # winners differ on this fixture
    assert rows and len({r["node"] for r in rows}) >= 2
