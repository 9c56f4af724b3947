"""Intent tests for the round-5w wave: greedy max-coverage seed
selection, the fetch-timeout tradeoff sweep, and empirical-Bayes
success-rate shrinkage — each recomputed by an independent
plain-python third implementation (the DuckDB oracles already prove
Spark==SQL on the registered fixtures), plus structural guarantees:
greedy marginal gains are non-increasing (submodularity), the
timeout curves are monotone in the timeout, and shrinkage is a
contraction toward 1/2 that genuinely reorders sparse hosts.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.web_queries import (
    SEED_K,
    SHRINK_ALPHA,
    SHRINK_BETA,
    SHRINK_HOSTS,
    SHRINK_PPM,
    TMO_GRID,
    TMO_HOSTS,
    TMO_PPM,
    TMO_VALUE_MOD,
    q_host_rate_shrunk,
    q_seed_coverage_greedy,
    q_timeout_sweep,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# ------------------------------------------------- seed_coverage_greedy


def test_seed_greedy_matches_python(spark):
    _, adj = _graph(spark)
    closed = {n: {n} | nbrs for n, nbrs in adj.items()}
    covered: set[int] = set()
    want = []
    for it in range(1, SEED_K + 1):
        best = None
        for v in sorted(adj):
            gain = len(closed[v] - covered)
            if best is None or (-gain, v) < (-best[1], best[0]):
                best = (v, gain)
        covered |= closed[best[0]]
        want.append(
            {"iteration": it, "seed": best[0], "gain": best[1], "cum": len(covered)}
        )
    got = sorted(
        (r.asDict() for r in q_seed_coverage_greedy(spark, SF).collect()),
        key=lambda r: r["iteration"],
    )
    assert len(got) == SEED_K
    for g, w in zip(got, want):
        assert g["iteration"] == w["iteration"]
        assert g["seed"] == w["seed"], (g, w)
        assert g["gain"] == w["gain"]
        assert g["cum_covered"] == w["cum"]


def test_seed_greedy_submodular(spark):
    """Marginal gains are non-increasing (the submodularity signature
    greedy relies on) and cumulative coverage never exceeds the node
    count."""
    rows = sorted(
        q_seed_coverage_greedy(spark, SF).collect(), key=lambda r: r["iteration"]
    )
    _, adj = _graph(spark)
    for a, b in zip(rows, rows[1:]):
        assert a["gain"] >= b["gain"]
    assert rows[-1]["cum_covered"] <= len(adj)
    assert rows[0]["gain"] == max(len(adj[n]) + 1 for n in adj)


# ------------------------------------------------------------ timeout_sweep


def test_timeout_sweep_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    cells: dict[tuple, dict] = {}
    for r in rows:
        host = r["user_id"] % TMO_HOSTS
        lat = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        for t in TMO_GRID:
            c = cells.setdefault(
                (host, t), {"n_fetches": 0, "n_lost": 0, "spent_us": 0}
            )
            c["n_fetches"] += 1
            c["n_lost"] += 1 if lat > t else 0
            c["spent_us"] += min(lat, t)
    got = {
        (r["host"], r["timeout_us"]): r for r in q_timeout_sweep(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for k, w in cells.items():
        g = got[k]
        for f in ("n_fetches", "n_lost", "spent_us"):
            assert g[f] == w[f], (k, f)
        assert g["loss_ppm"] == (w["n_lost"] * TMO_PPM) // w["n_fetches"]


def test_timeout_sweep_monotone(spark):
    """Raising the timeout can only reduce losses and increase time
    spent — per host, both curves are monotone in the grid."""
    rows = q_timeout_sweep(spark, SF).collect()
    by_host: dict[int, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["timeout_us"])
        for a, b in zip(rs, rs[1:]):
            assert a["n_lost"] >= b["n_lost"]
            assert a["spent_us"] <= b["spent_us"]
    # the largest grid point equals the value modulus, so nothing is
    # ever lost there
    assert all(
        r["n_lost"] == 0 for r in rows if r["timeout_us"] == max(TMO_GRID)
    )


# --------------------------------------------------------- host_rate_shrunk


def test_shrunk_matches_python(spark):
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    pulls: dict[int, int] = {}
    wins: dict[int, int] = {}
    for eid in eids:
        hh = int(hashlib.md5(f"hrs:{eid}".encode()).hexdigest()[:15], 16) % (
            SHRINK_HOSTS * SHRINK_HOSTS
        )
        h = math.isqrt(hh)
        pulls[h] = pulls.get(h, 0) + 1
        w = hashlib.md5(f"ucb:{eid}".encode()).hexdigest()[0] in _ODD
        wins[h] = wins.get(h, 0) + (1 if w else 0)
    scored = []
    for h in sorted(pulls):
        raw = (wins[h] * SHRINK_PPM) // pulls[h]
        shr = ((wins[h] + SHRINK_ALPHA) * SHRINK_PPM) // (
            pulls[h] + SHRINK_ALPHA + SHRINK_BETA
        )
        scored.append({"host": h, "pulls": pulls[h], "wins": wins[h],
                       "raw_ppm": raw, "shrunk_ppm": shr})
    for key, rank_name in (("raw_ppm", "rank_raw"), ("shrunk_ppm", "rank_shrunk")):
        order = sorted(scored, key=lambda r: (-r[key], r["host"]))
        for i, r in enumerate(order):
            r[rank_name] = i + 1
    got = {r["host"]: r for r in q_host_rate_shrunk(spark, SF).collect()}
    assert set(got) == {r["host"] for r in scored}
    for w in scored:
        g = got[w["host"]]
        for f in ("pulls", "wins", "raw_ppm", "shrunk_ppm", "rank_raw", "rank_shrunk"):
            assert g[f] == w[f], (w["host"], f, g[f], w[f])
        assert g["rank_moved"] == w["rank_raw"] - w["rank_shrunk"]


def test_shrunk_is_contraction_and_reorders(spark):
    """Shrinkage always moves the rate TOWARD 500000 ppm (the prior
    mean), never past it, and the skewed fixture guarantees it
    actually reorders at least one pair of hosts."""
    rows = q_host_rate_shrunk(spark, SF).collect()
    for r in rows:
        raw, shr = r["raw_ppm"], r["shrunk_ppm"]
        mid = SHRINK_PPM // 2
        if raw > mid:
            assert raw >= shr >= mid - 1  # floors may undershoot by 1
        elif raw < mid:
            assert raw <= shr <= mid
    assert any(r["rank_moved"] != 0 for r in rows)
    assert min(r["pulls"] for r in rows) < 10 < max(r["pulls"] for r in rows)
