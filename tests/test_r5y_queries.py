"""Intent tests for the round-5y wave: SRE multi-window burn-rate
alerting, max-min fair budget allocation, and the link-prediction
feature build — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: a page requires
BOTH windows to burn, the water-filling allocation is max-min fair
and spends the budget exactly, and the feature build separates
positives from negatives on common neighbors.
"""

from __future__ import annotations

import hashlib

from twawler_spark.web_queries import (
    BURN_FAST,
    BURN_HOSTS,
    BURN_LONG_H,
    BURN_PPM,
    BURN_SLO_PPM,
    BURN_SLOW,
    LPF_NEG,
    MMF_BUDGET,
    MMF_DEMAND_MOD,
    MMF_HOSTS,
    q_burn_rate_alerts,
    q_link_prediction_features,
    q_maxmin_budget_alloc,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- burn_rate_alerts


def test_burn_rate_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    ).collect()
    short: dict[tuple, dict] = {}
    for r in rows:
        host = r["user_id"] % BURN_HOSTS
        h = int(r["ts"].timestamp()) // 3600
        e = 1 if hashlib.md5(f"brn:{r['event_id']}".encode()).hexdigest()[0] in "135" else 0
        c = short.setdefault((host, h), {"n": 0, "err": 0})
        c["n"] += 1
        c["err"] += e
    got = {(r["host"], r["h"]): r for r in q_burn_rate_alerts(spark, SF).collect()}
    assert set(got) == set(short)
    for (host, h), c in short.items():
        n_long = err_long = 0
        for hh in range(h - BURN_LONG_H + 1, h + 1):
            if (host, hh) in short:
                n_long += short[(host, hh)]["n"]
                err_long += short[(host, hh)]["err"]
        g = got[(host, h)]
        assert g["n_short"] == c["n"] and g["err_short"] == c["err"]
        assert g["n_long"] == n_long and g["err_long"] == err_long
        paged = (
            c["err"] * BURN_PPM > BURN_FAST * BURN_SLO_PPM * c["n"]
            and err_long * BURN_PPM > BURN_SLOW * BURN_SLO_PPM * n_long
        )
        assert g["paged"] == (1 if paged else 0)


def test_burn_rate_two_window_and(spark):
    """Paging requires BOTH windows over budget; some short-window
    breaches must be suppressed by the long window (the flap-killing
    property that motivates the pattern)."""
    rows = q_burn_rate_alerts(spark, SF).collect()
    short_breach = [
        r
        for r in rows
        if r["err_short"] * BURN_PPM > BURN_FAST * BURN_SLO_PPM * r["n_short"]
    ]
    assert short_breach, "fixture must produce short-window breaches"
    suppressed = [r for r in short_breach if not r["paged"]]
    assert suppressed, "the long window must suppress some short spikes"
    for r in rows:
        if r["paged"]:
            assert r["err_long"] * BURN_PPM > BURN_SLOW * BURN_SLO_PPM * r["n_long"]


# ------------------------------------------------------ maxmin_budget_alloc


def test_maxmin_matches_python(spark):
    hosts = sorted(
        {
            r["event_id"] % MMF_HOSTS
            for r in spark.read.parquet(f"{SF}/events.parquet")
            .select("event_id")
            .collect()
        }
    )
    demand = {
        h: 1 + int(hashlib.md5(f"mmf:{h}".encode()).hexdigest()[:15], 16) % MMF_DEMAND_MOD
        for h in hosts
    }
    n = len(hosts)
    # exact water-fill
    level = 0
    while sum(min(d, level + 1) for d in demand.values()) <= MMF_BUDGET:
        level += 1
    spent = sum(min(d, level) for d in demand.values())
    extra = MMF_BUDGET - spent
    alloc = {h: min(d, level) for h, d in demand.items()}
    for h in sorted(h for h, d in demand.items() if d > level):
        if extra <= 0:
            break
        alloc[h] += 1
        extra -= 1
    got = {r["host"]: r for r in q_maxmin_budget_alloc(spark, SF).collect()}
    assert set(got) == set(demand)
    for h in demand:
        g = got[h]
        assert g["demand"] == demand[h]
        assert g["alloc"] == alloc[h], (h, g["alloc"], alloc[h])
        assert g["capped"] == (1 if demand[h] > level else 0)
        assert g["fill_level"] == level


def test_maxmin_fairness_properties(spark):
    """Budget spent exactly (demand-saturated fixture), nobody gets
    more than their demand, and max-min fairness: every capped host's
    allocation is within 1 of every other capped host's."""
    rows = q_maxmin_budget_alloc(spark, SF).collect()
    assert sum(r["alloc"] for r in rows) == MMF_BUDGET
    capped_allocs = [r["alloc"] for r in rows if r["capped"]]
    assert capped_allocs
    assert max(capped_allocs) - min(capped_allocs) <= 1
    for r in rows:
        assert r["alloc"] <= r["demand"]
        if not r["capped"]:
            assert r["alloc"] == r["demand"]


# ------------------------------------------------- link_prediction_features


def test_lpf_matches_python(spark):
    _, adj = _graph(spark)
    edges = {(u, v) for u in adj for v in adj[u] if u < v}
    nodes = sorted(adj)
    n = len(nodes)
    pos = {(u, v) for u, v in edges if (u * 31 + v) % 3 == 0}
    drawn = set()
    for k in range(LPF_NEG):
        r1 = int(hashlib.md5(f"lpn:a:{k}".encode()).hexdigest()[:15], 16) % n
        r2 = int(hashlib.md5(f"lpn:b:{k}".encode()).hexdigest()[:15], 16) % n
        a, b = nodes[r1], nodes[r2]
        if a != b:
            drawn.add((min(a, b), max(a, b)))
    neg = drawn - edges
    # components
    comp: dict[int, int] = {}
    seen: set[int] = set()
    for s0 in nodes:
        if s0 in seen:
            continue
        stack, mem = [s0], []
        seen.add(s0)
        while stack:
            x = stack.pop()
            mem.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(mem)
        for m in mem:
            comp[m] = root
    got = {(r["u"], r["v"]): r for r in q_link_prediction_features(spark, SF).collect()}
    assert set(got) == pos | neg
    for (u, v), g in got.items():
        label = 1 if (u, v) in pos else 0
        assert g["label"] == label
        assert g["common_neighbors"] == len(adj[u] & adj[v])
        assert g["deg_product"] == len(adj[u]) * len(adj[v])
        assert g["same_component"] == (1 if comp[u] == comp[v] else 0)


def test_lpf_signal_separation(spark):
    """The features carry signal: positives (real edges) average more
    common neighbors than negatives, and every positive pair is
    same-component by definition."""
    rows = q_link_prediction_features(spark, SF).collect()
    pos = [r for r in rows if r["label"] == 1]
    neg = [r for r in rows if r["label"] == 0]
    assert pos and neg
    assert all(r["same_component"] == 1 for r in pos)
    mean_pos = sum(r["common_neighbors"] for r in pos) / len(pos)
    mean_neg = sum(r["common_neighbors"] for r in neg) / len(neg)
    assert mean_pos > mean_neg
