"""Intent tests for the round-6m wave: exact 1-D earth-mover
distance, CR-k vocabulary concentration, and the joint timeout x
retry cost grid — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus structural guarantees: EMD reconciles
with a direct transport computation, CR-k is monotone and bounded,
and the joint cost factors into its attempts x mean-time pieces.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import TC_KS, TC_PPM, q_term_concentration
from twawler_spark.web_queries import (
    EMD_HOSTS,
    TMO_GRID,
    TMO_HOSTS,
    TMO_VALUE_MOD,
    TRC_PPM,
    TRC_RETRIES,
    q_emd_latency_drift,
    q_timeout_retry_cost,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- emd_latency_drift


def test_emd_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    samples: dict[int, list[int]] = {}
    for r in rows:
        h = r["user_id"] % EMD_HOSTS
        v = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        samples.setdefault(h, []).append(v)
    pooled = sorted(v for vs in samples.values() for v in vs)
    n_all = len(pooled)
    grid = sorted(set(pooled))
    import bisect

    got = {r["host"]: r for r in q_emd_latency_drift(spark, SF).collect()}
    assert set(got) == set(samples)
    for h, vs in samples.items():
        vs_sorted = sorted(vs)
        n_h = len(vs_sorted)
        emd = 0
        for v, v_next in zip(grid, grid[1:]):
            ch = bisect.bisect_right(vs_sorted, v)
            ca = bisect.bisect_right(pooled, v)
            emd += abs(ch * n_all - ca * n_h) * (v_next - v)
        g = got[h]
        assert g["n_h"] == n_h
        assert g["emd_num"] == emd, (h, g["emd_num"], emd)
        assert g["emd_us"] == emd // (n_h * n_all)
        assert g["emd_range_ppm"] == (emd // (n_h * n_all)) * 1_000_000 // TMO_VALUE_MOD


def test_emd_nonnegative_and_bounded(spark):
    """EMD is non-negative and below the full value range (the
    theoretical maximum transport for distributions on [1, MOD])."""
    for r in q_emd_latency_drift(spark, SF).collect():
        assert r["emd_num"] >= 0
        assert 0 <= r["emd_us"] < TMO_VALUE_MOD


# -------------------------------------------------------- term_concentration


def test_concentration_matches_python(spark):
    docs = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    counts: dict[str, int] = {}
    for text in docs:
        for t in text.lower().split(" "):
            if t:
                counts[t] = counts.get(t, 0) + 1
    order = sorted(counts, key=lambda t: (-counts[t], t))
    mass = sum(counts.values())
    got = {r["k"]: r for r in q_term_concentration(spark, SF).collect()}
    assert set(got) == set(TC_KS)
    for k in TC_KS:
        top = sum(counts[t] for t in order[:k])
        g = got[k]
        assert g["top_k_mass"] == top
        assert g["total_mass"] == mass
        assert g["cr_ppm"] == (top * TC_PPM) // mass


def test_concentration_monotone_bounded(spark):
    """CR-k grows with k and never exceeds 1e6; on the 32-term
    near-uniform vocabulary CR-16 sits near half the mass (not a
    heavy-tail corpus — which is itself the informative reading)."""
    rows = sorted(q_term_concentration(spark, SF).collect(), key=lambda r: r["k"])
    for a, b in zip(rows, rows[1:]):
        assert a["cr_ppm"] < b["cr_ppm"]
    assert rows[-1]["cr_ppm"] <= TC_PPM
    assert 350_000 < rows[-1]["cr_ppm"] < 700_000


# -------------------------------------------------------- timeout_retry_cost


def test_joint_cost_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    cells: dict[tuple, dict] = {}
    for r in rows:
        if r["event_id"] % 10 != 0:
            continue
        h = r["user_id"] % TMO_HOSTS
        lat = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        for t in TMO_GRID:
            c = cells.setdefault((h, t), {"n": 0, "lost": 0, "spent": 0})
            c["n"] += 1
            c["lost"] += 1 if lat > t else 0
            c["spent"] += min(lat, t)
    got = {
        (r["host"], r["timeout_us"]): r
        for r in q_timeout_retry_cost(spark, SF).collect()
    }
    assert set(got) == set(cells)
    R = TRC_RETRIES
    for key, w in cells.items():
        n, lost, spent = w["n"], w["lost"], w["spent"]
        series = sum(lost**k * n ** (R - k) for k in range(R + 1))
        g = got[key]
        assert g["n"] == n and g["lost"] == lost
        assert g["p_lost_ppm"] == (lost * TRC_PPM) // n
        assert g["attempts_ppm"] == (series * TRC_PPM) // (n**R)
        assert g["expected_us"] == (series * spent) // (n**R * n)


def test_joint_cost_tradeoff(spark):
    """The two cost drivers move oppositely in the timeout: attempts
    fall (fewer losses) while per-attempt time rises — both monotone
    per host across the grid."""
    rows = q_timeout_retry_cost(spark, SF).collect()
    by_host: dict[int, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        rs.sort(key=lambda r: r["timeout_us"])
        for a, b in zip(rs, rs[1:]):
            assert a["attempts_ppm"] >= b["attempts_ppm"]
            assert a["p_lost_ppm"] >= b["p_lost_ppm"]
        assert rs[-1]["attempts_ppm"] == TRC_PPM  # max timeout loses nothing
