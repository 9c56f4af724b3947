"""Intent tests for the round-6e wave: exact two-sample KS drift,
the rich-club coefficient curve, and the metronome detector's exact
ROC sweep — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: KS is bounded and
located where the python CDFs peak, the rich-club curve is monotone
on the clique fixture, and the ROC sweep moves through all three
regimes (over-sensitive, exact, over-strict).
"""

from __future__ import annotations

import hashlib

from twawler_spark.web_queries import (
    KS_HOSTS,
    KS_PPM,
    RC_KS,
    RC_PPM,
    ROC_KS,
    ROC_PPM,
    TMO_VALUE_MOD,
    q_ks_latency_drift,
    q_metronome_roc,
    q_rich_club,
    q_timing_regularity,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- ks_latency_drift


def test_ks_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    samples: dict[int, list[int]] = {}
    for r in rows:
        h = r["user_id"] % KS_HOSTS
        v = 1 + int(
            hashlib.md5(f"tmo:{r['event_id']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        samples.setdefault(h, []).append(v)
    pooled = sorted(v for vs in samples.values() for v in vs)
    n_all = len(pooled)
    grid = sorted(set(pooled))
    got = {r["host"]: r for r in q_ks_latency_drift(spark, SF).collect()}
    assert set(got) == set(samples)
    for h, vs in samples.items():
        n_h = len(vs)
        vs_sorted = sorted(vs)
        best_gap, best_v = -1, None
        ci = cj = 0
        import bisect

        for v in grid:
            ci = bisect.bisect_right(vs_sorted, v)
            cj = bisect.bisect_right(pooled, v)
            gap = abs(ci * n_all - cj * n_h)
            if gap > best_gap or (gap == best_gap and v < best_v):
                best_gap, best_v = gap, v
        g = got[h]
        assert g["n_h"] == n_h
        assert g["ks_num"] == best_gap, (h, g["ks_num"], best_gap)
        assert g["ks_at_v"] == best_v
        assert g["ks_ppm"] == (best_gap * KS_PPM) // (n_h * n_all)


def test_ks_bounded(spark):
    for r in q_ks_latency_drift(spark, SF).collect():
        assert 0 <= r["ks_ppm"] <= KS_PPM


# ---------------------------------------------------------------- rich_club


def test_rich_club_matches_python(spark):
    edges, adj = _graph(spark)
    got = {r["k"]: r for r in q_rich_club(spark, SF).collect()}
    assert set(got) == set(RC_KS)
    for k in RC_KS:
        rich = {n for n in adj if len(adj[n]) > k}
        e_rich = sum(1 for u, v in edges if u in rich and v in rich)
        g = got[k]
        assert g["n_rich"] == len(rich)
        assert g["e_rich"] == e_rich
        if len(rich) >= 2:
            assert g["phi_ppm"] == (e_rich * RC_PPM * 2) // (
                len(rich) * (len(rich) - 1)
            )
        else:
            assert g["phi_ppm"] == 0


def test_rich_club_monotone_on_clique_fixture(spark):
    """On the clique+periphery graph the rich get denser: phi(k) is
    non-decreasing along the grid while both populations shrink."""
    rows = sorted(q_rich_club(spark, SF).collect(), key=lambda r: r["k"])
    for a, b in zip(rows, rows[1:]):
        assert a["n_rich"] >= b["n_rich"]
        assert a["e_rich"] >= b["e_rich"]
        if b["n_rich"] >= 2:
            assert a["phi_ppm"] <= b["phi_ppm"]


# ------------------------------------------------------------ metronome_roc


def test_roc_matches_moments(spark):
    """Recompute every ROC cell from timing_regularity's own moment
    rows (the engine surface the sweep consumes)."""
    mom = q_timing_regularity(spark, SF).select(
        "user_id", "sum_g", "disp_num"
    ).collect()
    got = {r["k"]: r for r in q_metronome_roc(spark, SF).collect()}
    assert set(got) == set(ROC_KS)
    for k in ROC_KS:
        tp = fp = fn = tn = 0
        for m in mom:
            flag = m["disp_num"] < (m["sum_g"] * m["sum_g"]) // k
            bot = m["user_id"] < 0
            if flag and bot:
                tp += 1
            elif flag:
                fp += 1
            elif bot:
                fn += 1
            else:
                tn += 1
        g = got[k]
        assert (g["tp"], g["fp"], g["fn"], g["tn"]) == (tp, fp, fn, tn), k
        assert g["tpr_ppm"] == (tp * ROC_PPM) // (tp + fn)
        assert g["fpr_ppm"] == (fp * ROC_PPM) // (fp + tn)


def test_roc_three_regimes(spark):
    """The sweep must traverse over-sensitive (false positives at the
    loose end), exact (perfect separation in the middle), and
    over-strict (false negatives at the tight end)."""
    rows = sorted(q_metronome_roc(spark, SF).collect(), key=lambda r: r["k"])
    assert rows[0]["fp"] > 0, "loose threshold must over-flag organics"
    assert any(
        r["fp"] == 0 and r["fn"] == 0 and r["tp"] > 0 for r in rows
    ), "some middle threshold must separate perfectly"
    assert rows[-1]["fn"] > 0, "tight threshold must miss the bots"
    # monotone: tightening K can only reduce flags
    for a, b in zip(rows, rows[1:]):
        assert a["tp"] + a["fp"] >= b["tp"] + b["fp"]
