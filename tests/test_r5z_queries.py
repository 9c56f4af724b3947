"""Intent tests for the round-5z wave: per-document novelty
valuation, metronome bot-timing detection, and the outlink locality
split — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: novelty credit is
conserved (every shingle credited exactly once), the planted bots
and only plausible candidates trip the metronome flag, and the
locality split reconciles with the outlink total.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import NOV_PPM, q_doc_novelty
from twawler_spark.web_queries import (
    LOC_PPM,
    TREG_BOT_EVENTS,
    TREG_BOTS,
    TREG_K,
    TREG_MIN_EVENTS,
    q_link_locality,
    q_timing_regularity,
)

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------------- doc_novelty


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    n = max(len(toks) - 4, 1)
    return {" ".join(toks[i : i + 5]) for i in range(n)} - {""}


def test_novelty_matches_python(spark):
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    first: dict[str, int] = {}
    per: dict[int, dict] = {}
    for doc_id, text in docs:
        sh = _shingles(text)
        per[doc_id] = {"n_shingles": len(sh), "sh": sh}
        for t in sh:
            first.setdefault(t, doc_id)
    got = {r["doc_id"]: r for r in q_doc_novelty(spark, SF).collect()}
    assert set(got) == set(per)
    for doc_id, w in per.items():
        novel = sum(1 for t in w["sh"] if first[t] == doc_id)
        g = got[doc_id]
        assert g["n_shingles"] == w["n_shingles"]
        assert g["n_novel"] == novel
        assert g["novelty_ppm"] == (novel * NOV_PPM) // w["n_shingles"]


def test_novelty_credit_conserved(spark):
    """Every distinct shingle is credited to exactly one document:
    sum of novel counts == distinct shingle universe size; doc 0 (no
    predecessors) is fully novel."""
    rows = {r["doc_id"]: r for r in q_doc_novelty(spark, SF).collect()}
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    universe = set()
    for _, text in docs:
        universe |= _shingles(text)
    assert sum(r["n_novel"] for r in rows.values()) == len(universe)
    first_doc = min(rows)
    assert rows[first_doc]["novelty_ppm"] == NOV_PPM


# -------------------------------------------------------- timing_regularity


def test_timing_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    ).collect()
    series: dict[int, list] = {}
    for r in rows:
        s = int(r["ts"].timestamp())
        series.setdefault(r["user_id"], []).append((s, r["event_id"]))
        if r["event_id"] < TREG_BOT_EVENTS:
            bot = -(1 + r["event_id"] % TREG_BOTS)
            bs = (
                1700000000
                + (r["event_id"] // TREG_BOTS) * 600
                + int(hashlib.md5(f"bot:{r['event_id']}".encode()).hexdigest()[:15], 16) % 3
            )
            series.setdefault(bot, []).append((bs, r["event_id"]))
    want = {}
    for uid, evs in series.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if len(gaps) < TREG_MIN_EVENTS - 1:
            continue
        n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        disp = n * sg2 - sg * sg
        want[uid] = {
            "n_gaps": n,
            "sum_g": sg,
            "sum_g2": sg2,
            "disp_num": disp,
            "cv2_milli": (disp * 1000) // (sg * sg) if sg > 0 else 0,
            "metronome": 1 if TREG_K * disp < sg * sg else 0,
        }
    got = {r["user_id"]: r.asDict() for r in q_timing_regularity(spark, SF).collect()}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        for k in w:
            assert g[k] == w[k], (uid, k, g[k], w[k])


def test_timing_flags_only_bots(spark):
    """The planted metronome accounts (negative ids) trip the flag;
    every organic fixture user sits at CV^2 ~ 1 and does not."""
    rows = q_timing_regularity(spark, SF).collect()
    bots = [r for r in rows if r["user_id"] < 0]
    organic = [r for r in rows if r["user_id"] >= 0]
    assert len(bots) == TREG_BOTS
    assert all(r["metronome"] == 1 for r in bots)
    assert all(r["metronome"] == 0 for r in organic)
    assert all(r["cv2_milli"] < 100 for r in bots)  # CV^2 << 0.1


# ------------------------------------------------------------ link_locality


def test_locality_matches_surface(spark):
    from twawler_spark.crawl_queries import N_HOSTS, _plan
    from twawler_spark.plans.fetcher import discover_outlinks_anchored, fetch_results

    _, plan = _plan(spark, SF)
    links = discover_outlinks_anchored(fetch_results(plan), N_HOSTS).collect()
    plan_hosts = [
        int(r["host"][1:]) for r in plan.select("host").collect()
    ]
    fetched: dict[int, int] = {}
    for h in plan_hosts:
        fetched[h] = fetched.get(h, 0) + 1
    want: dict[int, dict] = {}
    for r in links:
        src = int(r["src_host"][1:].split(".")[0])
        dst = int(r["url"].split("https://h")[1].split(".")[0])
        c = want.setdefault(src, {"n_links": 0, "n_internal": 0})
        c["n_links"] += 1
        c["n_internal"] += 1 if src == dst else 0
    got = {r["host"]: r for r in q_link_locality(spark, SF).collect()}
    assert set(got) == set(want)
    for h, w in want.items():
        g = got[h]
        assert g["n_links"] == w["n_links"]
        assert g["n_internal"] == w["n_internal"]
        assert g["n_external"] == w["n_links"] - w["n_internal"]
        assert g["n_urls_fetched"] == fetched[h]
        assert g["internal_ppm"] == (w["n_internal"] * LOC_PPM) // w["n_links"]
        assert g["discovery_per_fetch_ppm"] == (
            (w["n_links"] - w["n_internal"]) * LOC_PPM
        ) // fetched[h]


def test_locality_split_reconciles(spark):
    rows = q_link_locality(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_internal"] + r["n_external"] == r["n_links"]
        assert 0 <= r["internal_ppm"] <= LOC_PPM
