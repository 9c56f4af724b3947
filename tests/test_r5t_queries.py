"""Intent tests for the round-5t wave: the top-k prefix-overlap
curve, the hindsight bandit regret ledger, and the bigram
successor-branching audit — each recomputed by an independent
plain-python third implementation (the DuckDB oracles already prove
Spark==SQL on the registered fixtures), plus structural guarantees:
the overlap curve is monotone in the count and bounded by depth, the
regret ledger is non-negative with the best arm at zero, and the
branching rows dominate their top successor consistently.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import BR_PPM, q_bigram_branching
from twawler_spark.web_queries import (
    REGRET_PPM,
    TOPK_D,
    TOPK_PPM,
    UCB_HOSTS,
    q_topk_overlap_curve,
    q_ucb_regret_audit,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# ------------------------------------------------------ topk_overlap_curve


def _signatures(spark):
    _, adj = _graph(spark)
    tri = {n: 0 for n in adj}
    for u in sorted(adj):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return {n: (len(adj[n]), tri[n]) for n in adj if len(adj[n]) >= 2}


def test_topk_overlap_matches_python(spark):
    sig = _signatures(spark)
    by_deg = sorted(sig, key=lambda n: (-sig[n][0], n))
    by_tri = sorted(sig, key=lambda n: (-sig[n][1], n))
    got = {r["depth"]: r for r in q_topk_overlap_curve(spark, SF).collect()}
    assert set(got) == set(range(1, TOPK_D + 1))
    for d in range(1, TOPK_D + 1):
        ov = len(set(by_deg[:d]) & set(by_tri[:d]))
        g = got[d]
        assert g["n_overlap"] == ov, (d, g["n_overlap"], ov)
        assert g["overlap_ppm"] == (ov * TOPK_PPM) // d
        assert g["jaccard_ppm"] == (ov * TOPK_PPM) // (2 * d - ov)


def test_topk_overlap_structure(spark):
    """Overlap counts are monotone non-decreasing in depth and never
    exceed the depth; ppm columns stay in [0, 1e6]."""
    rows = sorted(q_topk_overlap_curve(spark, SF).collect(), key=lambda r: r["depth"])
    prev = 0
    for r in rows:
        assert prev <= r["n_overlap"] <= r["depth"]
        prev = r["n_overlap"]
        assert 0 <= r["overlap_ppm"] <= TOPK_PPM
        assert 0 <= r["jaccard_ppm"] <= TOPK_PPM


# -------------------------------------------------------- ucb_regret_audit


def test_regret_matches_python(spark):
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    pulls: dict[int, int] = {}
    wins: dict[int, int] = {}
    for eid in eids:
        h = eid % UCB_HOSTS
        pulls[h] = pulls.get(h, 0) + 1
        if hashlib.md5(f"ucb:{eid}".encode()).hexdigest()[0] in _ODD:
            wins[h] = wins.get(h, 0) + 1
        else:
            wins.setdefault(h, 0)
    best = min(pulls, key=lambda h: (-(wins[h] / pulls[h]), h))
    got = {r["host"]: r for r in q_ucb_regret_audit(spark, SF).collect()}
    assert set(got) == set(pulls)
    for h in pulls:
        g = got[h]
        gap = wins[best] * pulls[h] - wins[h] * pulls[best]
        assert g["pulls"] == pulls[h]
        assert g["wins"] == wins[h]
        assert g["best_host"] == best
        assert g["is_best"] == (1 if h == best else 0)
        assert g["gap_num"] == gap
        assert g["mean_gap_ppm"] == (gap * REGRET_PPM) // (pulls[best] * pulls[h])


def test_regret_nonnegative_and_zero_at_best(spark):
    rows = q_ucb_regret_audit(spark, SF).collect()
    assert sum(r["is_best"] for r in rows) == 1
    for r in rows:
        assert r["gap_num"] >= 0
        if r["is_best"]:
            assert r["gap_num"] == 0 and r["mean_gap_ppm"] == 0


# -------------------------------------------------------- bigram_branching


def test_branching_matches_python(spark):
    docs = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    cnt: dict[tuple, int] = {}
    for text in docs:
        ts = text.lower().split(" ")
        for a, b in zip(ts, ts[1:]):
            if a and b:
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
    want: dict[str, dict] = {}
    for (a, b), c in cnt.items():
        e = want.setdefault(a, {"n_pairs": 0, "succ": {}})
        e["n_pairs"] += c
        e["succ"][b] = c
    got = {r["tok"]: r for r in q_bigram_branching(spark, SF).collect()}
    assert set(got) == set(want)
    for tok, w in want.items():
        g = got[tok]
        top = min(w["succ"], key=lambda s: (-w["succ"][s], s))
        assert g["n_pairs"] == w["n_pairs"]
        assert g["n_successors"] == len(w["succ"])
        assert g["top_next"] == top
        assert g["top_next_n"] == w["succ"][top]
        assert g["top_share_ppm"] == (w["succ"][top] * BR_PPM) // w["n_pairs"]


def test_branching_dominance(spark):
    """The top successor's count can never exceed the token's pair
    mass and its share bounds 1/n_successors from above."""
    for r in q_bigram_branching(spark, SF).collect():
        assert r["top_next_n"] <= r["n_pairs"]
        assert r["top_share_ppm"] * r["n_successors"] >= BR_PPM - r["n_successors"]
