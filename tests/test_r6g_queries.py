"""Intent tests for the round-6g wave: all-integer Katz-3
centrality, pagination-stitch detection, and Theil-Sen robust
regression — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: Katz walk counts
satisfy the message-passing recurrences, every planted page split
(and nothing else) is stitched, and the Theil-Sen median denoises
to the exact generative rate.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.web_queries import (
    SHRINK_HOSTS,
    STITCH_DOCS,
    STITCH_K,
    TS_PPM,
    q_katz3_centrality,
    q_page_stitch_detect,
    q_theil_sen_slope,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# --------------------------------------------------------- katz3_centrality


def test_katz_matches_python(spark):
    _, adj = _graph(spark)
    w1 = {n: len(adj[n]) for n in adj}
    w2 = {n: sum(w1[u] for u in adj[n]) for n in adj}
    w3 = {n: sum(w2[u] for u in adj[n]) for n in adj}
    got = {r["node"]: r for r in q_katz3_centrality(spark, SF).collect()}
    assert set(got) == set(adj)
    for n in adj:
        g = got[n]
        assert g["w1"] == w1[n]
        assert g["w2"] == w2[n]
        assert g["w3"] == w3[n]
        assert g["katz_x8"] == 4 * w1[n] + 2 * w2[n] + w3[n]
    order = sorted(adj, key=lambda n: (-got[n]["katz_x8"], n))
    for i, n in enumerate(order):
        assert got[n]["katz_rank"] == i + 1


def test_katz_walk_identities(spark):
    """Global identities: sum w1 = 2m, sum w2 = sum of degree^2, and
    Katz strictly refines the degree ordering somewhere (two equal-
    degree nodes with different neighborhoods separate)."""
    rows = q_katz3_centrality(spark, SF).collect()
    _, adj = _graph(spark)
    m2 = sum(len(v) for v in adj.values())
    assert sum(r["w1"] for r in rows) == m2
    assert sum(r["w2"] for r in rows) == sum(len(adj[n]) ** 2 for n in adj)
    by_deg: dict[int, set] = {}
    for r in rows:
        by_deg.setdefault(r["w1"], set()).add(r["katz_x8"])
    assert any(len(ks) > 1 for ks in by_deg.values())


# ------------------------------------------------------- page_stitch_detect


def test_stitch_finds_exactly_planted(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    planted = {
        doc_id
        for doc_id, text in docs.items()
        if doc_id < STITCH_DOCS
        and doc_id % 3 == 0
        and len(text.split(" ")) >= 2 * STITCH_K
    }
    got = [
        (r["doc_a"], r["doc_b"])
        for r in q_page_stitch_detect(spark, SF).collect()
    ]
    expected = {(f"{d}_p1", f"{d}_p2") for d in planted}
    assert set(got) == expected, (sorted(set(got) - expected)[:3],
                                  sorted(expected - set(got))[:3])
    assert len(got) == len(expected)  # no duplicates, no accidentals


def test_stitch_boundary_is_real(spark):
    """The reported boundary fingerprint matches the overlap actually
    shared by the split halves, and token counts reconcile with the
    original up to the duplicated overlap."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in q_page_stitch_detect(spark, SF).collect():
        base = int(r["doc_a"].split("_")[0])
        toks = docs[base].split(" ")
        h = len(toks) // 2
        overlap = " ".join(toks[h : h + STITCH_K])
        assert r["boundary_md5"] == hashlib.md5(overlap.encode()).hexdigest()
        assert r["tokens_a"] + r["tokens_b"] == len(toks) + STITCH_K


# --------------------------------------------------------- theil_sen_slope


def test_theil_sen_matches_python(spark):
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
    hosts = sorted(pulls)
    slopes = []
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            dx = pulls[b] - pulls[a]
            dy = wins[b] - wins[a]
            if dx == 0:
                continue
            if dx < 0:
                dx, dy = -dx, -dy
            slopes.append((dy, dx))
    slopes.sort(key=lambda s: (s[0] / s[1], s[0], s[1]))
    med = slopes[(len(slopes) + 1) // 2 - 1]
    row = q_theil_sen_slope(spark, SF).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert (row["slope_dy"], row["slope_dx"]) == med
    expect_ppm = (
        (med[0] * TS_PPM) // med[1]
        if med[0] >= 0
        else -(((-med[0]) * TS_PPM) // med[1])
    )
    assert row["slope_ppm"] == expect_ppm
    assert row["pooled_rate_ppm"] == (
        sum(wins.values()) * TS_PPM
    ) // sum(pulls.values())


def test_theil_sen_denoises_to_generative_rate(spark):
    """The md5 parity reward is a fair coin, so the robust slope must
    sit within a tight band of 500000 ppm — closer than many single-
    host raw rates get."""
    row = q_theil_sen_slope(spark, SF).collect()[0]
    assert abs(row["slope_ppm"] - 500_000) < 60_000
