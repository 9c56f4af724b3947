"""Intent tests for the round-5r wave: Weisfeiler-Lehman host colors,
the rendezvous-hash resize audit, and Jain scheduling fairness — each
recomputed by an independent plain-python third implementation (the
DuckDB oracles already prove Spark==SQL on the registered fixtures),
plus the structural guarantees each operator ships: WL refinement
only splits classes (never merges), HRW resize moves keys ONLY to the
new crawler at ~1/(C+1) share, and the Jain index is exact and
bounded by (1/n, 1].
"""

from __future__ import annotations

import hashlib

from twawler_spark.web_queries import (
    JAIN_PPM,
    RING_CRAWLERS,
    RING_PPM,
    WL_ROUNDS,
    q_ring_rebalance,
    q_sched_fairness,
    q_wl_host_hash,
)

from tests.test_r5p_queries import _py_edges

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ wl_host_hash


def _py_wl(adj: dict[int, set[int]]) -> dict[int, str]:
    colors = {n: str(len(nbrs)) for n, nbrs in adj.items()}
    for _ in range(WL_ROUNDS):
        colors = {
            n: hashlib.md5(
                (colors[n] + "|" + ",".join(sorted(colors[u] for u in adj[n]))).encode()
            ).hexdigest()
            for n in adj
        }
    return colors


def test_wl_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for u, v in _py_edges(doc_ids):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    colors = _py_wl(adj)
    want: dict[str, dict] = {}
    for n, c in colors.items():
        e = want.setdefault(c, {"n_nodes": 0, "sum_node_ids": 0, "min_node_id": None})
        e["n_nodes"] += 1
        e["sum_node_ids"] += n
        e["min_node_id"] = n if e["min_node_id"] is None else min(e["min_node_id"], n)
    got = {r["wl_color"]: r for r in q_wl_host_hash(spark, SF).collect()}
    assert set(got) == set(want)
    for c, w in want.items():
        g = got[c]
        for k in ("n_nodes", "sum_node_ids", "min_node_id"):
            assert g[k] == w[k], (c, k)


def test_wl_refines_degree_partition(spark):
    """1-WL refinement can only SPLIT the initial degree partition:
    the number of final color classes is >= the number of distinct
    degrees, and two nodes sharing a final color share a degree.
    Structurally identical clique nodes must share one color."""
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for u, v in _py_edges(doc_ids):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    colors = _py_wl(adj)
    rows = q_wl_host_hash(spark, SF).collect()
    assert len(rows) >= len({len(nbrs) for nbrs in adj.values()})
    by_color: dict[str, set[int]] = {}
    for n, c in colors.items():
        by_color.setdefault(c, set()).add(len(adj[n]))
    assert all(len(degs) == 1 for degs in by_color.values())


# --------------------------------------------------------- ring_rebalance


def test_ring_matches_python(spark):
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    want: dict[int, dict] = {}
    for eid in eids:
        k = f"u:{eid}"
        ws = [
            hashlib.md5(f"ring:{c}:{k}".encode()).hexdigest()
            for c in range(RING_CRAWLERS + 1)
        ]
        old = max(range(RING_CRAWLERS), key=lambda c: ws[c])
        new = max(range(RING_CRAWLERS + 1), key=lambda c: ws[c])
        e = want.setdefault(
            old, {"n_keys": 0, "n_moved_to_new": 0, "n_moved_elsewhere": 0}
        )
        e["n_keys"] += 1
        if new != old:
            if new == RING_CRAWLERS:
                e["n_moved_to_new"] += 1
            else:
                e["n_moved_elsewhere"] += 1
    got = {r["crawler"]: r.asDict() for r in q_ring_rebalance(spark, SF).collect()}
    assert set(got) == set(want)
    for c, w in want.items():
        g = got[c]
        for k in ("n_keys", "n_moved_to_new", "n_moved_elsewhere"):
            assert g[k] == w[k], (c, k)
        assert g["moved_ppm"] == (
            (w["n_moved_to_new"] + w["n_moved_elsewhere"]) * RING_PPM
        ) // w["n_keys"]


def test_ring_minimal_disruption(spark):
    """HRW guarantee: every moved key goes TO the new crawler; global
    movement sits near the ideal 1/(C+1) share."""
    rows = q_ring_rebalance(spark, SF).collect()
    assert all(r["n_moved_elsewhere"] == 0 for r in rows)
    total = sum(r["n_keys"] for r in rows)
    moved = sum(r["n_moved_to_new"] for r in rows)
    ideal = 1 / (RING_CRAWLERS + 1)
    assert 0.5 * ideal <= moved / total <= 2.0 * ideal


# --------------------------------------------------------- sched_fairness


def test_fairness_matches_python(spark):
    from twawler_spark.crawl_queries import _plan

    _, plan = _plan(spark, SF)
    counts: dict[str, int] = {}
    for r in plan.select("host").collect():
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    xs = list(counts.values())
    n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
    jain = (s1 * s1 * JAIN_PPM) // (n * s2)
    hist: dict[int, int] = {}
    for x in xs:
        hist[x] = hist.get(x, 0) + 1
    got = {r["n_scheduled"]: r for r in q_sched_fairness(spark, SF).collect()}
    assert set(got) == set(hist)
    for x, nh in hist.items():
        g = got[x]
        assert g["n_hosts"] == nh
        assert g["n_hosts_total"] == n
        assert g["s1"] == s1
        assert g["s2"] == s2
        assert g["jain_ppm"] == jain
    # Jain bounds: 1/n < J <= 1
    assert JAIN_PPM // n < jain <= JAIN_PPM
