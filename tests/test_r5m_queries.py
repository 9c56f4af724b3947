"""Intent tests for the round-5m wave: HDR-style quantile sketch,
HLL round-merge, and degree-ordered triangle counting — each
recomputed by an independent plain-python third implementation (the
DuckDB oracles already prove Spark==SQL on the registered fixtures),
plus randomized-graph equivalence for the triangle operator and the
structural sketch guarantees (one-sided quantile error bound, merge
== one-pass)."""

from __future__ import annotations

import hashlib
import math
from itertools import combinations

from twawler_spark.operators.graph import triangle_counts
from twawler_spark.sketch_queries import (
    HDR_HOSTS,
    HDR_QS,
    HDR_SUB_BITS,
    HDR_VALUE_MOD,
    q_hdr_quantiles,
    q_hll_distinct,
    q_hll_merge_rounds,
)
from twawler_spark.web_queries import (
    TRI_HUB_BASE,
    TRI_HUBS,
    TRI_PERIPHERY,
    q_triangle_hosts,
)

SF = "/root/testdata/sf0.001"


def _md5_60(prefix: str, s: str) -> int:
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:15], 16)


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    ).collect()


# ------------------------------------------------------- hdr_quantiles


def _hdr_bucket(v: int) -> int:
    shift = max(v.bit_length() - (1 + HDR_SUB_BITS), 0)
    return v - (v % (1 << shift))


def _rank_pick(sorted_vals: list, q: float) -> int:
    thr = math.ceil(q * len(sorted_vals))
    return sorted_vals[thr - 1]


def test_hdr_quantiles_matches_python(spark):
    """Spark sketch == dense plain-python bucketing per (host, q);
    exact column == rank-based quantile of the raw values; the
    structural guarantee est <= exact < est*(1+2^-5) holds per row."""
    by_host: dict[int, list] = {}
    for r in _events(spark):
        v = 1 + _md5_60("hdr:", str(r["event_id"])) % HDR_VALUE_MOD
        by_host.setdefault(r["user_id"] % HDR_HOSTS, []).append(v)

    rows = {
        (r["host"], r["q"]): r for r in q_hdr_quantiles(spark, SF).collect()
    }
    assert set(rows) == {(h, q) for h in by_host for q in HDR_QS}
    for (host, q), r in rows.items():
        vals = sorted(by_host[host])
        blos = sorted(_hdr_bucket(v) for v in vals)
        assert r["n"] == len(vals)
        assert r["exact_v"] == _rank_pick(vals, q), (host, q)
        assert r["est_lo"] == _rank_pick(blos, q), (host, q)
        # one-sided bound: the estimate is the bucket lower bound of
        # the exact quantile value
        assert r["est_lo"] <= r["exact_v"]
        assert r["exact_v"] < r["est_lo"] * (1 + 2.0 ** -HDR_SUB_BITS) + 1
        assert 0.0 <= r["rel_err_pct"] <= 100.0 * 2.0 ** -HDR_SUB_BITS


def test_hdr_bucket_merge_is_sum():
    """Mergeability: bucket counts from two halves sum to the one-pass
    sketch, and the merged rank-pick equals the one-pass rank-pick."""
    vals = [1 + _md5_60("hdr:", str(i)) % HDR_VALUE_MOD for i in range(2000)]

    def sketch(vs):
        d: dict[int, int] = {}
        for v in vs:
            b = _hdr_bucket(v)
            d[b] = d.get(b, 0) + 1
        return d

    s1, s2 = sketch(vals[:1000]), sketch(vals[1000:])
    merged = dict(s1)
    for b, c in s2.items():
        merged[b] = merged.get(b, 0) + c
    assert merged == sketch(vals)


# ---------------------------------------------------- hll_merge_rounds


def test_hll_merge_rounds_consistency(spark):
    """Per-round register partials merged by max reproduce the
    one-pass sketch exactly: regs_match is True for every host, the
    two estimates are identical, and the merged estimate equals
    hll_distinct's published estimate for the same stream."""
    merge_rows = {r["host"]: r for r in q_hll_merge_rounds(spark, SF).collect()}
    dist_rows = {r["host"]: r for r in q_hll_distinct(spark, SF).collect()}
    assert set(merge_rows) == set(dist_rows)
    for host, r in merge_rows.items():
        assert r["regs_match"] is True, host
        assert r["est_merged"] == r["est_onepass"], host
        assert r["est_merged"] == dist_rows[host]["n_est"], host
        assert 1 <= r["n_rounds"] <= 4


# ------------------------------------------------------ triangle_hosts


def _tri_py(edges: set) -> dict[int, tuple]:
    """Brute-force per-node triangle counts via sorted-triple scan."""
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            # each triangle found 3 times (once per edge); count the
            # third corner each time -> every corner counted once
            tri[w] += 1
    return {
        n: (len(adj[n]), tri[n]) for n in adj if len(adj[n]) >= 2
    }


def test_triangle_hosts_matches_python(spark):
    """Spark degree-ordered count == brute-force set-intersection on
    the registered fixture; the planted 8-clique contributes exactly
    C(8,3)=56 triangles, 21 per clique node (clique nodes touch no
    periphery edges by construction)."""
    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    edges = set()
    for d in docs:
        if d % 5 == 0:
            a = TRI_HUB_BASE + (d // 5) % TRI_HUBS
            b = TRI_HUB_BASE + (d // 40) % TRI_HUBS
        else:
            h = hashlib.md5(str(d).encode()).hexdigest()
            a = int(h[0:12], 16) % TRI_PERIPHERY
            b = int(h[16:28], 16) % TRI_PERIPHERY
        if a != b:
            edges.add((min(a, b), max(a, b)))
    want = _tri_py(edges)

    got = {
        r["node"]: (r["degree"], r["n_tri"])
        for r in q_triangle_hosts(spark, SF).collect()
    }
    assert got == want
    for i in range(TRI_HUBS):
        assert got[TRI_HUB_BASE + i] == (TRI_HUBS - 1, 21)
    assert sum(t for _, t in got.values()) % 3 == 0  # every corner counted


def test_triangle_counts_randomized_graphs(spark):
    """30 md5-seeded random graphs (varying density, including
    triangle-free sparse draws): the oriented-wedge operator equals
    brute force on every one."""
    for g in range(30):
        n_nodes = 8 + (g % 5) * 6
        n_draws = 4 + g * 3
        edges = set()
        for i in range(n_draws):
            h = hashlib.md5(f"tri{g}:{i}".encode()).hexdigest()
            a = int(h[0:8], 16) % n_nodes
            b = int(h[8:16], 16) % n_nodes
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if not edges:
            continue
        df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = {
            r["node"]: (r["degree"], r["n_tri"])
            for r in triangle_counts(df).collect()
        }
        assert got == _tri_py(edges), f"graph {g}"


def test_triangle_counts_clique_exact(spark):
    """K6: every node has degree 5 and C(5,2)=10 triangles."""
    edges = list(combinations(range(6), 2))
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: (r["degree"], r["n_tri"]) for r in triangle_counts(df).collect()}
    assert got == {n: (5, 10) for n in range(6)}
