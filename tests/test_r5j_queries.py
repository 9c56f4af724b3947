"""Intent tests for the round-5j wave: k-core peeling, adaptive
per-host latency timeouts, and the TLD/language mismatch audit — each
recomputed by an independent plain-python/numpy third implementation
(the DuckDB oracles already prove Spark==SQL on the registered
fixtures)."""

from __future__ import annotations

import collections
import hashlib

import numpy as np

from twawler_spark.operators.graph import k_core
from twawler_spark.web_queries import (
    KCORE_HUBS,
    KCORE_K,
    KCORE_PERIPHERY,
    KCORE_ROUNDS,
    LAT_HOSTS,
    LAT_JITTER_MOD,
    LAT_TIMEOUT_CAP,
    LAT_TIMEOUT_FACTOR,
    TLD_HOSTS,
    q_host_latency_quantiles,
    q_kcore_hosts,
    q_tld_lang_mismatch,
)

SF = "/root/testdata/sf0.001"


def _peel_py(edges: set[tuple[int, int]], k: int) -> tuple[dict, int]:
    """Independent fixpoint peel: (node -> in-core degree, rounds)."""
    cur = set(edges)
    rounds = 0
    while True:
        deg = collections.Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            return dict(deg), rounds
        cur = nxt
        rounds += 1


def _fixture_edges(spark) -> set[tuple[int, int]]:
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = set()
    for d in ids:
        if d % 3 == 0:
            u = 200 + (d // 3) % KCORE_HUBS
            v = 200 + (d // 3 + 1 + d % 7) % KCORE_HUBS
        else:
            h = hashlib.md5(str(d).encode()).hexdigest()
            u = int(h[0:12], 16) % KCORE_PERIPHERY
            v = int(h[16:28], 16) % KCORE_PERIPHERY
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return edges


def test_kcore_third_implementation(spark):
    """Python fixpoint peel over the registered fixture must equal the
    Spark query's (node, degree) set, the cascade must take >= 2 peel
    rounds (the loop is genuinely exercised), and the fixpoint must
    land inside the oracle's unroll budget KCORE_ROUNDS."""
    edges = _fixture_edges(spark)
    deg, rounds = _peel_py(edges, KCORE_K)
    assert 2 <= rounds < KCORE_ROUNDS
    want = {(n, d) for n, d in deg.items() if d > 0}
    assert want, "fixture must keep a surviving core"
    got = {
        (r["node"], r["degree"])
        for r in q_kcore_hosts(spark, SF).collect()
    }
    assert got == want
    # the planted circulant hub ring IS the surviving core at this SF
    assert {n for n, _ in got} == {200 + i for i in range(KCORE_HUBS)}


def test_kcore_adversarial_shapes(spark):
    """Operator-level edge cases: a path graph (2-core peels to empty
    through a full end-to-end cascade), a clique with a pendant tail
    (the clique survives exactly; the tail cascades away), and k=1
    (every non-isolated node trivially survives)."""
    def run(pairs, k, max_rounds=32):
        df = spark.createDataFrame(pairs, "u long, v long")
        return {
            (r["node"], r["degree"]) for r in k_core(df, k, max_rounds).collect()
        }

    path = [(i, i + 1) for i in range(8)]
    assert run(path, 2) == set()

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12)]
    got = run(clique + tail, 3)
    assert got == {(0, 3), (1, 3), (2, 3), (3, 3)}

    assert run(path, 1) == {(i, 2) for i in range(1, 8)} | {(0, 1), (8, 1)}


def test_latency_quantiles_third_implementation(spark):
    """numpy 'linear' percentiles (the same interpolation contract as
    Spark's exact `percentile` and DuckDB's quantile_cont) recompute
    every host row, including the capped-timeout rule."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "value")
        .collect()
    )
    by_host = collections.defaultdict(list)
    for r in rows:
        h = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0:12], 16)
        by_host[r["user_id"] % LAT_HOSTS].append(
            r["value"] + (h % LAT_JITTER_MOD) / 1e7
        )
    got = {r["host"]: r for r in q_host_latency_quantiles(spark, SF).collect()}
    assert set(got) == set(by_host)
    for h, vals in by_host.items():
        a = np.asarray(vals, dtype=np.float64)
        p50, p95, p99 = (
            float(np.percentile(a, q, method="linear")) for q in (50, 95, 99)
        )
        r = got[h]
        assert r["n_samples"] == len(vals)
        assert abs(r["p50_ms"] - round(p50, 4)) < 1e-9
        assert abs(r["p95_ms"] - round(p95, 4)) < 1e-9
        assert abs(r["p99_ms"] - round(p99, 4)) < 1e-9
        want_to = round(min(LAT_TIMEOUT_CAP, LAT_TIMEOUT_FACTOR * p99), 4)
        assert abs(r["timeout_ms"] - want_to) < 1e-9


def test_latency_approx_percentile_path(spark):
    """The unbounded-cardinality scale path: approx_percentile's
    fixed-size sketch is the drop-in when per-host groups outgrow the
    exact aggregate's buffer. Its contract is RANK error (<= 1/accuracy
    of n), not value error, so the assertion is positional: the sketch
    p95 must be an actual sample within one position of the true p95
    order statistics. (sf0.001 only populates a subset of the
    LAT_HOSTS buckets — the host set is taken from the data.)"""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF}/events.parquet").select(
        F.pmod(F.col("user_id"), F.lit(LAT_HOSTS)).alias("host"),
        F.col("value").alias("lat"),
    )
    both = (
        e.groupBy("host")
        .agg(
            F.collect_list("lat").alias("vals"),
            F.expr("approx_percentile(lat, 0.95, 10000)").alias("approx"),
        )
        .collect()
    )
    assert 1 <= len(both) <= LAT_HOSTS
    for r in both:
        vals = sorted(r["vals"])
        n = len(vals)
        pos = 0.95 * (n - 1)
        lo = vals[max(0, int(np.floor(pos)) - 1)]
        hi = vals[min(n - 1, int(np.ceil(pos)) + 1)]
        assert lo <= r["approx"] <= hi
        assert r["approx"] in vals  # sketch returns a real sample


def test_tld_mismatch_third_implementation(spark):
    """Plain-python recount of every host's mismatch share, and the
    fixture must exercise BOTH verdict branches."""
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    exp = {"gr": "el", "com": "en", "de": "de"}
    n = collections.Counter()
    bad = collections.Counter()
    for r in rows:
        hn = r["doc_id"] % TLD_HOSTS
        tld = ("gr", "com", "de")[hn % 3]
        host = f"h{hn}.{tld}"
        n[host] += 1
        if r["lang"] != exp[tld]:
            bad[host] += 1
    got = {r["host"]: r for r in q_tld_lang_mismatch(spark, SF).collect()}
    assert set(got) == set(n)
    verdicts = set()
    for host in n:
        r = got[host]
        assert r["n_docs"] == n[host]
        assert r["n_mismatch"] == bad[host]
        assert abs(r["mismatch_pct"] - round(100.0 * bad[host] / n[host], 4)) < 1e-9
        assert r["tld_misroute"] == (bad[host] / n[host] > 0.5)
        verdicts.add(r["tld_misroute"])
    assert verdicts == {True, False}
