"""Intent tests for the round-5h wave: pointer-doubling redirect-chain
resolution and bucket-prefiltered heavy hitters — each recomputed by an
independent plain-python third implementation (the DuckDB oracles
already prove Spark==SQL on the registered fixtures)."""

from __future__ import annotations

import hashlib
import math

from twawler_spark.operators.graph import resolve_chains
from twawler_spark.web_queries import (
    HH_THRESH,
    HH_ZIPF_N,
    REDIRECT_MAX_HOPS,
    q_heavy_hitters,
    q_redirect_resolve,
)

SF = "/root/testdata/sf0.001"


def _resolve_py(edges: dict[int, int], max_hops: int) -> dict[int, tuple]:
    """Independent hop-at-a-time walk with cycle detection."""
    nodes = set(edges) | set(edges.values())
    out = {}
    for n in nodes:
        cur, hops, seen = n, 0, {n}
        status = "resolved"
        while cur in edges:
            cur = edges[cur]
            hops += 1
            if cur in seen or hops > max_hops:
                status = "loop"
                break
            seen.add(cur)
        if status == "resolved":
            out[n] = (cur, hops, "resolved")
        else:
            out[n] = (None, None, "loop")
    return out


def test_resolve_chains_adversarial_graph(spark):
    """One functional graph covering every shape at max_hops=8: a short
    chain, a branch feeding into it, a 2-cycle with a feeder, a
    self-loop, a chain of EXACTLY max_hops, and one of max_hops+1 (its
    head must flip to 'loop', its second node must stay 'resolved')."""
    max_hops = 8
    edges = {1: 2, 2: 3, 3: 4, 10: 2, 20: 21, 21: 20, 22: 20, 30: 30}
    edges.update({40 + i: 41 + i for i in range(8)})   # 40 -> ... -> 48
    edges.update({50 + i: 51 + i for i in range(9)})   # 50 -> ... -> 59
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges.items()], "src long, dst long"
    )
    got = {
        r["node"]: (r["final"], r["hops"], r["status"])
        for r in resolve_chains(df, max_hops).collect()
    }
    want = _resolve_py(edges, max_hops)
    assert got == want
    # spot-check the boundary semantics explicitly
    assert got[40] == (48, 8, "resolved")   # exactly max_hops resolves
    assert got[50] == (None, None, "loop")  # max_hops+1 rejects
    assert got[51] == (59, 8, "resolved")   # its tail still resolves
    assert got[30] == (None, None, "loop")  # self-loop
    assert got[22] == (None, None, "loop")  # feeder into a cycle
    assert got[4] == (4, 0, "resolved")     # terminal resolves to itself


def test_redirect_resolve_third_implementation(spark):
    """Python rebuild of the registered fixture (md5-coin chains over
    user ranks + injected 3-cycle) must match the Spark query row-set."""
    users = sorted(
        r["user_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    )
    m = len(users)
    edges = {}
    for rid in range(1, m + 1):
        coin = int(hashlib.md5(f"rd:{rid}".encode()).hexdigest()[:15], 16) % 4 == 0
        if not (coin or rid == m):
            edges[rid] = rid + 1
    edges[m + 1], edges[m + 2], edges[m + 3] = m + 2, m + 3, m + 1
    want = {
        n: (f, h, s)
        for n, (f, h, s) in _resolve_py(edges, REDIRECT_MAX_HOPS).items()
    }
    got = {
        r["url_id"]: (r["final_id"], r["hops"], r["status"])
        for r in q_redirect_resolve(spark, SF).collect()
    }
    assert got == want
    assert any(s == "loop" for _, _, s in got.values())  # cycle exercised


def test_heavy_hitters_third_implementation(spark):
    """Python exact recount over the raw parquet: the bucket-prefiltered
    plan must return EXACTLY the naive heavy set (the prefilter is a
    superset filter, never a sampler)."""
    rows = spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    counts: dict[str, int] = {}
    for r in rows:
        page = math.floor(HH_ZIPF_N / (1 + r["event_id"] % HH_ZIPF_N))
        url = f"https://h{page % 20}.example.com/p/{page}"
        counts[url] = counts.get(url, 0) + 1
    total = sum(counts.values())
    want = {u: c for u, c in counts.items() if c * HH_THRESH > total}
    got = {r["url"]: r for r in q_heavy_hitters(spark, SF).collect()}
    assert {u: r["n_hits"] for u, r in got.items()} == want
    for u, r in got.items():
        assert abs(r["share_pct"] - 100.0 * want[u] / total) < 5e-4


def test_soft404_third_implementation(spark):
    """Python recount of the per-host fingerprint shares; the planted
    error templates must all be suspect, the benign welcome repeats
    must all be below threshold."""
    from twawler_spark.web_queries import (
        SOFT404_BENIGN,
        SOFT404_EVERY,
        SOFT404_MIN_SHARE,
        q_soft404_detect,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    groups: dict[tuple[int, str], int] = {}
    hostn: dict[int, int] = {}
    for r in rows:
        h = r["doc_id"] % 20
        if r["doc_id"] % SOFT404_EVERY == 0:
            body = f"error 404 not found h{h}"
        elif r["doc_id"] % SOFT404_BENIGN == 1:
            body = f"welcome to host h{h}"
        else:
            body = r["text"]
        fp = hashlib.md5(body.strip().lower().encode()).hexdigest()
        groups[(h, fp)] = groups.get((h, fp), 0) + 1
        hostn[h] = hostn.get(h, 0) + 1
    want = {
        (h, fp): (n, hostn[h], n / hostn[h] >= SOFT404_MIN_SHARE)
        for (h, fp), n in groups.items()
        if n >= 2
    }
    got = {
        (r["host"], r["fp"]): (r["n_docs"], r["host_docs"], r["soft404_suspect"])
        for r in q_soft404_detect(spark, SF).collect()
    }
    assert got == want
    verdicts = {v[2] for v in got.values()}
    err_fps = {
        (h, hashlib.md5(f"error 404 not found h{h}".encode()).hexdigest())
        for h in hostn
    }
    assert all(got[k][2] for k in err_fps if k in got)  # planted errors flagged
    assert verdicts == {True, False}  # both branches exercised


def test_resolve_chains_randomized_forest(spark):
    """30 seeded random functional graphs (disjoint id ranges, random
    successor per node with random edge density — chains, trees into
    cycles, long tangles) resolved in ONE Spark run must match the
    python walker node-for-node, including exact hop counts."""
    import random

    rng = random.Random(20260819)
    edges: dict[int, int] = {}
    for g in range(30):
        base = g * 1000
        n = rng.randint(2, 40)
        for i in range(n):
            if rng.random() < 0.8:  # 20% terminals
                edges[base + i] = base + rng.randrange(n)
    max_hops = 16
    df = spark.createDataFrame(
        sorted((int(s), int(d)) for s, d in edges.items()),
        "src long, dst long",
    )
    got = {
        r["node"]: (r["final"], r["hops"], r["status"])
        for r in resolve_chains(df, max_hops).collect()
    }
    want = _resolve_py(edges, max_hops)
    assert got == want
    statuses = {s for _, _, s in got.values()}
    assert statuses == {"resolved", "loop"}  # both outcomes present
