"""Intent tests for the round-5x wave: exact modularity of the
component partition, the cross-source duplicate matrix, and the
rank-decile crawl yield curve — each recomputed by an independent
plain-python third implementation (the DuckDB oracles already prove
Spark==SQL on the registered fixtures), plus structural guarantees:
the modularity identity 4m^2 - sum d_c^2 for all-internal partitions,
planted syndication appearing exactly on adjacent source pairs, and
the yield curve reconciling with the round's document total.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import SRC_OVERLAP_PPM, q_source_overlap
from twawler_spark.web_queries import (
    MODQ_PPM,
    YIELD_PPM,
    q_crawl_yield_curve,
    q_modularity_audit,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- modularity_audit


def test_modularity_matches_python(spark):
    edges, adj = _graph(spark)
    # components via DFS
    comp_of: dict[int, int] = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        stack, members = [start], []
        seen.add(start)
        while stack:
            x = stack.pop()
            members.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(members)
        for m in members:
            comp_of[m] = root
    m = len(edges)
    per: dict[int, dict] = {}
    for n in adj:
        c = per.setdefault(comp_of[n], {"n_nodes": 0, "d_mass": 0, "e_int": 0})
        c["n_nodes"] += 1
        c["d_mass"] += len(adj[n])
    for u, v in edges:
        assert comp_of[u] == comp_of[v]
        per[comp_of[u]]["e_int"] += 1
    q_num = sum(4 * m * c["e_int"] - c["d_mass"] ** 2 for c in per.values())
    got = {r["comp"]: r for r in q_modularity_audit(spark, SF).collect()}
    assert set(got) == set(per)
    for comp, w in per.items():
        g = got[comp]
        assert g["n_nodes"] == w["n_nodes"]
        assert g["e_int"] == w["e_int"]
        assert g["d_mass"] == w["d_mass"]
        assert g["contrib"] == 4 * m * w["e_int"] - w["d_mass"] ** 2
        assert g["q_ppm"] == (q_num * MODQ_PPM) // (4 * m * m)


def test_modularity_identity(spark):
    """For a CC partition every edge is internal: sum e_int == m,
    sum d_mass == 2m, and Q in [0, 1e6)."""
    rows = q_modularity_audit(spark, SF).collect()
    e_int = sum(r["e_int"] for r in rows)
    d_mass = sum(r["d_mass"] for r in rows)
    assert d_mass == 2 * e_int
    q = rows[0]["q_ppm"]
    assert all(r["q_ppm"] == q for r in rows)
    assert 0 <= q < MODQ_PPM


# ----------------------------------------------------------- source_overlap


def test_source_overlap_matches_python(spark):
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ]
    fp_by_src: dict[str, set[str]] = {}
    for doc_id, source, text in docs:
        h = hashlib.md5(text.lower().encode()).hexdigest()
        fp_by_src.setdefault(source, set()).add(h)
        if doc_id % 3 == 0:
            nxt = f"src{(int(source[3:]) + 1) % 20}"
            fp_by_src.setdefault(nxt, set()).add(h)
    want = {}
    srcs = sorted(fp_by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(fp_by_src[a] & fp_by_src[b])
            if shared:
                want[(a, b)] = {
                    "n_shared": shared,
                    "fp_a": len(fp_by_src[a]),
                    "fp_b": len(fp_by_src[b]),
                }
    got = {
        (r["src_a"], r["src_b"]): r for r in q_source_overlap(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in ("n_shared", "fp_a", "fp_b"):
            assert g[f] == w[f], (k, f)
        assert g["overlap_ppm"] == (
            w["n_shared"] * SRC_OVERLAP_PPM
        ) // min(w["fp_a"], w["fp_b"])


def test_source_overlap_is_adjacent_only(spark):
    """The planted syndication links src{k} to src{(k+1) mod 20} and
    nothing else — every overlapping pair must be ring-adjacent."""
    rows = q_source_overlap(spark, SF).collect()
    assert rows
    for r in rows:
        a = int(r["src_a"][3:])
        b = int(r["src_b"][3:])
        assert (b - a) % 20 == 1 or (a - b) % 20 == 1
        assert r["n_shared"] >= 1
        assert r["overlap_ppm"] <= SRC_OVERLAP_PPM


# --------------------------------------------------------- crawl_yield_curve


def test_yield_curve_matches_surface(spark):
    """Recompute from the ACTUAL plan + fetched docs of the engine's
    surface; yields reconcile with the round's document total."""
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents
    from twawler_spark.web_queries import YIELD_BUCKETS

    _, plan = _plan(spark, SF)
    plan_rows = plan.select("url_hash", "fetch_rank").collect()
    docs = (
        fetch_documents(plan, ROUND_NO)
        .dropDuplicates(["doc_id"])
        .groupBy("url_hash")
        .count()
        .collect()
    )
    per_url = {r["url_hash"]: r["count"] for r in docs}
    want: dict[int, dict] = {}
    for r in plan_rows:
        d = min(YIELD_BUCKETS - 1, r["fetch_rank"] - 1)
        c = want.setdefault(d, {"n_scheduled": 0, "n_docs": 0, "n_yieldless": 0})
        nd = per_url.get(r["url_hash"], 0)
        c["n_scheduled"] += 1
        c["n_docs"] += nd
        c["n_yieldless"] += 1 if nd == 0 else 0
    got = {r["decile"]: r for r in q_crawl_yield_curve(spark, SF).collect()}
    assert set(got) == set(want)
    for d, w in want.items():
        g = got[d]
        for f in ("n_scheduled", "n_docs", "n_yieldless"):
            assert g[f] == w[f], (d, f)
        assert g["yield_ppm"] == (w["n_docs"] * YIELD_PPM) // w["n_scheduled"]
    assert sum(r["n_docs"] for r in got.values()) == sum(per_url.values())
