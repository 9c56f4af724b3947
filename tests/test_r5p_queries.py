"""Intent tests for the round-5p wave: host-graph degree
assortativity, the join-expressible bloom FPR audit, and Hamilton
largest-remainder stratified sampling — each recomputed by an
independent plain-python third implementation (the DuckDB oracles
already prove Spark==SQL on the registered fixtures), plus the
structural guarantees each operator ships: the assortativity moment
identities, zero bloom false negatives with observed FPR near the
(1-e^{-kn/m})^k design point, and exact-quota apportionment that
never over-draws a stratum.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.training_queries import STRAT_N, q_stratified_sample
from twawler_spark.web_queries import (
    BF_K,
    BF_M_BITS,
    BF_PPM,
    BF_SHARDS,
    KNN_PPM,
    TRI_HUB_BASE,
    TRI_HUBS,
    TRI_PERIPHERY,
    q_bloom_fpr_audit,
    q_degree_assortativity,
)

SF = "/root/testdata/sf0.001"


# -------------------------------------------------- degree_assortativity


def _py_edges(doc_ids: list[int]) -> set[tuple[int, int]]:
    edges = set()
    for did in doc_ids:
        if did % 5 == 0:
            a = TRI_HUB_BASE + (did // 5) % TRI_HUBS
            b = TRI_HUB_BASE + (did // 40) % TRI_HUBS
        else:
            d = hashlib.md5(str(did).encode()).hexdigest()
            a = int(d[0:12], 16) % TRI_PERIPHERY
            b = int(d[16:28], 16) % TRI_PERIPHERY
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return edges


def test_assortativity_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = _py_edges(doc_ids)
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    endpoints = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    m = len(endpoints)
    sx = sum(x for x, _ in endpoints)
    sxx = sum(x * x for x, _ in endpoints)
    sxy = sum(x * y for x, y in endpoints)
    r = round((m * sxy - sx * sx) / (m * sxx - sx * sx), 6)
    knn: dict[int, list[int]] = {}
    for x, y in endpoints:
        knn.setdefault(x, []).append(y)
    got = {row["degree"]: row for row in q_degree_assortativity(spark, SF).collect()}
    assert set(got) == set(knn)
    for k, ys in knn.items():
        g = got[k]
        assert g["n_endpoints"] == len(ys)
        assert g["sum_nn_deg"] == sum(ys)
        assert g["knn_ppm"] == (sum(ys) * KNN_PPM) // len(ys)
        assert g["assortativity"] == r
    assert -1.0 <= r <= 1.0


def test_assortativity_moment_identities(spark):
    """Sum of endpoint counts over degree classes == 2|E|, and the
    total neighbor-degree mass equals the total degree mass (Sx ==
    sum over classes of sum_nn_deg) — the handshake identities."""
    rows = q_degree_assortativity(spark, SF).collect()
    m = sum(r["n_endpoints"] for r in rows)
    sx = sum(r["degree"] * r["n_endpoints"] for r in rows)
    s_nn = sum(r["sum_nn_deg"] for r in rows)
    assert m % 2 == 0
    assert sx == s_nn


# ------------------------------------------------------- bloom_fpr_audit


def _py_bloom(event_ids: list[int]) -> dict[int, dict]:
    info = {}
    for eid in event_ids:
        d = hashlib.md5(f"bf:u:{eid}".encode()).hexdigest()
        h1 = int(d[0:15], 16) % (1 << 59)
        h2 = (int(d[16:31], 16) % (1 << 58)) * 2 + 1
        pos = list({(h1 + i * h2) % BF_M_BITS for i in range(BF_K)})
        info[eid] = {
            "truth": eid % 3 != 0,
            "shard": h1 % BF_SHARDS,
            "pos": pos,
        }
    bits = set()
    for v in info.values():
        if v["truth"]:
            bits.update(v["pos"])
    shards: dict[int, dict] = {}
    for v in info.values():
        s = shards.setdefault(
            v["shard"],
            {"n_probes": 0, "n_seen": 0, "n_maybe": 0, "n_false_pos": 0},
        )
        maybe = all(p in bits for p in v["pos"])
        s["n_probes"] += 1
        s["n_seen"] += 1 if v["truth"] else 0
        s["n_maybe"] += 1 if maybe else 0
        s["n_false_pos"] += 1 if (maybe and not v["truth"]) else 0
    for s in shards.values():
        s["fpr_ppm"] = (s["n_false_pos"] * BF_PPM) // (s["n_probes"] - s["n_seen"])
    return shards


def test_bloom_audit_matches_python(spark):
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    expect = _py_bloom(eids)
    got = {r["shard"]: r.asDict() for r in q_bloom_fpr_audit(spark, SF).collect()}
    assert set(got) == set(expect)
    for shard, e in expect.items():
        g = got[shard]
        for k in ("n_probes", "n_seen", "n_maybe", "n_false_pos", "fpr_ppm"):
            assert g[k] == e[k], (shard, k, g[k], e[k])


def test_bloom_no_false_negatives_and_design_fpr(spark):
    """A bloom can never miss a set member: n_maybe - n_false_pos ==
    n_seen per shard. Aggregate observed FPR should sit near the
    (1-e^{-kn/m})^k design point (wide tolerance: small-sample)."""
    rows = q_bloom_fpr_audit(spark, SF).collect()
    for r in rows:
        assert r["n_maybe"] - r["n_false_pos"] == r["n_seen"]
    n = sum(r["n_seen"] for r in rows)
    negs = sum(r["n_probes"] - r["n_seen"] for r in rows)
    fps = sum(r["n_false_pos"] for r in rows)
    design = (1 - math.exp(-BF_K * n / BF_M_BITS)) ** BF_K
    assert fps / negs <= max(10 * design, 0.01)


# ----------------------------------------------------- stratified_sample


def _py_stratified(docs: list[tuple]) -> dict[tuple, dict]:
    strata: dict[tuple, list[int]] = {}
    for doc_id, source, lang in docs:
        strata.setdefault((source, lang), []).append(doc_id)
    n_pop = sum(len(v) for v in strata.values())
    rows = {}
    for (source, lang), ids in strata.items():
        q = STRAT_N * len(ids)
        rows[(source, lang)] = {
            "n_h": len(ids),
            "base": q // n_pop,
            "rem": q % n_pop,
        }
    t = STRAT_N - sum(r["base"] for r in rows.values())
    order = sorted(rows, key=lambda k: (-rows[k]["rem"], k[0], k[1]))
    for i, k in enumerate(order):
        rows[k]["alloc"] = rows[k]["base"] + (1 if i < t else 0)
    for (source, lang), r in rows.items():
        ids = sorted(
            strata[(source, lang)],
            key=lambda i: (hashlib.md5(f"ss:{i}".encode()).hexdigest(), i),
        )
        sel = ids[: r["alloc"]]
        r["n_sel"] = len(sel)
        r["sel_sum"] = sum(sel) if sel else 0
        r["sel_min"] = min(sel) if sel else -1
        r["sel_max"] = max(sel) if sel else -1
    return rows


def test_stratified_matches_python(spark):
    docs = [
        (r["doc_id"], r["source"], r["lang"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "lang")
        .collect()
    ]
    expect = _py_stratified(docs)
    got = {
        (r["source"], r["lang"]): r.asDict()
        for r in q_stratified_sample(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for k, e in expect.items():
        g = got[k]
        for f in ("n_h", "alloc", "n_sel", "sel_sum", "sel_min", "sel_max"):
            assert g[f] == e[f], (k, f, g[f], e[f])


def test_stratified_quota_exact(spark):
    """Hamilton apportionment: allocations sum EXACTLY to the quota,
    never exceed the stratum population, and the draw fills every
    allocated seat."""
    rows = q_stratified_sample(spark, SF).collect()
    assert sum(r["alloc"] for r in rows) == STRAT_N
    for r in rows:
        assert r["alloc"] <= r["n_h"]
        assert r["n_sel"] == r["alloc"]
