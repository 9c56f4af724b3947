"""Intent tests for the round-6f wave: Wilson rate bounds,
random-failure percolation, and quality-ranked dedup keepers — each
recomputed by an independent plain-python third implementation (the
DuckDB oracles already prove Spark==SQL on the registered fixtures),
plus structural guarantees: the Wilson interval contains the raw
rate and widens as pulls shrink, random removal degrades the giant
component monotonically, and keeper policies agree on pure pairs
while differing somewhere on chains.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.training_queries import q_dedup_keeper_quality
from twawler_spark.web_queries import (
    PERC_PS,
    SHRINK_HOSTS,
    WIL_PPM,
    q_host_rate_wilson,
    q_random_percolation,
)

from tests.test_r5p_queries import _py_edges
from tests.test_r5s_queries import _components

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# --------------------------------------------------------- host_rate_wilson


def test_wilson_matches_python(spark):
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
    got = {r["host"]: r for r in q_host_rate_wilson(spark, SF).collect()}
    assert set(got) == set(pulls)
    for h in pulls:
        n, w = pulls[h], wins[h]
        isq = math.isqrt(n * (w * (n - w) + n))
        lo = max(((w + 2) * n - 2 * isq) * WIL_PPM, 0) // (n * (n + 4))
        hi = min(((w + 2) * n + 2 * isq) * WIL_PPM // (n * (n + 4)), WIL_PPM)
        g = got[h]
        assert g["n"] == n and g["w"] == w
        assert g["raw_ppm"] == (w * WIL_PPM) // n
        assert g["wilson_lo_ppm"] == lo, (h, g["wilson_lo_ppm"], lo)
        assert g["wilson_hi_ppm"] == hi


def test_wilson_interval_properties(spark):
    """lo <= raw <= hi (up to the floor), and intervals WIDEN as
    pulls shrink: the widest interval belongs to a low-pull host."""
    rows = q_host_rate_wilson(spark, SF).collect()
    for r in rows:
        assert r["wilson_lo_ppm"] <= r["raw_ppm"] + 1
        assert r["wilson_hi_ppm"] >= r["raw_ppm"] - 1
        assert 0 <= r["wilson_lo_ppm"] <= r["wilson_hi_ppm"] <= WIL_PPM
    widths = {r["host"]: r["wilson_hi_ppm"] - r["wilson_lo_ppm"] for r in rows}
    pulls = {r["host"]: r["n"] for r in rows}
    widest = max(widths, key=lambda h: widths[h])
    assert pulls[widest] <= sorted(pulls.values())[len(pulls) // 4]


# ------------------------------------------------------- random_percolation


def test_percolation_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = _py_edges(doc_ids)
    nodes = {n for e in edges for n in e}
    gate = {
        n: int(hashlib.md5(f"perc:{n}".encode()).hexdigest()[:15], 16) % 10
        for n in nodes
    }
    got = {r["p_tenths"]: r for r in q_random_percolation(spark, SF).collect()}
    assert set(got) == set(PERC_PS)
    for p in PERC_PS:
        keep = {n for n in nodes if gate[n] >= p}
        ed = {(u, v) for u, v in edges if u in keep and v in keep}
        sizes = _components(keep, ed)
        g = got[p]
        assert g["n_nodes"] == len(keep)
        assert g["n_edges"] == len(ed)
        assert g["n_components"] == len(sizes)
        assert g["largest_comp"] == max(sizes)
        assert g["s2_fragmentation"] == sum(s * s for s in sizes)


def test_percolation_monotone_decay(spark):
    """Raising the removal probability can only shrink nodes, edges,
    the largest component and S2 — graceful degradation under RANDOM
    failure (contrast: host_robustness's targeted attack)."""
    rows = sorted(q_random_percolation(spark, SF).collect(), key=lambda r: r["p_tenths"])
    for a, b in zip(rows, rows[1:]):
        assert a["n_nodes"] >= b["n_nodes"]
        assert a["n_edges"] >= b["n_edges"]
        assert a["largest_comp"] >= b["largest_comp"]
        assert a["s2_fragmentation"] >= b["s2_fragmentation"]
    assert rows[0]["p_tenths"] == 0  # intact baseline present


# ---------------------------------------------------- dedup_keeper_quality


def test_keeper_quality_matches_python(spark):
    """Recompute clusters + both keeper policies from the registered
    LSH pair surface."""
    from twawler_spark.training_queries import _lsh_pairs, _with_near_dups

    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in _lsh_pairs(_with_near_dups(d)).collect()
    ]
    chars = {}
    for r in d.select("doc_id", "text").collect():
        chars[str(r["doc_id"])] = len(r["text"])
        nd = r["text"][r["text"].index(" ") + 1 :] if " " in r["text"] else ""
        chars[f"{r['doc_id']}_nd"] = len(nd)
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[str] = set()
    want = {}
    for s0 in sorted(adj):
        if s0 in seen:
            continue
        stack, mem = [s0], []
        seen.add(s0)
        while stack:
            x = stack.pop()
            mem.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        comp = min(mem)
        if len(mem) >= 2:
            want[comp] = {
                "cluster_size": len(mem),
                "keeper_minid": min(mem),
                "keeper_quality": max(mem, key=lambda m: (chars[m], m)),
                "keeper_chars": max(chars[m] for m in mem),
            }
    got = {r["component"]: r for r in q_dedup_keeper_quality(spark, SF).collect()}
    assert set(got) == set(want)
    for comp, w in want.items():
        g = got[comp]
        for k in ("cluster_size", "keeper_minid", "keeper_quality", "keeper_chars"):
            assert g[k] == w[k], (comp, k, g[k], w[k])
        assert g["differs"] == (1 if w["keeper_minid"] != w["keeper_quality"] else 0)


def test_keeper_policies_differ_somewhere(spark):
    """Both regimes occur: most clusters agree (base outranks its
    truncated copy on both policies) and at least one chain makes
    the policies diverge."""
    rows = q_dedup_keeper_quality(spark, SF).collect()
    assert rows
    assert any(r["differs"] == 0 for r in rows)
    assert any(r["differs"] == 1 for r in rows)
    for r in rows:
        if not r["differs"]:
            assert r["keeper_minid"] == r["keeper_quality"]
