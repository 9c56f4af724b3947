"""Intent tests for the round-5s wave: hub-removal robustness,
Heaps-law shingle vocabulary growth, and exact Kendall agreement
between priority signals — each recomputed by an independent
plain-python third implementation (the DuckDB oracles already prove
Spark==SQL on the registered fixtures), plus structural guarantees:
pruning only shrinks components/edges, the cumulative vocabulary is
monotone with batch-0 novelty ~1, and the Kendall pair classes
partition the pair universe.
"""

from __future__ import annotations

from twawler_spark.training_queries import VG_BATCH, VG_PPM, q_vocab_growth
from twawler_spark.web_queries import (
    RANKCORR_PPM,
    ROB_K,
    q_host_robustness,
    q_priority_rank_corr,
)

from tests.test_r5p_queries import _py_edges

SF = "/root/testdata/sf0.001"


def _graph(spark):
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = _py_edges(doc_ids)
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return edges, adj


def _components(nodes: set[int], edges: set[tuple[int, int]]) -> list[int]:
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seen: set[int] = set()
    sizes = []
    for n in nodes:
        if n in seen:
            continue
        stack, comp = [n], 0
        seen.add(n)
        while stack:
            x = stack.pop()
            comp += 1
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        sizes.append(comp)
    return sizes


# --------------------------------------------------------- host_robustness


def test_robustness_matches_python(spark):
    edges, adj = _graph(spark)
    hubs = set(
        sorted(adj, key=lambda n: (-len(adj[n]), n))[:ROB_K]
    )
    want = {}
    for tag in ("full", "pruned"):
        if tag == "full":
            nodes, ed = set(adj), edges
        else:
            nodes = set(adj) - hubs
            ed = {(u, v) for u, v in edges if u not in hubs and v not in hubs}
        sizes = _components(nodes, ed)
        want[tag] = {
            "n_nodes": len(nodes),
            "n_edges": len(ed),
            "n_components": len(sizes),
            "largest_comp": max(sizes),
            "s2_fragmentation": sum(s * s for s in sizes),
        }
    got = {r["scenario"]: r.asDict() for r in q_host_robustness(spark, SF).collect()}
    assert set(got) == {"full", "pruned"}
    for tag, w in want.items():
        for k, v in w.items():
            assert got[tag][k] == v, (tag, k, got[tag][k], v)


def test_robustness_monotone(spark):
    """Pruning removes exactly ROB_K nodes, can only remove edges, and
    can only shrink the largest component and the S2 index."""
    got = {r["scenario"]: r for r in q_host_robustness(spark, SF).collect()}
    f, p = got["full"], got["pruned"]
    assert f["n_nodes"] - p["n_nodes"] == ROB_K
    assert p["n_edges"] < f["n_edges"]
    assert p["largest_comp"] <= f["largest_comp"]
    assert p["s2_fragmentation"] < f["s2_fragmentation"]


# ------------------------------------------------------------ vocab_growth


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    n = max(len(toks) - 4, 1)
    return {" ".join(toks[i : i + 5]) for i in range(n)} - {""}


def test_vocab_growth_matches_python(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    per: dict[int, dict] = {}
    first: dict[str, int] = {}
    for doc_id, text in sorted(docs):
        b = doc_id // VG_BATCH
        sh = _shingles(text)
        e = per.setdefault(b, {"n_tokens": 0, "toks": set()})
        e["n_tokens"] += len(sh)
        e["toks"].update(sh)
        for t in sh:
            first.setdefault(t, b)
            first[t] = min(first[t], b)
    news: dict[int, int] = {}
    for t, b in first.items():
        news[b] = news.get(b, 0) + 1
    got = {r["batch"]: r for r in q_vocab_growth(spark, SF).collect()}
    assert set(got) == set(per)
    cum = 0
    for b in sorted(per):
        cum += news.get(b, 0)
        g = got[b]
        assert g["n_tokens"] == per[b]["n_tokens"]
        assert g["n_distinct"] == len(per[b]["toks"])
        assert g["n_new"] == news.get(b, 0)
        assert g["cum_vocab"] == cum
        assert g["new_ppm"] == (news.get(b, 0) * VG_PPM) // per[b]["n_tokens"]


def test_vocab_growth_monotone_and_rich(spark):
    """cum_vocab is strictly monotone on a rich shingle space, batch 0
    is ~all-new, and novelty never exceeds 1."""
    rows = sorted(q_vocab_growth(spark, SF).collect(), key=lambda r: r["batch"])
    assert rows[0]["n_new"] == rows[0]["n_distinct"]  # batch 0: everything is new
    for a, b in zip(rows, rows[1:]):
        assert b["cum_vocab"] > a["cum_vocab"]
    for r in rows:
        assert 0 <= r["new_ppm"] <= VG_PPM
        assert r["n_new"] <= r["n_distinct"] <= r["n_tokens"]


# ------------------------------------------------------ priority_rank_corr


def test_rank_corr_matches_python(spark):
    edges, adj = _graph(spark)
    # per-node triangle counts: each triangle (u < v < w) credits all
    # three corners exactly once
    tri: dict[int, int] = {n: 0 for n in adj}
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    sig = [(len(adj[n]), tri[n]) for n in nodes if len(adj[n]) >= 2]
    n_pairs = conc = disc = tied = 0
    for i in range(len(sig)):
        for j in range(i + 1, len(sig)):
            dd = sig[i][0] - sig[j][0]
            dt = sig[i][1] - sig[j][1]
            n_pairs += 1
            if dd * dt > 0:
                conc += 1
            elif dd * dt < 0:
                disc += 1
            if dd == 0 or dt == 0:
                tied += 1
    row = q_priority_rank_corr(spark, SF).collect()[0]
    assert row["n_nodes"] == len(sig)
    assert row["n_pairs"] == n_pairs
    assert row["n_concordant"] == conc
    assert row["n_discordant"] == disc
    assert row["n_tied"] == tied
    assert row["conc_ppm"] == (conc * RANKCORR_PPM) // n_pairs
    assert row["disc_ppm"] == (disc * RANKCORR_PPM) // n_pairs


def test_rank_corr_partition(spark):
    """Pair classes cover the universe: conc + disc + tied >= n_pairs
    (a pair can be tied only if its product is 0, so conc/disc/tied
    overlap nowhere) and the signals agree positively on this graph."""
    row = q_priority_rank_corr(spark, SF).collect()[0]
    assert (
        row["n_concordant"] + row["n_discordant"] + row["n_tied"] == row["n_pairs"]
    )
    assert row["n_pairs"] == row["n_nodes"] * (row["n_nodes"] - 1) // 2
    assert row["n_concordant"] > row["n_discordant"]  # degree ~ triangles
