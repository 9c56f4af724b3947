"""Intent tests for the round-5u wave: directed-link reciprocity,
per-edge triangle support, and the exact chi-square mixture
independence audit — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus structural guarantees: reciprocity is
symmetric in the mutual-pair count, edge supports sum to 3x the
triangle count, and chi-square deviations sum to zero over rows and
columns.
"""

from __future__ import annotations

from twawler_spark.training_queries import (
    CHI_MAX_DOCS,
    CHI_PPM,
    q_mixture_independence,
)
from twawler_spark.web_queries import (
    RECIP_PPM,
    TRUSS_K,
    q_edge_support,
    q_link_reciprocity,
)

from tests.test_r5s_queries import _graph

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- link_reciprocity


def test_reciprocity_matches_python(spark):
    """Recompute from the ACTUAL outlink expansion of the engine's
    fetch surface (independent of the Spark aggregation pipeline and
    the SQL synthesis twin)."""
    from twawler_spark.crawl_queries import N_HOSTS, _plan
    from twawler_spark.plans.fetcher import discover_outlinks_anchored, fetch_results

    _, plan = _plan(spark, SF)
    links = discover_outlinks_anchored(fetch_results(plan), N_HOSTS).collect()
    pairs = set()
    for r in links:
        a = int(r["src_host"][1:].split(".")[0])
        b = int(r["url"].split("https://h")[1].split(".")[0])
        if a != b:
            pairs.add((a, b))
    want: dict[int, dict] = {}
    for a, b in pairs:
        e = want.setdefault(a, {"n_out": 0, "n_reciprocal": 0})
        e["n_out"] += 1
        if (b, a) in pairs:
            e["n_reciprocal"] += 1
    got = {r["host"]: r for r in q_link_reciprocity(spark, SF).collect()}
    assert set(got) == set(want)
    for h, w in want.items():
        g = got[h]
        assert g["n_out"] == w["n_out"]
        assert g["n_reciprocal"] == w["n_reciprocal"]
        assert g["recip_ppm"] == (w["n_reciprocal"] * RECIP_PPM) // w["n_out"]


def test_reciprocity_mutual_mass_even(spark):
    """Every mutual pair contributes one reciprocal edge to EACH
    endpoint, so the total reciprocal count is even; reciprocity is
    bounded by 1."""
    rows = q_link_reciprocity(spark, SF).collect()
    assert rows, "fixture must produce directed pairs at every SF"
    assert sum(r["n_reciprocal"] for r in rows) % 2 == 0
    for r in rows:
        assert 0 <= r["n_reciprocal"] <= r["n_out"]
        assert r["recip_ppm"] <= RECIP_PPM


# ------------------------------------------------------------- edge_support


def test_edge_support_matches_python(spark):
    edges, adj = _graph(spark)
    want = {}
    n_tri = 0
    for u, v in edges:
        common = adj[u] & adj[v]
        want[(u, v)] = {
            "du": len(adj[u]),
            "dv": len(adj[v]),
            "support": len(common),
        }
    got = {(r["u"], r["v"]): r for r in q_edge_support(spark, SF).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["du"] == w["du"] and g["dv"] == w["dv"]
        assert g["support"] == w["support"], (k, g["support"], w["support"])
        denom = max(min(w["du"], w["dv"]) - 1, 1)
        assert g["edge_cc_ppm"] == (w["support"] * RECIP_PPM) // denom
        assert g["in_2truss"] == (1 if w["support"] >= TRUSS_K else 0)


def test_edge_support_triangle_identity(spark):
    """Edge supports sum to exactly 3x the triangle count (each
    triangle has three edges), tying this query to triangle_hosts."""
    from twawler_spark.web_queries import q_triangle_hosts

    sup_total = sum(r["support"] for r in q_edge_support(spark, SF).collect())
    node_tri = sum(r["n_tri"] for r in q_triangle_hosts(spark, SF).collect())
    # node counts sum to 3x triangles as well (three corners each)
    assert sup_total == node_tri
    assert sup_total % 3 == 0


# ----------------------------------------------------- mixture_independence


def test_mixture_matches_python(spark):
    docs = [
        (r["source"], r["lang"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "lang")
        .where(f"doc_id < {CHI_MAX_DOCS}")
        .collect()
    ]
    cells: dict[tuple, int] = {}
    for s, l in docs:
        cells[(s, l)] = cells.get((s, l), 0) + 1
    rows = {s: 0 for s, _ in cells}
    cols = {l: 0 for _, l in cells}
    for (s, l), c in cells.items():
        rows[s] += c
        cols[l] += c
    n = sum(cells.values())
    got = {(r["source"], r["lang"]): r for r in q_mixture_independence(spark, SF).collect()}
    assert set(got) == set(cells)
    for (s, l), obs in cells.items():
        g = got[(s, l)]
        dev = obs * n - rows[s] * cols[l]
        assert g["obs"] == obs
        assert g["row_total"] == rows[s]
        assert g["col_total"] == cols[l]
        assert g["n_total"] == n
        assert g["dev_num"] == dev
        assert g["cell_chi2_ppm"] == (dev * dev * CHI_PPM) // (n * rows[s] * cols[l])


def test_mixture_deviation_sums_zero(spark):
    """Margin identity over the FULL cross product: deviations sum to
    zero, so the observed cells' dev mass must equal the missing
    (zero-count) cells' row*col mass — unobserved combinations are
    exactly what the observed deviations compensate for."""
    rows = q_mixture_independence(spark, SF).collect()
    sources = {}
    langs = {}
    seen = set()
    for r in rows:
        sources[r["source"]] = r["row_total"]
        langs[r["lang"]] = r["col_total"]
        seen.add((r["source"], r["lang"]))
    missing_mass = sum(
        sources[s] * langs[l]
        for s in sources
        for l in langs
        if (s, l) not in seen
    )
    assert sum(r["dev_num"] for r in rows) == missing_mass
