"""Intent tests for the round-5q wave: exact 2-hop host reach, the
interleaved span-kind transition matrix, and delta-gap varint
posting-list sizing — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus the structural guarantees each
operator ships: reach never exceeds the walk-count bound, the
transition matrix is consistent with span_patterns' switch census,
and every varint estimate beats (or at worst matches) fixed-width.
"""

from __future__ import annotations

from twawler_spark.training_queries import (
    IDXV_MIN_DF,
    IDXV_PPM,
    q_index_varint_estimate,
)
from twawler_spark.web_queries import (
    BALL_PPM,
    SPANT_PPM,
    q_ball2_hosts,
    q_span_transitions,
)

from tests.test_r5p_queries import _py_edges

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ ball2_hosts


def test_ball2_matches_python(spark):
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
    got = {r["node"]: r for r in q_ball2_hosts(spark, SF).collect()}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        ball = set(nbrs)
        for u in nbrs:
            ball.update(adj[u])
        ball.discard(v)
        ub = len(nbrs) + sum(len(adj[u]) - 1 for u in nbrs)
        g = got[v]
        assert g["degree"] == len(nbrs)
        assert g["reach2"] == len(ball)
        assert g["walk_ub"] == ub
        assert g["saturation_ppm"] == (len(ball) * BALL_PPM) // ub


def test_ball2_bound_and_clique(spark):
    """reach2 <= walk_ub everywhere; clique nodes (degree-heavy,
    overlapping neighborhoods) sit well below saturation 1, while
    degree-1 periphery nodes with a degree-1 neighbor chain reach
    exactly their bound."""
    rows = q_ball2_hosts(spark, SF).collect()
    for r in rows:
        assert r["reach2"] <= r["walk_ub"]
        assert r["saturation_ppm"] <= BALL_PPM
    assert any(r["saturation_ppm"] < BALL_PPM for r in rows)


# ------------------------------------------------------- span_transitions


def test_span_transitions_third_implementation(spark):
    """Recompute the transition matrix in python from the ACTUAL
    fetched span arrays (the engine's own fetch surface)."""
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = (
        fetch_documents(plan, ROUND_NO)
        .dropDuplicates(["doc_id"])
        .select("doc_id", "spans")
        .collect()
    )
    want: dict[tuple, dict] = {}
    for r in docs:
        kinds = [s["kind"][0] for s in r["spans"]]
        for pos, (a, b) in enumerate(zip(kinds, kinds[1:])):
            e = want.setdefault(
                (a, b), {"n_transitions": 0, "docs": set(), "sum_pos": 0}
            )
            e["n_transitions"] += 1
            e["docs"].add(r["doc_id"])
            e["sum_pos"] += pos
    got = {
        (r["from_kind"], r["to_kind"]): r
        for r in q_span_transitions(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g["n_transitions"] == w["n_transitions"]
        assert g["n_docs"] == len(w["docs"])
        assert g["sum_pos"] == w["sum_pos"]
        assert g["mean_pos_ppm"] == (w["sum_pos"] * SPANT_PPM) // w["n_transitions"]
    # genuinely interleaved fixture: both switch directions occur
    assert ("t", "m") in got and ("m", "t") in got


def test_span_transitions_consistent_with_patterns(spark):
    """Total kind switches across the matrix == span_patterns' switch
    mass (n_docs * n_switches summed over patterns)."""
    from twawler_spark.web_queries import q_span_patterns

    trans = q_span_transitions(spark, SF).collect()
    pats = q_span_patterns(spark, SF).collect()
    switches_from_matrix = sum(
        r["n_transitions"] for r in trans if r["from_kind"] != r["to_kind"]
    )
    switches_from_census = sum(r["n_docs"] * r["n_switches"] for r in pats)
    assert switches_from_matrix == switches_from_census


# ------------------------------------------------- index_varint_estimate


def test_varint_matches_python(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    postings: dict[str, set[int]] = {}
    for doc_id, text in docs:
        for term in set(text.lower().split(" ")):
            if term:
                postings.setdefault(term, set()).add(doc_id)
    want = {}
    for term, ids in postings.items():
        if len(ids) < IDXV_MIN_DF:
            continue
        srt = sorted(ids)
        gaps = [srt[0] + 1] + [b - a for a, b in zip(srt, srt[1:])]
        vb = sum((g.bit_length() + 6) // 7 for g in gaps)
        raw = 8 * len(ids)
        want[term] = {
            "df": len(ids),
            "varint_bytes": vb,
            "raw_bytes": raw,
            "savings_ppm": ((raw - vb) * IDXV_PPM) // raw,
        }
    got = {r["term"]: r for r in q_index_varint_estimate(spark, SF).collect()}
    assert set(got) == set(want)
    for term, w in want.items():
        g = got[term]
        for k in ("df", "varint_bytes", "raw_bytes", "savings_ppm"):
            assert g[k] == w[k], (term, k, g[k], w[k])


def test_varint_always_saves_on_fixture(spark):
    """Small doc-id space -> every gap fits in <=2 varint bytes, so
    the estimate strictly beats fixed-width 8-byte postings."""
    for r in q_index_varint_estimate(spark, SF).collect():
        assert r["varint_bytes"] < r["raw_bytes"]
        assert 0 < r["savings_ppm"] < IDXV_PPM
