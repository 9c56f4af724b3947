"""Intent tests for the round-6b wave: the two-round since_id delta
invariant, multimodal packing-budget admission, and exact rank
normalization — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: refetch pages are
disjoint and additive, the budget verdict cells partition the doc
population, and rank normalization is order-preserving, tie-
preserving, and bounded.
"""

from __future__ import annotations

from twawler_spark.crawl_queries import ROUND_NO, _plan, q_crawl_round2_delta
from twawler_spark.training_queries import RNORM_PPM, q_rank_normalize
from twawler_spark.web_queries import (
    SBF_MEDIA_BUDGET,
    SBF_TOKEN_BUDGET,
    q_span_budget_fit,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------- crawl_round2_delta


def test_round2_delta_matches_surface(spark):
    """Recompute from the engine's own fetch surface at both round
    numbers; the invariant columns reconcile exactly."""
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    d1 = [(r["host"], r["doc_id"]) for r in fetch_documents(plan, ROUND_NO).collect()]
    d2 = [
        (r["host"], r["doc_id"])
        for r in fetch_documents(plan, ROUND_NO + 1).collect()
    ]
    keys1 = {k for _, k in d1}
    keys2 = {k for _, k in d2}
    per: dict[str, dict] = {}
    for h, k in d1:
        per.setdefault(h, {"r1": 0, "r2": 0, "shared": 0})["r1"] += 1
        if k in keys2:
            per[h]["shared"] += 1
    for h, k in d2:
        per.setdefault(h, {"r1": 0, "r2": 0, "shared": 0})["r2"] += 1
    union: dict[str, set] = {}
    for h, k in d1 + d2:
        union.setdefault(h, set()).add(k)
    got = {r["host"]: r for r in q_crawl_round2_delta(spark, SF).collect()}
    assert set(got) == set(per)
    for h, w in per.items():
        g = got[h]
        assert g["n_docs_r1"] == w["r1"]
        assert g["n_docs_r2"] == w["r2"]
        assert g["n_shared"] == w["shared"]
        assert g["n_union"] == len(union[h])


def test_round2_delta_invariant(spark):
    """The since_id contract: ZERO shared docs between rounds, pages
    strictly additive (r1 + r2 == union) on every host."""
    rows = q_crawl_round2_delta(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_shared"] == 0
        assert r["n_docs_r1"] + r["n_docs_r2"] == r["n_union"]
        assert r["n_docs_r1"] == r["n_docs_r2"]  # same nd stream per URL


# ------------------------------------------------------- span_budget_fit


def test_span_budget_matches_surface(spark):
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = fetch_documents(plan, ROUND_NO).dropDuplicates(["doc_id"]).collect()
    cells: dict[tuple, dict] = {}
    n_total = 0
    for r in docs:
        n_total += 1
        n_tok = sum(
            len(s["text"].split(" ")) for s in r["spans"] if s["kind"] == "text"
        )
        n_med = sum(1 for s in r["spans"] if s["kind"] == "media")
        key = (
            1 if n_tok > SBF_TOKEN_BUDGET else 0,
            1 if n_med > SBF_MEDIA_BUDGET else 0,
        )
        c = cells.setdefault(key, {"n_docs": 0, "sum_tokens": 0, "sum_media": 0})
        c["n_docs"] += 1
        c["sum_tokens"] += n_tok
        c["sum_media"] += n_med
    got = {
        (r["over_tokens"], r["over_media"]): r
        for r in q_span_budget_fit(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, w in cells.items():
        g = got[key]
        for f in ("n_docs", "sum_tokens", "sum_media"):
            assert g[f] == w[f], (key, f)
        assert g["fits"] == (1 if key == (0, 0) else 0)
    assert sum(r["n_docs"] for r in got.values()) == n_total


# -------------------------------------------------------- rank_normalize


def test_rank_normalize_matches_python(spark):
    docs = [
        (r["doc_id"], r["n_chars"], len(r["text"].split(" ")))
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars", "text")
        .collect()
    ]
    n = len(docs)

    def ranks(vals):
        srt = sorted(vals)
        return {
            v: srt.index(v) + 1  # competition rank: 1 + count of strictly smaller
            for v in set(vals)
        }

    rc = ranks([c for _, c, _ in docs])
    rt = ranks([t for _, _, t in docs])
    got = {r["doc_id"]: r for r in q_rank_normalize(spark, SF).collect()}
    assert len(got) == n
    for doc_id, c, t in docs:
        g = got[doc_id]
        cp = ((rc[c] - 1) * RNORM_PPM) // (n - 1)
        tp = ((rt[t] - 1) * RNORM_PPM) // (n - 1)
        assert g["n_chars"] == c and g["n_tokens"] == t
        assert g["chars_rank_ppm"] == cp
        assert g["tokens_rank_ppm"] == tp
        assert g["combined_ppm"] == (cp + tp) // 2


def test_rank_normalize_properties(spark):
    """Order-preserving, tie-preserving, bounded in [0, 1e6]; the
    minimum maps to 0 and the maximum to at most 1e6."""
    rows = q_rank_normalize(spark, SF).collect()
    by_chars = sorted(rows, key=lambda r: r["n_chars"])
    for a, b in zip(by_chars, by_chars[1:]):
        if a["n_chars"] == b["n_chars"]:
            assert a["chars_rank_ppm"] == b["chars_rank_ppm"]
        else:
            assert a["chars_rank_ppm"] < b["chars_rank_ppm"]
    for r in rows:
        assert 0 <= r["chars_rank_ppm"] <= RNORM_PPM
        assert 0 <= r["combined_ppm"] <= RNORM_PPM
    assert min(r["chars_rank_ppm"] for r in rows) == 0
