"""Intent tests for the round-6n wave: the Wald-Wolfowitz media runs
test, the marginal-document fetch price, and the id-space gap/island
census — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: run counts obey the
composition bounds, the cost quotient reconciles with its factors,
and the island census reconstructs the exact missing-id count.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import GAP_LANG, q_id_gap_islands
from twawler_spark.web_queries import (
    CPD_PPM,
    TMO_VALUE_MOD,
    YIELD_BUCKETS,
    q_cost_per_doc,
    q_media_runs_test,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------- media_runs_test


def test_media_runs_match_surface(spark):
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = fetch_documents(plan, ROUND_NO).dropDuplicates(["doc_id"]).collect()
    cells: dict[tuple, dict] = {}
    for r in docs:
        kinds = [s["kind"][0] for s in r["spans"]]
        if len(kinds) < 2:
            continue
        n_m = kinds.count("m")
        n_t = len(kinds) - n_m
        if n_t == 0 or n_m == 0:
            continue
        runs = 1 + sum(1 for a, b in zip(kinds, kinds[1:]) if a != b)
        c = cells.setdefault((n_t, n_m), {"n_docs": 0, "obs_runs": 0})
        c["n_docs"] += 1
        c["obs_runs"] += runs
    got = {
        (r["n_text"], r["n_media"]): r for r in q_media_runs_test(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for (n_t, n_m), w in cells.items():
        g = got[(n_t, n_m)]
        t = n_t + n_m
        exp_num = w["n_docs"] * (t + 2 * n_t * n_m)
        assert g["n_docs"] == w["n_docs"]
        assert g["obs_runs"] == w["obs_runs"]
        assert g["exp_num"] == exp_num
        assert g["exp_den"] == t
        lhs, rhs = w["obs_runs"] * t, exp_num
        verdict = (
            "clustered" if lhs < rhs else ("alternating" if lhs > rhs else "random")
        )
        assert g["verdict"] == verdict


def test_media_runs_bounds(spark):
    """Runs are bounded: 2 <= runs <= 2*min(n1,n2)+1 per doc implies
    per-class bounds n_docs*2 <= obs <= n_docs*(2*min+1)."""
    for r in q_media_runs_test(spark, SF).collect():
        mn = min(r["n_text"], r["n_media"])
        assert 2 * r["n_docs"] <= r["obs_runs"] <= (2 * mn + 1) * r["n_docs"]


# -------------------------------------------------------------- cost_per_doc


def test_cost_per_doc_matches_surface(spark):
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    per_url = {
        r["url_hash"]: r["count"]
        for r in fetch_documents(plan, ROUND_NO)
        .dropDuplicates(["doc_id"])
        .groupBy("url_hash")
        .count()
        .collect()
    }
    cells: dict[int, dict] = {}
    for r in plan.select("url_hash", "fetch_rank").collect():
        d = min(YIELD_BUCKETS - 1, r["fetch_rank"] - 1)
        lat = 1 + int(
            hashlib.md5(f"cpd:{r['url_hash']}".encode()).hexdigest()[:15], 16
        ) % TMO_VALUE_MOD
        c = cells.setdefault(d, {"n_scheduled": 0, "n_docs": 0, "fetch_us": 0})
        c["n_scheduled"] += 1
        c["n_docs"] += per_url.get(r["url_hash"], 0)
        c["fetch_us"] += lat
    head_cpd = (
        cells[0]["fetch_us"] // cells[0]["n_docs"] if cells[0]["n_docs"] else -1
    )
    got = {r["decile"]: r for r in q_cost_per_doc(spark, SF).collect()}
    assert set(got) == set(cells)
    for d, w in cells.items():
        g = got[d]
        for f in ("n_scheduled", "n_docs", "fetch_us"):
            assert g[f] == w[f], (d, f)
        cpd = w["fetch_us"] // w["n_docs"] if w["n_docs"] else -1
        assert g["us_per_doc"] == cpd
        expect = (
            (cpd * CPD_PPM) // head_cpd if cpd >= 0 and head_cpd > 0 else -1
        )
        assert g["vs_head_ppm"] == expect


def test_cost_per_doc_reconciles(spark):
    """The quotient reconciles: us_per_doc * n_docs <= fetch_us <
    (us_per_doc + 1) * n_docs on every populated decile; the head
    decile reads exactly 1e6 vs itself."""
    rows = {r["decile"]: r for r in q_cost_per_doc(spark, SF).collect()}
    for r in rows.values():
        if r["n_docs"] > 0:
            assert (
                r["us_per_doc"] * r["n_docs"]
                <= r["fetch_us"]
                < (r["us_per_doc"] + 1) * r["n_docs"]
            )
    if 0 in rows and rows[0]["n_docs"] > 0:
        assert rows[0]["vs_head_ppm"] == CPD_PPM


# ------------------------------------------------------------ id_gap_islands


def test_islands_match_python(spark):
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .where(f"lang = '{GAP_LANG}'")
        .collect()
    )
    islands = []
    start = prev = ids[0]
    for i in ids[1:]:
        if i == prev + 1:
            prev = i
        else:
            islands.append((start, prev))
            start = prev = i
    islands.append((start, prev))
    gaps = [b[0] - a[1] - 1 for a, b in zip(islands, islands[1:])]
    row = q_id_gap_islands(spark, SF).collect()[0]
    assert row["n_islands"] == len(islands)
    assert row["n_ids"] == len(ids)
    assert row["largest_island"] == max(b - a + 1 for a, b in islands)
    assert row["span_lo"] == ids[0]
    assert row["span_hi"] == ids[-1]
    assert row["n_missing"] == ids[-1] - ids[0] + 1 - len(ids)
    assert row["largest_gap"] == (max(gaps) if gaps else None)


def test_islands_identity(spark):
    """Internal consistency: missing ids equal the sum of the gaps,
    and islands exceed 1 (the lang filter fragments the id space)."""
    row = q_id_gap_islands(spark, SF).collect()[0]
    assert row["n_islands"] > 1
    assert row["span_hi"] - row["span_lo"] + 1 == row["n_ids"] + row["n_missing"]
