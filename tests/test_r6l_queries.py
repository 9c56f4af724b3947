"""Intent tests for the round-6l wave: exact BM25 tf saturation, the
bigram-hit LM proxy, and anchor/content agreement — each recomputed
by an independent plain-python third implementation (the DuckDB
oracles already prove Spark==SQL on the registered fixtures), plus
structural guarantees: BM25 scores saturate monotonically in tf and
penalize length, the hit score is a proper [0, 1e6] decile-ranked
signal, and anchor agreement is bounded by the smaller term set.
"""

from __future__ import annotations

from fractions import Fraction

from twawler_spark.training_queries import (
    BHS_PPM,
    BHS_TOP_K,
    BM25_PPM,
    BM25_TERMS,
    q_bigram_hit_score,
    q_bm25_tf_exact,
)
from twawler_spark.web_queries import ACA_PPM, q_anchor_content_agreement

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ bm25_tf_exact


def _corpus(spark):
    return [
        (r["doc_id"], r["text"].lower().split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]


def test_bm25_matches_python(spark):
    docs = _corpus(spark)
    dl = {d: len([t for t in ts if t]) for d, ts in docs}
    sum_len = sum(dl.values())
    n_docs = len(docs)
    want = {}
    for term in BM25_TERMS:
        scored = []
        for d, ts in docs:
            tf = sum(1 for t in ts if t == term)
            if tf == 0:
                continue
            score = (20 * tf * sum_len * BM25_PPM) // (
                8 * tf * sum_len + 3 * (sum_len + 3 * dl[d] * n_docs)
            )
            scored.append((d, tf, dl[d], score))
        scored.sort(key=lambda x: (-x[3], x[0]))
        for rk, (d, tf, l, score) in enumerate(scored[:5], 1):
            want[(term, d)] = {
                "tf": tf, "dl": l, "score_ppm": score, "term_rank": rk
            }
    got = {(r["term"], r["doc_id"]): r for r in q_bm25_tf_exact(spark, SF).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in w:
            assert g[f] == w[f], (k, f)


def test_bm25_saturation_properties(spark):
    """The exact score equals the float BM25 formula (via Fraction)
    and saturates: among the top rows, higher tf at equal length
    scores strictly higher, and the score stays below the k1+1
    asymptote."""
    rows = q_bm25_tf_exact(spark, SF).collect()
    assert rows
    docs = _corpus(spark)
    dl = {d: len([t for t in ts if t]) for d, ts in docs}
    sum_len = sum(dl.values())
    n = len(docs)
    for r in rows:
        frac = Fraction(20 * r["tf"] * sum_len,
                        8 * r["tf"] * sum_len + 3 * (sum_len + 3 * r["dl"] * n))
        # the rational equals tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        k1, b = Fraction(3, 2), Fraction(3, 4)
        avgdl = Fraction(sum_len, n)
        classic = (r["tf"] * (k1 + 1)) / (
            r["tf"] + k1 * (1 - b + b * Fraction(r["dl"]) / avgdl)
        )
        assert frac == classic
        assert r["score_ppm"] == (frac.numerator * BM25_PPM) // frac.denominator
        assert r["score_ppm"] < (5 * BM25_PPM) // 2  # < k1+1 asymptote


# --------------------------------------------------------- bigram_hit_score


def test_bigram_hit_matches_python(spark):
    docs = _corpus(spark)
    counts: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for d, ts in docs:
        bgs = [
            f"{a} {b}" for a, b in zip(ts, ts[1:]) if a and b
        ]
        per_doc[d] = bgs
        for bg in bgs:
            counts[bg] = counts.get(bg, 0) + 1
    top = set(sorted(counts, key=lambda b: (-counts[b], b))[:BHS_TOP_K])
    scored = {}
    for d, bgs in per_doc.items():
        if not bgs:
            continue
        hits = sum(1 for b in bgs if b in top)
        scored[d] = {
            "n_bigrams": len(bgs),
            "n_hits": hits,
            "hit_ppm": (hits * BHS_PPM) // len(bgs),
        }
    # rank over (hit_ppm, doc_id): the doc_id tie-break makes the
    # competition rank dense — each doc holds its own position
    order = sorted(scored, key=lambda d: (scored[d]["hit_ppm"], d))
    n = len(order)
    rk = {d: i + 1 for i, d in enumerate(order)}
    got = {r["doc_id"]: r for r in q_bigram_hit_score(spark, SF).collect()}
    assert set(got) == set(scored)
    for d, w in scored.items():
        g = got[d]
        for f in ("n_bigrams", "n_hits", "hit_ppm"):
            assert g[f] == w[f], (d, f)
        assert g["quality_decile"] == ((rk[d] - 1) * 10) // n


def test_bigram_hit_distribution(spark):
    """Scores span a real range (top-50 of a 32^2 bigram space
    covers a middle share) and deciles are populated 0..9."""
    rows = q_bigram_hit_score(spark, SF).collect()
    deciles = {r["quality_decile"] for r in rows}
    assert deciles == set(range(10))
    ppms = [r["hit_ppm"] for r in rows]
    assert min(ppms) < 200_000 < max(ppms)


# ------------------------------------------------- anchor_content_agreement


def test_anchor_agreement_matches_surface(spark):
    from twawler_spark.crawl_queries import N_HOSTS, ROUND_NO, _plan
    from twawler_spark.plans.fetcher import (
        discover_outlinks_anchored,
        fetch_documents,
        fetch_results,
    )

    _, plan = _plan(spark, SF)
    links = discover_outlinks_anchored(fetch_results(plan), N_HOSTS).collect()
    anchors: dict[int, set] = {}
    for r in links:
        tgt = int(r["url"].split("https://h")[1].split(".")[0])
        anchors.setdefault(tgt, set()).add(r["anchor"])
    docs = fetch_documents(plan, ROUND_NO).dropDuplicates(["doc_id"]).collect()
    content: dict[int, set] = {}
    for r in docs:
        h = int(r["host"][1:])
        for s in r["spans"]:
            if s["kind"] == "text":
                content.setdefault(h, set()).update(
                    t for t in s["text"].split(" ") if t
                )
    got = {r["host"]: r for r in q_anchor_content_agreement(spark, SF).collect()}
    expect_hosts = set(anchors) & set(content)
    assert set(got) == expect_hosts
    for h in expect_hosts:
        shared = len(anchors[h] & content[h])
        g = got[h]
        assert g["n_anchor_terms"] == len(anchors[h])
        assert g["n_content_terms"] == len(content[h])
        assert g["n_shared"] == shared
        assert g["agreement_ppm"] == (shared * ACA_PPM) // len(anchors[h])


def test_anchor_agreement_bounds(spark):
    for r in q_anchor_content_agreement(spark, SF).collect():
        assert r["n_shared"] <= min(r["n_anchor_terms"], r["n_content_terms"])
        assert 0 <= r["agreement_ppm"] <= ACA_PPM
