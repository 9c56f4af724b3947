"""Intent tests for the round-6c wave: the LSH banding chooser, the
positional span profile, and the Lorenz/Gini allocation audit — each
recomputed by an independent plain-python third implementation (the
DuckDB oracles already prove Spark==SQL on the registered fixtures),
plus structural guarantees: candidate cost rises and precision falls
as bands shrink, the positional profile reconciles with the budget
totals, and the Lorenz curve is convex ending at exactly 1.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import (
    LSHC_CONFIGS,
    LSHC_HIGH_J10,
    LSHC_PPM,
    N_MINHASH,
    SCURVE_DOCS,
    q_lsh_config_chooser,
)
from twawler_spark.web_queries import (
    GINI_PPM,
    SPP_PPM,
    q_alloc_gini,
    q_span_position_profile,
)

from tests.test_r5o_queries import _KM_M, _shingles

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ lsh_config_chooser


def _signature(sh: set[str]) -> list[int]:
    mins = [None] * N_MINHASH
    for tok in sh:
        if not tok:
            continue
        d = hashlib.md5(tok.encode()).hexdigest()
        h1 = int(d[0:15], 16) % _KM_M
        h2 = int(d[16:31], 16) % _KM_M
        for k in range(N_MINHASH):
            v = (h1 + k * h2) % _KM_M
            if mins[k] is None or v < mins[k]:
                mins[k] = v
    return mins


def test_chooser_matches_python(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    sample: dict[str, str] = {}
    import math

    for doc_id, text in docs:
        if doc_id >= SCURVE_DOCS:
            continue
        toks = text.split(" ")
        sample[str(doc_id)] = text
        sample[f"{doc_id}_nd"] = " ".join(toks[1:])
        sample[f"{doc_id}_h"] = " ".join(toks[: math.ceil(len(toks) / 2)])
    sh = {d: _shingles(t) for d, t in sample.items()}
    sig = {d: _signature(s) for d, s in sh.items()}
    ids = sorted(sample)
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    hi = {
        (a, b)
        for a, b in pairs
        if (10 * len(sh[a] & sh[b])) // len(sh[a] | sh[b]) >= LSHC_HIGH_J10
    }
    got = {
        (r["bands"], r["rows_per_band"]): r
        for r in q_lsh_config_chooser(spark, SF).collect()
    }
    assert set(got) == set(LSHC_CONFIGS)
    for nb, rows in LSHC_CONFIGS:
        cands = set()
        for a, b in pairs:
            for bi in range(nb):
                ba = "|".join(str(sig[a][bi * rows + ri]) for ri in range(rows))
                bb = "|".join(str(sig[b][bi * rows + ri]) for ri in range(rows))
                if ba == bb:
                    cands.add((a, b))
                    break
        caught = len(cands & hi)
        g = got[(nb, rows)]
        assert g["n_candidates"] == len(cands), (nb, rows)
        assert g["n_high_pairs"] == len(hi)
        assert g["n_caught"] == caught
        assert g["recall_ppm"] == (caught * LSHC_PPM) // len(hi)
        if cands:
            assert g["precision_ppm"] == (caught * LSHC_PPM) // len(cands)


def test_chooser_tradeoff_monotone(spark):
    """More (smaller) bands can only ADD candidates (a band match in
    a coarse banding implies one in a finer banding of the same
    hashes is not guaranteed — but the candidate COUNT must rise
    along our config ladder on this sample) and recall is
    non-decreasing while precision falls."""
    rows = sorted(q_lsh_config_chooser(spark, SF).collect(), key=lambda r: r["bands"])
    for a, b in zip(rows, rows[1:]):
        assert a["n_candidates"] <= b["n_candidates"]
        assert a["recall_ppm"] <= b["recall_ppm"]
        assert a["precision_ppm"] >= b["precision_ppm"]


# -------------------------------------------------- span_position_profile


def test_span_profile_matches_surface(spark):
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = fetch_documents(plan, ROUND_NO).dropDuplicates(["doc_id"]).collect()
    want: dict[int, dict] = {}
    for r in docs:
        for s in r["spans"]:
            c = want.setdefault(
                s["offset"], {"n_spans": 0, "n_media": 0, "sum_words": 0}
            )
            c["n_spans"] += 1
            if s["kind"] == "media":
                c["n_media"] += 1
            else:
                c["sum_words"] += len(s["text"].split(" "))
    got = {r["offset"]: r for r in q_span_position_profile(spark, SF).collect()}
    assert set(got) == set(want)
    for off, w in want.items():
        g = got[off]
        assert g["n_spans"] == w["n_spans"]
        assert g["n_media"] == w["n_media"]
        assert g["n_text"] == w["n_spans"] - w["n_media"]
        assert g["sum_words"] == w["sum_words"]
        assert g["media_ppm"] == (w["n_media"] * SPP_PPM) // w["n_spans"]


def test_span_profile_monotone_population(spark):
    """Offsets form a prefix (0..max) and their populations are
    non-increasing (a doc with a span at offset k has spans at every
    smaller offset)."""
    rows = sorted(q_span_position_profile(spark, SF).collect(), key=lambda r: r["offset"])
    assert [r["offset"] for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a["n_spans"] >= b["n_spans"]


# --------------------------------------------------------------- alloc_gini


def test_gini_matches_python(spark):
    from twawler_spark.crawl_queries import _plan

    _, plan = _plan(spark, SF)
    counts: dict[str, int] = {}
    for r in plan.select("host").collect():
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    s = sum(v for _, v in xs)
    iwx = sum((i + 1) * v for i, (_, v) in enumerate(xs))
    gini = ((2 * iwx - (n + 1) * s) * GINI_PPM) // (n * s)
    cum = 0
    dec_cum: dict[int, int] = {}
    for i, (_, v) in enumerate(xs):
        cum += v
        d = (10 * (i + 1) + n - 1) // n
        dec_cum[d] = cum
    got = {r["decile"]: r for r in q_alloc_gini(spark, SF).collect()}
    assert set(got) == set(dec_cum)
    for d, c in dec_cum.items():
        g = got[d]
        assert g["n_hosts"] == n
        assert g["total_alloc"] == s
        assert g["cum_alloc"] == c
        assert g["lorenz_ppm"] == (c * GINI_PPM) // s
        assert g["gini_ppm"] == gini


def test_gini_lorenz_shape(spark):
    """Lorenz curve: increasing, below-or-at the diagonal (sorted
    ascending), ending at exactly 1e6; Gini in [0, 1e6)."""
    rows = sorted(q_alloc_gini(spark, SF).collect(), key=lambda r: r["decile"])
    prev = 0
    for r in rows:
        assert r["lorenz_ppm"] >= prev
        prev = r["lorenz_ppm"]
        assert r["lorenz_ppm"] <= r["decile"] * 100_000 + 1
    assert rows[-1]["lorenz_ppm"] == GINI_PPM
    assert 0 <= rows[0]["gini_ppm"] < GINI_PPM
