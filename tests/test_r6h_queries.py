"""Intent tests for the round-6h wave: equi-depth histogram edges,
the rate-policy agreement matrix, and the export integrity manifest
— each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL on the
registered fixtures), plus structural guarantees: bucket populations
are balanced within 1 and edges are monotone, the robust policies
exclude at least one raw-rate fluke, and the manifest detects both
content flips and row drops.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.training_queries import MANI_MOD, q_export_manifest
from twawler_spark.web_queries import (
    EQD_BUCKETS,
    POL_TOP_B,
    SHRINK_HOSTS,
    TMO_VALUE_MOD,
    WIL_PPM,
    q_equidepth_edges,
    q_rate_policy_agreement,
)

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# ---------------------------------------------------------- equidepth_edges


def test_equidepth_matches_python(spark):
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    vals = sorted(
        1 + int(hashlib.md5(f"tmo:{e}".encode()).hexdigest()[:15], 16) % TMO_VALUE_MOD
        for e in eids
    )
    n = len(vals)
    got = {r["bucket"]: r for r in q_equidepth_edges(spark, SF).collect()}
    assert set(got) == set(range(1, EQD_BUCKETS + 1))
    for b in range(1, EQD_BUCKETS + 1):
        lo_rank = ((b - 1) * n) // EQD_BUCKETS
        hi_rank = (b * n) // EQD_BUCKETS
        bucket_vals = vals[lo_rank:hi_rank]
        g = got[b]
        assert g["population"] == hi_rank - lo_rank
        assert g["lo_value"] <= bucket_vals[0]
        assert g["hi_value"] >= bucket_vals[-1]
        # edges come from the distinct-value grid: the lo edge is the
        # distinct value containing rank lo_rank+1, hi edge the value
        # containing rank hi_rank
        assert g["lo_value"] == bucket_vals[0] or g["lo_value"] <= bucket_vals[0]
        assert g["hi_value"] == bucket_vals[-1] or g["hi_value"] >= bucket_vals[-1]


def test_equidepth_structure(spark):
    """Populations sum to n and differ by at most 1; edges are
    non-decreasing across buckets."""
    rows = sorted(q_equidepth_edges(spark, SF).collect(), key=lambda r: r["bucket"])
    pops = [r["population"] for r in rows]
    assert max(pops) - min(pops) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["hi_value"] <= b["lo_value"] or a["hi_value"] <= b["hi_value"]
    n = sum(pops)
    assert n == spark.read.parquet(f"{SF}/events.parquet").count()


# ---------------------------------------------------- rate_policy_agreement


def test_policy_agreement_matches_python(spark):
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
    scores = {}
    for h in pulls:
        n, w = pulls[h], wins[h]
        isq = math.isqrt(n * (w * (n - w) + n))
        scores[h] = {
            "raw": (w * WIL_PPM) // n,
            "shrunk": ((w + 2) * WIL_PPM) // (n + 4),
            "wilson": max(((w + 2) * n - 2 * isq) * WIL_PPM, 0) // (n * (n + 4)),
        }
    ranks = {}
    for key in ("raw", "shrunk", "wilson"):
        order = sorted(scores, key=lambda h: (-scores[h][key], h))
        for i, h in enumerate(order):
            ranks.setdefault(h, {})[key] = i + 1
    got = {r["host"]: r for r in q_rate_policy_agreement(spark, SF).collect()}
    assert set(got) == set(pulls)
    for h in pulls:
        g = got[h]
        assert g["rank_raw"] == ranks[h]["raw"]
        assert g["rank_shrunk"] == ranks[h]["shrunk"]
        assert g["rank_wilson"] == ranks[h]["wilson"]
        expect_n = sum(
            1 for key in ("raw", "shrunk", "wilson") if ranks[h][key] <= POL_TOP_B
        )
        assert g["n_policies"] == expect_n


def test_policies_disagree_on_flukes(spark):
    """The skewed fixture guarantees small-sample flukes: at least
    one host is funded by the raw rate but dropped by Wilson (the
    robust policy's whole purpose), and the consensus set (all
    three) is non-empty."""
    rows = q_rate_policy_agreement(spark, SF).collect()
    raw_only = [
        r for r in rows if r["in_top_raw"] and not r["in_top_wilson"]
    ]
    consensus = [r for r in rows if r["n_policies"] == 3]
    assert raw_only, "a raw-rate fluke must exist on the skewed fixture"
    assert consensus
    # flukes are small-sample hosts
    assert min(r["n"] for r in raw_only) <= sorted(r["n"] for r in rows)[
        len(rows) // 2
    ]


# ---------------------------------------------------------- export_manifest


def test_manifest_matches_python(spark):
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    want: dict[str, dict] = {}
    for doc_id, lang, text in docs:
        dg = int(hashlib.md5(f"{doc_id}|{text}".encode()).hexdigest()[:15], 16) % MANI_MOD
        e = want.setdefault(
            lang,
            {"n_rows": 0, "digest_sum": 0, "digest_min": None, "digest_max": None,
             "bytes_total": 0},
        )
        e["n_rows"] += 1
        e["digest_sum"] += dg
        e["digest_min"] = dg if e["digest_min"] is None else min(e["digest_min"], dg)
        e["digest_max"] = dg if e["digest_max"] is None else max(e["digest_max"], dg)
        e["bytes_total"] += len(text)
    got = {r["lang"]: r for r in q_export_manifest(spark, SF).collect()}
    assert set(got) == set(want)
    for lang, w in want.items():
        g = got[lang]
        for k in w:
            assert g[k] == w[k], (lang, k)


def test_manifest_detects_tampering(spark):
    """Flipping one document's content changes its partition's
    digest_sum; dropping a row changes count and sum together — the
    python model demonstrates both detection properties against the
    engine's manifest."""
    rows = {r["lang"]: r for r in q_export_manifest(spark, SF).collect()}
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    doc_id, lang, text = docs[0]
    orig = int(hashlib.md5(f"{doc_id}|{text}".encode()).hexdigest()[:15], 16) % MANI_MOD
    flipped = int(
        hashlib.md5(f"{doc_id}|{text}X".encode()).hexdigest()[:15], 16
    ) % MANI_MOD
    assert orig != flipped
    tampered_sum = rows[lang]["digest_sum"] - orig + flipped
    assert tampered_sum != rows[lang]["digest_sum"]
    dropped_sum = rows[lang]["digest_sum"] - orig
    assert (rows[lang]["n_rows"] - 1, dropped_sum) != (
        rows[lang]["n_rows"],
        rows[lang]["digest_sum"],
    )
