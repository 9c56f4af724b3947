"""Intent tests for the round-5v wave: the per-source batch drift
guardrail, sampled join-size estimation, and the skyline
(Pareto-front) operator — each recomputed by an independent
plain-python third implementation (the DuckDB oracles already prove
Spark==SQL on the registered fixtures), plus structural guarantees:
drift flags agree with the exact cross-product comparison, the
estimator is unbiased-in-expectation with exact bucket totals, and
the skyline is exactly the undominated set.
"""

from __future__ import annotations

import hashlib

from twawler_spark.training_queries import (
    DRIFT_BATCH,
    DRIFT_PPM,
    DRIFT_THRESH_PPM,
    JSZ_SAMPLE_MOD,
    q_batch_drift,
    q_join_size_estimate,
)
from twawler_spark.web_queries import q_skyline_hosts

from tests.test_r5t_queries import _signatures

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------------- batch_drift


def test_batch_drift_matches_python(spark):
    docs = [
        (r["doc_id"], r["source"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    ]
    cells: dict[tuple, dict] = {}
    srcs: dict[str, dict] = {}
    for doc_id, source, n_chars in docs:
        b = doc_id // DRIFT_BATCH
        c = cells.setdefault((source, b), {"n_docs": 0, "sum_chars": 0})
        c["n_docs"] += 1
        c["sum_chars"] += n_chars
        s = srcs.setdefault(source, {"n_src": 0, "sum_src": 0})
        s["n_src"] += 1
        s["sum_src"] += n_chars
    got = {(r["source"], r["batch"]): r for r in q_batch_drift(spark, SF).collect()}
    assert set(got) == set(cells)
    for (source, b), c in cells.items():
        g = got[(source, b)]
        s = srcs[source]
        dev = abs(c["sum_chars"] * s["n_src"] - s["sum_src"] * c["n_docs"])
        assert g["n_docs"] == c["n_docs"]
        assert g["sum_chars"] == c["sum_chars"]
        assert g["dev_num"] == dev
        assert g["drift_ppm"] == (dev * DRIFT_PPM) // (s["sum_src"] * c["n_docs"])
        assert g["drifted"] == (
            1 if dev * DRIFT_PPM > DRIFT_THRESH_PPM * s["sum_src"] * c["n_docs"] else 0
        )


def test_batch_drift_flag_consistent(spark):
    """The flag is exactly 'drift_ppm exceeds the threshold' up to
    the floor: drifted == 1 iff drift_ppm >= threshold (the exact
    comparison avoids the floor, so a flagged row's ppm is at least
    the threshold)."""
    for r in q_batch_drift(spark, SF).collect():
        if r["drifted"]:
            assert r["drift_ppm"] >= DRIFT_THRESH_PPM
        else:
            assert r["drift_ppm"] <= DRIFT_THRESH_PPM


# ------------------------------------------------------- join_size_estimate


def test_join_size_matches_python(spark):
    li = [
        r["l_partkey"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .collect()
    ]
    pa = [
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF}/part.parquet").select("p_partkey").collect()
    ]
    cl: dict[int, int] = {}
    for k in li:
        cl[k] = cl.get(k, 0) + 1
    cp: dict[int, int] = {}
    for k in pa:
        cp[k] = cp.get(k, 0) + 1
    want: dict[int, dict] = {}
    for k in set(cl) & set(cp):
        b = cl[k] // 8
        e = want.setdefault(
            b, {"n_keys": 0, "n_sampled_keys": 0, "exact_rows": 0, "est": 0}
        )
        contrib = cl[k] * cp[k]
        samp = int(hashlib.md5(f"jsz:{k}".encode()).hexdigest()[:15], 16) % JSZ_SAMPLE_MOD == 0
        e["n_keys"] += 1
        e["exact_rows"] += contrib
        if samp:
            e["n_sampled_keys"] += 1
            e["est"] += contrib
    got = {r["mult_bucket"]: r for r in q_join_size_estimate(spark, SF).collect()}
    assert set(got) == set(want)
    for b, w in want.items():
        g = got[b]
        assert g["n_keys"] == w["n_keys"]
        assert g["n_sampled_keys"] == w["n_sampled_keys"]
        assert g["exact_rows"] == w["exact_rows"]
        assert g["est_rows"] == w["est"] * JSZ_SAMPLE_MOD


def test_join_size_estimator_reasonable(spark):
    """The 1-in-8 key sample should land the GLOBAL estimate within a
    binomial band of the exact size, and exact totals equal the true
    join cardinality."""
    rows = q_join_size_estimate(spark, SF).collect()
    exact = sum(r["exact_rows"] for r in rows)
    est = sum(r["est_rows"] for r in rows)
    n_li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert exact == n_li  # p_partkey is unique -> join size == |lineitem|
    assert 0.5 * exact <= est <= 1.5 * exact


# ------------------------------------------------------------ skyline_hosts


def test_skyline_matches_python(spark):
    sig = _signatures(spark)
    got = {r["node"]: r for r in q_skyline_hosts(spark, SF).collect()}
    assert set(got) == set(sig)
    for n, (d, t) in sig.items():
        doms = sum(
            1
            for m, (d2, t2) in sig.items()
            if m != n and d2 >= d and t2 >= t and (d2 > d or t2 > t)
        )
        g = got[n]
        assert g["degree"] == d and g["n_tri"] == t
        assert g["n_dominators"] == doms, (n, g["n_dominators"], doms)
        assert g["on_skyline"] == (1 if doms == 0 else 0)


def test_skyline_properties(spark):
    """The skyline is non-empty, contains the max-degree and max-
    triangle hosts, and no skyline member dominates another on both
    coordinates strictly."""
    rows = q_skyline_hosts(spark, SF).collect()
    sky = [r for r in rows if r["on_skyline"]]
    assert sky
    max_d = max(r["degree"] for r in rows)
    max_t = max(r["n_tri"] for r in rows)
    assert any(r["degree"] == max_d for r in sky)
    assert any(r["n_tri"] == max_t for r in sky)
    # weak domination with one strict side cannot occur within the skyline
    for x in sky:
        for y in sky:
            if x["node"] != y["node"]:
                assert not (
                    x["degree"] >= y["degree"]
                    and x["n_tri"] >= y["n_tri"]
                    and (x["degree"] > y["degree"] or x["n_tri"] > y["n_tri"])
                )
