"""Intent tests for the round-5o wave: all-integer Lloyd k-means,
fixed-point UCB1 host scheduling, and the LSH s-curve calibration —
each recomputed by an independent plain-python third implementation
(the DuckDB oracles already prove Spark==SQL on the registered
fixtures), plus the structural guarantees each operator ships: the
k-means output partitions the corpus and its inertia identity holds,
the UCB bonus is exactly floor(sqrt(.)) and anti-monotone in pulls,
and the s-curve's planted similarity levels collide as the banding
theory predicts at the extremes.
"""

from __future__ import annotations

import hashlib
import math

from twawler_spark.training_queries import (
    KM_DIMS,
    KM_K,
    KM_QSCALE,
    KM_T,
    N_MINHASH,
    SCURVE_DOCS,
    SCURVE_PPM,
    _SCURVE_DEN4,
    q_kmeans_lloyd,
    q_lsh_s_curve,
)
from twawler_spark.web_queries import (
    UCB_HOSTS,
    UCB_PICK,
    UCB_SCALE,
    q_ucb_host_schedule,
)

SF = "/root/testdata/sf0.001"
_ODD = set("13579bdf")


# --------------------------------------------------------- kmeans_lloyd


def _quantized_vectors(spark) -> dict[int, list[int]]:
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    return {
        r["vec_id"]: [math.floor(float(x) * KM_QSCALE + 0.5) for x in r["embedding"]]
        for r in rows
    }


def _py_kmeans(vecs: dict[int, list[int]]) -> dict[int, dict]:
    cents = {
        cid: (list(vecs[cid]), 1) for cid in sorted(vecs) if cid < KM_K
    }
    assign: dict[int, int] = {}
    for _ in range(KM_T):
        assign = {}
        for vid, q in vecs.items():
            best = None
            for cid in sorted(cents):
                s, n = cents[cid]
                xx = sum(x * x for x in q)
                xs = sum(a * b for a, b in zip(q, s))
                ss = sum(x * x for x in s)
                a_num = n * n * xx - 2 * n * xs + ss
                cost = a_num / (n * n)
                if best is None or (cost, cid) < best[:2]:
                    best = (cost, cid)
            assign[vid] = best[1]
        new: dict[int, tuple[list[int], int]] = {}
        for vid, cid in assign.items():
            s, n = new.get(cid, ([0] * KM_DIMS, 0))
            new[cid] = ([a + b for a, b in zip(s, vecs[vid])], n + 1)
        cents = new
    out: dict[int, dict] = {}
    for cid, (s, n) in cents.items():
        members = [vid for vid, c in assign.items() if c == cid]
        inertia_num = 0
        for vid in members:
            q = vecs[vid]
            xx = sum(x * x for x in q)
            xs = sum(a * b for a, b in zip(q, s))
            ss = sum(x * x for x in s)
            inertia_num += n * n * xx - 2 * n * xs + ss
        out[cid] = {
            "n_members": n,
            "sum_vec_id": sum(members),
            "centroid_checksum": sum((d + 1) * s[d] for d in range(KM_DIMS)),
            "inertia_num": inertia_num,
        }
    return out


def test_kmeans_matches_python(spark):
    """Spark rows == dense python Lloyd with identical integer math."""
    vecs = _quantized_vectors(spark)
    expect = _py_kmeans(vecs)
    got = {r["cid"]: r for r in q_kmeans_lloyd(spark, SF).collect()}
    assert set(got) == set(expect)
    for cid, e in expect.items():
        g = got[cid]
        for k in ("n_members", "sum_vec_id", "centroid_checksum", "inertia_num"):
            assert g[k] == e[k], (cid, k, g[k], e[k])
        assert g["inertia"] == round(e["inertia_num"] / g["n_members"] ** 2, 4)


def test_kmeans_partitions_corpus(spark):
    """The final assignment is a partition: member counts sum to the
    corpus size and every cluster id is one of the K seeds."""
    rows = q_kmeans_lloyd(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(0 <= r["cid"] < KM_K for r in rows)


# ---------------------------------------------------- ucb_host_schedule


def _py_ucb(event_ids: list[int]) -> list[dict]:
    pulls: dict[int, int] = {}
    wins: dict[int, int] = {}
    for eid in event_ids:
        h = eid % UCB_HOSTS
        pulls[h] = pulls.get(h, 0) + 1
        w = hashlib.md5(f"ucb:{eid}".encode()).hexdigest()[0] in _ODD
        wins[h] = wins.get(h, 0) + (1 if w else 0)
    n_total = sum(pulls.values())
    lg = n_total.bit_length() - 1
    rows = []
    for h in sorted(pulls):
        mean = (wins[h] * UCB_SCALE) // pulls[h]
        arg = (2 * lg * UCB_SCALE * UCB_SCALE) // pulls[h]
        bonus = math.isqrt(arg)
        rows.append(
            {
                "host": h,
                "pulls": pulls[h],
                "wins": wins[h],
                "lg": lg,
                "mean_ppm": mean,
                "bonus_ppm": bonus,
                "score_ppm": mean + bonus,
            }
        )
    ranked = sorted(rows, key=lambda r: (-r["score_ppm"], r["host"]))
    for i, r in enumerate(ranked):
        r["ucb_rank"] = i + 1
        r["picked"] = 1 if i < UCB_PICK else 0
    return rows


def test_ucb_matches_python(spark):
    """Spark rows == python recompute; in particular the corrected
    floor(sqrt(.)) equals math.isqrt exactly on every host."""
    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    ]
    expect = {r["host"]: r for r in _py_ucb(eids)}
    got = {r["host"]: r.asDict() for r in q_ucb_host_schedule(spark, SF).collect()}
    assert got == expect


def test_ucb_bonus_antimonotone(spark):
    """More pulls can never mean a LARGER exploration bonus (the UCB1
    guarantee the integer floor preserves)."""
    rows = q_ucb_host_schedule(spark, SF).collect()
    by_pulls = sorted(rows, key=lambda r: r["pulls"])
    for a, b in zip(by_pulls, by_pulls[1:]):
        if a["pulls"] < b["pulls"]:
            assert a["bonus_ppm"] >= b["bonus_ppm"]
    assert sum(r["picked"] for r in rows) == min(UCB_PICK, len(rows))


# ---------------------------------------------------------- lsh_s_curve

_KM_M = 1 << 59


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    n = max(len(toks) - 4, 1)
    return {" ".join(toks[i : i + 5]) for i in range(n)}


def _bands(sh: set[str]) -> list[str]:
    mins = [None] * N_MINHASH
    for tok in sh:
        if tok == "":
            continue
        d = hashlib.md5(tok.encode()).hexdigest()
        h1 = int(d[0:15], 16) % _KM_M
        h2 = int(d[16:31], 16) % _KM_M
        for k in range(N_MINHASH):
            v = (h1 + k * h2) % _KM_M
            if mins[k] is None or v < mins[k]:
                mins[k] = v
    return [f"{mins[2 * b]}|{mins[2 * b + 1]}" for b in range(N_MINHASH // 2)]


def _py_s_curve(docs: list[tuple]) -> dict[int, dict]:
    sample: dict[str, str] = {}
    for doc_id, text in docs:
        if doc_id >= SCURVE_DOCS:
            continue
        toks = text.split(" ")
        sample[str(doc_id)] = text
        sample[f"{doc_id}_nd"] = " ".join(toks[1:])
        sample[f"{doc_id}_h"] = " ".join(toks[: math.ceil(len(toks) / 2)])
    sh = {d: _shingles(t) for d, t in sample.items()}
    bands = {d: _bands(s) for d, s in sh.items()}
    ids = sorted(sample)
    buckets: dict[int, dict] = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sh[da] & sh[db])
            union = len(sh[da] | sh[db])
            bkt = (10 * inter) // union
            coll = any(x == y for x, y in zip(bands[da], bands[db]))
            b = buckets.setdefault(bkt, {"n_pairs": 0, "n_collide": 0})
            b["n_pairs"] += 1
            b["n_collide"] += 1 if coll else 0
    for bkt, b in buckets.items():
        nm = max(400 - (2 * bkt + 1) ** 2, 0)
        b["emp_ppm"] = (b["n_collide"] * SCURVE_PPM) // b["n_pairs"]
        b["theory_ppm"] = SCURVE_PPM - (SCURVE_PPM * nm**4) // _SCURVE_DEN4
    return buckets


def test_s_curve_matches_python(spark):
    """Spark rows == python recompute of every bucket: exact jaccard
    deciles, band collisions, and both ppm rates."""
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    expect = _py_s_curve(docs)
    got = {r["jaccard_bucket"]: r.asDict() for r in q_lsh_s_curve(spark, SF).collect()}
    assert set(got) == set(expect)
    for bkt, e in expect.items():
        g = got[bkt]
        for k in ("n_pairs", "n_collide", "emp_ppm", "theory_ppm"):
            assert g[k] == e[k], (bkt, k, g[k], e[k])


def test_s_curve_extremes(spark):
    """The planted structure shows: near-dup buckets (>=8) collide at
    high rate, the random-pair bottom bucket at (near) zero — the
    s-curve separation that justifies the (4, 2) banding."""
    rows = {r["jaccard_bucket"]: r for r in q_lsh_s_curve(spark, SF).collect()}
    low = rows[min(rows)]
    assert low["emp_ppm"] < SCURVE_PPM // 10
    high_buckets = [b for b in rows if b >= 8]
    assert high_buckets, "planted near-dups must populate a >=0.8 bucket"
    hi_pairs = sum(rows[b]["n_pairs"] for b in high_buckets)
    hi_coll = sum(rows[b]["n_collide"] for b in high_buckets)
    assert hi_coll * 10 >= hi_pairs * 9  # >=90% recall at jaccard >= 0.8
    assert rows[10]["theory_ppm"] == SCURVE_PPM if 10 in rows else True
