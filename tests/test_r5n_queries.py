"""Intent tests for the round-5n wave: cross-crawl HLL set algebra,
the all-integer EWMA latency smoother, and the int8 embedding
quantization audit — each recomputed by an independent plain-python
third implementation (the DuckDB oracles already prove Spark==SQL on
the registered fixtures), plus the structural guarantees each
operator ships: register-max union merge == one-pass union sketch,
the inclusion-exclusion identity, the EWMA recurrence == its closed
form, and the per-component quantization error bound scale/2."""

from __future__ import annotations

import hashlib
import math

from twawler_spark.sketch_queries import (
    HLL_ALPHA,
    HLL_M,
    HLLX_HOSTS,
    HLLX_PAGES_A,
    HLLX_PAGES_B,
    q_hll_intersect,
)
from twawler_spark.training_queries import QUANT_LEVELS, q_embed_quantize
from twawler_spark.web_queries import (
    EWMA_HOSTS,
    EWMA_ROUNDS,
    EWMA_TIMEOUT_CAP,
    EWMA_TIMEOUT_FACTOR,
    EWMA_VALUE_MOD,
    q_host_ewma_latency,
)

SF = "/root/testdata/sf0.001"


def _md5_60(prefix: str, s: str) -> int:
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:15], 16)


def _event_ids(spark) -> list:
    return [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id")
        .collect()
    ]


# -------------------------------------------------------- hll_intersect


def _hll_regs(urls) -> dict:
    regs: dict[int, int] = {}
    for u in urls:
        h = _md5_60("hll:", u)
        j = h % HLL_M
        hw = h // HLL_M
        rho = 55 if hw == 0 else 55 - hw.bit_length()
        regs[j] = max(regs.get(j, -(10**9)), rho)
    return regs


def _hll_est(regs: dict) -> float:
    s = sum(2.0**-m for m in regs.values()) + (HLL_M - len(regs))
    raw = HLL_ALPHA * HLL_M * HLL_M / s
    v = HLL_M - len(regs)
    if raw <= 2.5 * HLL_M and v > 0:
        return HLL_M * math.log(HLL_M / v)
    return raw


def test_hll_intersect_matches_python(spark):
    """Spark rows == dense python recompute per host: exact set sizes
    from real set ops, estimates from recomputed registers, and the
    union registers equal the element-wise max of A's and B's."""
    a_sets: dict[str, set] = {}
    b_sets: dict[str, set] = {}
    for eid in _event_ids(spark):
        page = (eid // 2) % (HLLX_PAGES_A if eid % 2 == 0 else HLLX_PAGES_B)
        tgt = a_sets if eid % 2 == 0 else b_sets
        tgt.setdefault(f"h{page % HLLX_HOSTS}", set()).add(f"https://p/{page}")

    rows = {r["host"]: r for r in q_hll_intersect(spark, SF).collect()}
    assert set(rows) == set(a_sets) | set(b_sets) or set(rows) == set(a_sets)
    for host, r in rows.items():
        a, b = a_sets.get(host, set()), b_sets.get(host, set())
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_inter"] == len(a & b)
        ra, rb = _hll_regs(a), _hll_regs(b)
        ru = {j: max(ra.get(j, -(10**9)), rb.get(j, -(10**9))) for j in ra | rb}
        ea, eb, eu = _hll_est(ra), _hll_est(rb), _hll_est(ru)
        assert r["est_a"] == round(ea, 3) and r["est_b"] == round(eb, 3)
        assert r["est_union"] == round(eu, 3)
        # inclusion-exclusion identity, exactly as registered
        assert r["est_inter"] == round(ea + eb - eu, 3)
        assert r["err_abs"] == round(abs(ea + eb - eu - len(a & b)), 3)


def test_hll_union_merge_equals_onepass():
    """Mergeability (the cross-cluster story): registers built from
    the concatenated stream equal the element-wise max of per-stream
    registers — for arbitrary overlapping synthetic sets."""
    for seed in range(5):
        a = {f"u{seed}:{i}" for i in range(0, 600, 2)}
        b = {f"u{seed}:{i}" for i in range(0, 900, 3)}
        ra, rb = _hll_regs(a), _hll_regs(b)
        merged = {j: max(ra.get(j, -(10**9)), rb.get(j, -(10**9))) for j in ra | rb}
        assert merged == _hll_regs(a | b)


# ---------------------------------------------------- host_ewma_latency


def _round_half_up(x: float, nd: int) -> float:
    """Spark's/DuckDB's HALF_UP for positive doubles; python round()
    is banker's, and EWMA values are exact dyadic rationals (num/2^r)
    so .xxxx5 half-cases actually occur."""
    p = 10.0**nd
    return math.floor(x * p + 0.5) / p


def test_host_ewma_matches_python(spark):
    """Spark rows == python recompute of per-(host, round) medians and
    the stepwise EWMA recurrence s_r = (x_r + s_{r-1})/2 — proving the
    registered closed form (integer numerator / 2^idx) IS the
    recurrence, and the timeout rule tracks min(cap, factor*s)."""
    by: dict[tuple, list] = {}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id")
        .collect()
    )
    for r in ev:
        v = 1 + _md5_60("ewma:", str(r["event_id"])) % EWMA_VALUE_MOD
        by.setdefault(
            (r["user_id"] % EWMA_HOSTS, r["event_id"] % EWMA_ROUNDS), []
        ).append(v)

    def median(vals: list) -> int:
        s = sorted(vals)
        return s[math.ceil(len(s) / 2) - 1]

    rows = {(r["host"], r["round"]): r for r in q_host_ewma_latency(spark, SF).collect()}
    assert set(rows) == set(by)
    hosts = {h for h, _ in by}
    for host in hosts:
        rounds = sorted(r for h, r in by if h == host)
        s = None
        for rnd in rounds:
            x = median(by[(host, rnd)])
            s = x if s is None else (x + s) / 2.0
            row = rows[(host, rnd)]
            assert row["n"] == len(by[(host, rnd)])
            assert row["p50_us"] == x
            assert row["ewma_us"] == _round_half_up(s, 4)
            assert row["timeout_us"] == _round_half_up(
                min(EWMA_TIMEOUT_CAP, EWMA_TIMEOUT_FACTOR * s), 4
            )
            # smoothing keeps the state inside the observed envelope
            lo = min(median(by[(host, k)]) for k in rounds if k <= rnd)
            hi = max(median(by[(host, k)]) for k in rounds if k <= rnd)
            assert lo <= row["ewma_us"] <= hi


def test_ewma_closed_form_is_recurrence():
    """The registered integer closed form s_r*2^r = x_0 + sum 2^(k-1)
    x_k equals the float recurrence exactly for alpha=1/2 (dyadic
    denominators), over adversarial integer series."""
    import random

    rng = random.Random(53)
    for _ in range(50):
        xs = [rng.randrange(1, 10**6) for _ in range(rng.randrange(1, 9))]
        s = xs[0]
        for x in xs[1:]:
            s = (x + s) / 2.0
        r = len(xs) - 1
        num = xs[0] + sum((1 << (k - 1)) * xs[k] for k in range(1, r + 1))
        assert s == num / 2.0**r


# -------------------------------------------------------- embed_quantize


def test_embed_quantize_matches_python(spark):
    """Spark rows == numpy-free python recompute (floor(x/scale+0.5)
    on float64), plus the structural bounds: codes within [-127, 127],
    max-|v| component at exactly 127, per-component reconstruction
    error <= scale/2, and dequantized cosine near 1."""
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .where("vec_id < 200")
        .collect()
    }
    rows = {r["vec_id"]: r for r in q_embed_quantize(spark, SF).collect()}
    assert set(rows) == {k for k, v in emb.items() if max(abs(x) for x in v) > 0}
    for vid, r in rows.items():
        v = emb[vid]
        scale = max(abs(x) for x in v) / QUANT_LEVELS
        q = [math.floor(x / scale + 0.5) for x in v]
        assert r["scale"] == round(scale, 6)
        assert r["q_l1"] == sum(abs(c) for c in q)
        assert r["q_sq"] == sum(c * c for c in q)
        assert r["q_max"] == max(abs(c) for c in q) == QUANT_LEVELS
        assert all(-QUANT_LEVELS <= c <= QUANT_LEVELS for c in q)
        assert all(abs(x - c * scale) <= scale / 2 + 1e-12 for x, c in zip(v, q))
        dot = sum(x * c for x, c in zip(v, q))
        nv = math.sqrt(sum(x * x for x in v))
        nq = math.sqrt(sum(c * c for c in q))
        assert r["cos_deq"] == round(dot / (nv * nq), 6)
        assert r["cos_deq"] > 0.99
