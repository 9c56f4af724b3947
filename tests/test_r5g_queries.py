"""Intent tests for the round-5g wave: Efraimidis-Spirakis weighted
sampling, Schleimer winnowing fingerprints, and the frontier shard-
balance audit — each recomputed by an independent plain-python third
implementation (the DuckDB oracles already prove Spark==SQL)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from twawler_spark import web_queries as wq
from twawler_spark.training_queries import (
    WINNOW_K,
    WINNOW_MAX_DUP_FRAC,
    WINNOW_W,
    WSAMPLE_K,
    _WS_CEIL,
    q_weighted_sample,
    q_winnow_fingerprint,
)

SF = "/root/testdata/sf0.001"


def _md5_int(s: str, hexdigits: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hexdigits], 16)


def _winnow_py(text: str) -> tuple[int, set[int]]:
    """(n_grams, fingerprint set) — independent python winnowing."""
    toks = text.lower().split(" ")
    grams = [
        " ".join(toks[i : i + WINNOW_K])
        for i in range(len(toks) - WINNOW_K + 1)
    ]
    hashes = [_md5_int(g, 12) for g in grams]
    fps = {
        min(hashes[i : i + WINNOW_W])
        for i in range(len(hashes) - WINNOW_W + 1)
    }
    return len(grams), fps


def test_weighted_sample_third_implementation(spark):
    """Python recount of the A-ES keys: identical membership + ranks."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    keyed = []
    for doc_id, text in docs.items():
        w = len(text.split(" "))
        u = (_md5_int(f"ws:{doc_id}", 12) + 1) / float(_WS_CEIL)
        keyed.append((math.log(u) / w, doc_id, w))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = {
        doc_id: (rank + 1, w)
        for rank, (_, doc_id, w) in enumerate(keyed[:WSAMPLE_K])
    }
    rows = {
        r["doc_id"]: (r["sample_rank"], r["weight_tokens"])
        for r in q_weighted_sample(spark, SF).collect()
    }
    assert rows == want


def test_weighted_sample_is_weighted(spark):
    """Long documents must be overrepresented relative to a uniform
    draw: the sample's mean token weight exceeds the corpus mean
    (deterministic for this fixture + hash seed). Runs at sf0.01 —
    sf0.001 has fewer docs than K, so there the sample is the corpus."""
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    corpus_mean = sum(len(r["text"].split(" ")) for r in docs) / len(docs)
    rows = q_weighted_sample(spark, sf).collect()
    assert len(rows) == WSAMPLE_K < len(docs)
    sample_mean = sum(r["weight_tokens"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_winnow_fingerprint_third_implementation(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    fps_by_doc = {d: _winnow_py(t) for d, t in docs.items()}
    df_docs: dict[int, int] = {}
    for _, fps in fps_by_doc.values():
        for fp in fps:
            df_docs[fp] = df_docs.get(fp, 0) + 1
    rows = {
        r["doc_id"]: r.asDict()
        for r in q_winnow_fingerprint(spark, SF).collect()
    }
    assert set(rows) == set(fps_by_doc)
    for doc_id, (n_grams, fps) in fps_by_doc.items():
        r = rows[doc_id]
        n_dup = sum(1 for fp in fps if df_docs[fp] >= 2)
        assert r["n_grams"] == n_grams
        assert r["n_fps"] == len(fps)
        assert r["n_dup_fps"] == n_dup
        want = n_dup / len(fps) if fps else 0.0
        assert r["dup_frac"] == want
        assert r["keep"] == (want <= WINNOW_MAX_DUP_FRAC)


@given(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=30),
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=30),
    st.lists(st.sampled_from("uvwxyz"), min_size=WINNOW_K + WINNOW_W - 1,
             max_size=WINNOW_K + WINNOW_W + 10),
)
@settings(max_examples=150, deadline=None)
def test_winnow_guarantee_shared_run_shares_fingerprint(pre, post, shared):
    """Schleimer et al.'s winnowing guarantee: two documents sharing a
    token run of >= K + W - 1 always share at least one fingerprint.
    Pure-python over the same third-implementation helper — this tests
    the (K, W) algorithm choice itself, independent of Spark."""
    a = " ".join(pre + shared)
    b = " ".join(shared + post)
    _, fa = _winnow_py(a)
    _, fb = _winnow_py(b)
    assert fa & fb


def test_frontier_shard_balance_third_implementation(spark):
    uids = {
        r["user_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    }
    per: dict[int, list[int]] = {}
    for uid in uids:
        h = _md5_int(f"u:{uid}", 15)
        per.setdefault(h % wq.N_SHARD_BUCKETS, []).append(uid % 20)
    total = len(uids)
    rows = {
        r["bucket"]: r.asDict()
        for r in wq.q_frontier_shard_balance(spark, SF).collect()
    }
    assert set(rows) == set(per)
    assert sum(r["n_urls"] for r in rows.values()) == total
    for bucket, hosts in per.items():
        r = rows[bucket]
        assert r["n_urls"] == len(hosts)
        assert r["n_hosts"] == len(set(hosts))
        assert r["share_pct"] == round(100.0 * len(hosts) / total, 3)
        assert r["load_factor"] == round(
            len(hosts) * float(wq.N_SHARD_BUCKETS) / total, 4
        )


def _hrw_py(host_id: int, n_slots: int) -> int:
    return max(
        range(n_slots), key=lambda s: (_md5_int(f"a:{host_id}:{s}", 12), s)
    )


def test_fetcher_assignment_third_implementation(spark):
    uids = sorted(
        r["user_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    )
    n = wq.HRW_SLOTS
    want = {}
    for scheme, a16, a17 in (
        ("hrw", lambda u: _hrw_py(u, n), lambda u: _hrw_py(u, n + 1)),
        ("mod", lambda u: u % n, lambda u: u % (n + 1)),
    ):
        pairs = [(a16(u), a17(u)) for u in uids]
        loads: dict[int, int] = {}
        for s16, _ in pairs:
            loads[s16] = loads.get(s16, 0) + 1
        moved = sum(1 for s16, s17 in pairs if s16 != s17)
        want[scheme] = dict(
            n_hosts=len(uids),
            n_moved=moved,
            moved_pct=round(100.0 * moved / len(uids), 2),
            max_load16=max(loads.values()),
            min_load16=min(loads.values()),
        )
    rows = {
        r["scheme"]: r.asDict()
        for r in wq.q_fetcher_assignment(spark, SF).collect()
    }
    assert set(rows) == {"hrw", "mod"}
    for scheme, r in rows.items():
        r.pop("scheme")
        assert r == want[scheme], scheme


@given(st.integers(min_value=0, max_value=2**62), st.integers(2, 40))
@settings(max_examples=200, deadline=None)
def test_hrw_resize_moves_only_into_new_slot(host_id, n):
    """The rendezvous-hashing invariant the query's churn numbers rest
    on: growing the fleet N -> N+1 either keeps a host where it was or
    moves it INTO the new slot — never between old slots (so per-host
    politeness state survives a fleet resize for every unmoved host)."""
    before = _hrw_py(host_id, n)
    after = _hrw_py(host_id, n + 1)
    assert after == before or after == n
