"""Intent tests for the round-5k wave: interleave-shape census,
politeness compliance audit, and the frontier snapshot diff — each
recomputed by an independent plain-python third implementation (the
DuckDB oracles already prove Spark==SQL on the registered fixtures)."""

from __future__ import annotations

import collections
import hashlib
from datetime import timezone

from twawler_spark.web_queries import (
    PA_HOSTS,
    PA_MIN_GAP_US,
    SNAP_A_DROP,
    SNAP_B_DROP,
    SNAP_CHANGE,
    SNAP_STATES,
    q_politeness_audit,
    q_snapshot_diff,
    q_span_patterns,
)

SF = "/root/testdata/sf0.001"


def test_span_patterns_third_implementation(spark):
    """Recompute the census in Python from the ACTUAL fetched span
    arrays (the engine's own fetch surface), independent of both the
    Spark HOF pipeline and the SQL synthesis twin: per-doc pattern
    string, switch count, and the groupBy rollup."""
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = (
        fetch_documents(plan, ROUND_NO)
        .dropDuplicates(["doc_id"])
        .select("doc_id", "spans")
        .collect()
    )
    want = {}
    n_docs_total = 0
    for r in docs:
        n_docs_total += 1
        kinds = [s["kind"][0] for s in r["spans"]]
        # the north-rule order invariant: offsets must be 0..n-1 in order
        assert [s["offset"] for s in r["spans"]] == list(range(len(kinds)))
        pat = "".join(kinds)
        sw = sum(1 for a, b in zip(kinds, kinds[1:]) if a != b)
        ent = want.setdefault(
            pat,
            {
                "n_docs": 0,
                "n_spans": len(kinds),
                "n_text": pat.count("t"),
                "n_media": pat.count("m"),
                "n_switches": sw,
            },
        )
        ent["n_docs"] += 1
        assert ent["n_switches"] == sw  # constant per pattern
    got = {r["pattern"]: r for r in q_span_patterns(spark, SF).collect()}
    assert set(got) == set(want)
    assert sum(r["n_docs"] for r in got.values()) == n_docs_total
    for pat, w in want.items():
        g = got[pat]
        for k in ("n_docs", "n_spans", "n_text", "n_media", "n_switches"):
            assert g[k] == w[k], (pat, k)
    # the fixture must produce genuinely interleaved shapes, not only
    # single-kind blocks — otherwise the switch column is untested
    assert any(w["n_switches"] >= 2 for w in want.values())
    assert any(w["n_media"] == 0 for w in want.values())  # text-only path


def test_politeness_audit_third_implementation(spark):
    """Python recount of every host's gap sequence at exact epoch-us
    resolution, including the floor rule; both violation branches must
    appear in the fixture."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "ts")
        .collect()
    )
    by_host = collections.defaultdict(list)
    for r in rows:
        t_us = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )  # tz-naive == UTC
        by_host[r["user_id"] % PA_HOSTS].append((t_us, r["event_id"]))
    got = {r["host"]: r for r in q_politeness_audit(spark, SF).collect()}
    assert set(got) == set(by_host)
    total_viol = 0
    for h, evs in by_host.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        viol = sum(1 for g in gaps if g < PA_MIN_GAP_US)
        total_viol += viol
        r = got[h]
        assert r["n_fetches"] == len(evs)
        assert r["n_gaps"] == len(gaps)
        assert r["n_violations"] == viol
        assert r["min_gap_us"] == (min(gaps) if gaps else None)
        if gaps:
            assert abs(r["violation_pct"] - round(100.0 * viol / len(gaps), 4)) < 1e-9
    assert total_viol > 0
    assert total_viol < sum(len(v) - 1 for v in by_host.values())


def _state(uk: int) -> int:
    return int(hashlib.md5(f"s:{uk}".encode()).hexdigest()[0:12], 16) % SNAP_STATES


def test_snapshot_diff_third_implementation(spark):
    """Python rebuild of both snapshots and the full-outer classify;
    all four verdicts must appear, and the key checksums must match."""
    ids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id")
        .collect()
    ]
    a = {i: _state(i) for i in ids if i % SNAP_A_DROP != 0}
    b = {
        i: (_state(i) + 1) % SNAP_STATES if i % SNAP_CHANGE == 0 else _state(i)
        for i in ids
        if i % SNAP_B_DROP != 0
    }
    want = collections.defaultdict(lambda: [0, 0])
    for uk in set(a) | set(b):
        if uk not in a:
            v = "added"
        elif uk not in b:
            v = "removed"
        elif a[uk] != b[uk]:
            v = "changed"
        else:
            v = "same"
        want[v][0] += 1
        want[v][1] += uk
    got = {r["verdict"]: r for r in q_snapshot_diff(spark, SF).collect()}
    assert set(got) == {"added", "removed", "changed", "same"} == set(want)
    for v, (n, cs) in want.items():
        assert got[v]["n_urls"] == n
        assert got[v]["key_checksum"] == cs
