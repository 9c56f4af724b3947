"""Intent tests for the round-5e web-scale wave (web_queries.py) —
the DuckDB oracles prove Spark==SQL; these prove the semantics:
anchor aggregation bounds, interleaved keep-rule consistency, sitemap
coverage conservation, component validity, longest-match blocking."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from twawler_spark import docspec
from twawler_spark import web_queries as wq

SF = "/root/testdata/sf0.001"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=100, deadline=None)
def test_anchored_outlinks_preserve_url_identity(uh):
    """Adding anchors must not perturb the url stream the seen-set
    invariants key on."""
    anchored = docspec.outlinks_anchored(uh, n_hosts=100)
    assert docspec.outlinks(uh, n_hosts=100) == [u for u, _ in anchored]
    for _, anchor in anchored:
        assert anchor in docspec.VOCAB


def test_anchor_text_topk_bounds(spark):
    rows = [r.asDict() for r in wq.q_anchor_text(spark, SF).collect()]
    assert rows
    per_tgt = {}
    for r in rows:
        assert 1 <= r["rnk"] <= 3
        assert 1 <= r["n_src_hosts"] <= r["n_links"]
        per_tgt.setdefault(r["target_host"], []).append(r)
    for tgt, grp in per_tgt.items():
        grp.sort(key=lambda r: r["rnk"])
        assert [g["rnk"] for g in grp] == list(range(1, len(grp) + 1))
        # ranks follow (n_links desc, n_src_hosts desc, anchor asc)
        keys = [(-g["n_links"], -g["n_src_hosts"], g["anchor"]) for g in grp]
        assert keys == sorted(keys), tgt


def test_interleaved_filter_consistency(spark):
    from twawler_spark import crawl_queries as crq

    rows = [r.asDict() for r in wq.q_interleaved_filter(spark, SF).collect()]
    assert rows
    for r in rows:
        assert 0 <= r["n_media_boiler"] <= r["n_media"]
        want = (
            r["n_text"] >= 1
            and r["n_words"] >= wq.MIN_WORDS
            and (r["n_media"] - r["n_media_boiler"]) <= wq.MAX_REAL_MEDIA
        )
        assert r["keep"] == want, r
    # span conservation vs the driver-oracled docs query (same plan)
    docs = {
        d["doc_id"]: d["n_spans"]
        for d in crq.q_crawl_round_docs(spark, SF).collect()
    }
    assert set(docs) == {r["doc_id"] for r in rows}
    for r in rows:
        assert r["n_text"] + r["n_media"] == docs[r["doc_id"]], r


def test_sitemap_coverage_conservation(spark):
    rows = [r.asDict() for r in wq.q_sitemap_coverage(spark, SF).collect()]
    assert rows
    for r in rows:
        assert r["n_fetched"] + r["n_pending"] == r["n_sitemap"], r
        assert 0 <= r["coverage_pct"] <= 100.0
        assert r["n_orphan"] >= 0


def test_host_components_valid_partition(spark):
    rows = [r.asDict() for r in wq.q_host_components(spark, SF).collect()]
    assert len(rows) == 20  # every host classified exactly once
    comp_of = {r["host"]: r["component"] for r in rows}
    # the component id is itself a host, and THAT host is its own root
    for host, comp in comp_of.items():
        assert comp in comp_of, (host, comp)
        assert comp_of[comp] == comp
    # component = min member (large/small-star invariant)
    members = {}
    for host, comp in comp_of.items():
        members.setdefault(comp, []).append(int(host[1:]))
    for comp, ms in members.items():
        assert int(comp[1:]) == min(ms), (comp, ms)
    for r in rows:
        assert r["is_root"] == (r["host"] == r["component"])


def test_url_blocklist_longest_match(spark):
    """Third implementation: recompute the longest-dot-suffix match per
    host in plain Python from the events table and compare rollups."""
    import duckdb
    from collections import Counter

    rows = {r["blocked_by"]: r.asDict() for r in wq.q_url_blocklist(spark, SF).collect()}
    assert "allowed" in rows

    uids = [
        u
        for (u,) in duckdb.sql(
            f"SELECT user_id FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    urls_per_entry: Counter = Counter()
    hosts_per_entry: dict[str, set] = {}
    for u in uids:
        host = f"s{u % 7}.d{u % 11}.{['com', 'net', 'org'][u % 3]}"
        sufs = [host, host.split(".", 1)[1]]
        matches = [s for s in sufs if s in wq.BLOCKLIST]
        entry = max(matches, key=len) if matches else "allowed"
        urls_per_entry[entry] += 1
        hosts_per_entry.setdefault(entry, set()).add(host)
    assert {
        k: (len(hosts_per_entry[k]), urls_per_entry[k]) for k in urls_per_entry
    } == {k: (r["n_hosts"], r["n_urls"]) for k, r in rows.items()}
    # conservation: blocked + allowed == all events
    assert sum(r["n_urls"] for r in rows.values()) == len(uids)


def test_opic_cash_conservation_and_topk(spark):
    """Third implementation: recompute OPIC cash per candidate url in
    plain Python from the plan + docspec, take top-k per host, compare
    exactly; plus conservation — every source's cash splits exactly."""
    from collections import Counter, defaultdict

    from twawler_spark import crawl_queries as crq

    _, plan = crq._plan(spark, SF)
    cash: Counter = Counter()
    nsrcs: Counter = Counter()
    for r in plan.select("url_hash").collect():
        links = docspec.outlinks(r["url_hash"], crq.N_HOSTS)
        if not links:
            continue
        share = wq.OPIC_CASH_UNITS // len(links)
        assert share * len(links) == wq.OPIC_CASH_UNITS  # exact split
        for url in links:
            cash[url] += share
            nsrcs[url] += 1
    per_host = defaultdict(list)
    for url, c in cash.items():
        host = url.split("//")[1].split(".")[0]
        per_host[host].append((-c, url))
    want = {}
    for host, lst in per_host.items():
        for rnk, (negc, url) in enumerate(sorted(lst)[: wq.OPIC_TOP_K], 1):
            want[url] = (host, -negc, nsrcs[url], rnk)
    got = {
        r["url"]: (r["target_host"], r["cash_units"], r["n_srcs"], r["rnk"])
        for r in wq.q_opic_priority(spark, SF).collect()
    }
    assert got == want


def test_mirror_detect_recovers_planted_pairs(spark):
    """Third implementation: per-host fingerprint sets in Python,
    exact Jaccard, same df cap and threshold. Runs at sf0.01 — the
    smaller fixture has no complete mirror pair (15 user residues
    never produce both hn and hn+15)."""
    import duckdb
    from collections import defaultdict
    from hashlib import md5

    sf = "/root/testdata/sf0.01"
    fps = defaultdict(set)
    for (u, eid) in duckdb.sql(
        f"SELECT user_id, event_id FROM '{sf}/events.parquet'"
    ).fetchall():
        hn = u % 20
        fp = md5(
            f"fp:{eid % wq.MIRROR_FP_BUCKETS}:{hn % 15}".encode()
        ).hexdigest()
        fps[f"h{hn}"].add(fp)
    df: defaultdict = defaultdict(set)
    for h, s in fps.items():
        for fp in s:
            df[fp].add(h)
    keep = {fp for fp, hs in df.items() if len(hs) <= wq.MIRROR_DF_CAP}
    hosts = sorted(fps)
    want = {}
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            shared = len(fps[a] & fps[b] & keep)
            if not shared:
                continue
            jac = round(shared / (len(fps[a]) + len(fps[b]) - shared), 4)
            if jac >= wq.MIRROR_MIN_JACCARD:
                want[(a, b)] = (shared, len(fps[a]), len(fps[b]), jac)
    got = {
        (r["host_a"], r["host_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["jaccard_r"]
        )
        for r in wq.q_mirror_detect(spark, sf).collect()
    }
    assert got == want and want  # non-empty: mirrors exist in the data


def test_span_dedup_third_implementation(spark):
    """Plain-python recount over the same fetched docs: occurrence
    counts, canonical ownership, and the conservation laws
    (n_dup = n_canonical + n_drop_of_dup; every span is kept once
    globally per distinct duplicated content)."""
    from twawler_spark.crawl_queries import ROUND_NO, _plan
    from twawler_spark.plans.fetcher import fetch_documents

    _, plan = _plan(spark, SF)
    docs = fetch_documents(plan, ROUND_NO).dropDuplicates(["doc_id"]).collect()
    occ: dict[str, list[tuple[str, int]]] = {}
    for d in docs:
        pos = 0
        for s in d["spans"]:
            if s["kind"] == "text":
                occ.setdefault(s["text"], []).append((d["doc_id"], pos))
                pos += 1
    exp: dict[str, dict[str, int]] = {}
    for text, places in occ.items():
        places.sort()
        for i, (doc_id, _) in enumerate(places):
            e = exp.setdefault(
                doc_id,
                {"n_text_spans": 0, "n_dup_spans": 0, "n_canonical": 0, "n_drop": 0},
            )
            e["n_text_spans"] += 1
            if len(places) >= 2:
                e["n_dup_spans"] += 1
                if i == 0:
                    e["n_canonical"] += 1
            if i > 0:
                e["n_drop"] += 1
    rows = {r["doc_id"]: r.asDict() for r in wq.q_span_dedup(spark, SF).collect()}
    assert set(rows) == set(exp)
    for doc_id, e in exp.items():
        r = rows[doc_id]
        for k, v in e.items():
            assert r[k] == v, (doc_id, k)
        assert r["dup_frac"] == e["n_dup_spans"] / e["n_text_spans"]
        assert r["keep"] == (r["dup_frac"] <= wq.DUP_SPAN_MAX_FRAC)
    # global conservation: per distinct duplicated content, exactly one
    # canonical owner; drops = occurrences - distinct contents
    assert sum(e["n_canonical"] for e in exp.values()) == sum(
        1 for p in occ.values() if len(p) >= 2
    )
    assert sum(e["n_drop"] for e in exp.values()) == sum(
        len(p) - 1 for p in occ.values()
    )


def test_dup_ngram_coverage_third_implementation(spark):
    """Plain-python 5-gram recount on the documents table."""
    from twawler_spark.training_queries import (
        DUP_NGRAM_MAX_FRAC,
        NGRAM_N,
        q_dup_ngram_coverage,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    gram_docs: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in docs.items():
        toks = text.lower().split(" ")
        grams = [
            " ".join(toks[i : i + NGRAM_N])
            for i in range(len(toks) - NGRAM_N + 1)
        ]
        per_doc[doc_id] = grams
        for g in set(grams):
            gram_docs.setdefault(g, set()).add(doc_id)
    rows = {
        r["doc_id"]: r.asDict()
        for r in q_dup_ngram_coverage(spark, SF).collect()
    }
    assert set(rows) == set(per_doc)
    for doc_id, grams in per_doc.items():
        n_dup = sum(1 for g in grams if len(gram_docs[g]) >= 2)
        r = rows[doc_id]
        assert r["n_grams"] == len(grams)
        assert r["n_dup"] == n_dup
        want = n_dup / len(grams) if grams else 0.0
        assert r["dup_frac"] == want
        assert r["keep"] == (want <= DUP_NGRAM_MAX_FRAC)
