"""Invariant tests for the crawl-round driver queries (crawl_queries.py)
— the DuckDB oracle proves Spark==SQL; these prove both satisfy the
crawl semantics (budgets, robots, span ordering, state conservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twawler_spark import crawl_queries as crq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plan_rows(spark):
    _, plan = crq._plan(spark, SF)
    return [r.asDict() for r in plan.collect()]


def test_plan_respects_budgets_and_phases(plan_rows):
    from collections import Counter

    per_host = Counter()
    for r in plan_rows:
        per_host[(r["host"], r["phase"])] += 1
    assert per_host, "plan must schedule something"
    for (host, phase), n in per_host.items():
        hn = int(host[1:])
        b = 2 + hn % 4
        b2 = max(b // 2, 1)
        assert n <= (b if phase == "expected" else b2), (host, phase, n)
    # fetch_rank is dense + unique per (host, phase)
    for host in {h for h, _ in per_host}:
        for phase in ("expected", "late"):
            ranks = sorted(
                r["fetch_rank"]
                for r in plan_rows
                if r["host"] == host and r["phase"] == phase
            )
            assert ranks == list(range(1, len(ranks) + 1)), (host, phase, ranks)


def test_plan_respects_robots(spark):
    frontier, plan = crq._plan(spark, SF)
    joined = plan.join(
        frontier.select("url_hash", "path"), "url_hash"
    ).collect()
    for r in joined:
        hn = int(r["host"][1:])
        if hn % 5 == 0:
            assert not r["path"].startswith("/u/1"), r
        if hn % 10 == 0:
            assert not r["path"].startswith("/u/3"), r


def test_docs_span_sequences_well_formed(spark):
    docs = crq.q_crawl_round_docs(spark, SF).collect()
    assert docs
    for r in docs:
        kinds = r["span_kinds"].split(",")
        assert r["n_spans"] == len(kinds)
        assert r["offsets"] == ",".join(str(i) for i in range(r["n_spans"]))
        n_text = sum(k == "text" for k in kinds)
        n_media = sum(k == "media" for k in kinds)
        assert n_text + n_media == r["n_spans"]
        assert (r["text_all"] != "") == (n_text > 0)
        assert (r["media_all"] != "") == (n_media > 0)
        if n_media:
            assert all(m.startswith("m") and len(m) == 13
                       for m in r["media_all"].split(","))


def test_states_conserve_frontier(spark):
    rows = {r["state"]: r.asDict() for r in crq.q_crawl_round_states(spark, SF).collect()}
    frontier, plan = crq._plan(spark, SF)
    n_frontier = frontier.count()
    assert sum(r["n_urls"] for r in rows.values()) == n_frontier
    # every non-active state row came from a scheduled fetch this round
    n_transitioned = sum(
        r["n_urls"] for s, r in rows.items() if s != "active"
    )
    assert n_transitioned == sum(r["sum_state_round"] for r in rows.values())
    assert n_transitioned <= plan.count()


def test_outlinks_admission_subset(spark):
    out = crq.q_crawl_round_outlinks(spark, SF).collect()
    assert out
    for r in out:
        assert 0 <= r["n_admitted"] <= r["n_discovered"], r
        assert r["host"].endswith(".example.com")
    # the seen universe overlaps: something must actually be filtered
    assert any(r["n_admitted"] < r["n_discovered"] for r in out)


def test_crawl_to_corpus_funnel_is_monotone(spark):
    """The crawl->corpus funnel must narrow monotonically per host
    (fetched >= quality >= kept), and its token ledger must be
    consistent (sequences == floor(tokens/SEQ_LEN))."""
    from twawler_spark.crawl_queries import CORPUS_SEQ_LEN, q_crawl_to_corpus

    rows = q_crawl_to_corpus(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_fetched >= r.n_quality >= r.n_kept >= 0, r
        assert r.n_sequences == r.n_tokens // CORPUS_SEQ_LEN, r
    assert sum(r.n_kept for r in rows) > 0


def test_bfs_depth_semantics(spark):
    """Depth 0 is exactly the seed set; every depth-d node has an
    in-edge from some depth-(d-1) node and NO in-edge from any
    shallower-settled assignment (min-distance property, checked via a
    third implementation: plain-Python BFS over the collected edges)."""
    rows = {r["depth"]: r for r in crq.q_crawl_bfs_depth(spark, SF).collect()}
    assert rows[0]["n_nodes"] == len(crq.BFS_SEEDS)
    assert rows[0]["sum_node"] == sum(crq.BFS_SEEDS)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = {
        (r[0] % crq.BFS_MOD, (r[1] * 31 + r[2]) % crq.BFS_MOD)
        for r in li.select("l_orderkey", "l_partkey", "l_suppkey").collect()
    }
    adj = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
    dist = {s: 0 for s in crq.BFS_SEEDS}
    frontier = set(crq.BFS_SEEDS)
    for d in range(1, crq.BFS_MAX_DEPTH + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        frontier = nxt - dist.keys()
        for n in frontier:
            dist[n] = d
    from collections import Counter

    want = Counter(dist.values())
    got = {d: r["n_nodes"] for d, r in rows.items()}
    assert got == dict(want)


def test_dust_rules_recover_generative_truth(spark):
    """The fixture's generative rule is: content = f(path, page),
    independent of sid/ref. The miner must emit sid and ref as
    ignorable (support > 0, zero counterexamples) and page as
    content-bearing (every collapse is a counterexample)."""
    rows = {r["param"]: r for r in crq.q_dust_rules(spark, SF).collect()}
    assert set(rows) == set(crq.DUST_PARAMS)
    assert rows["sid"]["ignorable"] and rows["sid"]["n_collapsed"] > 0
    assert rows["ref"]["ignorable"] and rows["ref"]["n_conflicts"] == 0
    assert not rows["page"]["ignorable"]
    assert rows["page"]["n_conflicts"] == rows["page"]["n_collapsed"] > 0


def test_backlog_conserves_frontier(spark):
    """Per host: scheduled + blocked + waiting == active; total
    scheduled equals the plan size; robots-blocked rows appear only on
    hosts that actually carry deny rules (hn%5==0 or hn%10==0)."""
    rows = crq.q_crawl_backlog(spark, SF).collect()
    _, plan = crq._plan(spark, SF)
    for r in rows:
        assert r["n_scheduled"] + r["n_blocked"] + r["n_waiting"] == r["n_active"]
        hn = int(r["host"][1:])
        if r["n_blocked"] > 0:
            assert hn % 5 == 0
        if r["n_waiting"] > 0:
            assert r["est_rounds_to_drain"] >= 1
            assert r["max_waiting_hours_idle"] is not None
    assert sum(r["n_scheduled"] for r in rows) == plan.count()


def test_dust_apply_never_merges_content(spark):
    """Applying only the learned content-irrelevant rules must never
    collapse two URLs with different fingerprints: recompute the
    fixture in python and assert every canonical group is
    fingerprint-pure, and that the per-host savings match."""
    import hashlib

    def stream(p, did, m):
        return int(hashlib.md5(f"{p}:{did}".encode()).hexdigest()[:15], 16) % m

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    canon_groups = {}
    hosts = {}
    for r in docs:
        did = int(r["doc_id"])
        pid, pg = stream("dustp", did, 97), stream("dustg", did, 2)
        sid = stream("dusts", did, 5)
        ref = stream("dustv", did, 3) if stream("dustr", did, 4) == 0 else None
        url = f"https://h{pid % 20}.example.com/p/{pid}?page={pg}&sid={sid}"
        if ref is not None:
            url += f"&ref={ref}"
        fp = f"{pid}:{pg}"
        canon = f"https://h{pid % 20}.example.com/p/{pid}|page={pg}"
        canon_groups.setdefault(canon, {"urls": set(), "fps": set()})
        canon_groups[canon]["urls"].add(url)
        canon_groups[canon]["fps"].add(fp)
        hosts.setdefault(f"h{pid % 20}.example.com", set()).add(url)
    for g in canon_groups.values():
        assert len(g["fps"]) == 1  # fingerprint-pure: no content merged
    rows = {r["host"]: r for r in crq.q_dust_apply(spark, SF).collect()}
    for host, urls in hosts.items():
        canon_n = len({c for c, g in canon_groups.items() if g["urls"] & urls})
        assert rows[host]["n_urls"] == len(urls)
        assert rows[host]["n_canonical"] == canon_n
        assert rows[host]["n_fetches_saved"] == len(urls) - canon_n


def test_host_graph_rank_third_implementation(spark):
    """Weighted host-PageRank must match a plain-python recomputation
    from the engine's own collected edge weights, and conserve rank
    mass (sum == 1)."""
    from twawler_spark.plans.fetcher import discover_outlinks, fetch_results
    from pyspark.sql import functions as F

    _, plan = crq._plan(spark, SF)
    links = discover_outlinks(fetch_results(plan), crq.N_HOSTS).dropDuplicates(
        ["src_hash", "url"]
    )
    src = plan.select("url_hash", F.col("host").alias("src_host"))
    rows = (
        links.join(src, links["src_hash"] == src["url_hash"])
        .select(
            "src_host",
            F.concat(
                F.lit("h"), F.regexp_extract("url", r"^https://h([0-9]+)\.", 1)
            ).alias("dst_host"),
        )
        .collect()
    )
    from collections import Counter

    w = Counter((r["src_host"], r["dst_host"]) for r in rows)
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    n = len(nodes)
    ow = Counter()
    for (s, _), c in w.items():
        ow[s] += c
    rank = {h: 1.0 / n for h in nodes}
    d = crq.HG_DAMPING
    for _ in range(crq.HG_ITERS):
        dmass = sum(rank[h] for h in nodes if h not in ow)
        cin = {h: 0.0 for h in nodes}
        for (s, t), c in w.items():
            cin[t] += rank[s] * c / ow[s]
        rank = {h: (1 - d) / n + d * (cin[h] + dmass / n) for h in nodes}
    got = {r["host"]: r for r in crq.q_host_graph_rank(spark, SF).collect()}
    assert set(got) == set(nodes)
    for h in nodes:
        assert abs(got[h]["rank"] - rank[h]) < 2e-6, (h, got[h]["rank"], rank[h])
        assert got[h]["out_links"] == ow.get(h, 0)
    assert abs(sum(r["rank"] for r in got.values()) - 1.0) < 1e-4
