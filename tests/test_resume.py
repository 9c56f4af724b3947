"""Kill-safe resume: stopping after round k and resuming from the latest
committed snapshot yields the exact same state as an uninterrupted run
(the reference's "no risk of creating a corrupt state", README Stopping;
checkpoints crawlerdata.lastid, dumpall.py:83-87)."""

from __future__ import annotations

from twawler_spark.io_catalog import Catalog
from twawler_spark.plans.round import bootstrap, run_rounds

from .conftest import N_HOSTS


def _setup(spark, crawl_root, root):
    cat = Catalog(spark, root)
    for name in ("frontier_seed", "seen_seed", "host_budget", "robots"):
        spark.read.parquet(f"{crawl_root}/{name}").write.parquet(f"{root}/{name}")
    bootstrap(cat, cat.read_input("frontier_seed"), cat.read_input("seen_seed"))
    return cat


def test_resume_equals_uninterrupted(spark, crawl_root, tmp_path_factory):
    a = _setup(spark, crawl_root, str(tmp_path_factory.mktemp("a")))
    run_rounds(a, 4, n_hosts=N_HOSTS)

    b = _setup(spark, crawl_root, str(tmp_path_factory.mktemp("b")))
    run_rounds(b, 2, n_hosts=N_HOSTS)
    # "kill": drop every in-memory handle; a new Catalog resumes from disk
    b2 = Catalog(spark, b.root)
    assert b2.latest_round("frontier") == 2
    run_rounds(b2, 4, n_hosts=N_HOSTS)

    from twawler_spark.plans.round import read_frontier, read_seen

    left = {tuple(r) for r in read_frontier(a, 4).collect()}
    right = {tuple(r) for r in read_frontier(b2, 4).collect()}
    assert left == right
    seen_a = {tuple(r) for r in read_seen(a, 4).collect()}
    seen_b = {tuple(r) for r in read_seen(b2, 4).collect()}
    assert seen_a == seen_b

    docs_a = {r["doc_id"] for r in a.read_appended("documents").collect()}
    docs_b = {r["doc_id"] for r in b2.read_appended("documents").collect()}
    assert docs_a == docs_b


def test_compaction_and_history_expiry(spark, crawl_root, tmp_path_factory):
    """COMPACT_EVERY=4: round 4 writes a compaction snapshot and expires
    earlier manifests/deltas; reads and resume still work after."""
    from twawler_spark.plans.round import read_frontier

    cat = _setup(spark, crawl_root, str(tmp_path_factory.mktemp("e")))
    run_rounds(cat, 5, n_hosts=N_HOSTS)
    assert cat.compaction_rounds("frontier") == [4]  # 0..3 expired at r4
    assert cat.committed_rounds("frontier") == [4, 5]
    assert cat.latest_round("frontier") == 5
    assert read_frontier(cat, 5).count() > 0
    # manifest arithmetic matches the materialized view
    assert cat.read_manifest("frontier", 5)["n_rows"] == read_frontier(cat, 5).count()


def test_manifest_lineage(spark, crawl_root, tmp_path_factory):
    cat = _setup(spark, crawl_root, str(tmp_path_factory.mktemp("m")))
    run_rounds(cat, 1, n_hosts=N_HOSTS)
    man = cat.read_manifest("frontier", 0)  # round 0 = compaction snapshot
    assert man["kind"] == "compaction"
    assert man["n_rows"] == sum(p["rows"] for p in man["partitions"])
    assert man["n_rows"] > 0
    assert "url_hash" in man["columns"]
    man1 = cat.read_manifest("frontier", 1)  # delta-only commit
    assert man1["kind"] == "commit" and man1["n_rows"] > 0
