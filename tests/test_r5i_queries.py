"""Intent tests for the round-5i wave: bulk-lookup repopulation
batching and the cattweet point lookup — each recomputed by an
independent plain-python third implementation (the DuckDB oracles
already prove Spark==SQL on the registered fixtures)."""

from __future__ import annotations

from twawler_spark.coverage_queries import (
    CATTWEET_IDS,
    REPOP_BATCH,
    REPOP_SHARDS,
    q_cattweet_lookup,
    q_repopulate_batches,
)

SF = "/root/testdata/sf0.001"


def _degraded_ids(spark) -> list[int]:
    rows = spark.read.parquet(f"{SF}/events.parquet").select("event_id").collect()
    return sorted(
        r["event_id"]
        for r in rows
        if r["event_id"] % 3 == 1
        and r["event_id"] % 7 == 0
        and r["event_id"] % 17 != 0
    )


def test_repopulate_batches_third_implementation(spark):
    """Python rebuild: shard the degraded ids, chunk each shard's
    sorted stream into REPOP_BATCH-sized batches, compare the full
    per-batch plan (size + id span) against the Spark row-set."""
    ids = _degraded_ids(spark)
    assert ids, "fixture must produce degraded records at sf0.001"
    want = {}
    for shard in range(REPOP_SHARDS):
        stream = [i for i in ids if i % REPOP_SHARDS == shard]
        for b in range(0, len(stream), REPOP_BATCH):
            chunk = stream[b : b + REPOP_BATCH]
            want[(shard, b // REPOP_BATCH)] = (
                len(chunk), chunk[0], chunk[-1],
            )
    got = {
        (r["shard"], r["batch_no"]): (r["n_ids"], r["min_id"], r["max_id"])
        for r in q_repopulate_batches(spark, SF).collect()
    }
    assert got == want


def test_repopulate_batches_invariants(spark):
    """API-plan conservation laws: every batch respects the lookup
    limit, ids are conserved (sum of batch sizes == degraded count),
    only a shard's LAST batch may be short, and batch id spans within
    a shard never overlap (the cursor order is preserved)."""
    ids = _degraded_ids(spark)
    rows = sorted(
        q_repopulate_batches(spark, SF).collect(),
        key=lambda r: (r["shard"], r["batch_no"]),
    )
    assert sum(r["n_ids"] for r in rows) == len(ids)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 1 <= r["n_ids"] <= REPOP_BATCH
        assert r["min_id"] <= r["max_id"]
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, batch in by_shard.items():
        nos = [r["batch_no"] for r in batch]
        assert nos == list(range(len(batch)))  # dense numbering from 0
        for a, b in zip(batch, batch[1:]):
            assert a["n_ids"] == REPOP_BATCH  # only the tail is short
            assert a["max_id"] < b["min_id"]  # spans ordered, disjoint


def test_cattweet_lookup_third_implementation(spark):
    """Python point lookup over the raw parquet must match the Spark
    row-set exactly, including the JSON field extraction."""
    import json

    want = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        if r["event_id"] in CATTWEET_IDS:
            want[r["event_id"]] = (
                r["ts"], r["user_id"], r["event_type"], r["value"],
                int(json.loads(r["props"])["k"]),
            )
    assert want, "fixture ids must hit at sf0.001"
    got = {
        r["event_id"]: (r["ts"], r["user_id"], r["event_type"], r["value"], r["k"])
        for r in q_cattweet_lookup(spark, SF).collect()
    }
    assert got == want


def test_cattweet_filter_is_pushed(spark):
    """The IN-list must reach the parquet scan as a pushed filter —
    the point-lookup tier's whole value at 100 TB is row-group
    pruning, not a full scan with a post-filter."""
    plan = q_cattweet_lookup(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "event_id" in pushed and ("In(" in pushed or "EqualTo" in pushed)
