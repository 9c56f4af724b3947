"""Partitioned cuckoo seen-filter: zero false negatives, bounded false
positives, delete-without-rebuild (the retraction path Bloom lacks),
distributed-vs-driver build parity, persist roundtrip, and
cuckoo-prefiltered admission == exact anti-join."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from twawler_spark.operators.admission import admit
from twawler_spark.operators.cuckoo_filter import SLOTS, BroadcastCuckoo


def _keys_df(spark, lo, hi, name="url_hash"):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias(name)
    )


def _keys_np(lo, hi):
    # mixed-sign 64-bit keys, deterministic
    return ((np.arange(lo, hi, dtype=np.int64) * 2654435761) ^ (7 << 60)).astype(
        np.int64
    )


def test_core_no_false_negatives_and_fp_bound():
    keys = _keys_np(0, 50_000)
    ck = BroadcastCuckoo.from_keys(keys, n_shards=16)
    assert ck.contains_keys(keys).all()
    other = np.setdiff1d(_keys_np(1_000_000, 1_200_000), keys)
    # uint16 fingerprints, 2 buckets x 4 slots: fpp ~ 8/65536 = 0.012%
    assert ck.contains_keys(other).mean() < 0.001


def test_delete_without_rebuild():
    keys = _keys_np(0, 30_000)
    ck = BroadcastCuckoo.from_keys(keys, n_shards=8)
    gone, kept = keys[::3], np.setdiff1d(keys, keys[::3])
    removed = ck.delete_keys(gone)
    assert removed.all()
    # survivors keep zero false negatives — delete touched only the
    # retracted fingerprints
    assert ck.contains_keys(kept).all()
    # retracted keys read absent (up to the fp rate)
    assert ck.contains_keys(gone).mean() < 0.001
    # and re-insert restores them (the re-crawl completed path)
    ck.insert_keys(gone)
    assert ck.contains_keys(keys).all()


def test_insert_to_sizing_load_factor_no_overflow():
    # fill a small filter to its declared capacity: the kick loop must
    # absorb collisions without raising at the sizing load target
    keys = _keys_np(0, 40_000)
    ck = BroadcastCuckoo.from_keys(keys[:1], capacity=40_000, n_shards=4)
    ck.insert_keys(keys[1:])
    assert ck.contains_keys(keys).all()
    assert not ck.needs_rebuild


def test_distributed_build_matches_driver_build(spark):
    df = _keys_df(spark, 0, 20_000)
    arr = df.toPandas()["url_hash"].to_numpy(dtype=np.int64)
    dist = BroadcastCuckoo.build(df, n_keys=20_000, n_shards=16)
    drv = BroadcastCuckoo.from_keys(arr, capacity=dist.capacity, n_shards=16)
    assert dist.nb == drv.nb
    probe = np.concatenate([arr, _keys_np(5_000_000, 5_050_000)])
    # same shard routing + same hash streams -> identical membership
    # answers (table cell order may differ via kick history, membership
    # may not)
    assert (dist.contains_keys(probe) == drv.contains_keys(probe)).all()


def test_spark_probe_matches_driver_lookup(spark):
    seen = _keys_df(spark, 0, 10_000)
    ck = BroadcastCuckoo.build(seen, n_keys=10_000, n_shards=8)
    cands = _keys_df(spark, 5_000, 15_000)
    flagged = ck.probe(cands).toPandas()
    arr = flagged["url_hash"].to_numpy(dtype=np.int64)
    assert (flagged["maybe_seen"].to_numpy() == ck.contains_keys(arr)).all()
    # all genuinely-seen candidates flagged (no false negatives)
    seen_set = set(seen.toPandas()["url_hash"])
    hit = flagged[flagged["url_hash"].isin(seen_set)]
    assert hit["maybe_seen"].all()


def test_cuckoo_admission_equals_exact(spark):
    seen = _keys_df(spark, 0, 5_000)
    cands = _keys_df(spark, 2_500, 10_000)
    ck = BroadcastCuckoo.build(seen, n_keys=5_000, n_shards=8)
    with_ck = {r["url_hash"] for r in admit(cands, seen, ck).collect()}
    exact = {r["url_hash"] for r in admit(cands, seen, None).collect()}
    assert with_ck == exact
    assert len(exact) == 5_000


def test_retraction_admission_equals_exact_on_survivors(spark):
    """The retrydeletedtweets shape: retract a slice of the seen-set,
    then admit — cuckoo deletes in place (no rebuild) and the admitted
    set must equal the exact anti-join against the surviving seen."""
    seen = _keys_df(spark, 0, 6_000)
    retract = seen.where(F.pmod(F.col("url_hash"), F.lit(5)) == 0)
    survivors = seen.subtract(retract)
    cands = _keys_df(spark, 0, 9_000)
    ck = BroadcastCuckoo.build(seen, n_keys=6_000, n_shards=8)
    ck.delete_keys(retract.toPandas()["url_hash"].to_numpy(dtype=np.int64))
    got = {r["url_hash"] for r in admit(cands, survivors, ck).collect()}
    want = {r["url_hash"] for r in admit(cands, survivors, None).collect()}
    assert got == want


def test_save_load_roundtrip(tmp_path):
    keys = _keys_np(0, 10_000)
    ck = BroadcastCuckoo.from_keys(keys, n_shards=8)
    ck.delete_keys(keys[:100])
    ck.save(str(tmp_path / "state" / "seen"))
    back = BroadcastCuckoo.load(str(tmp_path / "state" / "seen"))
    assert back.n_keys == ck.n_keys and back.nb == ck.nb
    assert (back.table == ck.table).all()
    assert back.table.shape[1] == SLOTS
