"""Co-bucketed storage layout invariants (io_catalog.write_bucketed).

The 10^10 design point stores frontier and seen hash-bucketed + sorted
on url_hash so whole-frontier dedup never shuffles either table. These
tests pin the three properties that make that true:
  * aligned repartition -> exactly one file per bucket;
  * a join between alike-bucketed tables plans with ZERO Exchange
    (and zero Sort once the scan reports its SORTED BY ordering);
  * the bucketed anti-join returns exactly the unbucketed result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from twawler_spark.io_catalog import register_bucketed, write_bucketed

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    big = spark.range(20_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        (F.col("id") % 97).alias("host_id"),
    )
    seen = spark.range(0, 20_000, 3).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    write_bucketed(big, f"{root}/big", "t_big_gen", n_buckets=N_BUCKETS)
    write_bucketed(seen, f"{root}/seen", "t_seen_gen", n_buckets=N_BUCKETS)
    register_bucketed(spark, "t_big", f"{root}/big", n_buckets=N_BUCKETS)
    register_bucketed(spark, "t_seen", f"{root}/seen", n_buckets=N_BUCKETS)
    return root, big, seen


def test_one_file_per_bucket(bucketed_pair):
    import glob

    root, _, _ = bucketed_pair
    for t in ("big", "seen"):
        files = glob.glob(f"{root}/{t}/part-*.parquet")
        assert len(files) == N_BUCKETS, f"{t}: {len(files)} files"
        # bucket id is encoded in the file name suffix _0000N
        buckets = {f.rsplit("_", 1)[1][:5] for f in files}
        assert len(buckets) == N_BUCKETS


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_big").join(spark.table("t_seen"), "url_hash", "left_anti")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ")
        assert "SMJ" in plan.replace("SortMergeJoin", "SMJ")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_antijoin_matches_unbucketed(spark, bucketed_pair):
    _, big, seen = bucketed_pair
    expect = sorted(
        r["url_hash"] for r in big.join(seen, "url_hash", "left_anti").collect()
    )
    got = sorted(
        r["url_hash"]
        for r in spark.table("t_big")
        .join(spark.table("t_seen"), "url_hash", "left_anti")
        .collect()
    )
    assert got == expect and len(got) > 0


def test_register_rejects_layout_mismatch(spark, bucketed_pair):
    import json
    import os
    import shutil

    root, _, _ = bucketed_pair
    # wrong n_buckets vs the on-disk spec -> loud failure, not wrong joins
    with pytest.raises(ValueError, match="mismatch"):
        register_bucketed(spark, "t_bad", f"{root}/big", n_buckets=N_BUCKETS * 2)
    # missing spec (pre-validation layouts / foreign writers) -> rejected
    plain = f"{root}/plain"
    shutil.copytree(f"{root}/big", plain)
    os.remove(f"{plain}/_bucket_spec.json")
    with pytest.raises(ValueError, match="_bucket_spec"):
        register_bucketed(spark, "t_bad", plain, n_buckets=N_BUCKETS)
    # two files in one bucket -> the one-file-per-bucket invariant fails
    multi = f"{root}/multi"
    shutil.copytree(f"{root}/big", multi)
    src = next(f for f in os.listdir(multi) if f.startswith("part-"))
    shutil.copy(f"{multi}/{src}", f"{multi}/part-99999-deadbeef_{src.split('_')[1]}")
    with pytest.raises(ValueError, match=">1 file"):
        register_bucketed(spark, "t_bad", multi, n_buckets=N_BUCKETS)
