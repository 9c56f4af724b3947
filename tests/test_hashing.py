"""XXH64 parity with Spark's builtin + PRNG determinism."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from twawler_spark.hashing import (
    np_stream64,
    stream64,
    to_signed64,
    xxh64_str,
)

import numpy as np


def test_xxh64_matches_spark_builtin(spark):
    samples = [
        "",
        "a",
        "http://a.com/x",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 100,
        "üñïçødé-пример-示例",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == to_signed64(xxh64_str(s)), s


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_xxh64_stable(s):
    assert xxh64_str(s) == xxh64_str(s)


def test_np_stream_matches_scalar():
    keys = np.array([0, 1, -5, 2**62, -(2**62)], dtype=np.int64)
    for stream in (1, 7, 101):
        for idx in (0, 3):
            vec = np_stream64(keys, stream, idx)
            for i, k in enumerate(keys):
                assert int(vec[i]) == stream64(int(k), stream, idx)


def test_stream64_duckdb_sql_parity():
    """The crawl-round oracles re-derive the deterministic fetch
    synthesis in DuckDB via the expanded splitmix64 SQL in
    crawl_queries._stream — it must be bit-identical to
    hashing.stream64 (the function the engine's fetcher uses)."""
    import duckdb

    from twawler_spark.crawl_queries import _stream
    from twawler_spark.hashing import stream64

    con = duckdb.connect()
    keys = [0, 1, 12345, (1 << 60) - 7, 987654321987654321, (1 << 64) - 1]
    for k in keys:
        for stream in (1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13):
            for idx in (0, 5, 257, 4096):
                sql = f"SELECT ({_stream(str(k), stream, str(idx))})::VARCHAR"
                got = int(con.sql(sql).fetchone()[0])
                assert got == stream64(k, stream, idx), (k, stream, idx)
    # and inside a lambda (how the span oracles use it)
    got = con.sql(
        f"SELECT list_transform(range(0, 4), k -> ({_stream('42', 5, 'k')}) % 3)"
    ).fetchone()[0]
    assert got == [stream64(42, 5, k) % 3 for k in range(4)]


def test_stream64_duckdb_sql_parity_property():
    """Hypothesis sweep of the splitmix64 SQL expansion across the full
    u64 key space (one DuckDB query per batch, all streams the engine
    uses)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from twawler_spark.crawl_queries import _stream
    from twawler_spark.hashing import stream64

    con = duckdb.connect()

    @settings(max_examples=25, deadline=None)
    @given(
        k=st.integers(min_value=0, max_value=(1 << 64) - 1),
        stream=st.integers(min_value=1, max_value=13),
        idx=st.integers(min_value=0, max_value=1 << 20),
    )
    def check(k, stream, idx):
        got = int(
            con.sql(f"SELECT ({_stream(str(k), stream, str(idx))})::VARCHAR").fetchone()[0]
        )
        assert got == stream64(k, stream, idx)

    check()
