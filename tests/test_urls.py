"""URL canonicalization: rules + scalar/UDF parity (deshorten.py analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twawler_spark.functions.urls import canonicalize_str, canonicalize_udf

CASES = {
    "https://Example.com/a/b/": "https://example.com/a/b",
    "HTTP://WWW.Foo.COM:80//x//y?utm_source=a&q=1#frag": "http://foo.com/x/y?q=1",
    "https://a.com:443/p?b=2&a=1": "https://a.com/p?a=1&b=2",
    "https://a.com/?utm_campaign=z": "https://a.com/",
    "https://a.com/p?sess=1&gclid=2&keep=3": "https://a.com/p?keep=3",
    "not a url": "not a url",
    "https://a.com": "https://a.com/",
}


def test_canonicalize_rules():
    for raw, want in CASES.items():
        assert canonicalize_str(raw) == want, raw


def test_udf_matches_scalar(spark):
    df = spark.createDataFrame([(r,) for r in CASES], ["url"])
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_udf(F.col("url")).alias("c")).collect()
    }
    for raw, want in CASES.items():
        assert got[raw] == want


def test_idempotent():
    for raw in CASES:
        c = canonicalize_str(raw)
        assert canonicalize_str(c) == c
