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


def test_resolve_aliases_multihop(spark):
    """deshorten.py:86-97 redirect chains: iterative self-join resolves
    multi-hop aliases to the final target (bounded by max_hops)."""
    from twawler_spark.functions.urls import resolve_aliases

    urls = spark.createDataFrame(
        [("https://sho.rt/a",), ("https://sho.rt/b",), ("https://x.com/p",)],
        ["url"],
    )
    alias = spark.createDataFrame(
        [
            ("https://sho.rt/a", "https://mid.io/a"),
            ("https://mid.io/a", "https://final.com/a"),
            ("https://sho.rt/b", "https://final.com/b"),
        ],
        ["src_url", "dst_url"],
    )
    got = {r["url"] for r in resolve_aliases(urls, alias).collect()}
    assert got == {"https://final.com/a", "https://final.com/b", "https://x.com/p"}


def test_vectorized_matches_scalar_bulk():
    """The pandas .str fast path must be bit-identical to the scalar
    reference on adversarial + generator-shaped URLs."""
    import pandas as pd

    from twawler_spark.functions.urls import canonicalize_series

    cases = list(CASES) + [
        "http://a.com:443/p", "https://b.com:80/p", "  https://c.com/x  ",
        "https://WWW.D.com//", "https://e.com/p?z=1&utm_x=2&a=3&m=4",
        "https://f.com/p?", "https://g.com/p?&", "ftp://h.com/x", "",
        "https://i.com/p?ref=1", "https://j.com/p?a=1#x#y",
    ]
    for i in range(500):
        h = f"h{i % 37}.example.com"
        cases += [
            f"https://{h}/p/{i}",
            f"HTTPS://WWW.{h.upper()}//p//{i}/",
            f"https://{h}/p/{i}?utm_source=gen&b=2&a=1#frag",
            f"https://{h}:443/p/{i}?sess=abc",
        ]
    vec = canonicalize_series(pd.Series(cases))
    for raw, got in zip(cases, vec):
        assert got == canonicalize_str(raw), raw
