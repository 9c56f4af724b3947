"""Pure-Python invariants of the deterministic fetch spec + URL
canonicalization properties (hypothesis). No Spark session needed."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from twawler_spark import docspec
from twawler_spark.functions.urls import canonicalize_series, canonicalize_str


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_status_stable_and_valid(uh):
    s = docspec.fetch_status(uh)
    assert s in (200, 404, 403, 429)
    assert s == docspec.fetch_status(uh)


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_spans_invariants(uh, rnd):
    docs = docspec.synth_docs(uh, rnd)
    if docspec.fetch_status(uh) != 200:
        assert docs == []
        return
    assert 1 <= len(docs) <= docspec.MAX_DOCS_PER_FETCH
    for doc_id, spans in docs:
        assert doc_id.startswith("d") and len(doc_id) == 17
        assert 1 <= len(spans) <= docspec.MAX_SPANS
        offsets = [o for (_, _, _, o) in spans]
        assert offsets == list(range(len(spans)))  # dense, increasing
        for kind, text, media, _ in spans:
            if kind == "text":
                assert text and media is None
            else:
                assert kind == "media" and media and text is None


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=100, deadline=None)
def test_docs_differ_across_rounds(uh):
    if docspec.fetch_status(uh) != 200:
        return
    ids1 = {d for d, _ in docspec.synth_docs(uh, 1)}
    ids2 = {d for d, _ in docspec.synth_docs(uh, 2)}
    assert not (ids1 & ids2)  # refetch yields new docs, not duplicates


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=100, deadline=None)
def test_outlinks_deterministic_and_bounded(uh):
    links = docspec.outlinks(uh, n_hosts=100)
    assert links == docspec.outlinks(uh, n_hosts=100)
    assert len(links) <= docspec.MAX_OUTLINKS
    for u in links:
        assert u.startswith("https://h")
        assert canonicalize_str(u) == u  # outlinks are already canonical


_URLISH = st.one_of(
    st.text(max_size=50),
    st.builds(
        lambda scheme, www, host, port, path, q, frag: (
            f"{scheme}://{www}{host}{port}{path}{q}{frag}"
        ),
        st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        st.sampled_from(["", "www.", "WWW."]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9._\-]{0,10}){0,4}/?", fullmatch=True),
        st.sampled_from(
            ["", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&a=2", "?sess=q&x"]
        ),
        st.sampled_from(["", "#f", "#a#b"]),
    ),
)


@given(_URLISH)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_vectorized_parity(url):
    c = canonicalize_str(url)
    assert canonicalize_str(c) == c  # idempotent
    vec = canonicalize_series(pd.Series([url]))[0]
    assert vec == c  # vectorized == scalar
