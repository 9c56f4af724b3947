"""Deterministic synthetic-fetch specification.

The sandbox has no network, so the "fetch" of a scheduled URL is a pure
function of its 64-bit url_hash — the same stand-in the reference's
correctness story needs (its real fetches are Twitter API calls; the
rebuild's invariants are about scheduling, dedup, state transitions and
span-sequence fidelity, not HTTP).

This module is the single source of truth for that function: the Spark
fetcher (plans/fetcher.py, applyInPandas) and the sequential reference
simulator (reference_sim.py) both call it, so per-row span-sequence
equality verifies that the distributed pipeline (Arrow batching,
shuffles, nested-array parquet IO) preserves every (kind, text,
media_ref, order) sequence exactly.

Statuses mirror the reference's error-driven state machine
(twkit/utils.py:496-554 ``handle_twitter_error``):
  200 -> ok (docs emitted, checkpoint advances)
  404 -> dead      (code 50/34: bury,   utils.py:430-446)
  403 -> protected (code 179: protect,  utils.py:385-388)
  429 -> suspended (code 63/88: suspend/back off, utils.py:351-366)
"""

from __future__ import annotations

from .hashing import stream64, to_unsigned64

# stream ids (keep stable — they define the data)
_S_STATUS = 1
_S_NDOCS = 2
_S_DOCKEY = 3
_S_NSPANS = 4
_S_KIND = 5
_S_WORD = 6
_S_NWORDS = 7
_S_MEDIA = 8
_S_NOUT = 11
_S_OUTHOST = 12
_S_OUTID = 13
_S_ANCHOR = 14

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "crawl", "frontier", "span", "media", "fetch",
    "budget",
]
_V = len(VOCAB)

MAX_DOCS_PER_FETCH = 4
MAX_SPANS = 8
MAX_WORDS = 6
MAX_OUTLINKS = 3
BACKFILL_STEP = 3  # first_id decrement per successful fetch (load-past paging)


def fetch_status(url_hash: int) -> int:
    r = stream64(to_unsigned64(url_hash), _S_STATUS) % 100
    if r < 88:
        return 200
    if r < 92:
        return 404
    if r < 96:
        return 429
    return 403


def n_docs(url_hash: int) -> int:
    if fetch_status(url_hash) != 200:
        return 0
    return 1 + stream64(to_unsigned64(url_hash), _S_NDOCS) % MAX_DOCS_PER_FETCH


def synth_spans(doc_key: int) -> list[tuple[str, str | None, str | None, int]]:
    """Interleaved (kind, text, media_ref, offset) span sequence."""
    spans = []
    nsp = 1 + stream64(doc_key, _S_NSPANS) % MAX_SPANS
    for k in range(nsp):
        if stream64(doc_key, _S_KIND, k) % 3 < 2:
            nw = 1 + stream64(doc_key, _S_NWORDS, k) % MAX_WORDS
            words = [
                VOCAB[stream64(doc_key, _S_WORD, k * 16 + t) % _V] for t in range(nw)
            ]
            spans.append(("text", " ".join(words), None, k))
        else:
            spans.append(("media", None, "m%012x" % (stream64(doc_key, _S_MEDIA, k) % (1 << 48)), k))
    return spans


def synth_docs(url_hash: int, round_no: int) -> list[tuple[str, list]]:
    """[(doc_id, spans)] for one fetched URL (empty unless status 200).

    Keyed by (url_hash, round, j): a refetch in a later round yields the
    NEW documents since the checkpoint (dumpall.py since_id semantics),
    not duplicates of the previous fetch.
    """
    u = to_unsigned64(url_hash)
    out = []
    for j in range(n_docs(url_hash)):
        d = stream64(u, _S_DOCKEY, (round_no << 8) | j)
        out.append(("d%016x" % d, synth_spans(d)))
    return out


def outlinks_anchored(url_hash: int, n_hosts: int) -> list[tuple[str, str]]:
    """[(url, anchor_word)] discovered by a successful fetch — the
    anchor word is the source page's link text for that outlink (a
    deterministic independent stream, so it never perturbs the url
    identity that ``outlinks`` and the seen-set invariants key on)."""
    if fetch_status(url_hash) != 200:
        return []
    u = to_unsigned64(url_hash)
    links = []
    for j in range(stream64(u, _S_NOUT) % (MAX_OUTLINKS + 1)):
        th = stream64(u, _S_OUTHOST, j) % n_hosts
        oid = stream64(u, _S_OUTID, j) % (1 << 48)
        anchor = VOCAB[stream64(u, _S_ANCHOR, j) % _V]
        links.append((f"https://h{th}.example.com/o/{oid}", anchor))
    return links


def outlinks(url_hash: int, n_hosts: int) -> list[str]:
    """Canonical outlink URLs discovered by a successful fetch."""
    return [url for url, _anchor in outlinks_anchored(url_hash, n_hosts)]


STATE_OF_STATUS = {200: "active", 404: "dead", 403: "protected", 429: "suspended"}
