"""Text-analysis kernels — pure column expressions (SURVEY §2.8).

Reference lineage: tokenization stats.py:628-649 (itertext/deaccent),
letter-class counting stats.py:691-728, lexicon membership
stats.py:654-689, language-ratio thresholds crawl-tweets.sh:90-95 (F14).
Everything here is JVM-side (codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "value", "data", "table", "row")

TOKEN_RE = r"[a-z0-9]+"


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokenization (TweetTokenizer stand-in, F4)."""
    return F.split(text, " ")


def tokenize_re(text: Column) -> Column:
    """Regex word tokenization (the BPE-ish fallback)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def normalize(text: Column) -> Column:
    """F2-style cleanup: lowercase, strip urls/mentions/extra space."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"https?://\S+", " ")
    t = F.regexp_replace(t, r"[@#]\w+", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokenize_ws(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(text: Column, threshold: float = 0.08) -> Column:
    """n-gram/stopword heuristic language id (F14 thresholds shape)."""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("other")


def token_count(text: Column) -> Column:
    return F.size(tokenize_ws(text))


def type_token_ratio(text: Column) -> Column:
    toks = tokenize_ws(text)
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Length/diversity/stopword composite in [0,1] (quality gate)."""
    return (
        F.least(token_count(text) / F.lit(50.0), F.lit(1.0)) * 0.4
        + type_token_ratio(text) * 0.4
        + (1 - stopword_ratio(text)) * 0.2
    )


def fingerprint(text: Column, prefix_tokens: int = 8) -> Column:
    """Normalized-prefix fingerprint (doc identity under edits at tail)."""
    return F.md5(
        F.concat_ws(" ", F.slice(F.split(F.lower(text), " "), 1, prefix_tokens))
    )


def deaccent_gr(text: Column) -> Column:
    """Greek de-accenting (stats.py:639-649) via translate."""
    return F.translate(text, "άέήίόύώΐΰς", "αεηιουωιυσ")
