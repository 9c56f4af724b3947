"""Simulated fetch stage — grouped Arrow UDFs over the fetch plan.

Reference: twkit/crawler/dumpall.py:23-92 pages each scheduled user's
timeline (200/page), inserts tweets dup-tolerantly and advances the
``crawlerdata.lastid`` checkpoint. Here the per-host group is the unit
(connection reuse / politeness locality); the plan is at most
sum(host budgets) rows per round, so the grouped-UDF stage is tiny
relative to the frontier scan that produced it.

Outlink discovery stays entirely JVM-side (xxhash64-derived expressions
+ explode) — no Python for the part whose volume scales with docs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import docspec
from ..schemas import DOCUMENTS, FETCH_RESULT


def fetch_documents(plan: DataFrame, round_no: int) -> DataFrame:
    """plan (url_hash, host, fetch_rank, ...) -> DOCUMENTS rows."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uh, host, rank in zip(pdf["url_hash"], pdf["host"], pdf["fetch_rank"]):
            for doc_id, spans in docspec.synth_docs(int(uh), round_no):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in spans
                        ],
                        "url_hash": int(uh),
                        "host": host,
                        "round": round_no,
                        "fetch_rank": int(rank),
                    }
                )
        return pd.DataFrame(
            rows, columns=[f.name for f in DOCUMENTS.fields]
        )

    return (
        plan.select("url_hash", "host", "fetch_rank")
        .groupBy("host")
        .applyInPandas(run, schema=DOCUMENTS)
    )


def fetch_results(plan: DataFrame) -> DataFrame:
    """Per scheduled URL: status, docs fetched, forward checkpoint
    advance (dumpall.py:83-87) and backward-backfill progress
    (load-past.py:69-77: first_id pages toward 0; reached marks the
    exhausted floor)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        st = [docspec.fetch_status(int(u)) for u in pdf["url_hash"]]
        nd = [docspec.n_docs(int(u)) for u in pdf["url_hash"]]
        last = [
            (int(l) if pd.notna(l) else 0) + n
            for l, n in zip(pdf["last_id"], nd)
        ]
        firsts, reached = [], []
        for s, f, r in zip(st, pdf["first_id"], pdf["reached"]):
            f = int(f) if pd.notna(f) else 0
            r = bool(r)
            if s == 200 and not r:  # backfill only pages on success
                f = max(f - docspec.BACKFILL_STEP, 0)
                r = f == 0
            firsts.append(f)
            reached.append(r)
        return pd.DataFrame(
            {
                "url_hash": pdf["url_hash"].astype("int64"),
                "host": pdf["host"],
                "status": pd.Series(st, dtype="int32"),
                "n_docs": pd.Series(nd, dtype="int32"),
                "new_last_id": pd.Series(last, dtype="int64"),
                "new_first_id": pd.Series(firsts, dtype="int64"),
                "new_reached": pd.Series(reached, dtype="bool"),
            }
        )

    return (
        plan.select("url_hash", "host", "last_id", "first_id", "reached")
        .groupBy("host")
        .applyInPandas(run, schema=FETCH_RESULT)
    )


def discover_outlinks(results: DataFrame, n_hosts: int) -> DataFrame:
    """JVM-side outlink expansion — must match docspec.outlinks exactly.

    Every stream64 call below replicates hashing.stream64(key, s, j)
    with xxhash64-free arithmetic is impossible JVM-side, so instead the
    *count* and *identity* of outlinks are derived from the same scalar
    function via a small Arrow UDF-free trick: docspec uses splitmix64
    streams, which have no Spark builtin — so this stage uses a pandas
    UDF after all, but on the RESULTS table (≤ plan size), not on docs.
    """
    if "host" not in results.columns:
        results = results.withColumn("host", F.lit(""))
    return discover_outlinks_anchored(results, n_hosts).select("src_hash", "url")


def discover_outlinks_anchored(results: DataFrame, n_hosts: int) -> DataFrame:
    """Outlink expansion carrying the source host and the link's anchor
    word (docspec.outlinks_anchored) — the input of anchor-text
    aggregation and host-graph construction. Same Arrow surface as
    ``discover_outlinks`` (the fetch-synthesis site), same ≤plan-size
    input bound."""
    import pandas as pd  # noqa: F811

    def run(it):
        for pdf in it:
            rows = []
            for uh, host in zip(pdf["url_hash"], pdf["host"]):
                for url, anchor in docspec.outlinks_anchored(int(uh), n_hosts):
                    rows.append(
                        {
                            "src_hash": int(uh),
                            "src_host": host,
                            "url": url,
                            "anchor": anchor,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["src_hash", "src_host", "url", "anchor"]
            )

    ok = results.where(F.col("status") == 200).select("url_hash", "host")
    return ok.mapInPandas(
        run, schema="src_hash long, src_host string, url string, anchor string"
    )
