"""Structured-Streaming ingest — the reference's stream.py (S3) analog.

The reference consumes a push stream (tweepy) and upserts idempotently;
here the same semantics are Structured Streaming over a file source:
watermarked event-time windows, idempotent by window key. A live
deployment swaps the file source for Kafka — the query is unchanged.

``windowed_counts_batch_equivalent`` is the exact batch form of the
streaming aggregation: used as the DuckDB-checkable oracle twin (the
streaming result over a static dir equals the batch result).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_counter = itertools.count()


def stream_windowed_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the streaming windowed count over the static events dir to
    completion (availableNow) and return the result as a DataFrame."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"stream_out_{next(_counter)}"
    events = (
        spark.readStream.schema(schema)
        # file stream source needs a directory; glob selects the table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # parquet stores TIMESTAMP_NTZ; event-time semantics need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def windowed_counts_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming aggregation (for tests/oracles)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


O_STREAM_WINDOWED = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop's discover→dedup→admit path as a NATIVE streaming
    query (S3+S12+P5): candidates stream in (file source standing in
    for the push stream), stateful ``dropDuplicates`` gives the
    dup-tolerant insert semantics, a stream-static LEFT ANTI join
    against the broadcast seen-set is the admission filter, and the
    windowless per-host rollup runs in complete mode. No foreachBatch
    side effects — the whole path is declarative streaming operators.

    Candidate key = event_id % 3000 (collisions exercise the stateful
    dedup; host is derived from the key so dedup is deterministic);
    seen = 19·custkey for custkey < 150."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    name = f"stream_out_{next(_counter)}"
    kid = F.col("event_id") % 3000
    cand = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("o:"), kid.cast("string"))), 1, 15),
                16,
                10,
            ).cast("long").alias("url_hash"),
            F.concat(F.lit("h"), (kid % 20).cast("string")).alias("host"),
        )
        .dropDuplicates(["url_hash"])
    )
    seen = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") < 150)
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("o:"), (F.col("c_custkey") * 19).cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long").alias("url_hash")
        )
    )
    admitted = cand.join(F.broadcast(seen), "url_hash", "left_anti")
    agg = admitted.groupBy("host").agg(F.count(F.lit(1)).alias("n_admitted"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


O_STREAM_CRAWL_ADMISSION = """
WITH cand AS (SELECT DISTINCT event_id % 3000 AS kid FROM events),
seen AS (SELECT c_custkey * 19 AS kid FROM customer WHERE c_custkey < 150),
adm AS (SELECT kid FROM cand WHERE kid NOT IN (SELECT kid FROM seen))
SELECT 'h' || cast(kid % 20 as varchar) AS host, count(*) AS n_admitted
FROM adm GROUP BY 1
"""


def _row_minhash_bands(text_col):
    """4 LSH band keys per ROW as a fully streamable expression — the
    shingle→minhash→band tier with NO explode/groupBy: distinct 5-gram
    shingles via transform+slice, each Kirsch-Mitzenmacher hash as an
    array_min over a transform fold (same md5-split/expand arithmetic
    as operators/dedup.minhash_signatures, so row-wise and
    aggregate-wise signatures are bit-identical). Returns an array of
    (band_idx, band_val) structs."""
    M = 1 << 59

    def sh_arr(toks):
        # let-bound tokens: the shingle transform would otherwise
        # re-evaluate split() per element (O(len^2) per row)
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 4, F.lit(1)))
        return F.filter(
            F.array_distinct(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 5)))
            ),
            lambda t: t != "",
        )

    def bands_from(sh):
        # let-bound shingles: the 8 minhash folds share one evaluation
        # of the shingle array instead of rebuilding it per hash
        def h(k):
            def km(tok):
                m = F.md5(tok)
                h1 = F.pmod(
                    F.conv(F.substring(m, 1, 15), 16, 10).cast("long"), F.lit(M)
                )
                h2 = F.pmod(
                    F.conv(F.substring(m, 17, 15), 16, 10).cast("long"), F.lit(M)
                )
                return F.pmod(h1 + k * h2, F.lit(M))

            return F.array_min(F.transform(sh, km))

        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat(
                        h(2 * b).cast("string"),
                        F.lit("|"),
                        h(2 * b + 1).cast("string"),
                    ).alias("band_val"),
                )
                for b in range(4)
            ]
        )

    sh_bound = F.transform(F.array(F.split(text_col, " ")), sh_arr)[0]
    return F.transform(F.array(sh_bound), bands_from)[0]


def stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming content near-dup detection: mutated document variants
    stream in (first token dropped, the planted near-dup family) and
    are checked against the STATIC ingested corpus via the minhash-LSH
    band join — the content-tier twin of stream_crawl_admission's
    url-hash tier.

    Stream side: per-row band keys from _row_minhash_bands (stateless
    HOFs — no explode-aggregate on the stream, so no watermark needed),
    then a stateless explode to long form. Static side: the corpus'
    band table (batch groupBy minhash — same values). Stream-static
    INNER join on (band_idx, band_val) surfaces candidate near-dup
    pairs; stateful dropDuplicates collapses multi-band collisions.
    Append mode throughout — at production scale the static side is the
    bucketed signature store and the stream is Kafka."""
    from ..training_queries import _minhash_cols, _shingles_spark

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    name = f"stream_out_{next(_counter)}"
    nd = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(
            F.concat(F.col("doc_id").cast("string"), F.lit("_nd")).alias("nd_doc"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
        .select("nd_doc", F.explode(_row_minhash_bands(F.col("text"))).alias("b"))
        .select("nd_doc", "b.band_idx", "b.band_val")
    )
    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("orig_doc"), "text")
    )
    toks = corpus.select(
        "orig_doc", F.explode(_shingles_spark(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    sigs = toks.groupBy("orig_doc").agg(*_minhash_cols())
    static_bands = sigs.select(
        "orig_doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat(
                            F.col(f"h{2*b}").cast("string"),
                            F.lit("|"),
                            F.col(f"h{2*b+1}").cast("string"),
                        ).alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("orig_doc", "b.band_idx", "b.band_val")
    matched = (
        nd.join(F.broadcast(static_bands), ["band_idx", "band_val"])
        .select("nd_doc", "orig_doc")
        .dropDuplicates(["nd_doc", "orig_doc"])
    )
    q = (
        matched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _o_stream_near_dup() -> str:
    from ..training_queries import _o_minhash_parts

    ctes, _ = _o_minhash_parts()
    joins = "\nUNION\n".join(
        f"SELECT y.doc_id AS nd_doc, x.doc_id AS orig_doc FROM bands x "
        f"JOIN bands y ON x.band{b} = y.band{b} "
        f"AND x.doc_id NOT LIKE '%\\_nd' ESCAPE '\\' "
        f"AND y.doc_id LIKE '%\\_nd' ESCAPE '\\'"
        for b in range(4)
    )
    return f"""
WITH {ctes}
{joins}
"""


O_STREAM_NEAR_DUP = _o_stream_near_dup()
