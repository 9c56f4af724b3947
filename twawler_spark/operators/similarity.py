"""Similarity search over embedding columns (array<float>).

  cosine(a, b)            pure column expression (zip_with + aggregate —
                          JVM-side, no UDF)
  brute_force_topk        exact baseline: queries × corpus cross join +
                          windowed rank (correct at any scale, O(Q·N))
  rp_lsh_buckets          random-hyperplane signature (deterministic ±1
                          planes from md5 parity — no stored model)
  lsh_topk                the scale path: candidates from matching LSH
                          buckets (multi-probe via rotated prefixes),
                          exact cosine re-rank, top-k per query

At 100 TB the corpus bucketing is computed once and written
bucket-partitioned; query batches join only their probe buckets —
a broadcastable bucket map replaces the full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("__cv"))
    pairs = q.crossJoin(c).where(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id", "c_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _plane_sign(p: int, dim_col):
    """Deterministic ±1 weight for (plane p, dimension d)."""
    return F.when(
        F.substring(F.md5(F.concat(F.lit(f"{p},"), dim_col.cast("string"))), 1, 1).isin(
            *_ODD_HEX
        ),
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def rp_lsh_buckets(
    df: DataFrame, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket) — sign-bit signature under n deterministic planes."""
    dims = df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("d", "v"))
    parts = dims.select(
        F.col(id_col),
        *[
            (_plane_sign(p, F.col("d")) * F.col("v").cast("double")).alias(f"w{p}")
            for p in range(n_planes)
        ],
    )
    sums = parts.groupBy(id_col).agg(
        *[F.sum(f"w{p}").alias(f"s{p}") for p in range(n_planes)]
    )
    bucket = None
    for p in range(n_planes):
        term = F.when(F.col(f"s{p}") >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return sums.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates (same signature under
    any single-bit flip — multi-probe radius 1), exact cosine re-rank."""
    cb = rp_lsh_buckets(corpus, n_planes, id_col, vec_col).withColumnRenamed(
        id_col, "c_id"
    )
    qb = rp_lsh_buckets(queries, n_planes, id_col, vec_col).withColumnRenamed(
        id_col, "q_id"
    )
    # multi-probe: query probes its own bucket + every 1-bit neighbor
    probes = qb.select(
        "q_id",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                    for p in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("__cv"))
    cand = (
        probes.join(cb, "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    scored = (
        cand.join(qv, "q_id")
        .join(cv, "c_id")
        .select("q_id", "c_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
