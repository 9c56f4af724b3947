"""Deduplication operators — reusable engine APIs.

The query-suite twins (training_queries.py) inline these shapes with
DuckDB oracles; this module is the composable API a pipeline imports.
All operators are pure DataFrame compositions (no per-row Python):

  exact_dedup            hash-groupBy keep-first (S12: unique-index
                         dedup-on-write, dumpall.py:61-81)
  shingles               distinct k-gram word shingles (column expr)
  minhash_signatures     K portable min-hashes (md5-based, engine-agnostic)
  lsh_candidate_pairs    banded LSH bucket-join -> candidate pairs
  simhash                64-bit simhash via per-bit majority
  jaccard_pairs          token-set jaccard within blocking keys
  embedding_dup_pairs    cosine near-dup pairs within blocking keys

Scale notes: minhash/LSH is the 100 TB path — candidate generation is
|bands| self-joins on band value (shuffle on a short string key; bucket
sizes are bounded by construction because identical band values imply
near-identical shingle sets). The all-pairs jaccard/cosine variants
require a blocking column and are for candidate *verification*, not
discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spread_for_explode(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Pre-spread a small-file input before an explode-amplified stage.

    The shingle/token explode and its per-element hashing run in the
    SCAN's stage, so they inherit the scan's partitioning: a corpus
    that arrives as one or two parquet files serializes all the hash
    work on one or two cores no matter how wide the cluster is. When
    the input has fewer partitions than the cluster's default
    parallelism, hash-repartition by the document key (cheap: rows are
    pre-explode, tens of bytes each vs ~50× that post-explode). At
    warehouse scale the input split count far exceeds the core count,
    so this is a no-op — no shuffle is added on the 100 TB path."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key_col))
    return df


def shingles(text_col, k: int = 5):
    """Distinct k-gram word shingles as an array column."""
    toks = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-content group."""
    fp = F.md5(F.lower(F.col(text_col)))
    ranked = df.withColumn("__fp", fp).withColumn(
        "__keep",
        F.row_number().over(Window.partitionBy("__fp").orderBy(F.col(id_col).asc())),
    )
    return ranked.where(F.col("__keep") == 1).drop("__fp", "__keep")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, h0..h{K-1}) — portable min-hash per shingle set.

    ONE md5 per shingle, split into two 60-bit halves, expanded to K
    hashes via Kirsch-Mitzenmacher (h_k = h1 + k·h2 mod 2^59) — 8x less
    hashing than one salted md5 per row, and the min-aggregation runs
    over longs instead of 32-char hex strings. The same expression is
    portable SQL (DuckDB: ('0x'||substr(md5,..))::BIGINT), so the
    oracle computes identical signatures."""
    df = spread_for_explode(df, id_col)
    toks = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_k)).alias("__sh")
    ).where(F.col("__sh") != "")
    m = F.md5(F.col("__sh"))
    M = 1 << 59
    h1 = F.pmod(F.conv(F.substring(m, 1, 15), 16, 10).cast("long"), F.lit(M))
    h2 = F.pmod(F.conv(F.substring(m, 17, 15), 16, 10).cast("long"), F.lit(M))
    aggs = [
        F.min(F.pmod(h1 + k * h2, F.lit(M))).alias(f"h{k}")
        for k in range(n_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", n_hashes: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in >= 1 LSH band."""
    n_bands = n_hashes // rows_per_band
    # long form: one self-join on (band_idx, band_val) — a single shuffle
    # whose key includes the band index, instead of n_bands sig rescans
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "|",
                            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), "band.band_idx", "band.band_val")
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(id, simhash) — per-bit majority over xxhash64 of tokens.

    JVM-side: bit j of xxhash64(token) via shiftright+mask; the sum per
    bit decides the signature bit. All codegen, no UDF.
    """
    df = spread_for_explode(df, id_col)
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    ).where(F.col("__tok") != "")
    h = F.xxhash64(F.col("__tok"))
    parts = toks.select(
        F.col(id_col),
        *[
            (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ],
    )
    sums = parts.groupBy(id_col).agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(bits)]
    )
    sig = None
    for j in range(bits):
        bit_j = (1 << j) if j < 63 else -(1 << 63)  # two's-complement top bit
        term = F.when(F.col(f"s{j}") >= 0, F.lit(bit_j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by simhash: block on rotated bit-prefixes (each
    pair within hamming d collides on >= 1 of the 4 16-bit prefixes for
    d <= 3), then exact hamming filter."""
    blocks = None
    for r in range(64 // prefix_bits):
        b = sig_df.select(
            F.col(id_col),
            F.col("simhash"),
            F.shiftrightunsigned(F.col("simhash"), r * prefix_bits)
            .bitwiseAND(F.lit((1 << prefix_bits) - 1))
            .alias("block"),
            F.lit(r).alias("rot"),
        )
        blocks = b if blocks is None else blocks.unionByName(b)
    x, y = blocks.alias("x"), blocks.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.rot") == F.col("y.rot"))
            & (F.col("x.block") == F.col("y.block"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Token-set jaccard >= threshold within blocking groups."""
    toks = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("__toks"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.__toks"), F.col("b.__toks")))
    union = F.size(F.array_union(F.col("a.__toks"), F.col("b.__toks")))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def embedding_dup_pairs(
    df: DataFrame,
    block_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
) -> DataFrame:
    """Cosine >= threshold pairs within blocking groups (verification
    joint for LSH-bucketed candidates; see similarity.py)."""
    a, b = df.alias("a"), df.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col(f"a.{vec_col}"),
            F.col(f"b.{vec_col}"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.{vec_col}"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            (dot / (norm("a") * norm("b"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node in ``edges`` — component is the
    minimum node id reachable through the undirected pair graph.

    This is the cluster-resolution step production dedup needs after
    candidate discovery: LSH/simhash emit near-dup PAIRS; picking one
    keeper per duplicate group requires the transitive closure.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round formulation that survives web-scale graphs, unlike
    naive label propagation whose round count is the graph diameter.
    Each half-round is one shuffle: a window-min over the neighbor list
    (no per-node set materialization, so high-degree nodes stream
    through the min aggregate) followed by an edge rewrite + distinct.

      large-star: every neighbor v > u re-attaches to m = min(N(u)+{u})
      small-star: with edges oriented big->small, every neighbor and u
                  itself attach to m = min(N(u)+{u})

    Convergence is detected by an edge-multiset signature (count +
    sum-of-hashes aggregate — a 1-row collect per round); at the fixed
    point every non-minimum node points directly at its component
    minimum. Lineage is truncated per round with localCheckpoint (on a
    cluster, set a reliable checkpoint dir instead)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def large_star(e: DataFrame) -> DataFrame:
        b = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        return (
            b.withColumn("m", m)
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # precondition: u > v on every row (holds after large_star)
        m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        w = e.withColumn("m", m)
        return (
            w.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(w.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def signature(e: DataFrame):
        row = e.agg(
            F.count("*").alias("n"),
            # decimal sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    # lazy checkpoint + signature: the signature aggregate is the action
    # that materializes each round's checkpoint — one job per round, not
    # two (checkpoint job + signature job)
    e = large_star(e).localCheckpoint(eager=False)
    prev = signature(e)
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint(eager=False)
        cur = signature(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixed point: e holds (node -> component-min) for every non-root;
    # roots are min-ids that only appear on the v side
    nonroot = e.groupBy("u").agg(F.min("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("u"))
        .distinct()
        .join(nonroot.select("u"), "u", "left_anti")
        .withColumn("component", F.col("u"))
    )
    return nonroot.unionByName(roots).select(F.col("u").alias("node"), "component")
