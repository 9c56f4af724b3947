"""Round-5l distributed-sketch tier: mergeable cardinality and
frequency summaries for 10^10-URL frontiers.

At web scale the two counters a crawl loop asks for constantly —
"how many DISTINCT URLs has this host contributed?" and "how often
does this exact URL keep showing up?" — are exactly the ones whose
exact forms shuffle one row per distinct key. This module adds the
standard sketch answers, built from scratch on portable md5-derived
hashes so the DuckDB oracle replicates every register bit:

  hll_distinct   per-host HyperLogLog cardinality registers
                 (Flajolet et al. 2007; m=64, alpha=0.709, linear
                 counting below 2.5m) next to the exact distinct —
                 the sketch the production tier would checkpoint
                 per-partition instead of ever running countDistinct
  cms_freq       Count-Min frequency estimates (Cormode &
                 Muthukrishnan 2005; d=4 rows x w=64 buckets) for a
                 fixed hot-URL watchlist next to the exact counts —
                 the approximate tier behind heavy_hitters' exact
                 two-pass plan

Both sketches are MERGEABLE (HLL: register-wise max; CMS: cell-wise
sum), which is the whole point at 100 TB: partial sketches partial-
aggregate map-side, the shuffle carries at most (m x hosts) or
(d x w) rows per map task regardless of key cardinality, and round-
over-round accumulation is a tiny merge of checkpointed sketch rows —
the counting twin of the bloom/cuckoo seen-filter tier
(operators/seen_filter.py). Reference analog: the reference keeps
exact Mongo-side distinct/frequency counters (twkit/utils/counters +
twkit/analytics/freq.py); at 10^10 URLs those become sketches.

The exact columns in both outputs are the VERIFICATION baseline (and
what the DuckDB oracle also computes); the production path at scale
keeps only the sketch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _t

# ------------------------------------------------------------- fixture
#
# URL hit stream derived from events, shared by both sketches:
#   cms_freq uses the reciprocal Zipf law of heavy_hitters (hot keys
#   with thousands of hits) — frequency sketches are about skew;
#   hll_distinct uses a near-uniform page draw (page = event_id mod
#   HLL_PAGES) over HLL_HOSTS hosts — cardinality sketches are about
#   distinct mass, and this puts ~375 distinct URLs per host at
#   sf0.01 (raw-HLL branch) and ~125 at sf0.001 (linear-counting
#   branch), so the oracle sweep exercises both estimator regimes.

HLL_M = 64          # registers; alpha_64 = 0.709 (Flajolet et al., fig. 3)
HLL_ALPHA = 0.709
HLL_ROUNDS = 4      # scheduling-round partitions for the merge demo
HLL_PAGES = 3001    # fixture distinct-page modulus (prime-ish, co-prime to hosts)
HLL_HOSTS = 8
CMS_D = 4           # hash rows
CMS_W = 64          # buckets per row
CMS_ZIPF_N = 10000  # same reciprocal law as heavy_hitters' fixture
CMS_KEYS = list(range(1, 13))  # watchlist: the 12 hottest Zipf pages


def _md5_long(col, prefix: str):
    """Portable 60-bit positive hash: first 15 hex chars of
    md5(prefix || col) — identical in Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
    ).cast("long")


# --------------------------------------------------------- hll_distinct


def _hll_hits(spark: SparkSession, sf: str) -> DataFrame:
    """Shared HLL fixture: (host, url, round) hit stream — round is the
    scheduling-round label used by the merge demonstration."""
    e = _t(spark, sf, "events")
    page = F.pmod(F.col("event_id"), F.lit(HLL_PAGES))
    return e.select(
        F.concat(F.lit("h"), F.pmod(page, F.lit(HLL_HOSTS)).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("https://p/"), page.cast("string")).alias("url"),
        F.pmod(F.col("event_id"), F.lit(HLL_ROUNDS)).alias("round"),
    )


def _hll_ranked(df: DataFrame) -> DataFrame:
    """Attach (j, rho): register index and leading-zero rank. h is a
    60-bit non-negative long; h >> 6 is exact floor division (h / 64.0
    would round through a 53-bit double mantissa)."""
    h = _md5_long(F.col("url"), "hll:")
    hw = F.shiftright(h, 6)
    rho = F.when(hw == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(hw)))
    return df.withColumn("j", F.pmod(h, F.lit(HLL_M))).withColumn("rho", rho)


def _hll_estimate(s_present, n_present):
    """Estimate from present-register aggregates: alpha*m^2 / sum(2^-M)
    with empty registers contributing 2^0, linear counting m*ln(m/V)
    below 2.5m while V > 0 empty registers remain."""
    raw = (HLL_ALPHA * HLL_M * HLL_M) / (s_present + (HLL_M - n_present))
    v_zero = F.lit(HLL_M) - n_present
    return F.when(
        (raw <= 2.5 * HLL_M) & (v_zero > 0),
        HLL_M * F.log(HLL_M / v_zero.cast("double")),
    ).otherwise(raw)


def q_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host distinct-URL cardinality: HyperLogLog estimate next to
    the exact count. h = 60-bit md5 hash; register j = h mod 64; the
    remaining 54 bits w rank rho = (leading zeros of w) + 1 =
    55 - length(bin(w)) (both engines' bin() strips leading zeros);
    registers take max(rho); the estimate is alpha * m^2 / sum(2^-M[j])
    with empty registers contributing 2^0, switching to linear
    counting m*ln(m/V) when the raw estimate is under 2.5m and V > 0
    empty registers remain — the textbook small-range correction.

    100 TB shape: the ONLY exchange carrying data proportional to the
    stream is the (host, register) partial aggregation, and map-side
    combine caps it at m=64 rows per host per map task no matter how
    many trillion URL hits flow through; the per-host estimate then
    reduces 64 rows to 1. The exact countDistinct column exists to
    verify the sketch (and for the oracle) — the production tier
    checkpoints the 64 register values per host instead and merges
    snapshots register-wise by max across rounds and clusters.
    Reference analog: twkit/analytics/freq.py's exact per-key distinct
    counters, re-expressed as the sketch a 10^10-URL frontier needs."""
    hits = _hll_hits(spark, sf)
    regs = (
        _hll_ranked(hits.select("host", "url"))
        .groupBy("host", "j")
        .agg(F.max("rho").alias("m"))
    )
    per_host = regs.groupBy("host").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = _hll_estimate(F.col("s_present"), F.col("n_present"))
    exact = hits.groupBy("host").agg(F.countDistinct("url").alias("n_exact"))
    return (
        exact.join(per_host, "host")
        .select(
            "host",
            "n_exact",
            F.round(est, 3).alias("n_est"),
            F.round(100.0 * (est - F.col("n_exact")) / F.col("n_exact"), 3).alias(
                "rel_err_pct"
            ),
        )
    )


O_HLL_DISTINCT = f"""
WITH hits AS (
  SELECT 'h' || cast((event_id % {HLL_PAGES}) % {HLL_HOSTS} as varchar) AS host,
         'https://p/' || cast(event_id % {HLL_PAGES} as varchar) AS url
  FROM events),
hashed AS (
  SELECT host, url,
         ('0x' || substring(md5('hll:' || url), 1, 15))::BIGINT AS h
  FROM hits),
ranked AS (
  SELECT host, url, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN 55
              ELSE 55 - length(bin(h // {HLL_M})) END AS rho
  FROM hashed),
regs AS (
  SELECT host, j, max(rho) AS m FROM ranked GROUP BY host, j),
per_host AS (
  SELECT host, sum(pow(2.0, -m)) AS s_present, count(*) AS n_present
  FROM regs GROUP BY host),
exact AS (
  SELECT host, count(DISTINCT url) AS n_exact FROM hits GROUP BY host),
est AS (
  SELECT e.host, e.n_exact,
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (p.s_present + ({HLL_M} - p.n_present))
                   <= {2.5 * HLL_M}
               AND {HLL_M} - p.n_present > 0
              THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - p.n_present as double))
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (p.s_present + ({HLL_M} - p.n_present))
         END AS raw_est
  FROM exact e JOIN per_host p USING (host))
SELECT host, n_exact, round(raw_est, 3) AS n_est,
       round(100.0 * (raw_est - n_exact) / n_exact, 3) AS rel_err_pct
FROM est
"""


# ------------------------------------------------------------- cms_freq


def q_cms_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min frequency estimates for a fixed hot-URL watchlist
    next to the exact counts. Each hit increments d=4 cells (row r,
    bucket = md5(r || ':' || url) mod 64); a key's estimate is the MIN
    over its 4 cells — never below the true count (the one-sided CMS
    guarantee, asserted per-row by the ``overcount`` column and the
    unit test). The fixture is the same reciprocal Zipf law as
    heavy_hitters, so the watchlist spans keys with thousands of hits
    down to keys absent at small sf (exact 0, estimate = collision
    mass — the property still holds).

    100 TB shape: the sketch build is ONE exchange bounded by
    d*w = 256 rows per map task after map-side combine, independent of
    URL cardinality; the watchlist lookup broadcasts 12 keys against
    the 256-row sketch. Cells merge by SUM across rounds/clusters, so
    the production tier accumulates a running sketch next to the
    frontier checkpoint instead of recounting the fetch log. The
    exact column is the verification baseline (it shuffles one row
    per distinct URL — the thing the sketch exists to avoid).
    Companion to heavy_hitters (exact two-pass): CMS answers point
    queries on a standing watchlist; heavy_hitters discovers the
    heavy set exactly."""
    e = _t(spark, sf, "events")
    page = F.floor(
        F.lit(float(CMS_ZIPF_N)) / (F.pmod(F.col("event_id"), F.lit(CMS_ZIPF_N)) + 1)
    ).cast("long")
    url = F.concat(
        F.lit("https://h"),
        F.pmod(page, F.lit(20)).cast("string"),
        F.lit(".example.com/p/"),
        page.cast("string"),
    )
    hits = e.select(url.alias("url"))
    cells = hits.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(_md5_long(F.col("url"), f"{r}:"), F.lit(CMS_W)).alias(
                            "b"
                        ),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("cell")
    )
    sketch = cells.groupBy("cell.r", "cell.b").agg(F.count(F.lit(1)).alias("c"))
    keys = spark.createDataFrame(
        [(f"https://h{p % 20}.example.com/p/{p}",) for p in CMS_KEYS], ["url"]
    )
    probes = keys.select(
        "url",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(_md5_long(F.col("url"), f"{r}:"), F.lit(CMS_W)).alias(
                            "b"
                        ),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("url", "cell.r", "cell.b")
    est = (
        probes.join(sketch, ["r", "b"], "left")
        .groupBy("url")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("n_cms"))
    )
    exact = hits.groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    return (
        est.join(exact, "url", "left")
        .select(
            "url",
            F.coalesce("n", F.lit(0)).alias("n_exact"),
            F.col("n_cms").cast("long").alias("n_cms"),
            (F.col("n_cms") - F.coalesce("n", F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


def _build_o_cms() -> str:
    keys = ", ".join(
        f"('https://h{p % 20}.example.com/p/{p}')" for p in CMS_KEYS
    )
    return f"""
WITH hits AS (
  SELECT 'https://h'
         || cast(cast(floor({CMS_ZIPF_N}.0 / (1 + event_id % {CMS_ZIPF_N}))
                 as bigint) % 20 as varchar)
         || '.example.com/p/'
         || cast(cast(floor({CMS_ZIPF_N}.0 / (1 + event_id % {CMS_ZIPF_N}))
                 as bigint) as varchar) AS url
  FROM events),
rows_ AS (SELECT unnest(range(0, {CMS_D})) AS r),
cells AS (
  SELECT r,
         ('0x' || substring(md5(cast(r as varchar) || ':' || url), 1, 15))::BIGINT
             % {CMS_W} AS b,
         count(*) AS c
  FROM hits CROSS JOIN rows_ GROUP BY 1, 2),
keys(url) AS (VALUES {keys}),
probes AS (
  SELECT url, r,
         ('0x' || substring(md5(cast(r as varchar) || ':' || url), 1, 15))::BIGINT
             % {CMS_W} AS b
  FROM keys CROSS JOIN rows_),
est AS (
  SELECT p.url, min(coalesce(c.c, 0)) AS n_cms
  FROM probes p LEFT JOIN cells c ON p.r = c.r AND p.b = c.b
  GROUP BY p.url),
exact AS (SELECT url, count(*) AS n FROM hits GROUP BY url)
SELECT e.url, cast(coalesce(x.n, 0) as bigint) AS n_exact,
       cast(e.n_cms as bigint) AS n_cms,
       cast(e.n_cms - coalesce(x.n, 0) as bigint) AS overcount
FROM est e LEFT JOIN exact x ON e.url = x.url
"""


O_CMS_FREQ = _build_o_cms()


# ---------------------------------------------------- hll_merge_rounds


def q_hll_merge_rounds(spark: SparkSession, sf: str) -> DataFrame:
    """The checkpoint-merge story, proven in one query: split the URL
    hit stream into HLL_ROUNDS scheduling rounds, build each round's
    per-host registers INDEPENDENTLY (what the production crawl loop
    would checkpoint next to the frontier snapshot each round), merge
    the per-round partials register-wise by max, and compare both the
    merged estimate AND every merged register against the one-pass
    sketch over the whole stream. regs_match is computed from a
    full-outer register join, so any divergence — a dropped register,
    a max/sum mix-up, a partial that saw rows from the wrong round —
    flips the column, and both engines must agree it never flips.

    100 TB shape: this is why the sketch tier exists. A 10^10-URL
    crawl never recounts history: each round aggregates ONLY its own
    fetch log into (host, j, max rho) partials (bounded at m=64 rows
    per host), and the running cardinality is a merge of tiny
    checkpointed register rows — the counting twin of
    bloom_delta_update's incremental seen-filter maintenance. The
    same merge works across clusters (registers from N and 4N
    executor runs combine identically), which is what makes the
    estimate resumable and lineage-friendly. Reference analog:
    twkit/utils/counters' monotonically accumulated exact counters."""
    ranked = _hll_ranked(_hll_hits(spark, sf))
    partials = ranked.groupBy("host", "round", "j").agg(F.max("rho").alias("m"))
    merged = partials.groupBy("host", "j").agg(F.max("m").alias("m"))
    onepass = ranked.groupBy("host", "j").agg(F.max("rho").alias("m"))

    def _est(regs: DataFrame, name: str) -> DataFrame:
        ph = regs.groupBy("host").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        return ph.select(
            "host",
            F.round(
                _hll_estimate(F.col("s_present"), F.col("n_present")), 3
            ).alias(name),
        )

    mism = (
        merged.withColumnRenamed("m", "m_a")
        .join(onepass.withColumnRenamed("m", "m_b"), ["host", "j"], "full_outer")
        .groupBy("host")
        .agg(
            F.sum(
                F.when(
                    F.col("m_a").isNull()
                    | F.col("m_b").isNull()
                    | (F.col("m_a") != F.col("m_b")),
                    1,
                ).otherwise(0)
            ).alias("n_mismatch")
        )
    )
    n_rounds = partials.groupBy("host").agg(
        F.countDistinct("round").alias("n_rounds")
    )
    return (
        n_rounds.join(_est(merged, "est_merged"), "host")
        .join(_est(onepass, "est_onepass"), "host")
        .join(mism, "host")
        .select(
            "host",
            "n_rounds",
            "est_merged",
            "est_onepass",
            (F.col("n_mismatch") == 0).alias("regs_match"),
        )
    )


O_HLL_MERGE_ROUNDS = f"""
WITH hits AS (
  SELECT 'h' || cast((event_id % {HLL_PAGES}) % {HLL_HOSTS} as varchar) AS host,
         'https://p/' || cast(event_id % {HLL_PAGES} as varchar) AS url,
         event_id % {HLL_ROUNDS} AS round
  FROM events),
ranked AS (
  SELECT host, round, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN 55
              ELSE 55 - length(bin(h // {HLL_M})) END AS rho
  FROM (SELECT host, round, url,
               ('0x' || substring(md5('hll:' || url), 1, 15))::BIGINT AS h
        FROM hits)),
partials AS (
  SELECT host, round, j, max(rho) AS m FROM ranked GROUP BY host, round, j),
merged AS (
  SELECT host, j, max(m) AS m FROM partials GROUP BY host, j),
onepass AS (
  SELECT host, j, max(rho) AS m FROM ranked GROUP BY host, j),
est_m AS (
  SELECT host,
         round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                         / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
                         <= {2.5 * HLL_M}
                     AND {HLL_M} - count(*) > 0
                    THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - count(*) as double))
                    ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                         / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
               END, 3) AS est_merged
  FROM merged GROUP BY host),
est_o AS (
  SELECT host,
         round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                         / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
                         <= {2.5 * HLL_M}
                     AND {HLL_M} - count(*) > 0
                    THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - count(*) as double))
                    ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                         / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
               END, 3) AS est_onepass
  FROM onepass GROUP BY host),
mism AS (
  SELECT coalesce(a.host, b.host) AS host,
         cast(sum(CASE WHEN a.m IS NULL OR b.m IS NULL OR a.m <> b.m
                       THEN 1 ELSE 0 END) as bigint) AS n_mismatch
  FROM merged a FULL OUTER JOIN onepass b
    ON a.host = b.host AND a.j = b.j
  GROUP BY 1),
nr AS (
  SELECT host, cast(count(DISTINCT round) as bigint) AS n_rounds
  FROM partials GROUP BY host)
SELECT nr.host, nr.n_rounds, est_m.est_merged, est_o.est_onepass,
       (mism.n_mismatch = 0) AS regs_match
FROM nr JOIN est_m USING (host) JOIN est_o USING (host)
        JOIN mism USING (host)
"""


# -------------------------------------------------------- hdr_quantiles

HDR_HOSTS = 10       # fetcher-pool host shards
HDR_SUB_BITS = 5     # sub-bucket precision: keep top (1+5) bits of v
HDR_VALUE_MOD = 999983  # latency_us fixture modulus (~20 octaves)
HDR_QS = (0.5, 0.9, 0.99)


def q_hdr_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable log2/linear-bucket quantile sketch (the HdrHistogram
    bucketing, Tene) for per-host fetch latency, next to the exact
    rank-based quantile — the third leg of the sketch tier
    (cardinality: hll_distinct; frequency: cms_freq; quantiles: this).
    For an integer latency v >= 1, the bucket keeps the top
    1+HDR_SUB_BITS significant bits: m = bit-length(v), shift =
    max(m-6, 0), bucket_lo = v - (v % 2^shift). All-integer, so both
    engines (and the python third implementation) place every value
    in the same bucket bit-for-bit — no log() calls whose last-ulp
    could flip a boundary. The quantile estimate is the smallest
    bucket_lo whose cumulative count reaches ceil(q*n); the exact twin
    applies the SAME rank rule to raw values (percentile_disc
    semantics, no interpolation), so the guarantee is structural:
    est <= exact < est * (1 + 2^-5), asserted per row by rel_err_pct
    in [0, 3.125].

    100 TB shape: the sketch is a groupBy(host, bucket_lo) count —
    ONE exchange carrying at most 64*octaves (~2^11) rows per host
    per map task after partial agg, regardless of fetch volume, vs
    exact percentile's per-group value buffer. Buckets merge by SUM
    across rounds and clusters (same checkpoint-merge story as
    hll_merge_rounds), so the adaptive-timeout tier
    (host_latency_quantiles' min(cap, 1.5*p99) rule) can run from
    accumulated sketch rows without ever re-reading the fetch log."""
    e = _t(spark, sf, "events")
    v = (F.lit(1) + F.pmod(_md5_long(F.col("event_id").cast("string"), "hdr:"),
                           F.lit(HDR_VALUE_MOD))).alias("v")
    vals = e.select(
        F.pmod(F.col("user_id"), F.lit(HDR_HOSTS)).alias("host"), v
    )
    m = F.length(F.bin(F.col("v")))
    shift = F.greatest(m - F.lit(1 + HDR_SUB_BITS), F.lit(0))
    w = F.pow(F.lit(2.0), shift.cast("double")).cast("long")  # exact: shift <= 14
    bucketed = vals.withColumn("blo", F.col("v") - F.pmod(F.col("v"), w))

    qs = spark.createDataFrame([(q,) for q in HDR_QS], "q double")
    n = vals.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    thr = n.crossJoin(F.broadcast(qs)).select(
        "host", "q", "n", F.ceil(F.col("q") * F.col("n")).alias("thr")
    )

    def _rank_pick(df: DataFrame, key: str, out: str) -> DataFrame:
        from pyspark.sql.window import Window

        grouped = df.groupBy("host", key).agg(F.count(F.lit(1)).alias("c"))
        cum = grouped.withColumn(
            "cum",
            F.sum("c").over(
                Window.partitionBy("host")
                .orderBy(key)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        return (
            cum.join(thr, "host")
            .where(F.col("cum") >= F.col("thr"))
            .groupBy("host", "q", "n")
            .agg(F.min(key).alias(out))
        )

    est = _rank_pick(bucketed, "blo", "est_lo")
    exact = _rank_pick(vals, "v", "exact_v")
    return (
        exact.join(est, ["host", "q", "n"])
        .select(
            "host",
            "q",
            "n",
            "exact_v",
            "est_lo",
            F.round(
                100.0 * (F.col("exact_v") - F.col("est_lo")) / F.col("exact_v"), 4
            ).alias("rel_err_pct"),
        )
    )


def _build_o_hdr() -> str:
    qs = ", ".join(f"({q})" for q in HDR_QS)
    return f"""
WITH vals AS (
  SELECT user_id % {HDR_HOSTS} AS host,
         1 + ('0x' || substring(md5('hdr:' || cast(event_id as varchar)), 1, 15))
             ::BIGINT % {HDR_VALUE_MOD} AS v
  FROM events),
bucketed AS (
  SELECT host, v,
         v - (v % cast(pow(2.0, greatest(length(bin(v)) - {1 + HDR_SUB_BITS}, 0))
                       as bigint)) AS blo
  FROM vals),
n AS (SELECT host, count(*) AS n FROM vals GROUP BY host),
qs AS (SELECT cast(q as double) AS q FROM (VALUES {qs}) t(q)),
thr AS (SELECT host, q, n, cast(ceil(q * n) as bigint) AS thr
        FROM n CROSS JOIN qs),
est_cum AS (
  SELECT host, blo, sum(count(*)) OVER
           (PARTITION BY host ORDER BY blo
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bucketed GROUP BY host, blo),
est AS (
  SELECT t.host, t.q, t.n, min(c.blo) AS est_lo
  FROM thr t JOIN est_cum c ON c.host = t.host AND c.cum >= t.thr
  GROUP BY t.host, t.q, t.n),
ex_cum AS (
  SELECT host, v, sum(count(*)) OVER
           (PARTITION BY host ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vals GROUP BY host, v),
exact AS (
  SELECT t.host, t.q, t.n, min(c.v) AS exact_v
  FROM thr t JOIN ex_cum c ON c.host = t.host AND c.cum >= t.thr
  GROUP BY t.host, t.q, t.n)
SELECT e.host, e.q, e.n, e.exact_v, s.est_lo,
       round(100.0 * (e.exact_v - s.est_lo) / e.exact_v, 4) AS rel_err_pct
FROM exact e JOIN est s ON e.host = s.host AND e.q = s.q AND e.n = s.n
"""


O_HDR_QUANTILES = _build_o_hdr()


# -------------------------------------------------------- hll_intersect

HLLX_HOSTS = 8       # host shards (page % HLLX_HOSTS), shared by both crawls
HLLX_PAGES_A = 700   # crawl A page modulus
HLLX_PAGES_B = 1000  # crawl B page modulus (overlapping URL space)


def _hllx_hits(spark: SparkSession, sf: str, which: str) -> DataFrame:
    """Two overlapping crawl-cluster URL streams carved from events:
    crawl A = even event ids over a 700-page URL space, crawl B = odd
    event ids over a 1000-page space. Both index the SAME url universe
    ('https://p/N'), so A's set is (mostly) contained in B's at sf0.01
    and partially at sf0.001 — a real intersection in both regimes."""
    e = _t(spark, sf, "events")
    mod = HLLX_PAGES_A if which == "a" else HLLX_PAGES_B
    parity = 0 if which == "a" else 1
    page = F.pmod(F.shiftright(F.col("event_id"), 1), F.lit(mod))
    return e.where(F.pmod(F.col("event_id"), 2) == parity).select(
        F.concat(
            F.lit("h"), F.pmod(page, F.lit(HLLX_HOSTS)).cast("string")
        ).alias("host"),
        F.concat(F.lit("https://p/"), page.cast("string")).alias("url"),
    )


def q_hll_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-crawl set algebra on HLL registers: two crawl clusters
    each checkpoint their own per-host register rows; the union
    cardinality comes from the register-wise MAX merge (the same merge
    hll_merge_rounds proves round-over-round), and the intersection
    from inclusion-exclusion est(A) + est(B) - est(A|B) — the standard
    HLL intersection estimator (Flajolet et al. 2007 §5 discussion).
    Output per host: exact |A|, |B|, |A&B| next to the three sketch
    estimates, with the intersection's absolute error. Exact columns
    exist for verification; the production tier never holds either
    crawl's URL set, only 64 registers per host per cluster.

    100 TB shape: the question "how much of crawl B's frontier did
    crawl A already cover?" is an intersection of two 10^10-URL sets —
    exact answers need a co-partitioned join of both seen-sets (the
    single most expensive query two crawl clusters can ask each
    other). The sketch answer moves HLL_M=64 rows per host between
    clusters, total bytes independent of URL cardinality, and the
    merge is the same register MAX the checkpoint tier already ships.
    Estimator caveat encoded in the output: inclusion-exclusion error
    is additive in the union error, so est_inter can undershoot or
    even go negative when |A&B| << |A|B|| — the err_abs column next to
    the exact count is the honesty gauge, and the unit test asserts
    the identity est_a + est_b - est_union == est_inter exactly.
    Reference analog: twkit/utils/counters' per-crawl exact distinct
    counters, which cannot answer cross-crawl overlap at all without
    shipping the full key sets."""
    a = _hllx_hits(spark, sf, "a")
    b = _hllx_hits(spark, sf, "b")
    regs_a = _hll_ranked(a).groupBy("host", "j").agg(F.max("rho").alias("m"))
    regs_b = _hll_ranked(b).groupBy("host", "j").agg(F.max("rho").alias("m"))
    regs_u = (
        regs_a.unionByName(regs_b)
        .groupBy("host", "j")
        .agg(F.max("m").alias("m"))
    )

    def _est(regs: DataFrame, name: str) -> DataFrame:
        ph = regs.groupBy("host").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        return ph.select(
            "host",
            _hll_estimate(F.col("s_present"), F.col("n_present")).alias(name),
        )

    flags = (
        a.select("host", "url", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            b.select(
                "host", "url", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("host", "url")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    exact = flags.groupBy("host").agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
    )
    est_i = F.col("est_a") + F.col("est_b") - F.col("est_u")
    return (
        exact.join(_est(regs_a, "est_a"), "host")
        .join(_est(regs_b, "est_b"), "host")
        .join(_est(regs_u, "est_u"), "host")
        .select(
            "host",
            "n_a",
            "n_b",
            "n_inter",
            F.round("est_a", 3).alias("est_a"),
            F.round("est_b", 3).alias("est_b"),
            F.round("est_u", 3).alias("est_union"),
            F.round(est_i, 3).alias("est_inter"),
            F.round(F.abs(est_i - F.col("n_inter")), 3).alias("err_abs"),
        )
    )


O_HLL_INTERSECT = f"""
WITH a AS (
  SELECT 'h' || cast(((event_id // 2) % {HLLX_PAGES_A}) % {HLLX_HOSTS} as varchar)
             AS host,
         'https://p/' || cast((event_id // 2) % {HLLX_PAGES_A} as varchar) AS url
  FROM events WHERE event_id % 2 = 0),
b AS (
  SELECT 'h' || cast(((event_id // 2) % {HLLX_PAGES_B}) % {HLLX_HOSTS} as varchar)
             AS host,
         'https://p/' || cast((event_id // 2) % {HLLX_PAGES_B} as varchar) AS url
  FROM events WHERE event_id % 2 = 1),
rank_a AS (
  SELECT host, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN 55
              ELSE 55 - length(bin(h // {HLL_M})) END AS rho
  FROM (SELECT host,
               ('0x' || substring(md5('hll:' || url), 1, 15))::BIGINT AS h
        FROM a)),
rank_b AS (
  SELECT host, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN 55
              ELSE 55 - length(bin(h // {HLL_M})) END AS rho
  FROM (SELECT host,
               ('0x' || substring(md5('hll:' || url), 1, 15))::BIGINT AS h
        FROM b)),
regs_a AS (SELECT host, j, max(rho) AS m FROM rank_a GROUP BY host, j),
regs_b AS (SELECT host, j, max(rho) AS m FROM rank_b GROUP BY host, j),
regs_u AS (
  SELECT host, j, max(m) AS m
  FROM (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
  GROUP BY host, j),
est_a AS (
  SELECT host,
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*))) <= {2.5 * HLL_M}
               AND {HLL_M} - count(*) > 0
              THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - count(*) as double))
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
         END AS est_a
  FROM regs_a GROUP BY host),
est_b AS (
  SELECT host,
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*))) <= {2.5 * HLL_M}
               AND {HLL_M} - count(*) > 0
              THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - count(*) as double))
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
         END AS est_b
  FROM regs_b GROUP BY host),
est_u AS (
  SELECT host,
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*))) <= {2.5 * HLL_M}
               AND {HLL_M} - count(*) > 0
              THEN {HLL_M} * ln({HLL_M} / cast({HLL_M} - count(*) as double))
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M})
                   / (sum(pow(2.0, -m)) + ({HLL_M} - count(*)))
         END AS est_u
  FROM regs_u GROUP BY host),
flags AS (
  SELECT host, url, max(in_a) AS in_a, max(in_b) AS in_b
  FROM (SELECT host, url, 1 AS in_a, 0 AS in_b FROM a
        UNION ALL
        SELECT host, url, 0 AS in_a, 1 AS in_b FROM b)
  GROUP BY host, url),
exact AS (
  SELECT host, cast(sum(in_a) as bigint) AS n_a,
         cast(sum(in_b) as bigint) AS n_b,
         cast(sum(in_a * in_b) as bigint) AS n_inter
  FROM flags GROUP BY host)
SELECT e.host, e.n_a, e.n_b, e.n_inter,
       round(a.est_a, 3) AS est_a,
       round(b.est_b, 3) AS est_b,
       round(u.est_u, 3) AS est_union,
       round(a.est_a + b.est_b - u.est_u, 3) AS est_inter,
       round(abs(a.est_a + b.est_b - u.est_u - e.n_inter), 3) AS err_abs
FROM exact e JOIN est_a a USING (host) JOIN est_b b USING (host)
     JOIN est_u u USING (host)
"""
