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
    e = _t(spark, sf, "events")
    page = F.pmod(F.col("event_id"), F.lit(HLL_PAGES))
    hits = e.select(
        F.concat(F.lit("h"), F.pmod(page, F.lit(HLL_HOSTS)).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("https://p/"), page.cast("string")).alias("url"),
    )
    h = _md5_long(F.col("url"), "hll:")
    # h is a 60-bit non-negative long; h >> 6 is exact floor division
    # (h / 64.0 would round through a 53-bit double mantissa)
    hw = F.shiftright(h, 6)
    rho = F.when(hw == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(hw)))
    regs = (
        hits.select("host", "url")
        .withColumn("j", F.pmod(h, F.lit(HLL_M)))
        .withColumn("rho", rho)
        .groupBy("host", "j")
        .agg(F.max("rho").alias("m"))
    )
    per_host = regs.groupBy("host").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    raw = (HLL_ALPHA * HLL_M * HLL_M) / (
        F.col("s_present") + (HLL_M - F.col("n_present"))
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v_zero > 0),
        HLL_M * F.log(HLL_M / v_zero.cast("double")),
    ).otherwise(raw)
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
