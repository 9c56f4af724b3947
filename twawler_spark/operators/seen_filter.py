"""Partitioned Bloom seen-filter.

The reference preloads its membership sets (ignored/cemetery/suspended/
protected/greeks) into driver-side Python dicts (twkit/utils.py:107-135,
``init_state(use_cache=True)``) and checks candidates one by one
(utils.py:672-692 ``can_follow``). That caps out at what fits on one
machine. The rebuild shards the seen-set by ``pmod(url_hash, n_buckets)``
and builds one Bloom filter per shard with an Arrow-batched
``applyInPandas`` — filters live with the data on executors and are
joined to candidates by bucket with ``cogroup`` (co-partitioned, never
broadcast), so a 10^10-key seen-set (≈15 GB of filter bits at 10 b/key)
never has to fit anywhere whole.

Probe outcome per candidate:
  * bloom says ABSENT  -> definitely new (no false negatives) — admit
    without touching the exact set;
  * bloom says PRESENT -> "maybe seen" (fpp ≈ 1%) — only this small
    remainder goes through the exact anti-join.

``merge_global`` additionally ORs equal-sized shard filters into one
filter via RDD ``treeAggregate`` (the north rule's merge path) for a
driver-side broadcastable prefilter when the key count allows it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import np_stream64

# hash-stream ids for bloom probes (shared by build + probe + simulator)
_BLOOM_H1 = 101
_BLOOM_H2 = 102


def _positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(len(keys), k) double-hashed bit positions — Kirsch-Mitzenmacher."""
    h1 = np_stream64(keys, _BLOOM_H1)
    h2 = np_stream64(keys, _BLOOM_H2) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _bits_set(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _bits_test(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """row-wise AND over k probe positions -> membership bool per key."""
    probed = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probed.all(axis=1)


def _size_for(n: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << (m - 1).bit_length()  # pow2 for cheap masking + mergeability
    k = max(1, round(m / max(n, 1) * math.log(2)))
    return m, min(k, 16)


@dataclass
class ShardedBloom:
    shards: DataFrame  # (bucket, n_keys, m_bits, k_hashes, bits)
    n_buckets: int
    key_col: str = "url_hash"

    def probe(self, candidates: DataFrame, flag_col: str = "maybe_seen") -> DataFrame:
        """candidates + boolean ``flag_col``; co-partitioned cogroup by bucket."""
        key = self.key_col
        cand = candidates.withColumn(
            "__bucket", F.pmod(F.col(key), F.lit(self.n_buckets)).cast("int")
        )
        from pyspark.sql import types as T

        out_schema = T.StructType(
            list(cand.schema.fields) + [T.StructField(flag_col, T.BooleanType(), False)]
        )

        def check(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            if cpdf.empty:
                return cpdf.assign(**{flag_col: pd.Series([], dtype=bool)})
            if bpdf.empty:
                return cpdf.assign(**{flag_col: False})
            row = bpdf.iloc[0]
            bits = np.frombuffer(row["bits"], dtype=np.uint8)
            pos = _positions(
                cpdf[key].to_numpy(), int(row["m_bits"]), int(row["k_hashes"])
            )
            return cpdf.assign(**{flag_col: _bits_test(bits, pos)})

        res = (
            cand.groupBy("__bucket")
            .cogroup(self.shards.withColumnRenamed("bucket", "__bucket").groupBy("__bucket"))
            .applyInPandas(check, schema=out_schema)
        )
        return res.drop("__bucket")

    def merge_global(self):
        """OR all equal-sized shards into one (m, k, bits) via treeAggregate."""
        rows = self.shards.select("m_bits", "k_hashes", "bits").rdd
        meta = self.shards.select("m_bits", "k_hashes").first()
        if meta is None:
            return None
        m, k = int(meta["m_bits"]), int(meta["k_hashes"])

        def seq(acc: np.ndarray, row) -> np.ndarray:
            if int(row["m_bits"]) != m or int(row["k_hashes"]) != k:
                raise ValueError("merge_global requires uniform shard sizing")
            return acc | np.frombuffer(row["bits"], dtype=np.uint8)

        zero = np.zeros(m // 8, dtype=np.uint8)
        merged = rows.treeAggregate(zero, seq, lambda a, b: a | b, depth=3)
        return m, k, merged


def build_sharded_bloom(
    keys: DataFrame,
    key_col: str = "url_hash",
    n_buckets: int = 64,
    fpp: float = 0.01,
    fixed_m_bits: int | None = None,
) -> ShardedBloom:
    """Build per-bucket filters with applyInPandas (one Arrow batch/bucket).

    ``fixed_m_bits`` forces uniform sizing (required by merge_global);
    default sizes each shard for its own key count at ``fpp``.
    """
    bucketed = keys.select(
        F.col(key_col), F.pmod(F.col(key_col), F.lit(n_buckets)).cast("int").alias("bucket")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = pdf[key_col].to_numpy()
        n = len(arr)
        if fixed_m_bits is not None:
            m = fixed_m_bits
            k = max(1, min(16, round(m / max(n, 1) * math.log(2))))
        else:
            m, k = _size_for(n, fpp)
        bits = np.zeros(m // 8, dtype=np.uint8)
        _bits_set(bits, _positions(arr, m, k))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n_keys": [n],
                "m_bits": [m],
                "k_hashes": [k],
                "bits": [bits.tobytes()],
            }
        )

    shards = bucketed.groupBy("bucket").applyInPandas(
        build, schema="bucket int, n_keys long, m_bits long, k_hashes int, bits binary"
    )
    return ShardedBloom(shards=shards, n_buckets=n_buckets, key_col=key_col)
