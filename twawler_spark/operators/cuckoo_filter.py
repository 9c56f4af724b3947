"""Partitioned cuckoo URL-seen filter — the deletable half of the north
rule's "bloom/cuckoo" pair.

Same role as ``seen_filter.BroadcastBloom`` (approximate ABSENT/maybe
prefilter in front of the exact seen-set anti-join, reference
``can_follow`` twkit/utils.py:672-692) with two properties Bloom cannot
offer:

* **deletion** — a fingerprint can be removed without rebuilding, which
  is exactly the seen-set *retraction* shape of the reference's
  ``retrydeletedtweets.py`` (un-mark misidentified rows so they get
  re-crawled) and of curation purges: with Bloom the filter must be
  rebuilt from the surviving 10^10 keys; with cuckoo the round deletes
  its plan-bounded retraction set in O(|delta|);
* **~80x lower false-positive rate per byte of the uint16 table**
  (2·SLOTS/2^16 ≈ 0.012% vs the Bloom tier's 1%), shrinking the
  exact-confirm remainder by the same factor.

Layout: the key space is sharded by ``key % n_shards`` (python modulo —
identical to Spark ``pmod`` for positive shard counts, so the
distributed build and the numpy probe route identically). Each shard is
an independent (nb, SLOTS) uint16 table built on executors via one
Arrow batch per shard (``applyInPandas``); shard tables are collected
as blobs and concatenated — cuckoo tables merge by CONCATENATION over
disjoint key ranges, not by OR, which is why the shard routing is part
of the filter identity and persisted with it. Probing is one
vectorized Arrow UDF over the broadcast table: zero shuffles, same as
the Bloom tier.

Partial-key cuckoo hashing (Fan et al., CoNEXT'14 — public algorithm):
fingerprint fp = high 16 bits of splitmix64(key) (0 remapped to 1 so 0
means "empty slot"), bucket i1 = low bits, alternate bucket
i2 = i1 XOR h(fp); the XOR makes i1 recoverable from (i2, fp), so an
evicted fingerprint can keep kicking without knowing its original key.
Eviction order is deterministic (victim slot = kick_count % SLOTS) —
no RNG, so builds are bit-reproducible.

Deleting a key that was never inserted is UNDEFINED (it may strip a
colliding key's fingerprint and introduce a false negative) — callers
delete only keys they previously inserted, which retraction sets
satisfy by construction. At overload (`n_keys > capacity`) insertion
raises and the caller rebuilds at 4x, same amortized-O(log) rebuild
protocol as the Bloom tier.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import np_stream64

SLOTS = 4  # fingerprints per bucket (b=4: >95% achievable load)
_CK_H1 = 111  # hash-stream id: key -> (bucket, fingerprint)
_CK_H2 = 112  # hash-stream id: fingerprint -> bucket displacement
_MAX_KICKS = 500
_LOAD_TARGET = 0.7  # sizing load factor: headroom keeps kick chains short


def _fp_hash(fp: np.ndarray, nb: int) -> np.ndarray:
    """Displacement h(fp) for i2 = i1 ^ h(fp); depends ONLY on fp."""
    return (np_stream64(fp.astype(np.int64), _CK_H2) & np.uint64(nb - 1)).astype(
        np.int64
    )


def _derive(keys: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(i1, i2, fp) per key. fp uses the high bits, i1 the low bits of
    one splitmix64 draw — independent at 16+log2(nb) <= 64 bits."""
    h = np_stream64(keys, _CK_H1)
    i1 = (h & np.uint64(nb - 1)).astype(np.int64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 is the empty-slot sentinel
    i2 = i1 ^ _fp_hash(fp, nb)
    return i1, i2, fp


def _place_pass(table: np.ndarray, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """One vectorized greedy placement round: put fp[j] into bucket b[j]
    where free slots allow. Rows sharing a bucket get consecutive slots
    (occupancy + within-bucket rank), so all writes hit distinct cells.
    Returns the placed mask."""
    if len(b) == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(b, kind="stable")
    bs, fps = b[order], fp[order]
    first = np.searchsorted(bs, bs, side="left")
    rank = np.arange(len(bs)) - first
    slot = (table[bs] != 0).sum(axis=1) + rank
    ok = slot < SLOTS
    table[bs[ok], slot[ok]] = fps[ok]
    placed = np.zeros(len(b), dtype=bool)
    placed[order[ok]] = True
    return placed


def _insert(table: np.ndarray, keys: np.ndarray) -> None:
    """Insert keys into one shard table: two vectorized passes (i1 then
    i2) place the overwhelming majority at the sizing load factor; the
    rare remainder runs the classic deterministic kick loop."""
    nb = table.shape[0]
    i1, i2, fp = _derive(keys, nb)
    placed = _place_pass(table, i1, fp)
    rest = np.where(~placed)[0]
    if rest.size:
        placed2 = _place_pass(table, i2[rest], fp[rest])
        rest = rest[~placed2]
    for j in rest:
        f, i = fp[j], int(i1[j])
        for kick in range(_MAX_KICKS):
            row = table[i]
            free = np.where(row == 0)[0]
            if free.size:
                row[free[0]] = f
                break
            s = kick % SLOTS
            f, row[s] = row[s], f  # evict deterministically
            i = int(i ^ _fp_hash(np.array([f], dtype=np.uint16), nb)[0])
        else:
            raise ValueError(
                "cuckoo shard over capacity — rebuild the filter larger"
            )


def _lookup(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    nb = table.shape[0]
    i1, i2, fp = _derive(keys, nb)
    return (table[i1] == fp[:, None]).any(axis=1) | (
        table[i2] == fp[:, None]
    ).any(axis=1)


def _delete(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Remove ONE fingerprint copy per key (i1 bucket first). Python
    loop — retraction deltas are plan-bounded, and in-batch duplicates
    of one (bucket, fp) pair must clear distinct slots sequentially."""
    nb = table.shape[0]
    i1, i2, fp = _derive(keys, nb)
    removed = np.zeros(len(keys), dtype=bool)
    for j in range(len(keys)):
        for i in (int(i1[j]), int(i2[j])):
            row = table[i]
            hit = np.where(row == fp[j])[0]
            if hit.size:
                row[hit[0]] = 0
                # re-pack the row left: every insert path (vectorized
                # occupancy+rank placement AND the kick loop's first-free
                # slot) assumes buckets fill left-to-right with no holes —
                # a hole would make a later insert overwrite a live
                # fingerprint (a false negative for its key)
                nz = row[row != 0]
                row[:] = 0
                row[: nz.size] = nz
                removed[j] = True
                break
    return removed


def _shard_nb(capacity: int, n_shards: int) -> int:
    """Per-shard bucket count: pow2 sized so capacity keys sit at the
    target load factor across n_shards * nb * SLOTS slots."""
    per_shard = max(capacity / max(n_shards, 1) / SLOTS / _LOAD_TARGET, 1.0)
    return 1 << max(int(np.ceil(np.log2(per_shard))), 4)


@dataclass
class BroadcastCuckoo:
    """Driver-held sharded cuckoo filter; same tier and lifecycle as
    ``BroadcastBloom`` (build once distributed, O(|delta|) per-round
    updates, map-side Arrow probe, atomic persist) plus ``delete``."""

    n_shards: int
    nb: int  # buckets per shard (uniform, pow2)
    table: np.ndarray  # uint16, shape (n_shards * nb, SLOTS)
    n_keys: int
    capacity: int

    # ------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        keys: DataFrame,
        n_keys: int,
        key_col: str = "url_hash",
        capacity: int | None = None,
        n_shards: int = 64,
    ) -> "BroadcastCuckoo":
        """Distributed build: one independent shard table per Arrow
        batch on executors, concatenated on the driver. ``n_keys`` comes
        from the caller's write metrics (no extra count job)."""
        capacity = max(capacity or 2 * n_keys, 1 << 12)
        nb = _shard_nb(capacity, n_shards)
        bucketed = keys.select(
            F.col(key_col),
            F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("shard"),
        )

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            t = np.zeros((nb, SLOTS), dtype=np.uint16)
            # seen keys are unique by contract; unique() guards anyway so
            # a duplicated input can't double-fill slots
            _insert(t, np.unique(pdf[key_col].to_numpy(dtype=np.int64)))
            return pd.DataFrame(
                {"shard": [int(pdf["shard"].iloc[0])], "blob": [t.tobytes()]}
            )

        rows = (
            bucketed.groupBy("shard")
            .applyInPandas(build_shard, schema="shard int, blob binary")
            .collect()
        )
        table = np.zeros((n_shards * nb, SLOTS), dtype=np.uint16)
        for r in rows:
            s = int(r["shard"])
            table[s * nb : (s + 1) * nb] = np.frombuffer(
                r["blob"], dtype=np.uint16
            ).reshape(nb, SLOTS)
        return cls(
            n_shards=n_shards, nb=nb, table=table, n_keys=n_keys, capacity=capacity
        )

    @classmethod
    def from_keys(
        cls, keys: np.ndarray, capacity: int | None = None, n_shards: int = 64
    ) -> "BroadcastCuckoo":
        """Driver-side build from an in-hand key array (tests, small sets)."""
        keys = np.unique(keys.astype(np.int64))
        capacity = max(capacity or 2 * len(keys), 1 << 12)
        nb = _shard_nb(capacity, n_shards)
        table = np.zeros((n_shards * nb, SLOTS), dtype=np.uint16)
        out = cls(
            n_shards=n_shards,
            nb=nb,
            table=table,
            n_keys=0,
            capacity=capacity,
        )
        out.insert_keys(keys)
        return out

    # ---------------------------------------------------------- updates
    def _route(self, keys: np.ndarray) -> np.ndarray:
        return keys.astype(np.int64) % self.n_shards  # == Spark pmod

    def _per_shard(self, keys: np.ndarray):
        shards = self._route(keys)
        order = np.argsort(shards, kind="stable")
        ks, ss = keys[order], shards[order]
        bounds = np.searchsorted(ss, np.arange(self.n_shards + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                yield s, ks[lo:hi], order[lo:hi]

    def insert_keys(self, keys: np.ndarray) -> None:
        """O(|delta|) per-round update — the seen-delta append path."""
        if keys.size == 0:
            return
        keys = keys.astype(np.int64)
        for s, ks, _ in self._per_shard(keys):
            _insert(self.table[s * self.nb : (s + 1) * self.nb], ks)
        self.n_keys += int(keys.size)

    def delete_keys(self, keys: np.ndarray) -> np.ndarray:
        """Retraction: remove previously-inserted keys (retry/purge
        sweeps). Returns the per-key removed mask (input order)."""
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        keys = keys.astype(np.int64)
        removed = np.zeros(len(keys), dtype=bool)
        for s, ks, idx in self._per_shard(keys):
            removed[idx] = _delete(
                self.table[s * self.nb : (s + 1) * self.nb], ks
            )
        self.n_keys -= int(removed.sum())
        return removed

    def contains_keys(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        keys = keys.astype(np.int64)
        out = np.zeros(len(keys), dtype=bool)
        for s, ks, idx in self._per_shard(keys):
            out[idx] = _lookup(self.table[s * self.nb : (s + 1) * self.nb], ks)
        return out

    @property
    def needs_rebuild(self) -> bool:
        return self.n_keys > self.capacity

    # ------------------------------------------------------------ probe
    def probe(
        self,
        candidates: DataFrame,
        key_col: str = "url_hash",
        flag_col: str = "maybe_seen",
    ) -> DataFrame:
        """candidates + boolean ``flag_col`` — map-side only, the table
        rides a Spark broadcast; probing is one vectorized Arrow UDF."""
        from pyspark.sql.functions import pandas_udf

        sc = candidates.sparkSession.sparkContext
        bc = sc.broadcast(self.table.tobytes())
        n_shards, nb = self.n_shards, self.nb

        @pandas_udf("boolean")
        def might_contain(s: pd.Series) -> pd.Series:
            if s.empty:
                return pd.Series([], dtype=bool)
            table = np.frombuffer(bc.value, dtype=np.uint16).reshape(-1, SLOTS)
            keys = s.to_numpy(dtype=np.int64)
            shards = keys % n_shards
            h = np_stream64(keys, _CK_H1)
            i1 = (h & np.uint64(nb - 1)).astype(np.int64)
            fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
            fp[fp == 0] = 1
            i2 = i1 ^ _fp_hash(fp, nb)
            base = shards * nb
            found = (table[base + i1] == fp[:, None]).any(axis=1) | (
                table[base + i2] == fp[:, None]
            ).any(axis=1)
            return pd.Series(found)

        return candidates.withColumn(flag_col, might_contain(F.col(key_col)))

    # ---------------------------------------------------------- persist
    def save(self, path_prefix: str) -> None:
        """Atomic persist: table first, then json meta as commit marker."""
        import json
        import os

        os.makedirs(os.path.dirname(path_prefix), exist_ok=True)
        ttmp = path_prefix + ".cuckoo.tmp"
        with open(ttmp, "wb") as f:
            f.write(self.table.tobytes())
        os.replace(ttmp, path_prefix + ".cuckoo")
        meta = {
            "n_shards": self.n_shards,
            "nb": self.nb,
            "n_keys": self.n_keys,
            "capacity": self.capacity,
        }
        mtmp = path_prefix + ".cuckoo.json.tmp"
        with open(mtmp, "w") as f:
            json.dump(meta, f)
        os.replace(mtmp, path_prefix + ".cuckoo.json")

    @classmethod
    def load(cls, path_prefix: str) -> "BroadcastCuckoo":
        import json

        with open(path_prefix + ".cuckoo.json") as f:
            meta = json.load(f)
        flat = np.fromfile(path_prefix + ".cuckoo", dtype=np.uint16)
        want = meta["n_shards"] * meta["nb"] * SLOTS
        if flat.size != want:
            raise ValueError(f"cuckoo table truncated at {path_prefix}")
        return cls(table=flat.reshape(-1, SLOTS), **meta)
