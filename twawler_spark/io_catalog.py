"""Snapshot-versioned table storage (Iceberg semantics, parquet fallback).

The design targets Iceberg (hidden partitioning, snapshot isolation,
MERGE); this sandbox ships no iceberg-spark-runtime jar, so ``Catalog``
implements the same contract on plain parquet dirs:

  root/<table>/snap=<round>/part-*.parquet     full snapshots (frontier, seen)
  root/<table>/data/round=<round>/...          append-only logs (documents)
  root/<table>/_manifests/<round>.json         row counts + per-partition
                                               lineage (the north rule's
                                               "per-partition lineage +
                                               counters")

Resume = read the highest committed snapshot (manifest written last, so
a killed round leaves no committed-but-partial snapshot — the
reference's "kill-safe, no corrupt state" invariant, README Stopping).
If an Iceberg catalog is configured on the session, set
``use_iceberg=True`` to route through table identifiers instead.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import re

# bump when the bucketed on-disk contract changes (file-per-bucket layout,
# sort order, hash placement); markers written by other versions are stale
BUCKET_LAYOUT_VERSION = 2


def _scan_bucket_files(path: str) -> dict[int, int]:
    """Map bucket id -> file count by parsing the ``_NNNNN`` suffix Spark
    encodes in bucketed part file names (``part-*-<uuid>_00042[.c000]...``)."""
    counts: dict[int, int] = {}
    pat = re.compile(r"^part-.*_(\d{5})(?:\.c\d+)?\..*parquet$")
    for f in os.listdir(path):
        m = pat.match(f)
        if m:
            b = int(m.group(1))
            counts[b] = counts.get(b, 0) + 1
    return counts


def write_bucketed(
    df: DataFrame,
    path: str,
    table_name: str,
    key: str = "url_hash",
    n_buckets: int = 64,
) -> None:
    """Persist ``df`` hash-bucketed + sorted on ``key`` (the co-located
    layout for the two 10^10 tables, frontier and seen: a join between
    tables bucketed alike needs NO exchange — Iceberg's ``bucket(N,
    key)`` partition transform + storage-partitioned joins).

    ``repartition(n, key)`` uses the same murmur3-pmod placement as
    ``bucketBy``, so each task holds exactly one bucket and writes
    exactly ONE file — which is what lets the scan also report its
    SORTED BY ordering (no Sort before a merge join) when
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is on."""
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table_name)
    )
    spec = {"n_buckets": n_buckets, "key": key, "version": BUCKET_LAYOUT_VERSION}
    with open(f"{path}/_bucket_spec.json", "w") as f:
        json.dump(spec, f)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    key: str = "url_hash",
    n_buckets: int = 64,
) -> None:
    """(Re-)attach an existing bucketed-files dir as a catalog table.

    Bucketed writes need ``saveAsTable``; the in-memory catalog forgets
    the entry across JVMs, so each session re-declares the external
    table over the already-bucketed files (bucket ids are encoded in
    the file names, which the bucketed scan reads back).

    The CLUSTERED/SORTED declaration (plus the session-wide
    ``legacy.bucketedTableScan.outputOrdering``) is only sound if the
    on-disk layout actually matches: re-registering stale files under a
    mismatched bucket spec would make bucketed joins silently WRONG, so
    validate before CREATE TABLE — the ``_bucket_spec.json`` written by
    :func:`write_bucketed` must agree on (n_buckets, key, layout
    version), every part file's bucket id must be < n_buckets, and no
    bucket may hold more than one file (the one-file-per-bucket
    invariant that lets the scan report its SORTED BY ordering)."""
    spec_path = f"{path}/_bucket_spec.json"
    if not os.path.exists(spec_path):
        raise ValueError(
            f"bucketed layout at {path} has no _bucket_spec.json — "
            "written by an older writer or not via write_bucketed(); rewrite it"
        )
    with open(spec_path) as f:
        spec = json.load(f)
    expected = {"n_buckets": n_buckets, "key": key, "version": BUCKET_LAYOUT_VERSION}
    if spec != expected:
        raise ValueError(
            f"bucketed layout mismatch at {path}: on-disk spec {spec} != "
            f"requested {expected}; rewrite with write_bucketed()"
        )
    counts = _scan_bucket_files(path)
    if not counts:
        raise ValueError(f"no bucketed part files found at {path}")
    bad_ids = [b for b in counts if b >= n_buckets]
    multi = {b: c for b, c in counts.items() if c > 1}
    if bad_ids or multi:
        raise ValueError(
            f"bucketed layout at {path} violates the spec: "
            f"bucket ids >= {n_buckets}: {sorted(bad_ids)}; "
            f"buckets with >1 file: {multi}"
        )
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


class Catalog:
    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool = False):
        self.spark = spark
        self.root = root
        if use_iceberg:
            raise NotImplementedError(
                "iceberg-spark-runtime not on classpath in this sandbox; "
                "parquet-snapshot fallback implements the same contract"
            )
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- snapshots
    def _snap_dir(self, table: str, round_no: int) -> str:
        return f"{self.root}/{table}/snap={round_no}"

    def _manifest_path(self, table: str, round_no: int) -> str:
        return f"{self.root}/{table}/_manifests/{round_no}.json"

    def write_snapshot(self, df: DataFrame, table: str, round_no: int) -> dict:
        path = self._snap_dir(table, round_no)
        df.write.mode("overwrite").parquet(path)
        written = self.spark.read.parquet(path)
        lineage = (
            written.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .orderBy("partition")
            .collect()
        )
        manifest = {
            "table": table,
            "round": round_no,
            "kind": "compaction",
            "n_rows": int(sum(r["count"] for r in lineage)),
            "partitions": [
                {"partition": int(r["partition"]), "rows": int(r["count"])}
                for r in lineage
            ],
            "columns": written.columns,
        }
        self._write_manifest(table, round_no, manifest)
        return manifest

    def commit_round(self, table: str, round_no: int, n_rows: int) -> dict:
        """Commit a delta-only round: manifest without snapshot data
        (the delta files were appended separately; this rename is the
        atomic commit point)."""
        manifest = {
            "table": table,
            "round": round_no,
            "kind": "commit",
            "n_rows": int(n_rows),
        }
        self._write_manifest(table, round_no, manifest)
        return manifest

    def _write_manifest(self, table: str, round_no: int, manifest: dict) -> None:
        mp = self._manifest_path(table, round_no)
        os.makedirs(os.path.dirname(mp), exist_ok=True)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mp)  # commit point

    def compaction_rounds(self, table: str) -> list[int]:
        """Rounds whose manifest carries full snapshot data."""
        out = []
        for r in self.committed_rounds(table):
            if self.read_manifest(table, r).get("kind", "compaction") == "compaction":
                out.append(r)
        return out

    def committed_rounds(self, table: str) -> list[int]:
        d = f"{self.root}/{table}/_manifests"
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
        )

    def latest_round(self, table: str) -> int | None:
        rounds = self.committed_rounds(table)
        return rounds[-1] if rounds else None

    def read_snapshot(self, table: str, round_no: int | None = None) -> DataFrame:
        if round_no is None:
            round_no = self.latest_round(table)
            if round_no is None:
                raise FileNotFoundError(f"no committed snapshot for {table}")
        return self.spark.read.parquet(self._snap_dir(table, round_no))

    def read_manifest(self, table: str, round_no: int) -> dict:
        with open(self._manifest_path(table, round_no)) as f:
            return json.load(f)

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` committed snapshots
        (Iceberg expire_snapshots analog). Manifest is deleted FIRST so
        a crash mid-expiry never leaves a committed-but-missing snapshot."""
        import shutil

        rounds = self.committed_rounds(table)
        expired = rounds[:-keep_last] if keep_last > 0 else rounds
        for r in expired:
            mp = self._manifest_path(table, r)
            if os.path.exists(mp):
                os.remove(mp)
            shutil.rmtree(self._snap_dir(table, r), ignore_errors=True)
        return expired

    # ------------------------------------------------------- append tables
    def append(self, df: DataFrame, table: str, round_no: int) -> None:
        df.write.mode("overwrite").parquet(
            f"{self.root}/{table}/data/round={round_no}"
        )

    def read_appended(self, table: str) -> DataFrame:
        return (
            self.spark.read.option("basePath", f"{self.root}/{table}/data")
            .parquet(f"{self.root}/{table}/data")
        )

    def has_appends(self, table: str) -> bool:
        return os.path.isdir(f"{self.root}/{table}/data")

    # ------------------------------------------------------------- inputs
    def read_input(self, name: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/{name}")
