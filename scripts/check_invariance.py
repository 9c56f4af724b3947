"""Partition-invariance gate: the same registry query must produce the
IDENTICAL result set at different parallelism levels and shuffle
partition counts.

Why this matters for the 100 TB claim: a query whose answer depends on
partition boundaries (per-partition RNG, undeterministic first()/limit,
accumulation-order-sensitive floats that leak past rounding, salting
that changes semantics instead of just layout) works at local[8] and
silently corrupts at 1000 executors. Running every audited query at two
deliberately-mismatched layouts — different core counts AND coprime
shuffle-partition counts, so no hash boundary lines up — and comparing
order-insensitive row hashes is the direct falsifier.

Usage:
  python scripts/check_invariance.py [sf_dir] [query ...]
      (parent: runs the child twice and diffs)
  python scripts/check_invariance.py --child cpus parts out.json sf [q ...]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Default audit set: every shuffle shape in the engine — windows, salted
# ranks, HOF folds, band joins, iterative BFS/CC, stream-shaped batch.
DEFAULT = [
    "crawl_budget_rank",
    "crawl_round_docs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_cdc",
    "dedup_containment",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "quality_classifier",
    "recrawl_schedule",
    "boilerplate_strip",
    "warc_ingest",
    "token_budget_select",
    "sequence_packing",
    "graph_bfs_ecc",
    "graph_harmonic",
    "j8_synchrotrap_full",
    "user_vector_wide",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def result_key(df) -> str:
    import hashlib

    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(norm(r[i]) for i in order) for r in df.collect()
    )
    h = hashlib.sha256()
    h.update(("|".join(sorted(cols))).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return f"{len(rows)}:{h.hexdigest()[:16]}"


def child(cpus: int, parts: int, out: str, sf: str, names: list[str]) -> None:
    from twawler_spark.session import get_spark
    from twawler_spark.registry import QUERIES

    spark = get_spark(
        f"invariance-{cpus}", master=f"local[{cpus}]", shuffle_partitions=parts
    )
    res = {}
    for n in names:
        try:
            res[n] = result_key(QUERIES[n](spark, sf))
        except Exception as e:  # noqa: BLE001 — recorded, compared, fails
            res[n] = f"ERROR: {str(e).splitlines()[0][:120]}"
        print(f"  [{cpus}c/{parts}p] {n}: {res[n]}", file=sys.stderr)
    json.dump(res, open(out, "w"))
    spark.stop()


def main() -> int:
    if sys.argv[1:2] == ["--child"]:
        child(
            int(sys.argv[2]),
            int(sys.argv[3]),
            sys.argv[4],
            sys.argv[5],
            sys.argv[6:],
        )
        return 0
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    # coprime partition counts (7 vs 61) so no hash boundary coincides
    layouts = [(4, 7), (32, 61)]
    outs = []
    for cpus, parts in layouts:
        out = f"/tmp/invariance_{cpus}_{parts}.json"
        outs.append(out)
        subprocess.run(
            [sys.executable, __file__, "--child", str(cpus), str(parts), out, sf]
            + names,
            check=True,
            cwd=REPO,
        )
    a, b = (json.load(open(o)) for o in outs)
    bad = [n for n in names if a.get(n) != b.get(n) or "ERROR" in str(a.get(n))]
    for n in names:
        mark = "MISMATCH" if n in bad else "ok"
        print(f"{mark:9s} {n}: {a.get(n)} vs {b.get(n)}")
    print(f"\n{len(bad)} invariance failures" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
