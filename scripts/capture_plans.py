"""Capture .explain("formatted") for a list of queries into a directory.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX [query ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt. Runs against whatever tree is first
on sys.path — point PYTHONPATH at a historic checkout to capture
"before" plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.environ.get("CAPTURE_TREE", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from twawler_spark.registry import QUERIES
    from twawler_spark.session import get_spark

    spark = get_spark(
        "plan-capture",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    sf = os.environ.get("CAPTURE_SF", "/root/testdata/sf0.01")
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # capture what we can; note failures
            txt = f"PLAN CAPTURE FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
