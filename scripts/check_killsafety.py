"""Kill-safety gate: SIGKILL the crawl CLI mid-round, resume, and the
final committed state must equal an uninterrupted run's, byte for byte.

tests/test_resume.py proves LOGICAL resume (drop handles, new Catalog).
This probe proves CRASH resume at the ship-shape surface: the process
group (driver JVM + python workers) dies with -9 while round 2 is
writing deltas but before its manifest rename — leaving orphan parquet
files on disk — and the rerun must (a) resume from round 1, (b) ignore
every uncommitted file (the manifest is the only source of truth), and
(c) end with committed_rounds + all per-round metrics IDENTICAL to a
control run that was never killed. Determinism of the engine (see the
invariance gate) makes strict equality the right assertion.

Usage: python scripts/check_killsafety.py [n_urls] [n_hosts]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, SPARK_GRAFT_CPUS="8")


def cli(args: list[str], **kw):
    return subprocess.run(
        [sys.executable, "-m", "twawler_spark", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True, **kw,
    )


def status(root: str) -> dict:
    r = cli(["status", "--root", root])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    a, b = "/tmp/twkill_control", "/tmp/twkill_victim"
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)
    print(f"gen {n_urls} urls / {n_hosts} hosts ...", file=sys.stderr)
    cli(["gen", "--root", a, "--urls", str(n_urls), "--hosts", str(n_hosts)],
        check=True)
    shutil.copytree(a, b)

    print("control: crawl --rounds 3 uninterrupted", file=sys.stderr)
    t0 = time.time()
    cli(["crawl", "--root", a, "--rounds", "3", "--hosts", str(n_hosts)],
        check=True)
    control_sec = time.time() - t0
    want = status(a)

    print("victim: crawl --rounds 3, SIGKILL mid-round-2", file=sys.stderr)
    p = subprocess.Popen(
        [sys.executable, "-m", "twawler_spark", "crawl", "--root", b,
         "--rounds", "3", "--hosts", str(n_hosts)],
        cwd=REPO, env=ENV, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    m1 = f"{b}/frontier/_manifests/1.json"
    m2 = f"{b}/frontier/_manifests/2.json"
    deadline = time.time() + max(600, control_sec * 4)
    while not os.path.exists(m1):
        if p.poll() is not None or time.time() > deadline:
            print("victim finished/died before round-1 commit — rerun "
                  "with a larger n_urls", file=sys.stderr)
            return 2
        time.sleep(0.05)
    # round 1 committed; let round 2 start writing, then kill the group
    time.sleep(max(0.5, control_sec / 3 * 0.4))
    killed_mid_round2 = not os.path.exists(m2)
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    print(f"killed; round-2 manifest present at kill: {not killed_mid_round2}",
          file=sys.stderr)

    # count orphan files written after the last committed manifest
    committed = {int(f.split(".")[0])
                 for f in os.listdir(f"{b}/frontier/_manifests")}
    print(f"victim committed rounds at kill: {sorted(committed)}",
          file=sys.stderr)

    print("victim: resume crawl --rounds 3", file=sys.stderr)
    cli(["crawl", "--root", b, "--rounds", "3", "--hosts", str(n_hosts)],
        check=True)
    got = status(b)

    ok = got == want
    print(json.dumps({
        "killed_mid_round2": killed_mid_round2,
        "committed_at_kill": sorted(committed),
        "control": want, "resumed": got, "equal": ok,
    }, sort_keys=True))
    print("KILL-SAFETY OK" if ok else "KILL-SAFETY MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
