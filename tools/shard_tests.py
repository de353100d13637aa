"""Sharded full-suite runner — reproducible ~20-minute evidence for the
whole 740+-test pytest suite (serial it takes ~1:40 h; VERDICT r5 item 8).

Splits tests/test_*.py across N worker subprocesses (whole files, so
module/session fixtures never cross shards), runs them concurrently, and
aggregates pass/fail counts. Files are assigned round-robin by descending
size as a cheap runtime balancer.

Usage: python tools/shard_tests.py [N_SHARDS] [extra pytest args...]
Exit code 0 iff every shard exits 0. Writes per-shard logs to
/tmp/gc_shard_<i>.log and prints a one-line JSON summary.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    n = int(argv[0]) if argv and argv[0].isdigit() else 5
    extra = argv[1:] if argv and argv[0].isdigit() else argv
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(root, "tests", "test_*.py")),
        key=lambda p: -os.path.getsize(p),
    )
    shards: list[list[str]] = [[] for _ in range(n)]
    sizes = [0] * n
    for f in files:  # greedy: next file to the currently lightest shard
        i = sizes.index(min(sizes))
        shards[i].append(f)
        sizes[i] += os.path.getsize(f)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = open(f"/tmp/gc_shard_{i}.log", "w")
        procs.append(
            (
                i,
                log,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", *extra, *shard],
                    cwd=root,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
            )
        )
    results = {}
    passed = failed = 0
    for i, log, p in procs:
        rc = p.wait()
        log.close()
        tail = open(f"/tmp/gc_shard_{i}.log").read()[-2000:]
        m = re.findall(r"(\d+) passed", tail)
        f_ = re.findall(r"(\d+) failed", tail)
        results[i] = {
            "rc": rc,
            "passed": int(m[-1]) if m else 0,
            "failed": int(f_[-1]) if f_ else 0,
        }
        passed += results[i]["passed"]
        failed += results[i]["failed"]
    summary = {
        "shards": n,
        "passed": passed,
        "failed": failed,
        "wall_sec": round(time.time() - t0, 1),
        "per_shard": results,
        "ok": all(r["rc"] == 0 for r in results.values()),
    }
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
