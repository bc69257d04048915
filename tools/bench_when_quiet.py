"""Bounded-retry bench driver (VERDICT r9 #1): the co-tenant load on
this box arrives in sustained multi-minute waves, so a single bench
launch can start quiet and finish drowned (r9: 54/56 bw_dirty; the
first two r10 attempts hit the same waves). This wrapper launches
`bench.py` only after the box has been QUIET FOR A SUSTAINED STREAK
(both probes under their quiet thresholds on N consecutive samples),
checks the produced record's cleanliness, and retries up to
``SPARK_GRAFT_BENCH_ATTEMPTS`` times, keeping the cleanest record
seen (fewest hot queries, then fewest bw-dirty, then lowest total).

Usage: python tools/bench_when_quiet.py
Env: SPARK_GRAFT_BENCH_ATTEMPTS (default 3),
     SPARK_GRAFT_BENCH_MAX_WAIT_S per-attempt quiet wait (default 1800).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_LOCAL.json")
STREAK = 4          # consecutive quiet probe pairs required
PROBE_GAP_S = 20.0  # spacing between streak probes
GEMM_QUIET = 0.30
BW_QUIET = 0.18


def wait_sustained_quiet(max_wait_s: float) -> bool:
    streak = 0
    deadline = time.monotonic() + max_wait_s
    while streak < STREAK:
        g, b = bench._probe_pair()
        streak = streak + 1 if (g <= GEMM_QUIET and b <= BW_QUIET) else 0
        if streak >= STREAK:
            return True
        if time.monotonic() > deadline:
            return False
        time.sleep(PROBE_GAP_S)
    return True


def score(rec: dict) -> tuple:
    # Cleanliness ONLY: total runtime is NOT part of the score —
    # keeping the fastest of N equally-clean runs would bias
    # cross-round comparisons low. Ties go to the most recent
    # attempt (the caller compares with `<=`).
    return (len(rec.get("hot_queries") or []),
            len(rec.get("bw_dirty_queries") or []))


def main():
    attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "1800"))
    best, best_path = None, None
    attempt_totals = []
    for i in range(attempts):
        quiet = wait_sustained_quiet(max_wait)
        print(f"attempt {i}: sustained quiet={quiet}", flush=True)
        if not quiet and best is not None:
            # don't burn an attempt on a box we know is loaded when a
            # record already exists
            continue
        rc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                            capture_output=True, text=True)
        if rc.returncode != 0:
            print(f"attempt {i}: bench rc={rc.returncode}", flush=True)
            continue
        rec = json.load(open(OUT))
        keep = os.path.join(REPO, f"bench_attempt_{i}.json")
        shutil.copy(OUT, keep)
        attempt_totals.append({"attempt": i, "value": rec.get("value"),
                               "hot": len(rec.get("hot_queries") or []),
                               "bw_dirty": len(rec.get("bw_dirty_queries") or [])})
        print(f"attempt {i}: total={rec['value']} "
              f"hot={rec['hot_queries']} "
              f"bw_dirty={len(rec['bw_dirty_queries'])}", flush=True)
        # `<=`: equally-clean later attempt replaces the earlier one
        # (most-recent clean wins; runtime never enters the choice)
        if best is None or score(rec) <= score(best):
            best, best_path = rec, keep
        if not rec["hot_queries"] and len(rec["bw_dirty_queries"]) <= 6:
            print("clean record — stopping", flush=True)
            break
    if best_path:
        # record every attempt's total alongside the kept one so
        # cross-round comparisons can see the full distribution
        best["attempt_totals"] = attempt_totals
        with open(OUT, "w") as fh:
            json.dump(best, fh)
        print(f"kept {best_path} as BENCH_LOCAL.json "
              f"(hot={len(best['hot_queries'])}, "
              f"bw_dirty={len(best['bw_dirty_queries'])}, "
              f"total={best['value']}, "
              f"attempts={attempt_totals})", flush=True)


if __name__ == "__main__":
    main()
