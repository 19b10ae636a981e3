#!/usr/bin/env python3
"""Compare a bench detail file against the committed BENCH_DETAIL.json.

Usage: python3 scripts/bench_diff.py [runDetail.json] [--factor 2.0]

Default runDetail is BENCH_DETAIL_run.json (what a full un-promoted
bench writes). The committed baseline is read with `git show
HEAD:BENCH_DETAIL.json`, so the working tree state never skews the
comparison. Prints totals, per-query regressions above --factor,
improvements below 1/factor, and added/removed queries.
"""
import json
import subprocess
import sys


def main() -> int:
    run_path = "BENCH_DETAIL_run.json"
    factor = 2.0
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factor":
            if not args:
                print(__doc__)
                return 1
            try:
                factor = float(args.pop(0))
            except ValueError:
                print(__doc__)
                return 1
        else:
            run_path = a
    base = json.loads(subprocess.check_output(
        ["git", "show", "HEAD:BENCH_DETAIL.json"]).decode())
    run = json.load(open(run_path))
    bq, rq = base["queries"], run["queries"]
    print(f"baseline total {sum(bq.values()):7.1f}s over {len(bq)} queries "
          f"(committed BENCH_DETAIL.json)")
    print(f"run      total {sum(rq.values()):7.1f}s over {len(rq)} queries "
          f"({run_path})")
    noise_floor = 0.15  # ignore ratios on sub-150ms rows
    regs, wins = [], []
    for k, v in rq.items():
        if k in bq and bq[k] > noise_floor:
            if v > factor * bq[k]:
                regs.append((v / bq[k], k, bq[k], v))
            elif v < bq[k] / factor:
                wins.append((bq[k] / v, k, bq[k], v))
    for title, rows in (("regressions", sorted(regs, reverse=True)),
                        ("improvements", sorted(wins, reverse=True))):
        print(f"\n>{factor}x {title}: {len(rows)}")
        for r, k, b, v in rows:
            print(f"  {r:5.1f}x  {k}: {b:.2f}s -> {v:.2f}s")
    added = sorted(set(rq) - set(bq))
    removed = sorted(set(bq) - set(rq))
    if added:
        print(f"\nnew queries ({len(added)}):")
        for k in added:
            print(f"  {rq[k]:6.2f}s  {k}")
    if removed:
        print(f"\nmissing vs baseline ({len(removed)}): {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
