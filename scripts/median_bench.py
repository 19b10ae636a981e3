#!/usr/bin/env python3
"""Combine N exclusive bench runs into the frozen close recording.

r15 close protocol (VERDICT r14 ask 6): the committed BENCH_DETAIL.json
is the PER-ROW MEDIAN of >=3 exclusive runs of the shipped tree
(min-of-passes within each run stays the per-run number), so a single
run's ambient host-speed draw cannot become the round's baseline. The
per-row dispersion (max/min across runs) is recorded alongside; the
round-over-round comparison normalizes on untouched-row medians.

Usage: median_bench.py OUT.json RUN1.json RUN2.json RUN3.json [...]
Prints a dispersion summary; exits nonzero if any run failed queries.
"""
import json
import statistics
import sys


def main() -> int:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    # the protocol is >=3 exclusive runs: with 2, median degenerates to
    # the mean of both and the single-run-ambient-draw protection is
    # silently gone while the protocol tag still reads "-medianN"
    assert len(runs) >= 3, "close protocol requires >=3 exclusive runs"
    for p, r in zip(run_paths, runs):
        if r.get("n_failed", 0):
            print(f"run {p} has {r['n_failed']} failed queries", file=sys.stderr)
            return 1
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == names, "runs cover different query sets"

    med = {q: statistics.median(r["queries"][q] for r in runs) for q in names}
    med_fp = {q: statistics.median(r["first_pass"][q] for r in runs) for q in names}
    disp = {
        q: max(r["queries"][q] for r in runs) / max(1e-9, min(r["queries"][q] for r in runs))
        for q in names
    }

    base = dict(runs[0])
    base["queries"] = dict(sorted(med.items()))
    base["first_pass"] = dict(sorted(med_fp.items()))
    base["value"] = round(sum(med.values()), 3)
    base["first_pass_total"] = round(sum(med_fp.values()), 3)
    base["protocol"] = f"{runs[0].get('protocol', 'sweep3-warmfinal')}-median{len(runs)}"
    base["run_totals"] = [round(sum(r["queries"].values()), 3) for r in runs]
    base["dispersion"] = {
        "median_maxmin_ratio": round(statistics.median(disp.values()), 3),
        "p90_maxmin_ratio": round(sorted(disp.values())[int(0.9 * len(disp))], 3),
        "rows_over_1p5": sorted(q for q, v in disp.items() if v > 1.5),
    }
    json.dump(base, open(out_path, "w"), indent=1)

    print(f"runs: {base['run_totals']} -> median total {base['value']}")
    d = base["dispersion"]
    print(f"dispersion: median max/min {d['median_maxmin_ratio']}, "
          f"p90 {d['p90_maxmin_ratio']}, rows>1.5x spread: {len(d['rows_over_1p5'])}")
    for q in d["rows_over_1p5"]:
        vals = [round(r["queries"][q], 3) for r in runs]
        print(f"  {q}: {vals} (median {med[q]:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
