#!/usr/bin/env python3
"""Cross-round bench comparison implementing the PLANS_r12 regression rule.

Usage: tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json
           [--threshold-pct 10] [--abs-floor-sec 0.15] [--shuffle-tol-pct 1.0]

Channels used, in order of authority:
  1. shuffle_bytes byte-identity (within --shuffle-tol-pct relative
     tolerance: AQE / task-retry jitter moves bytes by <1% on identical
     plans — round-11 verdict) -> plan unchanged; any wall delta is host.
  2. queries_min (min of N reps) -> host noise only ADDS time, so a min
     inflation beyond the threshold AT UNCHANGED shuffle_bytes is a
     REGRESSION candidate; plan-changed queries are listed separately
     (they need a PLANS entry, not a timing argument).
  3. Old artifacts without queries_min (rounds <= 10) fall back to the
     single-run "queries" channel with a doubled threshold and a LOW
     confidence tag.

Host-speed normalization (round-11 verdict #1 calibration): two runs of
IDENTICAL code on different host windows shift the WHOLE min distribution
(observed same-code per-query min ratios: median 0.977, p10 0.866, p90
1.12), so a fixed per-query threshold over-flags ~50 rows on a clean
compare. Each query's ratio is therefore normalized by the RUN-WIDE
median ratio before thresholding (a real regression in a handful of
queries barely moves the median; a host-speed shift moves every ratio
identically), and a flag additionally requires the host-normalized
absolute delta to exceed --abs-floor-sec — sub-second queries sit inside
the jitter spread and carry no per-query signal at small deltas.

Dispersion-aware threshold: even AFTER median normalization, same-code
pairs at reps=3 show a +28% tail (measured round11_final vs the judge's
rerun: normalized p95 +19%, p100 +28% — min-of-3 is not a true floor on
a shared host), so the effective per-query threshold is
max(--threshold-pct, 2 x the pair's own p95 normalized spread). That is
the honest per-query detection limit for THIS pair of runs: it reads
~38% on today's host windows (a planted 2x = +100% stays far outside)
and tightens automatically when reps rise or the host quiets. The
header prints the effective threshold so a reader knows the limit; a
BROAD regression (many queries at once) inflates the spread and the
median and must be read off min_sum_sec, not per-query rows — disclosed.

Exit code 1 iff any REGRESSION row is emitted (CI-able). Self-test:
tools/test_bench_compare.py (also wired into sbt test as BenchCompareSpec)
pins that a same-code rerun with a 15% host shift exits 0 while a planted
2x slowdown in one query is still caught.
"""
import argparse
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        for line in f:
            if '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no metric line in {p}")


def main():
    ap = argparse.ArgumentParser(
        description="graft cross-round bench regression compare")
    ap.add_argument("old_bench", help="previous round's bench JSON")
    ap.add_argument("new_bench", help="this round's bench JSON")
    ap.add_argument("--threshold-pct", type=float, default=10.0,
                    help="median-normalized min inflation that flags (default 10)")
    ap.add_argument("--abs-floor-sec", type=float, default=0.15,
                    help="ignore host-normalized deltas below this (default 0.15)")
    ap.add_argument("--shuffle-tol-pct", type=float, default=1.0,
                    help="relative shuffle-byte drift treated as plan-identical")
    args = ap.parse_args()
    thr = args.threshold_pct
    old, new = load(args.old_bench), load(args.new_bench)
    o_min = old.get("queries_min") or {}
    n_min = new.get("queries_min") or {}
    o_sb, n_sb = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    def plan_same(q):
        if q not in o_sb or q not in n_sb:
            return False
        a, b = o_sb[q], n_sb[q]
        return a == b or abs(a - b) <= args.shuffle_tol_pct / 100.0 * max(a, b)

    # Pass 1: per-query timing ratios on plan-identical queries, to learn
    # the run-wide host-speed ratio. Only timings big enough to measure a
    # ratio from (>= 0.05 s on the old side) vote for the median.
    rows, ratios = [], []
    plan_changed = []
    for q in common:
        if not plan_same(q):
            plan_changed.append((q, o_sb.get(q), n_sb.get(q)))
            continue
        if q in o_min and q in n_min:
            ov, nv, conf, t = o_min[q], n_min[q], "min-of-reps", thr
        else:
            ov, nv, conf, t = old["queries"][q], new["queries"][q], \
                "single-run (LOW confidence)", thr * 2
        rows.append((q, ov, nv, conf, t))
        if ov >= 0.05 and nv > 0:
            ratios.append(nv / ov)
    host = statistics.median(ratios) if ratios else 1.0
    if host <= 0:
        host = 1.0
    # Effective threshold = max(user threshold, 2x the pair's own p95
    # normalized spread): the per-query detection limit this pair of runs
    # actually supports (see module docstring).
    norm = sorted(r / host for r in ratios)
    p95 = norm[min(len(norm) - 1, int(0.95 * len(norm)))] if norm else 1.0
    disp_pct = max(0.0, (p95 - 1.0) * 100) * 2
    eff_thr = max(thr, disp_pct)

    # Pass 2: flag queries whose NORMALIZED inflation clears the effective
    # threshold AND whose host-normalized absolute delta clears the floor.
    regressions, improved = [], []
    for q, ov, nv, conf, t in rows:
        if ov <= 0.05 and nv <= 0.05:
            continue  # sub-noise-floor timings carry no signal
        t_eff = max(t, eff_thr)
        norm_delta_pct = (nv / (ov * host) - 1.0) * 100 if ov > 0 else 0.0
        abs_delta = nv - ov * host
        if norm_delta_pct > t_eff and abs_delta > args.abs_floor_sec:
            regressions.append((q, ov, nv, norm_delta_pct, conf))
        elif norm_delta_pct < -t_eff and -abs_delta > args.abs_floor_sec:
            improved.append((q, ov, nv, norm_delta_pct))

    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"plan_changed={len(plan_changed)} threshold={thr}% "
          f"effective_threshold={eff_thr:.1f}% (p95 spread {disp_pct / 2:.1f}% x2) "
          f"host_ratio={host:.3f} abs_floor={args.abs_floor_sec}s "
          f"shuffle_tol={args.shuffle_tol_pct}%")
    for q, ov, nv, d, conf in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {q}: {ov:.3f}s -> {nv:.3f}s "
              f"(+{d:.0f}% host-normalized) at identical shuffle_bytes [{conf}]")
    for q, a, b in plan_changed:
        print(f"PLAN-CHANGED {q}: shuffle_bytes {a} -> {b} "
              f"(needs a PLANS entry, not a timing argument)")
    for q, ov, nv, d in sorted(improved, key=lambda r: r[3])[:10]:
        print(f"improved {q}: {ov:.3f}s -> {nv:.3f}s ({d:.0f}% host-normalized)")
    if added:
        print("added:", ",".join(added))
    if removed:
        print("removed:", ",".join(removed))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
