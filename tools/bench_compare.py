#!/usr/bin/env python3
"""Cross-round bench comparison implementing the PLANS_r12/r13 regression
rule.

Usage: tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json
           [--threshold-pct 10] [--abs-floor-sec 0.15] [--shuffle-tol-pct 1.0]
           [--max-threshold-pct 60] [--broad-threshold-pct 30]
           [--probe-elevated-factor 1.5] [--jitter-family PATH]

Channels used, in order of authority:
  1. shuffle_bytes byte-identity (within --shuffle-tol-pct relative
     tolerance: AQE / task-retry jitter moves bytes by <1% on identical
     plans — round-11 verdict) -> plan unchanged; any wall delta is host.
     A small in-repo allowlist (tools/shuffle_jitter_family.json,
     round-12 verdict blemish #1) widens the tolerance for the queries
     whose multi-stage store lifecycles are known to drift 0.5-2% on
     identical plans; beyond the listed tolerance is still PLAN-CHANGED.
  2. calibration_probes + query_start_ms (round-12 verdict #1): the
     constant-work machine probes interleaved through the suite localize
     host-contention windows IN-BAND. A query whose bracketing probe (in
     either run) read more than --probe-elevated-factor x that run's
     median probe sits in a contended window: its timing carries no
     cross-run signal, so it is MASKED from per-query flagging and from
     the dispersion/host estimates (reported as MASKED-CONTENDED, never
     REGRESSION). The pre-suite probe is excluded from the median — it
     carries codegen cold-start, not machine state.
  2b. task_run_ms / task_cpu_ms (round-13, artifacts >= r13 on both
     sides): probes sample only every ~7 queries, so a microburst
     BETWEEN probes inflates a query with quiet brackets (q223/q229 on
     the round-12 judge pair). Task CPU does not rise when tasks merely
     wait for a core: a flagged query whose cpu/run share collapsed
     >15 points below its old-run share was starved, not regressed ->
     MASKED-CONTENDED with both shares printed.
  3. queries_min (min of N reps) -> host noise only ADDS time, so a min
     inflation beyond the threshold AT UNCHANGED shuffle_bytes in a
     QUIET window is a REGRESSION candidate; plan-changed queries are
     listed separately (they need a PLANS entry, not a timing argument).
  4. Old artifacts without queries_min (rounds <= 10) fall back to the
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
max(--threshold-pct, 2 x the pair's own p95 normalized spread). Two
round-12-advice hardenings keep a multi-query regression from masking
itself by inflating that spread: (a) normalized ratios already beyond
the cap (definite-regression territory — where several queries at 2x
land) are dropped before the p95 is taken, so they can no longer raise
the threshold above themselves, while the honest sub-cap reps=3 tail of
a real same-code pair (p95 ~1.28 on the r11/r12 artifacts) still counts;
(b) the effective threshold is capped at --max-threshold-pct regardless
of spread.

Broad-regression guard (round-12 advice #1): a regression touching MOST
queries moves the run-wide median itself, which per-query normalization
can never see. The guard reads the two channels that DON'T move with
code speed: the machine ratio between the runs is estimated from the
calibration probes (constant work, data-independent; fallback when a
side has no probes: the 25th percentile of per-query ratios — host noise
and regressions both only ADD time, so the low quantile tracks the true
host shift), and min_sum over plan-identical unmasked queries is
compared after dividing out that machine ratio. A machine-normalized
min_sum inflation beyond --broad-threshold-pct is a BROAD-REGRESSION and
drives the exit code. The BROAD line is always printed so a reader sees
the margin.

Exit code 1 iff any REGRESSION or BROAD-REGRESSION row is emitted
(CI-able). Self-test: tools/test_bench_compare.py (also wired into sbt
test as BenchCompareSpec) pins that a same-code rerun with a 15% host
shift exits 0, a planted 2x slowdown is caught, a contended window
localized by the probes is masked instead of flagged, a 4-query planted
regression no longer hides inside its own p95, and an all-queries
slowdown at quiet probes trips the broad guard.
"""
import argparse
import json
import os
import statistics
import sys


def load(p):
    with open(p) as f:
        for line in f:
            if '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no metric line in {p}")


def probe_secs(run):
    """In-suite probe readings + the post-suite probe; the PRE probe is
    excluded (it carries codegen cold-start, not machine state)."""
    secs = [p["sec"] for p in run.get("calibration_probes", [])]
    post = run.get("calibration_post_sec")
    if post:
        secs.append(post)
    return secs


def contended(run, factor):
    """Set of query names sitting in a probe-localized contention window:
    a bracketing probe (the one just before the query in suite order, or
    the one at/after it) read > factor x the run's median probe. Suite
    order is the sorted query-name order (Bench runs queries sorted)."""
    probes = run.get("calibration_probes", [])
    if not probes:
        return set()
    secs = probe_secs(run)
    med = statistics.median(secs)
    if med <= 0:
        return set()
    names = sorted(run["queries"])
    idx = {q: i for i, q in enumerate(names)}
    # Probe after query X covers the boundary between X and the next
    # query; model it as an event at position idx(X) + 0.5.
    events = sorted((idx[p["after_query"]] + 0.5, p["sec"])
                    for p in probes if p["after_query"] in idx)
    post = run.get("calibration_post_sec")
    if post:
        events.append((len(names) + 0.5, post))
    hot = set()
    for i, q in enumerate(names):
        prev = [s for pos, s in events if pos < i]
        nxt = [s for pos, s in events if pos > i]
        bracket = ([prev[-1]] if prev else []) + ([nxt[0]] if nxt else [])
        if any(s > factor * med for s in bracket):
            hot.add(q)
    return hot


def machine_ratio(old, new):
    """new/old machine-speed ratio from the constant-work probe channel;
    None when either side lacks probes (legacy artifacts)."""
    o, n = probe_secs(old), probe_secs(new)
    if not o or not n:
        return None
    om, nm = statistics.median(o), statistics.median(n)
    return (nm / om) if om > 0 else None


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
    ap.add_argument("--max-threshold-pct", type=float, default=60.0,
                    help="cap on the dispersion-derived threshold (default 60)")
    ap.add_argument("--broad-threshold-pct", type=float, default=30.0,
                    help="machine-normalized min_sum inflation that trips the "
                         "broad-regression guard (default 30)")
    ap.add_argument("--probe-elevated-factor", type=float, default=1.5,
                    help="bracketing probe > factor x run median probe marks a "
                         "contended window (default 1.5)")
    ap.add_argument("--jitter-family", default=os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "shuffle_jitter_family.json"),
                    help="JSON allowlist of per-query shuffle-byte tolerances")
    args = ap.parse_args()
    thr = args.threshold_pct
    old, new = load(args.old_bench), load(args.new_bench)
    o_min = old.get("queries_min") or {}
    n_min = new.get("queries_min") or {}
    o_sb, n_sb = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    try:
        with open(args.jitter_family) as f:
            jitter_tol = {q: float(t)
                          for q, t in json.load(f).get("members", {}).items()}
    except FileNotFoundError:
        jitter_tol = {}

    def plan_same(q):
        if q not in o_sb or q not in n_sb:
            return False
        a, b = o_sb[q], n_sb[q]
        tol = max(args.shuffle_tol_pct, jitter_tol.get(q, 0.0))
        return a == b or abs(a - b) <= tol / 100.0 * max(a, b)

    # Contention windows, localized per run by the in-band probes.
    hot_old = contended(old, args.probe_elevated_factor)
    hot_new = contended(new, args.probe_elevated_factor)
    hot = hot_old | hot_new

    # Per-query CPU-share contention evidence (round-13 channel): probes
    # sample the machine only every ~7 queries, so a microburst between
    # probes inflates a query with no probe evidence. Task CPU time does
    # not rise when tasks merely wait for a core: a query whose wall
    # inflated at identical bytes while its cpu/run share COLLAPSED
    # (>15 points below the old run's share) was starved, not regressed.
    # Requires the task_run_ms/task_cpu_ms channels on BOTH sides
    # (artifacts >= round 13); degrades to probe-only masking otherwise.
    # Caveat: an allocation-pressure regression also lowers the share
    # (GC wall is not task CPU) — the masked row prints both shares and
    # gc_ms stays in the artifacts for that adjudication.
    o_run, o_cpu = old.get("task_run_ms", {}), old.get("task_cpu_ms", {})
    n_run, n_cpu = new.get("task_run_ms", {}), new.get("task_cpu_ms", {})

    def cpu_collapse(q):
        ovr, ovc = o_run.get(q, 0), o_cpu.get(q, 0)
        nvr, nvc = n_run.get(q, 0), n_cpu.get(q, 0)
        if ovr < 50 or nvr < 50:
            return None  # sub-50ms task totals carry no share signal
        os_, ns_ = ovc / ovr, nvc / nvr
        return (os_, ns_) if ns_ < os_ - 0.15 else None

    # Pass 1: per-query timing ratios on plan-identical queries OUTSIDE
    # contended windows, to learn the run-wide host-speed ratio. Only
    # timings big enough to measure a ratio from (>= 0.05 s on the old
    # side) vote for the median.
    rows, ratios = [], []
    plan_changed, masked = [], []
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
        if q not in hot and ov >= 0.05 and nv > 0:
            ratios.append(nv / ov)
    host = statistics.median(ratios) if ratios else 1.0
    if host <= 0:
        host = 1.0
    # Effective threshold = max(user threshold, 2x the pair's own p95
    # normalized spread), with two round-12-advice-#1 hardenings: ratios
    # already beyond the cap are DROPPED before taking the p95 (a planted
    # 2x in several queries must not raise the threshold above itself;
    # sub-cap tails — the honest reps=3 dispersion of a real pair — still
    # count), and the dispersion term is capped at --max-threshold-pct.
    cap_ratio = 1.0 + args.max_threshold_pct / 100.0
    norm = sorted(r / host for r in ratios)
    trimmed = [r for r in norm if r <= cap_ratio]
    p95 = trimmed[min(len(trimmed) - 1, int(0.95 * len(trimmed)))] if trimmed else 1.0
    disp_pct = max(0.0, (p95 - 1.0) * 100) * 2
    eff_thr = max(thr, min(disp_pct, args.max_threshold_pct))

    # Pass 2: flag queries whose NORMALIZED inflation clears the effective
    # threshold AND whose host-normalized absolute delta clears the floor
    # AND whose window is quiet in both runs (otherwise MASKED-CONTENDED).
    regressions, improved = [], []
    for q, ov, nv, conf, t in rows:
        if ov <= 0.05 and nv <= 0.05:
            continue  # sub-noise-floor timings carry no signal
        t_eff = max(t, eff_thr)
        norm_delta_pct = (nv / (ov * host) - 1.0) * 100 if ov > 0 else 0.0
        abs_delta = nv - ov * host
        if norm_delta_pct > t_eff and abs_delta > args.abs_floor_sec:
            cc = cpu_collapse(q)
            if q in hot_new:
                masked.append((q, ov, nv, norm_delta_pct,
                               "a probe-elevated window of the new run"))
            # Round-14 hardening (r13 verdict #10): the cpu-share mask may
            # NEVER absorb a >2x single-query inflation when the probes
            # read idle — host starvation strong enough to double a query
            # elevates the bracketing probes, while a lock-convoy or
            # recompute regression (the r13 q297 shape: 56x at idle
            # probes, byte-identical shuffles, cpu share 43%) collapses
            # the share exactly like starvation does. Beyond 2x at quiet
            # probes the collapse IS the regression signature.
            elif cc is not None and norm_delta_pct <= 100.0:
                masked.append((q, ov, nv, norm_delta_pct,
                               f"a cpu-share collapse ({cc[0]:.0%} -> {cc[1]:.0%}"
                               f" of task wall on-core — starved, not regressed)"))
            else:
                regressions.append((q, ov, nv, norm_delta_pct, conf))
        elif norm_delta_pct < -t_eff and -abs_delta > args.abs_floor_sec:
            if q not in hot_old:
                improved.append((q, ov, nv, norm_delta_pct))

    # Broad guard: machine-normalized min_sum over plan-identical,
    # unmasked common queries (round-12 advice #1 — a regression touching
    # most queries moves the per-query median itself; the probes don't).
    mr = machine_ratio(old, new)
    mr_src = "probes"
    if mr is None:
        lo = sorted(ratios)
        mr = lo[int(0.25 * len(lo))] if lo else 1.0
        mr_src = "p25-ratio fallback (no probes)"
    s_old = sum(ov for q, ov, nv, _, _ in rows if q not in hot)
    s_new = sum(nv for q, ov, nv, _, _ in rows if q not in hot)
    broad = (s_new / (s_old * mr)) if s_old > 0 and mr > 0 else 1.0
    broad_flag = (broad - 1.0) * 100 > args.broad_threshold_pct

    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"plan_changed={len(plan_changed)} masked_contended={len(hot)} "
          f"threshold={thr}% "
          f"effective_threshold={eff_thr:.1f}% (trimmed p95 spread {disp_pct / 2:.1f}% x2, "
          f"cap {args.max_threshold_pct:.0f}%) "
          f"host_ratio={host:.3f} abs_floor={args.abs_floor_sec}s "
          f"shuffle_tol={args.shuffle_tol_pct}% (+{len(jitter_tol)} family)")
    print(f"BROAD min_sum: old={s_old:.1f}s new={s_new:.1f}s "
          f"machine_ratio={mr:.3f} ({mr_src}) "
          f"normalized_inflation={(broad - 1.0) * 100:+.1f}% "
          f"(threshold +{args.broad_threshold_pct:.0f}%)")
    if broad_flag:
        print(f"BROAD-REGRESSION: plan-identical min_sum inflated "
              f"{(broad - 1.0) * 100:+.1f}% after dividing out the "
              f"machine ratio {mr:.3f} — a suite-wide slowdown the "
              f"per-query channel cannot see")
    for q, ov, nv, d, conf in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {q}: {ov:.3f}s -> {nv:.3f}s "
              f"(+{d:.0f}% host-normalized) at identical shuffle_bytes [{conf}]")
    for q, ov, nv, d, why in sorted(masked, key=lambda r: -r[3]):
        print(f"MASKED-CONTENDED {q}: {ov:.3f}s -> {nv:.3f}s (+{d:.0f}% "
              f"host-normalized) inside {why} — no cross-run signal")
    for q, a, b in plan_changed:
        print(f"PLAN-CHANGED {q}: shuffle_bytes {a} -> {b} "
              f"(needs a PLANS entry, not a timing argument)")
    for q, ov, nv, d in sorted(improved, key=lambda r: r[3])[:10]:
        print(f"improved {q}: {ov:.3f}s -> {nv:.3f}s ({d:.0f}% host-normalized)")
    if added:
        print("added:", ",".join(added))
    if removed:
        print("removed:", ",".join(removed))
    sys.exit(1 if regressions or broad_flag else 0)


if __name__ == "__main__":
    main()
