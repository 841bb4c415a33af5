#!/usr/bin/env python3
"""Self-test for tools/bench_compare.py (wired into sbt test by
BenchCompareSpec).

Pins the round-12/13 calibration contract (round-11 verdict #1,
round-12 verdict #1 + advice #1):
  1. a SAME-CODE rerun under a 15% host-speed shift with realistic
     per-query jitter (sub-second queries +/-10%, big queries +/-2%) and
     <1% shuffle-byte drift exits 0 with zero REGRESSION/PLAN-CHANGED rows;
  2. a deliberately planted 2x slowdown in one mid-size query IS caught;
  3. a >1% shuffle-byte change is reported as PLAN-CHANGED;
  4. the space-separated --threshold-pct form parses (round-11 advice #3:
     it used to be silently ignored);
  5. a legacy old artifact without queries_min falls back to the
     single-run channel and still catches a 2.5x slowdown;
  6. queries inflated inside a probe-localized contention window are
     MASKED-CONTENDED, not REGRESSION (round-12 verdict #1 — the judge's
     same-code rerun produced 6 false rows in one probe-visible window),
     while a planted 2x OUTSIDE the window is still caught;
  7. a 4-query planted regression (~7% of the suite) no longer inflates
     the dispersion p95 above itself (round-12 advice #1 trimming): all
     four flagged;
  8. an ALL-queries slowdown at quiet probes — invisible to per-query
     median normalization by construction — trips the BROAD-REGRESSION
     min_sum guard;
  9. the in-repo shuffle-jitter family widens byte tolerance for listed
     queries only, and a drift beyond the listed tolerance still flags.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CMP = os.path.join(HERE, "bench_compare.py")

# Deterministic suite shape: 50 sub-second queries + 10 big ones.
SMALL_JITTER = [0.92, 1.08, 0.97, 1.03, 1.00, 0.90, 1.10, 0.95, 1.05, 0.99]
BIG_JITTER = [0.99, 1.01, 0.98, 1.02, 1.00]


def mk_run(host=1.0, planted=None, plan_drift=None, legacy=False,
           probe_override=None):
    """Build one bench JSON dict. host scales every timing (host-speed
    window) INCLUDING the constant-work probes; planted = {query: factor}
    multiplies specific queries on top (a code change: probes unaffected);
    plan_drift = {query: rel} scales that query's shuffle bytes;
    probe_override = {after_query: sec} pins specific probe readings
    (a localized contention window). legacy drops queries_min AND the
    probe channels (rounds <= 4 artifacts)."""
    queries, qmin, sb = {}, {}, {}
    for i in range(50):
        q = f"q{i:03d}_small"
        base = 0.1 + (i % 7) * 0.05  # 0.10 .. 0.40 s
        j = SMALL_JITTER[i % len(SMALL_JITTER)] if host != 1.0 else 1.0
        v = base * host * j * (planted or {}).get(q, 1.0)
        queries[q] = v * 1.3  # cold run is slower than min
        qmin[q] = v
        sb[q] = 1_000_000 + i * 12_345
    for i in range(10):
        q = f"q9{i:02d}_big"
        base = 2.0 + i * 1.5  # 2 .. 15.5 s
        j = BIG_JITTER[i % len(BIG_JITTER)] if host != 1.0 else 1.0
        v = base * host * j * (planted or {}).get(q, 1.0)
        queries[q] = v * 1.2
        qmin[q] = v
        sb[q] = 400_000_000 + i * 9_876_543
    for q, rel in (plan_drift or {}).items():
        sb[q] = int(sb[q] * (1.0 + rel))
    d = {"metric": "total", "value": sum(queries.values()), "unit": "sec",
         "queries": queries, "shuffle_bytes": sb, "failed": []}
    if not legacy:
        d["queries_min"] = qmin
        d["bench_reps"] = 3
        # Round-13 per-query contention channel: task wall tracks the
        # cold wall (8 cores busy), CPU rides at a 90% on-core share.
        d["task_run_ms"] = {q: int(v * 8000) for q, v in queries.items()}
        d["task_cpu_ms"] = {q: int(v * 8000 * 0.9) for q, v in queries.items()}
        # Probes after every 7th query in sorted order, like Bench.
        names = sorted(queries)
        probes = [{"after_query": names[i], "sec": 0.30 * host}
                  for i in range(len(names)) if i % 7 == 6]
        for p in probes:
            if probe_override and p["after_query"] in probe_override:
                p["sec"] = probe_override[p["after_query"]]
        d["calibration_probes"] = probes
        d["calibration_pre_sec"] = 0.62 * host  # cold, excluded by tool
        d["calibration_post_sec"] = 0.30 * host
    return d


def write(d):
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".json", dir=tempfile.gettempdir(), delete=False)
    f.write(json.dumps(d) + "\n")
    f.close()
    return f.name


def run(old, new, *extra):
    p = subprocess.run(
        [sys.executable, CMP, write(old), write(new), *extra],
        capture_output=True, text=True)
    return p.returncode, p.stdout


def check(name, cond, out):
    if not cond:
        print(f"FAIL {name}\n--- output ---\n{out}")
        sys.exit(1)
    print(f"ok {name}")


def main():
    base = mk_run()

    # 1. Same-code rerun: 15% slower host window, per-query jitter, and a
    #    0.5% shuffle drift on two queries (AQE/retry jitter) -> clean.
    rerun = mk_run(host=1.15, plan_drift={"q003_small": 0.005, "q902_big": -0.004})
    rc, out = run(base, rerun)
    check("same-code rerun exits 0", rc == 0, out)
    check("same-code rerun: no REGRESSION rows", "REGRESSION" not in out, out)
    check("same-code rerun: no PLAN-CHANGED rows", "PLAN-CHANGED" not in out, out)
    check("host ratio learned (~1.15)", "host_ratio=1.1" in out, out)
    check("machine ratio from probes (~1.15)", "machine_ratio=1.15" in out, out)

    # 2. Planted 2x slowdown in one mid-size query, same host shift.
    slow = mk_run(host=1.15, plan_drift={"q003_small": 0.005})
    slow["queries_min"]["q903_big"] *= 2.0
    slow["queries"]["q903_big"] *= 2.0
    rc, out = run(base, slow)
    check("planted 2x exits 1", rc == 1, out)
    check("planted 2x names the query", "REGRESSION q903_big" in out, out)
    check("planted 2x flags ONLY it", out.count("REGRESSION") == 1, out)

    # 3. A >1% shuffle change is a plan change, not a timing argument.
    moved = mk_run(host=1.0, plan_drift={"q905_big": 0.05})
    rc, out = run(base, moved)
    check("plan change exits 0 (no regression)", rc == 0, out)
    check("plan change reported", "PLAN-CHANGED q905_big" in out, out)

    # 4. Space-separated --threshold-pct parses (round-11 advice #3): a
    #    threshold of 300% must unflag the planted 2x.
    rc, out = run(base, slow, "--threshold-pct", "300")
    check("space-separated threshold honored", rc == 0 and "REGRESSION" not in out, out)
    #    ...and a stray positional fails loudly instead of shifting files.
    p = subprocess.run([sys.executable, CMP, write(base), write(slow), "10"],
                       capture_output=True, text=True)
    check("stray positional rejected", p.returncode == 2, p.stderr)

    # 5. Legacy old artifact (no queries_min, no probes): single-run
    #    fallback with a doubled threshold still catches a 2.5x slowdown,
    #    and the broad guard's no-probe machine-ratio fallback engages.
    legacy_old = mk_run(legacy=True)
    legacy_slow = mk_run(host=1.1, legacy=True)
    legacy_slow["queries"]["q904_big"] *= 2.5
    rc, out = run(legacy_old, legacy_slow)
    check("legacy fallback catches 2.5x", rc == 1 and "q904_big" in out, out)
    check("legacy fallback tagged LOW", "LOW confidence" in out, out)
    check("legacy machine-ratio fallback used", "p25-ratio fallback" in out, out)

    # 6. Contention window: queries inflated 2.5x inside a window whose
    #    bracketing probe is elevated (0.8 vs 0.345 median = 2.3x, like
    #    the judge's 0.70 vs 0.31) are masked, not flagged. The probe
    #    after q048_small brackets sorted positions 42..48 on one side.
    cont = mk_run(host=1.15, probe_override={"q048_small": 0.80})
    for q in ("q043_small", "q045_small", "q047_small"):
        cont["queries_min"][q] *= 2.5
        cont["queries"][q] *= 2.5
    rc, out = run(base, cont)
    check("contended window exits 0", rc == 0, out)
    check("contended window: no REGRESSION rows", "REGRESSION" not in out, out)
    check("contended window: masked rows reported", "MASKED-CONTENDED q045_small" in out, out)
    #    A planted 2x OUTSIDE the window (quiet probes around q907) is
    #    still caught in the same compare.
    cont2 = json.loads(json.dumps(cont))
    cont2["queries_min"]["q907_big"] *= 2.0
    cont2["queries"]["q907_big"] *= 2.0
    rc, out = run(base, cont2)
    check("planted 2x outside window still exits 1", rc == 1, out)
    check("planted 2x outside window flagged", "REGRESSION q907_big" in out, out)
    check("window stays masked next to real flag", "MASKED-CONTENDED q045_small" in out, out)

    # 7. Four planted 2x queries (~7% of suite): the trimmed p95 keeps the
    #    effective threshold below them (round-12 advice #1 — untrimmed,
    #    they inflated the p95 above +100% and masked themselves).
    four = mk_run(host=1.15)
    for q in ("q900_big", "q902_big", "q904_big", "q906_big"):
        four["queries_min"][q] *= 2.0
        four["queries"][q] *= 2.0
    rc, out = run(base, four)
    check("4-query regression exits 1", rc == 1, out)
    check("all four flagged", out.count("REGRESSION") == 4, out)

    # 8. ALL queries 2x at QUIET probes: per-query normalization absorbs
    #    it (the median moves), but machine-normalized min_sum cannot be
    #    argued away -> BROAD-REGRESSION.
    allslow = mk_run(planted={q: 2.0 for q in base["queries"]})
    rc, out = run(base, allslow)
    check("suite-wide slowdown exits 1", rc == 1, out)
    check("broad guard names itself", "BROAD-REGRESSION" in out, out)

    # 10. CPU-share collapse: a query inflated by a microburst BETWEEN
    #     probes (quiet brackets, so probe masking can't see it) shows
    #     its wall rising while task CPU stays flat -> masked. The
    #     planted REAL 2x in test 2 keeps its share (cpu rises with
    #     wall) and still flags — the discriminator the probes lack.
    burst = mk_run(host=1.15)
    burst["queries_min"]["q906_big"] *= 1.8
    burst["queries"]["q906_big"] *= 1.8
    burst["task_run_ms"]["q906_big"] = int(burst["task_run_ms"]["q906_big"] * 1.8)
    # ...but task_cpu_ms stays: the tasks were starved, not working.
    rc, out = run(base, burst)
    check("cpu-share collapse exits 0", rc == 0, out)
    check("cpu-share collapse masked", "MASKED-CONTENDED q906_big" in out
          and "cpu-share collapse" in out, out)

    # 11. Round-13 verdict #10: the cpu-share mask may NEVER absorb a >2x
    #     single-query inflation at byte-identical shuffles when the
    #     probes read idle (the r13 q297 shape: 56x at quiet probes, cpu
    #     share 43% — a lock-convoy regression whose share collapse looks
    #     exactly like starvation). A 3x planted inflation with a cpu
    #     collapse MUST flag REGRESSION, not MASKED-CONTENDED.
    convoy = mk_run(host=1.15)
    convoy["queries_min"]["q906_big"] *= 3.0
    convoy["queries"]["q906_big"] *= 3.0
    convoy["task_run_ms"]["q906_big"] *= 3  # tasks ran 3x longer...
    # ...at flat CPU — share collapsed to 30%, like the q297 convoy.
    rc, out = run(base, convoy)
    check("q297-shape convoy exits 1", rc == 1, out)
    check("q297-shape convoy flagged REGRESSION", "REGRESSION q906_big" in out, out)
    check("q297-shape convoy NOT masked", "MASKED-CONTENDED q906_big" not in out, out)

    # 9. Shuffle-jitter family: a listed query tolerates 3% byte drift; an
    #    unlisted one does not; beyond the listed tolerance still flags.
    fam = write({"members": {"q905_big": 3.0}})
    drift2 = mk_run(plan_drift={"q905_big": 0.02, "q906_big": 0.02})
    rc, out = run(base, drift2, "--jitter-family", fam)
    check("family member tolerates 2% drift", "PLAN-CHANGED q905_big" not in out, out)
    check("non-member still flagged at 2%", "PLAN-CHANGED q906_big" in out, out)
    drift5 = mk_run(plan_drift={"q905_big": 0.05})
    rc, out = run(base, drift5, "--jitter-family", fam)
    check("family member still flagged at 5%", "PLAN-CHANGED q905_big" in out, out)
    #    The committed repo allowlist parses (it is the default).
    with open(os.path.join(HERE, "shuffle_jitter_family.json")) as f:
        members = json.load(f)["members"]
    check("repo allowlist parses with members", len(members) >= 9, str(members))

    print("ALL PASS")


if __name__ == "__main__":
    main()
