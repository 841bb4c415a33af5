#!/usr/bin/env python3
"""Self-test for tools/bench_compare.py (wired into sbt test by
BenchCompareSpec).

Pins the round-12 calibration contract (round-11 verdict #1):
  1. a SAME-CODE rerun under a 15% host-speed shift with realistic
     per-query jitter (sub-second queries +/-10%, big queries +/-2%) and
     <1% shuffle-byte drift exits 0 with zero REGRESSION/PLAN-CHANGED rows;
  2. a deliberately planted 2x slowdown in one mid-size query IS caught;
  3. a >1% shuffle-byte change is reported as PLAN-CHANGED;
  4. the space-separated --threshold-pct form parses (round-11 advice #3:
     it used to be silently ignored);
  5. a legacy old artifact without queries_min falls back to the
     single-run channel and still catches a 2.5x slowdown.
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


def mk_run(host=1.0, planted=None, plan_drift=None, legacy=False):
    """Build one bench JSON dict. host scales every timing (host-speed
    window); planted = {query: factor} multiplies specific queries on top;
    plan_drift = {query: rel} scales that query's shuffle bytes."""
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

    # 5. Legacy old artifact (no queries_min): single-run fallback with a
    #    doubled threshold still catches a 2.5x slowdown.
    legacy_old = mk_run(legacy=True)
    legacy_slow = mk_run(host=1.1)
    legacy_slow["queries"]["q904_big"] *= 2.5
    del legacy_slow["queries_min"]
    rc, out = run(legacy_old, legacy_slow)
    check("legacy fallback catches 2.5x", rc == 1 and "q904_big" in out, out)
    check("legacy fallback tagged LOW", "LOW confidence" in out, out)

    print("ALL PASS")


if __name__ == "__main__":
    main()
