#!/usr/bin/env python3
"""Cross-round bench comparison implementing the PLANS_r11 regression rule.

Usage: tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json [--threshold-pct 10]

Channels used, in order of authority:
  1. shuffle_bytes byte-identity  -> plan unchanged (any wall delta is host).
  2. queries_min (min of N reps)  -> host noise only ADDS time, so a min
     inflation beyond the threshold AT UNCHANGED shuffle_bytes is flagged
     as a REGRESSION candidate; plan-changed queries are listed separately
     (they need a PLANS entry, not a timing argument).
  3. Old artifacts without queries_min (rounds <= 10) fall back to the
     single-run "queries" channel with a doubled threshold and a LOW
     confidence tag.

Exit code 1 iff any REGRESSION row is emitted (CI-able)."""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            if '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no metric line in {p}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 10.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold-pct"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, new = load(args[0]), load(args[1])
    o_min = old.get("queries_min") or {}
    n_min = new.get("queries_min") or {}
    o_sb, n_sb = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    regressions, plan_changed, improved = [], [], []
    for q in common:
        sb_same = q in o_sb and q in n_sb and o_sb[q] == n_sb[q]
        if not sb_same:
            plan_changed.append((q, o_sb.get(q), n_sb.get(q)))
            continue
        if q in o_min and q in n_min:
            ov, nv, conf, t = o_min[q], n_min[q], "min-of-reps", thr
        else:
            ov, nv, conf, t = old["queries"][q], new["queries"][q], \
                "single-run (LOW confidence)", thr * 2
        if ov <= 0.05 and nv <= 0.05:
            continue  # sub-noise-floor timings carry no signal
        delta = (nv - ov) / max(ov, 1e-9) * 100
        if delta > t:
            regressions.append((q, ov, nv, delta, conf))
        elif delta < -t:
            improved.append((q, ov, nv, delta))

    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"plan_changed={len(plan_changed)} threshold={thr}%")
    for q, ov, nv, d, conf in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {q}: {ov:.3f}s -> {nv:.3f}s (+{d:.0f}%) "
              f"at identical shuffle_bytes [{conf}]")
    for q, a, b in plan_changed:
        print(f"PLAN-CHANGED {q}: shuffle_bytes {a} -> {b} "
              f"(needs a PLANS entry, not a timing argument)")
    for q, ov, nv, d in sorted(improved, key=lambda r: r[3])[:10]:
        print(f"improved {q}: {ov:.3f}s -> {nv:.3f}s ({d:.0f}%)")
    if added:
        print("added:", ",".join(added))
    if removed:
        print("removed:", ",".join(removed))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
