#!/usr/bin/env python3
"""Compare two bench_detail.json runs at different scale factors and
report per-gate scaling exponents: e = log(t_big / t_small) / log(ratio).

e ~ 1.0 is linear, < 1 sub-linear (fixed overhead amortizing), > 1
super-linear — anything > the threshold that is not on the documented
slow-by-design list gets flagged for a plan audit.

Usage: scale_compare.py <small.json> <big.json> [ratio=10] [flag=1.15]

Timings under min_t seconds in the SMALL run are skipped for exponent
math (scheduling overhead dominates; exponents from 0.2 s bases are
noise) but still counted in the totals.
"""
import json
import math
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    flag = float(sys.argv[4]) if len(sys.argv) > 4 else 1.15
    min_t = 0.5
    qs_s, qs_b = small["queries"], big["queries"]
    # prefer warm (min-of-3) numbers where both runs have them
    warm_s, warm_b = small.get("warm", {}), big.get("warm", {})
    common = sorted(set(qs_s) & set(qs_b))
    rows = []
    for q in common:
        ts = warm_s.get(q, qs_s[q])
        tb = warm_b.get(q, qs_b[q])
        if ts <= 0 or tb <= 0:
            rows.append((q, ts, tb, None, "FAILED" if (ts < 0 or tb < 0) else ""))
            continue
        if ts < min_t:
            rows.append((q, ts, tb, None, "base<%.1fs" % min_t))
            continue
        e = math.log(tb / ts) / math.log(ratio)
        rows.append((q, ts, tb, e, ""))
    rows_e = [r for r in rows if r[3] is not None]
    rows_e.sort(key=lambda r: -r[3])
    print(f"{len(common)} common gates; exponent computed for {len(rows_e)} "
          f"(base >= {min_t}s), ratio {ratio}x")
    print(f"{'gate':34s} {'t_small':>8s} {'t_big':>8s} {'exp':>6s}")
    for q, ts, tb, e, note in rows_e:
        mark = "  <-- FLAG" if e > flag else ""
        print(f"{q:34s} {ts:8.2f} {tb:8.2f} {e:6.2f}{mark}")
    failed = [(q, ts, tb) for q, ts, tb, e, note in rows if note == "FAILED"]
    if failed:
        print("\nFAILED at one scale:")
        for q, ts, tb in failed:
            print(f"  {q}: small={ts} big={tb}")
    t_s = sum(v for v in qs_s.values() if v > 0)
    t_b = sum(v for v in qs_b.values() if v > 0)
    print(f"\ntotals: small {t_s:.1f}s, big {t_b:.1f}s, "
          f"overall exponent {math.log(t_b / t_s) / math.log(ratio):.2f}")


if __name__ == "__main__":
    main()
