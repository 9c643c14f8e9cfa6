#!/usr/bin/env python3
"""Compare two Bench JSON lines per query (driver-side tooling only).

Usage: python3 tools/bench_compare.py a.json b.json [tol]
Prints queries whose |a-b| exceeds tol (default 0.15) of min(a,b), with an
absolute floor of 0.25 s (sub-second queries jitter by scheduling quanta,
not by plan regressions).
"""
import json
import sys


def main(pa: str, pb: str, tol: float = 0.15) -> int:
    a = json.load(open(pa))["queries"]
    b = json.load(open(pb))["queries"]
    bad = 0
    for q in sorted(set(a) | set(b)):
        va, vb = a.get(q, -1), b.get(q, -1)
        if va < 0 or vb < 0:
            print(f"MISSING {q}: {va} vs {vb}")
            bad += 1
            continue
        diff = abs(va - vb)
        if diff > tol * min(va, vb) and diff > 0.25:
            print(f"DRIFT {q}: {va:.2f} vs {vb:.2f} ({diff / min(va, vb):+.0%})")
            bad += 1
    ta = sum(v for v in a.values() if v >= 0)
    tb = sum(v for v in b.values() if v >= 0)
    print(f"totals: {ta:.1f} vs {tb:.1f} s; {bad} queries outside tolerance")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    sys.exit(main(sys.argv[1], sys.argv[2], tol))
