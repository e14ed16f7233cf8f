#!/usr/bin/env python3
"""Scale-ladder report: join two or three bench.py JSON outputs into the
per-query scaling table recorded in SCALE.md.

Usage: python examples/scale_ladder_report.py small.json big.json [factor]
Prints a markdown table of per-query seconds + ratio, sorted by ratio
descending, and flags queries whose time grew faster than the data
(ratio > factor, default 10) — the super-linearity alarm.
"""

from __future__ import annotations

import json
import sys


def main():
    small, big = (json.load(open(p)) for p in sys.argv[1:3])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in qb:
        if name not in qs:
            continue
        a, b = qs[name], qb[name]
        rows.append((name, a, b, (b / a) if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf{small['sf']} s | sf{big['sf']} s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        flag = " ⚠" if r > factor else ""
        print(f"| {name} | {a:.3f} | {b:.3f} | {r:.2f}×{flag} |")
    tot_a = sum(qs[n] for n, *_ in [(r[0],) for r in rows])
    tot_b = sum(qb[n] for n, *_ in [(r[0],) for r in rows])
    sup = [r[0] for r in rows if r[3] > factor]
    print(f"\ntotal: {tot_a:.1f}s -> {tot_b:.1f}s ({tot_b / tot_a:.2f}x) "
          f"on {len(rows)} shared queries; data factor {factor:g}; "
          f"super-linear: {sup if sup else 'none'}")


if __name__ == "__main__":
    main()
