#!/usr/bin/env python3
"""Two-run stability analysis for the BASELINE.md noise-floor section
(VERDICT r5 "Next round" #3): given two back-to-back quiet full-inventory
BENCH_FULL-format JSONs at the SAME frozen inventory, print totals and the
per-query relative-spread distribution, flagging queries whose two medians
differ by more than the stated tolerances.

Usage: stability.py run1.json run2.json [committed.json]
"""
import json
import math
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main(p1, p2, pc=None):
    a, b = load(p1), load(p2)
    qa, qb = a["queries"], b["queries"]
    assert set(qa) == set(qb), "inventories differ"
    n = len(qa)
    print(f"inventory: {n} queries")
    print(f"totals: run1={a['value']:.2f}s run2={b['value']:.2f}s "
          f"ratio={max(a['value'], b['value'])/min(a['value'], b['value']):.3f}")
    rels = []
    for q in sorted(qa):
        lo, hi = sorted([qa[q], qb[q]])
        rel = (hi - lo) / lo if lo > 0 else 0.0
        rels.append((rel, q, qa[q], qb[q]))
    rels.sort(reverse=True)
    xs = sorted(r[0] for r in rels)
    def pct(p):
        return xs[min(n - 1, math.ceil(p / 100 * n) - 1)]
    print(f"per-query |run2-run1|/min spread: median={pct(50)*100:.1f}% "
          f"p90={pct(90)*100:.1f}% p99={pct(99)*100:.1f}% max={xs[-1]*100:.1f}%")
    print("worst 10:")
    for rel, q, va, vb in rels[:10]:
        print(f"  {q:28s} {va:6.2f}s vs {vb:6.2f}s  ({rel*100:5.1f}%)")
    if pc:
        c = load(pc)["queries"]
        common = sorted(set(c) & set(qa))
        worst = sorted(((max(qa[q], qb[q]) / c[q], q) for q in common
                        if c[q] > 0), reverse=True)
        over2 = [w for w in worst if w[0] > 2.0]
        print(f"vs committed ({len(common)} common): {len(over2)} queries >2x "
              f"committed median; worst 5:")
        for r, q in worst[:5]:
            print(f"  {q:28s} {r:.2f}x (committed {c[q]:.2f}s, "
                  f"runs {qa[q]:.2f}/{qb[q]:.2f}s)")


if __name__ == "__main__":
    main(*sys.argv[1:])
