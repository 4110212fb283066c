#!/usr/bin/env python3
"""Analyze scale_probe.sh output: per query, the sf0.1 and sf1 medians,
the 10x time ratio, and the implied scaling exponent log10(t1/t0.1)
(1.0 = linear in data size, 2.0 = quadratic; <1 means fixed overhead
still dominates at sf1). Emits the BASELINE.md markdown table.

Usage: scale_probe.py probe_sf0.1.txt probe_sf1.txt
"""
import math
import sys


def load(path):
    out = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 3 and parts[0] == "GRAFT_TIME":
            out[parts[1]] = float(parts[2])
    return out


def main(p01, p1):
    a, b = load(p01), load(p1)
    print("| query | sf0.1 s | sf1 s | ratio (10x data) | exponent |")
    print("|---|---|---|---|---|")
    for q in sorted(set(a) & set(b)):
        r = b[q] / a[q] if a[q] > 0 else float("inf")
        e = math.log10(r) if r > 0 else 0.0
        print(f"| {q} | {a[q]:.2f} | {b[q]:.2f} | {r:.1f}x | {e:.2f} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
