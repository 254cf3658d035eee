#!/usr/bin/env python3
"""Diff two bench_queries.json artifacts (wall/cpu per query, totals).

Usage: bench_diff.py BEFORE.json AFTER.json [N]
Prints totals and the N biggest wall deltas both ways (default 20).
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def pct(new, old):
    return f"({(new - old) / old * 100:+.1f}%)" if old else "(n/a)"


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    wa = sum(qa[k][0] for k in common)
    wb = sum(qb[k][0] for k in common)
    ca = sum(qa[k][1] for k in common)
    cb = sum(qb[k][1] for k in common)
    print(f"queries: {len(common)} common "
          f"(+{len(set(qb)-set(qa))} new, -{len(set(qa)-set(qb))} gone)")
    print(f"wall: {wa:8.1f} -> {wb:8.1f}  {pct(wb, wa)}")
    print(f"cpu:  {ca:8.1f} -> {cb:8.1f}  {pct(cb, ca)}")
    print(f"load@end: {a.get('load_avg')} -> {b.get('load_avg')}")
    deltas = sorted(common, key=lambda k: qb[k][0] - qa[k][0])
    # head+tail only when they don't overlap; otherwise each row once
    shown = deltas if len(deltas) <= 2 * n else None

    def row(k):
        print(f"{k:34s} {qa[k][0]:5.2f}->{qb[k][0]:5.2f} "
              f"{qa[k][1]:5.1f}->{qb[k][1]:5.1f}")

    print(f"\n{'query':34s} {'wall':>13s} {'cpu':>13s}")
    if shown is not None:
        for k in shown:
            row(k)
    else:
        for k in deltas[:n]:
            row(k)
        print("  ...")
        for k in deltas[-n:]:
            row(k)


if __name__ == "__main__":
    main()
