#!/usr/bin/env python3
"""Per-query bench regression gate: diff two bench artifacts (the current
idle run vs the prior round's) and flag movers.

A mover is a query present in BOTH artifacts whose time changed by more
than RATIO x AND by more than ABS_S seconds — the double gate keeps
sub-second scheduling jitter out of the report while still catching a real
0.5 s -> 2 s plan regression. New/removed queries are listed separately
(they are not regressions, but the report must show them so a renamed
query can't silently drop out of comparison).

Usage: bench_diff.py <prior.json> <current.json> [--ratio 2.0] [--abs 1.0]
Exit code: 0 always (the gate REPORTS; BENCHNOTES adjudicates machine
envelope vs plan change — an rc gate would turn known machine noise into
spurious round failures). The output is markdown, intended to be committed
next to BENCHNOTES_r{N}.md.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    # failed queries record -1; exclude them from ratio math but surface them
    ok = {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}
    bad = sorted(k for k, v in qs.items() if not (isinstance(v, (int, float)) and v >= 0))
    return ok, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prior")
    ap.add_argument("current")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--abs", dest="abs_s", type=float, default=1.0)
    args = ap.parse_args()

    prior, prior_bad = load(args.prior)
    cur, cur_bad = load(args.current)

    common = sorted(set(prior) & set(cur))
    added = sorted(set(cur) - set(prior))
    removed = sorted(set(prior) - set(cur))

    movers = []
    for q in common:
        p, c = prior[q], cur[q]
        if p <= 0 or c <= 0:
            continue
        ratio = c / p
        delta = c - p
        if (ratio >= args.ratio or ratio <= 1.0 / args.ratio) and abs(delta) >= args.abs_s:
            movers.append((q, p, c, ratio, delta))
    movers.sort(key=lambda m: -abs(m[4]))

    tp = sum(prior[q] for q in common)
    tc = sum(cur[q] for q in common)

    print(f"# Bench diff: {args.prior} -> {args.current}")
    print()
    print(f"- common queries: {len(common)}; total {tp:.1f} s -> {tc:.1f} s "
          f"({tc / tp:.2f}x)" if tp > 0 else "- no common queries")
    print(f"- gate: ratio >= {args.ratio}x AND |delta| >= {args.abs_s} s")
    print(f"- added: {', '.join(added) if added else 'none'}")
    print(f"- removed: {', '.join(removed) if removed else 'none'}")
    if prior_bad or cur_bad:
        print(f"- errored (prior): {', '.join(prior_bad) or 'none'}; "
              f"errored (current): {', '.join(cur_bad) or 'none'}")
    print()
    if not movers:
        print("**No movers past the gate.**")
        return 0
    print(f"**{len(movers)} movers past the gate** (largest |delta| first):")
    print()
    print("| query | prior s | current s | ratio | delta s |")
    print("|---|---|---|---|---|")
    for q, p, c, r, d in movers:
        print(f"| {q} | {p:.3f} | {c:.3f} | {r:.2f}x | {d:+.3f} |")
    print()
    print("Adjudicate each mover in BENCHNOTES: plan change (name the commit)"
          " or machine envelope (show a solo re-run).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
