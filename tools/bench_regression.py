#!/usr/bin/env python3
"""Per-query bench regression gate between two rounds.

Usage: python3 tools/bench_regression.py <prev_bench.json> <new_bench.json>
       [--threshold 1.5] [--min-seconds 2.0]

Reads the driver's BENCH_r{N}.json files (either the raw one-line
{"metric":...,"queries":{...}} shape or the driver wrapper whose `tail`
embeds that line), compares per-query seconds, and fails (exit 1) when
any query regressed more than --threshold x. Queries faster than
--min-seconds in BOTH rounds are ignored: below ~2s the scheduler
noise on a shared box (measured at +-0.5s between sweeps) exceeds any
plan change — single-shot sweep timings of sub-second queries produce
false regressions (q44/q45 measured 1.5-1.9x "regressed" in one sweep,
then 0.8s/0.5s warm — identical to baseline — under BenchOne reps).
"""
import argparse
import json
import re
import sys


def load_queries(path):
    with open(path) as fh:
        text = fh.read().strip()
    # tolerate sbt's "[info] " line prefix on raw bench output
    doc = json.loads(text[text.index("{"):])
    if "queries" in doc:
        return {k: float(v) for k, v in doc["queries"].items()}
    # driver wrapper: the bench line lives (possibly head-truncated)
    # inside `tail` — recover just the queries object
    tail = doc.get("tail", "")
    m = re.search(r'"queries":(\{[^{}]*\})', tail)
    if m:
        return {k: float(v) for k, v in json.loads(m.group(1)).items()}
    # the driver head-truncates `tail`, which can cut the line before
    # (or inside) the queries object — recover whatever per-query pairs
    # survive; a partial baseline still gates every query it names
    matches = list(re.finditer(r'"(q\d+[a-z0-9_]*)":([0-9.]+)', tail))
    # the final pair can itself be cut mid-digits at the truncation
    # point ("3.14159" -> "3.1"): if the last match runs to the very
    # end of the tail, its number is unreliable — drop it rather than
    # gate that query against a silently-wrong baseline
    if matches and matches[-1].end() == len(tail):
        matches.pop()
    if not matches:
        raise SystemExit(f"no bench line found in {path}")
    print(f"note: {path}: truncated tail, {len(matches)} queries recovered")
    return {m.group(1): float(m.group(2)) for m in matches}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-seconds", type=float, default=2.0)
    args = ap.parse_args()

    # Bench emits short qNN keys for the driver's 2000-char tail capture
    # (full names live in bench_full.json); older rounds used full names.
    # Normalize both sides to the qNN prefix so rounds stay comparable.
    def norm(queries):
        return {k.split("_", 1)[0]: v for k, v in queries.items()}

    prev, new = norm(load_queries(args.prev)), norm(load_queries(args.new))
    regressions = []
    for q in sorted(new):
        if q not in prev:
            print(f"NEW  {q}: {new[q]:.2f}s (no baseline)")
            continue
        if prev[q] < args.min_seconds and new[q] < args.min_seconds:
            continue
        ratio = new[q] / prev[q] if prev[q] > 0 else float("inf")
        flag = "REGRESSED" if ratio > args.threshold else "ok"
        print(f"{flag:9s} {q}: {prev[q]:.2f}s -> {new[q]:.2f}s ({ratio:.2f}x)")
        if ratio > args.threshold:
            regressions.append(q)
    tp, tn = sum(prev.values()), sum(new.values())
    print(f"total: {tp:.1f}s -> {tn:.1f}s ({tn / tp:.2f}x)")
    if regressions:
        print(f"== {len(regressions)} regression(s): {', '.join(regressions)}")
        sys.exit(1)
    print("== no regressions ==")


if __name__ == "__main__":
    main()
