#!/usr/bin/env python3
"""Automated physical-plan audit over graft.Explain output.

Usage: SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Explain /tmp/plans"
       python3 tools/plan_audit.py /tmp/plans [--max-exchanges 8]

Per query: exchange count, join strategies and scan pushdown evidence.
FAILS (exit 1) on any CartesianProduct, or on a query whose exchange
count exceeds --max-exchanges — a regression tripwire for
accidentally-added shuffles. q54/q65 are exempt: their plans embed the
iterative component rounds, so the exchange count varies with
convergence, not with plan quality.
"""
import argparse
import glob
import os
import re
import sys

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("plans_dir")
    ap.add_argument("--max-exchanges", type=int, default=8)
    args = ap.parse_args()
    # Exempt from the per-query exchange cap: q54 is iterative
    # (bounded by component diameter), q65 composes four operators in
    # one DAG, q114 unions THREE independent audit pipelines (each
    # needs a parent-distinct + a count agg — ~4 exchanges per
    # relationship is the minimal shape, and relationships scale the
    # query linearly, not any single shuffle).
    # q140/q146 embed the same iterative component rounds as q54
    # (their exchange counts track convergence depth, not plan quality)
    exempt = {"q54_dedup_clusters", "q65_curation_pipeline",
              "q114_fk_audit", "q140_dedup_survivors",
              "q146_effective_tokens", "q149_cluster_sizes"}
    failures = []
    rows = []
    for path in sorted(glob.glob(os.path.join(args.plans_dir, "*.txt"))):
        name = os.path.basename(path)[:-4]
        text = open(path).read()
        # count plan NODES, not mentions: formatted plans list "(n) Node"
        nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", text, re.M)
        n_exch = sum(1 for n in nodes if n == "Exchange")
        joins = sorted(set(JOIN_RE.findall(text)))
        pushed = "PushedFilters: [" in text and \
            not re.search(r"PushedFilters: \[\]", text)
        flags = []
        if "CartesianProduct" in joins:
            flags.append("CARTESIAN")
            failures.append(name)
        if n_exch > args.max_exchanges and name not in exempt:
            flags.append(f"EXCHANGES>{args.max_exchanges}")
            failures.append(name)
        rows.append((name, n_exch, ",".join(joins) or "-",
                     "y" if pushed else "-", " ".join(flags)))
    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{'query':{w}}  exch  joins (pushdown) flags")
    for name, ne, joins, pushed, flags in rows:
        print(f"{name:{w}}  {ne:4d}  {joins} ({pushed}) {flags}")
    if failures:
        print(f"== plan audit FAILED: {sorted(set(failures))}")
        sys.exit(1)
    print(f"== {len(rows)} plans clean ==")


if __name__ == "__main__":
    main()
