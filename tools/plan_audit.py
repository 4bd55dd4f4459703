"""Dump a plan-fact table for the headline queries: per query, the
operator counts that the scale claims rest on (exchanges, broadcast vs
sort-merge joins, generates, cartesians, global windows) plus pushed
filters on the scans. Writes PLANS.md so the claims in docstrings /
COVERAGE.md are re-derivable from one command:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # single source of the headline list


def plan_facts(plan: str) -> dict[str, object]:
    # formatted plans print each node in the tree AND the detail section;
    # counting the tree lines (leading "N) ") avoids double counting
    tree = [ln for ln in plan.splitlines() if re.match(r"^\s*[*+:\-| ]*\(\d+\)", ln)]
    tree_s = "\n".join(tree)
    return {
        "exchanges": tree_s.count("Exchange"),
        "bhj": tree_s.count("BroadcastHashJoin"),
        "smj": tree_s.count("SortMergeJoin"),
        "generate": tree_s.count("Generate"),
        "cartesian": tree_s.count("CartesianProduct")
        + tree_s.count("BroadcastNestedLoopJoin"),
        "window": tree_s.count("Window"),
        # unpartitioned spec: the FIRST element inside windowspecdefinition
        # is already an ORDERING column (col ASC/DESC) — a partitioned spec
        # lists bare partition columns first
        "global_window": len(
            re.findall(r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)", plan)
        ),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    rows = []
    for name in HEADLINE:
        df = catalog.REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        rows.append((name, plan_facts(buf.getvalue())))

    out = [
        "# PLANS — headline-query plan facts (auto-generated)",
        "",
        f"`python tools/plan_audit.py {sf_dir}` — operator counts from",
        "`explain('formatted')` tree sections. `global_window` counts",
        "windowspecdefinitions whose FIRST element is an ordering column",
        "(i.e. unpartitioned) — the scale-killer this engine avoids; a",
        "nonzero value here is either the documented tiny-relation",
        "bucket-totals window (q119/q137/q141 two-level prefix sums, q89's",
        "32-row rank) or a regression.",
        "",
        "q219/q220 audit as all-zero by construction: their training loops",
        "run per-iteration plans inside unigram_train / fs_em_train (the",
        "q206/q212 DP shapes and one pair-sized aggregate per EM round)",
        "and the returned trajectories are 3-row local relations.",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | explodes | cartesian | windows | unpartitioned specs | scans w/ pushed filters |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, f in rows:
        out.append(
            f"| {name} | {f['exchanges']} | {f['bhj']} | {f['smj']} | "
            f"{f['generate']} | {f['cartesian']} | {f['window']} | "
            f"{f['global_window']} | {f['pushed']} |"
        )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
