#!/usr/bin/env bash
# One-shot end-of-round gate runner — the full evidence ritual in the
# right order, failing fast at the first red gate:
#
#   tools/round_gates.sh <round>
#
# 1. full pytest suite (correctness + plan locks + stream≡batch)
# 2. gated K=10 scale probe -> SCALE_r<N>.json (nonzero exit on any
#    per-query growth-budget violation)
# 3. release_check (tuned + plain full-oracle sweeps at a CLEAN HEAD,
#    git_sha-stamped artifacts)
# 4. gated K=10 pipeline probe -> PIPELINE_SCALE_r<N>.json (the COMPOSED
#    curate() funnel + governance + shard export, per-stage attribution)
#
# Steps 2-4 write round artifacts into the tree; COMMIT them afterwards
# (release_check refuses to even start on a tree with tracked changes,
# so run this only after the round's code is committed).
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:?usage: tools/round_gates.sh <round>}"

# regenerate the mechanical catalog index FIRST (it must reflect the
# round's final registry and be committed with the round's code, so the
# clean-tree release check below sees it in place)
echo "== pre-gate: regenerate CATALOG.md =="
python tools/catalog_index.py

echo "== gate 1/4: pytest (FULL tier — slow markers included) =="
SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q

# release check runs BEFORE the scale probe: both stamp the same HEAD,
# but the probe OVERWRITES SCALE_r<N>.json — if that file is already
# tracked (re-running the ritual later in a round), the overwrite
# dirties the tree and release_check would refuse to start.
echo "== gate 2/4: full-oracle release check =="
bash tools/release_check.sh "$round"

echo "== gate 3/4: scale probe (K=10, budget-gated) =="
python tools/scale_probe.py 10 --out "SCALE_r${round}.json"

echo "== gate 4/4: pipeline probe (K=10, budget-gated) =="
python tools/pipeline_probe.py 10 --out "PIPELINE_SCALE_r${round}.json"

# advisory (not a gate): the full per-query bench artifact at this HEAD
# — the r14 discipline; compare rounds with tools/bench_diff.py. Raw
# core_total is the primary cross-round signal (the calibration probe
# under-tracks workload drift on noisy hosts — COVERAGE r14).
echo "== post-gate: full bench artifact =="
SPARK_GRAFT_BENCH_OUT="BENCH_FULL_r${round}.json" python bench.py

echo "ALL GATES GREEN — commit SCALE_r${round}.json, PIPELINE_SCALE_r${round}.json, ORACLE_FULL_r${round}*.json and BENCH_FULL_r${round}.json"
