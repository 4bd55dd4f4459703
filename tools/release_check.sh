#!/usr/bin/env bash
# End-of-round artifact ritual (VERDICT r6 task 1): regenerate the
# full-catalog oracle artifact at the FINAL query-touching commit, in
# BOTH the tuned engine session and a plain driver-default session, with
# the git SHA stamped inside (check_oracle.py --json records git_sha +
# git_dirty). Refuses to run on a dirty tree so the artifact can never
# misreport the committed code again.
#
#   tools/release_check.sh <round>     # writes ORACLE_FULL_r<round>.json
#
# The tuned run is the artifact; the plain run must also be 0-failure
# (driver conditions) and is written alongside as *_plain.json.
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:?usage: tools/release_check.sh <round>}"
sf_dir="${SPARK_GRAFT_SF_DIR_ORACLE:-/root/testdata/sf0.01}"

# -uno: only TRACKED modifications make the artifact describe code that
# differs from HEAD; untracked files (e.g. this ritual's own first
# artifact, present when re-running) cannot. PROGRESS.jsonl is driver
# telemetry appended every ~15 min — it can't change the code either,
# and gating on it would make the ritual racy against the driver.
# exact root path (porcelain is `XY <path>`): a suffix grep would also
# excuse subdir/PROGRESS.jsonl or MYPROGRESS.jsonl
if [[ -n "$(git status --porcelain --untracked-files=no | grep -vE '^.. PROGRESS\.jsonl$' || true)" ]]; then
    echo "refusing: working tree is dirty — commit first so the artifact" >&2
    echo "describes exactly one SHA (git_sha is stamped into the JSON)" >&2
    exit 1
fi

# Artifacts are written to a temp dir and moved into the tree only
# after BOTH sweeps finish: when a previous round's artifact is already
# committed, writing the tuned JSON in place modifies a TRACKED file
# and the plain sweep then truthfully-but-uselessly stamps
# git_dirty=true about the ritual's own first output.
tmpdir="$(mktemp -d)"
trap 'rm -rf "$tmpdir"' EXIT

# Sweeps log to files so a check_oracle.py CRASH fails here with its own
# tail, instead of being swallowed by a progress-filter grep and dying
# later at the mv with a confusing "No such file". The grep is a
# progress-noise reducer only ("|| true": no matching line is fine);
# the authoritative pass/fail gate is the JSON assertion block below.
run_sweep() { # <label> <logfile> <check_oracle args...>
    local label="$1" logf="$2"; shift 2
    echo "== ${label} sweep at ${sf_dir} (HEAD $(git rev-parse --short HEAD)) =="
    if ! python tools/check_oracle.py "$@" > "$logf" 2>&1; then
        echo "${label} sweep FAILED (check_oracle.py exit != 0); last lines:" >&2
        tail -25 "$logf" >&2
        exit 1
    fi
    grep -E "^(PASS|FAIL|ok|[0-9]+ failures|wrote)" "$logf" || true
}

run_sweep "tuned session" "$tmpdir/tuned.log" \
    --json "$tmpdir/ORACLE_FULL_r${round}.json" "$sf_dir"
run_sweep "plain driver-default session" "$tmpdir/plain.log" \
    --json "$tmpdir/ORACLE_FULL_r${round}_plain.json" --plain "$sf_dir"

mv "$tmpdir/ORACLE_FULL_r${round}.json" "$tmpdir/ORACLE_FULL_r${round}_plain.json" .

python - "$round" <<'EOF'
import json, sys
r = sys.argv[1]
for suffix in ("", "_plain"):
    p = f"ORACLE_FULL_r{r}{suffix}.json"
    d = json.load(open(p))
    assert d["failures"] == 0, f"{p}: {d['failures']} failures — do not ship"
    # git_sha may be null if check_oracle's git subprocess failed
    sha = (d.get("git_sha") or "unknown")[:10]
    print(f"{p}: {d['pass']}/{d['checked']} pass, git_sha={sha}, dirty={d.get('git_dirty')}")
EOF
