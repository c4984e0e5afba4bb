#!/usr/bin/env bash
# Same-VM control run for cross-round bench comparisons — codifies the
# procedure judges kept re-inventing (CLAUDE.md "cross-round bench
# totals are MACHINE-relative"): check out a prior commit in a
# worktree, bench it on THIS machine, and print the per-query wall
# ratio table vs HEAD's BENCH_DETAIL.json plus the calibration rows.
#
# Usage: tools/controlbench.sh <commit> [sfDir]
#
# NEVER run concurrently with another sbt/compile on this VM — CPU
# steal inflates the control walls invisibly (the r6 x45 lesson).
set -euo pipefail

commit="${1:?usage: tools/controlbench.sh <commit> [sfDir]}"
sfdir="${2:-/root/testdata/sf0.1}"
repo="$(cd "$(dirname "$0")/.." && pwd)"
# key the worktree on the RESOLVED sha, not the raw argument: a moving
# ref ("main", HEAD~1) would silently reuse a stale checkout from a
# prior invocation and bench the wrong baseline
sha="$(git -C "$repo" rev-parse --verify "${commit}^{commit}")"
wt="/tmp/graft_control_${sha:0:12}"
out="/tmp/graft_control_bench_${sha:0:12}.json"

if [ ! -d "$wt" ]; then
  git -C "$repo" worktree add "$wt" "$sha"
fi
# The ratio table is only meaningful when HEAD's BENCH_DETAIL.json was
# benched on THIS VM this session — the Python block below warns when
# the artifact's mtime predates this VM's boot (the reliable signal;
# the old "unmodified in git" heuristic fired spuriously on the
# round-close flow where a fresh same-VM bench is committed before
# adjudication, training readers to ignore it — r13 advice).
(cd "$wt" && SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$out" \
  sbt -batch "runMain graft.Bench" >/dev/null)

python3 - "$repo/BENCH_DETAIL.json" "$out" <<'EOF'
import json, statistics, sys

head = json.load(open(sys.argv[1]))
ctrl = json.load(open(sys.argv[2]))

def walls(d):
    return {k: (v["wall"] if isinstance(v, dict) else v)
            for k, v in d["queries"].items()}

import os, time
# staleness guard (r12 advice): the head artifact must have been
# benched on THIS VM. "older than the control run" is always true
# (this script just created the control output), so compare against
# the VM's boot time instead — an artifact predating boot was
# necessarily written on another machine.
try:
    boot = time.time() - float(open("/proc/uptime").read().split()[0])
    age = boot - os.path.getmtime(sys.argv[1])
    if age > 0:
        print(f"WARNING: {sys.argv[1]} predates this VM's boot by "
              f"{age/60:.0f} min - it was benched on another machine, so the "
              "ratios below compare machines, not code. Re-bench HEAD here "
              "first.", file=sys.stderr)
except OSError:
    pass
hw, cw = walls(head), walls(ctrl)
common = sorted(set(hw) & set(cw), key=lambda k: -hw[k])
ratios = {k: hw[k] / cw[k] for k in common if cw[k] > 0}
if not ratios:
    # guard (r12 advice): no shared query names / all-zero control
    # walls would StatisticsError AFTER the expensive control bench ran
    print("no comparable queries between head and control "
          f"({len(hw)} head vs {len(cw)} control names, "
          f"{len(common)} shared) - check both artifacts", file=sys.stderr)
    sys.exit(1)
print(f"{'query':<40}{'head_wall':>10}{'ctrl_wall':>10}{'ratio':>8}")
for k in common[:30]:
    r = ratios.get(k, float("nan"))
    print(f"{k:<40}{hw[k]:>10.2f}{cw[k]:>10.2f}{r:>8.2f}")
med = statistics.median(ratios.values())
print(f"\nmedian head/control wall ratio over {len(ratios)} shared queries: {med:.3f}")
print(f"head total {head['value']:.1f}s ({len(hw)} queries) vs "
      f"control total {ctrl['value']:.1f}s ({len(cw)} queries) on this VM")
for d, n in ((head, "head"), (ctrl, "control")):
    if "calib_wall" in d:
        print(f"{n}: calib_wall={d['calib_wall']} calib_cpu={d.get('calib_cpu')}")
print("a per-query ratio tracking the calib_wall ratio on identical code "
      "means VM speed, not a regression")
EOF

echo "worktree kept at $wt — remove with: git -C $repo worktree remove $wt"
