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
wt="/tmp/graft_control_${commit}"
out="/tmp/graft_control_bench_${commit}.json"

if [ ! -d "$wt" ]; then
  git -C "$repo" worktree add "$wt" "$commit"
fi
(cd "$wt" && SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$out" \
  sbt -batch "runMain graft.Bench" >/dev/null)

python3 - "$repo/BENCH_DETAIL.json" "$out" <<'EOF'
import json, statistics, sys

head = json.load(open(sys.argv[1]))
ctrl = json.load(open(sys.argv[2]))

def walls(d):
    return {k: (v["wall"] if isinstance(v, dict) else v)
            for k, v in d["queries"].items()}

hw, cw = walls(head), walls(ctrl)
common = sorted(set(hw) & set(cw), key=lambda k: -hw[k])
ratios = {k: hw[k] / cw[k] for k in common if cw[k] > 0}
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
