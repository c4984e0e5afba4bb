#!/usr/bin/env python3
"""Quiet-run gate for the canonical bench artifact (r13 verdict #2).

BENCH_DETAIL.json is only trustworthy for cross-round adjudication when
the VM was quiet for the WHOLE run. Gate design is data-driven (r14
measured three same-code quiet runs plus the r13 contaminated one):

- GATE 1: median pre-vs-post drift < 20%, measured on the JIT-trivial
  calib_scalar pair when the artifact carries one (r16: the Spark
  calib workload never stops JIT-gliding - a fresh idle JVM ran its
  5-rep median 0.40 -> 0.19 s across 100 executions, so calib_wall
  drift conflates codegen warmup with machine speed and stamped three
  bit-repeatable 35-40% false reds the round the suite got lighter).
  Pre-r16 artifacts fall back to calib_wall drift. Bench measures
  each row as the MEDIAN OF 5 reps - single ~0.5 s shots carried
  +/-40% noise (a quiet fastest-ever run read 76% "drift" on
  one-shots while r13's contaminated run read 8%), so only the
  median form of this gate means anything.
- GATE 2: no non-intrinsic query holds >= 25% of the suite's CPU.
  This is the signature that actually identified r13's contamination:
  x43 absorbed 41% of suite CPU (490 s vs its 13 s quiet band) while
  both calib-wall rows looked calm. Quiet runs top out ~7% (x161).
- NOT gated: calib_cpu pre-vs-post. Post-suite calib_cpu sits ~9-13 s
  on quiet and contended VMs alike (r12 quiet [5.18, 9.71], r13
  contended [3.15, 9.89], r14 quiet [1.83, 8.39]) - it is the JVM's
  post-suite state, not the machine. The calib_cpu_postclear row
  quantifies how much of that the cached frames explain; reported
  for the record only.

Also warns (never fails) on ATTRIBUTION MOVERS (r16 verdict #5: the
x99 lesson - a memo-key change silently re-attributed 25.5 s of CPU to
a query no PERF.md section mentioned): any query whose CPU moved >3x
in either direction vs the prior committed canonical (git show
HEAD:BENCH_DETAIL.json, or --prev PATH) and whose name does not appear
in PERF.md (--perf PATH) is listed so the round's adjudication can't
skip it. CPU at 3x, not the verdict's literal 2x wall: the prior
canonical usually rode a DIFFERENT VM, and r17 measured 20 false
2x-wall movers (consecutive query ranges swinging 2-3x both ways with
in-run contention phases) vs exactly one CPU mover - an x95
memo-attribution shift, the precise class this check exists for. The
x99 case itself reads ~15x on CPU; 3x keeps that unmissable.

Usage: python3 tools/benchgate.py [BENCH_DETAIL.json] [--prev PATH]
                                  [--perf PERF.md]
Exit 0 = quiet (commit it); exit 1 = contended (re-bench first).
"""
import json
import subprocess
import sys

args = sys.argv[1:]
def opt(name, default):
    if name in args:
        i = args.index(name)
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit(f"usage: benchgate.py [BENCH_DETAIL.json] "
                     f"[--prev PREV.json] [--perf PERF.md] "
                     f"(flag {name} requires a value)")
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default
prev_path = opt("--prev", None)
perf_path = opt("--perf", "PERF.md")
path = args[0] if args else "BENCH_DETAIL.json"
d = json.load(open(path))


def cpu_of(v):
    return v.get("cpu", 0.0) if isinstance(v, dict) else 0.0


def current_round_section(perf_text):
    """Everything from the FIRST heading of the HIGHEST round number to
    the end — the only part of PERF.md that counts as THIS round's
    adjudication. Matching the whole file would permanently exempt
    every query any past round ever discussed (155 of 239 at r17 —
    including x99, the motivating case), so the guard could never fire
    twice (r17 review). Taking all max-round sections (not just the
    text after the LAST heading) keeps heading-line mentions
    ('## Round 17 (... x99 owned ...)') and the '## Round N,
    continued' pattern (r16) counting. A file with no round headings
    counts whole (fixtures, fresh repos)."""
    import re
    heads = [(m.start(), int(m.group(1)))
             for m in re.finditer(r"^## Round (\d+)", perf_text,
                                  re.MULTILINE)]
    if not heads:
        return perf_text
    max_n = max(n for _, n in heads)
    first = min(pos for pos, n in heads if n == max_n)
    return perf_text[first:]


def attribution_movers(prev_qs, cur_qs, perf_text,
                       ratio=3.0, floor=2.0):
    """Queries whose CPU moved >ratio x (either direction) vs the
    prior canonical, with at least one side >= floor CPU-seconds
    (both-tiny rows are pure noise), and whose name the CURRENT round
    section of PERF.md never mentions. Pure so the BenchSpec fixture
    pins the semantics."""
    import re
    section = current_round_section(perf_text)
    movers = []
    for q in sorted(set(prev_qs) & set(cur_qs)):
        pc, cc = cpu_of(prev_qs[q]), cpu_of(cur_qs[q])
        if max(pc, cc) < floor or pc <= 0:
            continue
        # "mentioned" = the full query name, or its xNN short form as
        # a whole word (the round prose writes both)
        short = q.split("_")[0]
        mentioned = q in section or \
            re.search(rf"\b{re.escape(short)}\b", section) is not None
        if (cc > ratio * pc or cc * ratio < pc) and not mentioned:
            movers.append((q, pc, cc))
    return movers

cw = d.get("calib_wall")
cc = d.get("calib_cpu")
if not cw or len(cw) != 2 or cw[0] <= 0:
    sys.exit(f"{path}: no usable calib_wall rows - re-bench with current graft.Bench")
cs = d.get("calib_scalar")
spark_drift = abs(cw[1] - cw[0]) / cw[0]
if cs and len(cs) == 2 and cs[0] > 0:
    drift_src, wall_drift = "calib_scalar", abs(cs[1] - cs[0]) / cs[0]
else:
    drift_src, wall_drift = "calib_wall", spark_drift
total = d.get("value")
if not isinstance(total, (int, float)):
    sys.exit(f"{path}: no numeric 'value' total - not a bench artifact "
             "(hand-composed/replayed line?); re-bench with current graft.Bench")
print(
    f"{path}: calib_wall {cw} scalar={cs} drift[{drift_src}]={wall_drift:.1%}; "
    f"calib_cpu {cc}; "
    f"postclear wall={d.get('calib_wall_postclear')} "
    f"cpu={d.get('calib_cpu_postclear')}; "
    f"total={total:.1f}s cpu_s={d.get('cpu_s')}"
)
failures = []
if wall_drift >= 0.20:
    failures.append(
        f"median {drift_src} drifted {wall_drift:.1%} (gate <20%): the "
        "machine-speed scale moved mid-run"
    )
# secondary bound, mirroring Bench.gateVerdict (r16 advice): even when
# the scalar pair is flat, a >=50% Spark calib_wall swing flags IO /
# memory-bandwidth contamination the register-only scalar loop can't
# see (drift under 50% stays un-gated - that band is JIT-glide noise,
# the r16 false-red class)
if drift_src == "calib_scalar" and spark_drift >= 0.50:
    failures.append(
        f"calib_wall drifted {spark_drift:.1%} (secondary gate <50%) while "
        "calib_scalar stayed flat: IO/memory-bandwidth contamination the "
        "scalar loop is blind to"
    )

qs = d.get("queries", {})
cpu_total = d.get("cpu_s") or sum(v.get("cpu", 0.0) for v in qs.values())
if cpu_total > 0 and qs:
    def intrinsic(v):
        return v.get("intrinsic_low_par") or v.get("intrinsic_stream") \
            or v.get("intrinsic_rounds")
    shares = {k: v.get("cpu", 0.0) / cpu_total
              for k, v in qs.items() if not intrinsic(v)} or {"(none)": 0.0}
    top, share = max(shares.items(), key=lambda kv: kv[1])
    print(f"top non-intrinsic CPU share: {top} at {share:.1%} of {cpu_total:.0f}s")
    if share >= 0.25:
        failures.append(
            f"{top} holds {share:.1%} of suite CPU (gate <25%) - the r13 "
            "contamination signature (x43 hit 41% on the contended VM)"
        )

# --- attribution movers (warning only, never a gate failure) ---
prev = None
if prev_path:
    try:
        prev = json.load(open(prev_path))
    except Exception as e:
        print(f"note: --prev {prev_path} unreadable ({e}); mover check skipped")
else:
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, timeout=30)
        if out.returncode == 0:
            prev = json.loads(out.stdout)
    except Exception:
        pass
if prev and prev.get("queries"):
    try:
        perf_text = open(perf_path).read()
    except Exception:
        perf_text = ""
    movers = attribution_movers(prev["queries"], qs, perf_text)
    for q, pc, cc in movers:
        print(f"ATTRIBUTION WARNING: {q} cpu {pc:.2f} -> {cc:.2f} s "
              f"({cc / pc:.1f}x) vs prior canonical and {perf_path} never "
              "mentions it - adjudicate (controlbench row + PERF.md entry) "
              "or own the shift by name before committing")
    if not movers:
        print("attribution: no un-adjudicated >3x CPU movers vs prior canonical")
elif prev is None and not prev_path:
    print("note: no prior canonical readable (git show HEAD:BENCH_DETAIL.json)"
          " - mover check skipped")

stamped = d.get("benchgate_pass")
if stamped is not None and stamped != (not failures):
    print(f"note: in-artifact benchgate_pass={stamped} disagrees with this "
          "gate run - artifact predates a gate change, or was hand-edited")
if failures:
    sys.exit("CONTENDED: " + "; ".join(failures) + ". Re-bench in a quiet "
             "window before committing this artifact as canonical.")
print("QUIET: calibration + CPU-share gates pass - OK to commit as canonical")
