#!/usr/bin/env python3
"""Promote docs/bench_full.json to docs/bench_locked.json — the lock
gate, made executable (round 16).

A LOCK is the artifact future rounds gate against, so promoting a
low-trust run poisons every later comparison (the r15 incident: a
fastest-window min-probe shrank all allowances and manufactured 26
flags on unchanged code). This script refuses to lock unless the run
self-reports a qualified window:

  - artifact_ok            (tainted <= 25%, no tainted-only, no errors)
  - window_ok              (clean-probe spread <= 1.5x: the minima
                            describe the run, not just its fastest
                            window)
  - every flag has a floor (no unfloored inflated min may become a
                            next-round anchor — the q132 ratchet mode)

It also prints the two-verdict table for each flag (sev_clamped fired
the gate; sev_unclamped rescales by the raw probe ratio) so window-vs-
code is readable from the artifact alone.

Usage: python3 tools/lock.py [--force] [--src docs/bench_full.json]
"""
import json
import shutil
import sys

src = "docs/bench_full.json"
dst = "docs/bench_locked.json"
force = "--force" in sys.argv
if "--src" in sys.argv:
    src = sys.argv[sys.argv.index("--src") + 1]

with open(src) as f:
    a = json.load(f)

problems = []
if a.get("partial", False):
    problems.append("partial=true (crash-flushed artifact — the run never "
                    "completed its measurement protocol)")
degraded = a.get("degraded", [])
if degraded:
    problems.append(f"budget-degraded run: {', '.join(degraded)} "
                    "(re-run with SPARK_GRAFT_DEADLINE_SEC=0 for a lock)")
if not a.get("artifact_ok", False):
    problems.append(
        f"artifact_ok=false (tainted {a.get('tainted_pct')}%, "
        f"tainted_only {a.get('tainted_only')}, errors "
        f"{list(a.get('errors', {}))})")
if not a.get("window_ok", False):
    # r17: per-query min-window provenance supersedes the global
    # spread. The spread refuses a run when ANY clean probe strayed
    # past 1.5x — even when every published minimum was measured in a
    # fast window (the +0.25 s absolute stall guard keeps 1.5-2.8x
    # windows "clean" on a ~0.15 s baseline, so one slow stretch
    # anywhere in a 45-minute run blows the max). What the lock
    # actually needs is that THE SAMPLES BEING LOCKED ran at baseline
    # speed: minima_window_ok certifies each query's published minimum
    # was measured in a <=1.3x-of-baseline window (or in a forked
    # floor, the stronger standalone protocol). Accept on that
    # per-sample evidence; refuse when it is absent or incomplete.
    if a.get("minima_window_ok", False):
        mw = [r for r in a.get("min_windows", {}).values() if r >= 0]
        print(f"window_ok=false (spread {a.get('probe_spread')}x) but "
              f"minima provenance OK: {len(mw)} suite minima all in "
              f"<=1.3x windows (max {max(mw):.3f}x)"
              if mw else "minima provenance OK (all floors)")
    else:
        problems.append(
            f"window_ok=false (clean-probe spread {a.get('probe_spread')}x"
            f" > 1.5x) and minima_window_ok=false — neither the run nor "
            f"the locked samples have fast-window provenance")
flags = a.get("regressed_vs_prev", {})
unfloored = [n for n, v in flags.items() if v.get("floor_mode") == "none"]
if unfloored:
    problems.append(
        f"{len(unfloored)} flags without floor provenance: "
        f"{', '.join(unfloored)} (re-run with SPARK_GRAFT_MAX_FLOORS "
        f">= {len(flags)})")

if flags:
    # r17: two display fixes learned from the round-17 refusal.
    # (1) A floor measured in a SLOW window can come back above the
    #     suite min; reading floor_sev alone then overstates (q82: floor
    #     5.2x vs suite 1.9x on byte-identical code). The verdict takes
    #     the BEST (lowest) available unclamped severity — both are
    #     clean measurements of the same code.
    # (2) On an oscillating window (window_ok=false) the min-probe
    #     describes only the fastest segment; the representative host
    #     unit is probe_p50. sev_p50 rescales the best severity by
    #     probe_baseline/probe_p50 — the r16-verdict reading, made
    #     executable. The verdict column reads sev_p50; the raw columns
    #     stay for cross-checking.
    # p50 rescaling applies ONLY to oscillating windows: on a clean
    # window pb ~= p50 and rescaling would soften real regressions
    pb = a.get("probe_baseline")
    p50 = a.get("probe_p50") or pb
    p50_scale = (pb / p50) if (not a.get("window_ok", False) and
                               isinstance(pb, (int, float)) and
                               isinstance(p50, (int, float)) and p50 > 0) else 1.0
    print(f"{len(flags)} flags (two-verdict table; "
          f"p50 unit = min-probe x {1 / p50_scale:.2f}):")
    print(f"{'query':36} {'prior':>7} {'min':>7} {'floor':>7} "
          f"{'sev_cl':>7} {'sev_un':>7} {'sev_p50':>7} verdict")
    def fmt(x):
        return f"{x:7.3f}" if isinstance(x, (int, float)) else f"{'-':>7}"
    for n, v in sorted(flags.items()):
        sev_cl = v.get("floor_sev_clamped", v.get("sev_clamped"))
        candidates = [s for s in (v.get("sev_unclamped"),
                                  v.get("floor_sev_unclamped"))
                      if isinstance(s, (int, float))]
        sev_un = min(candidates) if candidates else None
        sev_p50 = sev_un * p50_scale if sev_un is not None else None
        verdict = ("window" if isinstance(sev_p50, (int, float))
                   and sev_p50 <= 1.3 else
                   "CODE?" if isinstance(sev_p50, (int, float)) else
                   "pre-r16 artifact: no two-verdict fields")
        print(f"{n:36} {fmt(v.get('prev'))} {fmt(v.get('suite_min'))} "
              f"{fmt(v.get('floor'))} {fmt(sev_cl)} {fmt(sev_un)} "
              f"{fmt(sev_p50)} {verdict}")

if problems and not force:
    print("\nREFUSING to lock:")
    for p in problems:
        print(f"  - {p}")
    print("(--force overrides; do NOT force a low-trust window)")
    sys.exit(1)

shutil.copyfile(src, dst)
q = a.get("queries", {})
print(f"\nLOCKED {dst}: {len(q)} queries, "
      f"{sum(v for v in q.values() if v > 0):.1f} s min-sum, "
      f"probe {a.get('probe_baseline')} (p50 {a.get('probe_p50')}), "
      f"spread {a.get('probe_spread')}x, "
      f"tainted {a.get('tainted_pct')}%"
      + (" [FORCED over: " + "; ".join(problems) + "]" if problems else ""))
