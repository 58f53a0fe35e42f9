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
                            window), OR per-sample provenance: every
                            published minimum certified fast
                            (min_windows <= 1.3, both bounding probes)
                            or NORMALIZED into the baseline probe unit
                            at promotion (r18: raw / min_windows_lo,
                            bounded at 3x — the rescale the two-verdict
                            adjudication already trusts, applied at
                            lock time so a stable-slow window locks
                            honestly). The provenance verdict is
                            RECOMPUTED here from min_windows (never
                            trusted from the artifact's boolean); a
                            Bench/lock.py disagreement refuses.
  - every flag has a floor (no unfloored inflated min may become a
                            next-round anchor — the q132 ratchet mode)

It also prints the two-verdict table for each flag (sev_clamped fired
the gate; sev_unclamped rescales by the raw probe ratio) so window-vs-
code is readable from the artifact alone.

Usage: python3 tools/lock.py [--force] [--src docs/bench_full.json]
                             [--dst docs/bench_locked.json]
                             [--floors floors.json]
"""
import json
import shutil
import sys

src = "docs/bench_full.json"
dst = "docs/bench_locked.json"
force = "--force" in sys.argv
if "--src" in sys.argv:
    src = sys.argv[sys.argv.index("--src") + 1]
if "--dst" in sys.argv:
    dst = sys.argv[sys.argv.index("--dst") + 1]

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
# ── per-sample provenance, RECOMPUTED (r18) ──────────────────────────
# lock.py is the last line of defense for the lock, so it re-derives
# the minima verdict from min_windows itself instead of trusting the
# artifact's precomputed boolean: coverage (every non-errored published
# query has a provenance entry) and the <=1.3 certification criterion
# are both recomputed here, and a disagreement with the artifact's
# minima_window_ok refuses outright — if Bench and lock.py ever drift
# (a threshold changed in one place), the gate hardens instead of
# silently weakening.
FAST = 1.3   # the settle band — Bench's certification criterion
RMAX = 3.0   # beyond this, probe-linearity is not a credible rescale
# PAIRED with Bench.scala's provenance-floor stage (RescaleBound == RMAX;
# its ManufacturedFlagBand 1.45 sizes the floors this file's
# floor-corroboration block consumes) — retune the pair together.
qmap = dict(a.get("queries", {}))
mw = a.get("min_windows", {})
mwlo = a.get("min_windows_lo", {})
errored = set(a.get("errors", {}))
covered = [n for n, v in qmap.items()
           if isinstance(v, (int, float)) and v >= 0 and n not in errored]
missing = [n for n in covered if n not in mw]
slow = [n for n in covered
        if n in mw and not (mw[n] == -1 or mw[n] <= FAST)]
recomputed_ok = (not a.get("partial", False) and not missing and not slow)
if bool(a.get("minima_window_ok", False)) != recomputed_ok:
    problems.append(
        f"minima_window_ok drift: artifact says "
        f"{a.get('minima_window_ok')} but recomputing from min_windows "
        f"says {recomputed_ok} ({len(missing)} missing, {len(slow)} "
        f"slow) — Bench and lock.py disagree on the criterion")

# queries whose minima get NORMALIZED into the baseline probe unit at
# promotion (r18 — the seven-refusals lesson): a minimum measured in a
# slow-but-bounded window is rescaled by its window's conservative lo
# ratio (min of the two bounding probes — under-normalizing, so the
# locked value is never faster than the code warrants). This is the
# same probe-unit rescaling the two-verdict adjudication already
# trusts for exoneration, applied at lock time instead of excuse time:
# a stable-slow window locks honestly instead of refusing forever on a
# host whose baseline dips are rare.
normalized = {}
if not a.get("window_ok", False):
    if recomputed_ok:
        ratios = [r for r in (mw[n] for n in covered) if r >= 0]
        print(f"window_ok=false (spread {a.get('probe_spread')}x) but "
              f"minima provenance OK: {len(ratios)} suite minima all in "
              f"<={FAST}x windows (max {max(ratios):.3f}x)"
              if ratios else "minima provenance OK (all floors)")
    else:
        unfixable = [n for n in slow
                     if n not in mwlo or mwlo[n] < 0 or mw[n] > RMAX]
        if missing or unfixable or a.get("partial", False):
            problems.append(
                f"window_ok=false (clean-probe spread "
                f"{a.get('probe_spread')}x > 1.5x), minima not all "
                f"certified fast, and not normalizable: {len(missing)} "
                f"without provenance, {len(unfixable)} beyond the "
                f"{RMAX}x rescale bound or without a lo ratio")
        else:
            for n in slow:
                normalized[n] = max(1.0, mwlo[n])
                qmap[n] = qmap[n] / normalized[n]
            rmax = max(mw[n] for n in slow)
            print(f"window_ok=false (spread {a.get('probe_spread')}x); "
                  f"{len(slow)} slow-window minima NORMALIZED into the "
                  f"baseline probe unit (raw / min_windows_lo, worst "
                  f"window {rmax:.3f}x), {len(covered) - len(slow)} "
                  f"certified fast or floor-published")
flags = a.get("regressed_vs_prev", {})

# ── floor-corroborated divisor bound (r19 — the r18 measured residual:
# ~3% of normalized anchors carried lo-divisors 1.49-1.76x inflated by
# mid-window fast dips, manufacturing 1.4-1.6x flags on slow hosts). A
# fresh-JVM floor is a CLEAN measurement of the same code whose own
# window is at worst RMAX slow, so a normalized anchor below floor/RMAX
# is provably over-normalized — cap it there (equivalently: cap the
# divisor at raw·RMAX/floor). Floor sources: the artifact's own flag
# floors (regressed_vs_prev) and an optional --floors sidecar
# (q -> seconds, e.g. standalone adjudication floors). Queries the
# Bench floor stage certified outright carry min_windows = -1 and are
# never normalized, so this bound mainly consumes sidecar floors. ──
if normalized:
    floors = {n: v.get("floor") for n, v in flags.items()
              if isinstance(v.get("floor"), (int, float))}
    if "--floors" in sys.argv:
        # a bad sidecar must land in the refusal path, not a traceback —
        # silently promoting WITHOUT the floors the operator asked for
        # would be worse than refusing
        sidecar = sys.argv[sys.argv.index("--floors") + 1]
        try:
            with open(sidecar) as fh:
                extra = json.load(fh)
            if not isinstance(extra, dict):
                raise ValueError(f"expected a JSON object, got "
                                 f"{type(extra).__name__}")
            # every value must be a positive number — a stringified
            # float would be silently dropped by the isinstance filter
            # below (promoting WITHOUT the floor the operator asked
            # for), and a JSON true passes isinstance(int) and would
            # apply a nonsense floor of 1.0
            bad = {k: v for k, v in extra.items()
                   if isinstance(v, bool)
                   or not isinstance(v, (int, float)) or v <= 0}
            if bad:
                raise ValueError(f"non-positive-number floors: {bad}")
            floors.update(extra)
        except (OSError, ValueError) as e:
            problems.append(f"--floors sidecar {sidecar} unusable: {e}")
    capped = {}
    rawq = a.get("queries", {})
    for n in list(normalized):
        f = floors.get(n)
        if isinstance(f, (int, float)) and f > 0 and qmap[n] < f / RMAX:
            bounded = min(rawq[n], f / RMAX)  # divisor stays >= 1
            capped[n] = {"was": qmap[n], "floor": f,
                         "divisor": rawq[n] / bounded}
            qmap[n] = bounded
            normalized[n] = rawq[n] / bounded
    if capped:
        print(f"{len(capped)} normalized anchors floor-corroborated "
              "(anchor < floor/RMAX would manufacture flags): " +
              ", ".join(f"{n} {v['was']:.3f}->{qmap[n]:.3f}s "
                        f"(floor {v['floor']:.3f})"
                        for n, v in sorted(capped.items())))
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

if normalized:
    # the locked artifact carries the NORMALIZED minima in `queries`
    # (the unit every downstream anchor reads — expressed at this
    # run's probe_baseline like every other lock), with the raw values
    # and the per-query divisors preserved for audit
    locked = dict(a)
    locked["queries_raw"] = dict(a.get("queries", {}))
    locked["queries"] = qmap
    locked["normalized_at_lock"] = normalized
    locked["value"] = sum(v for v in qmap.values()
                          if isinstance(v, (int, float)) and v > 0)
    with open(dst, "w") as f:
        json.dump(locked, f, separators=(",", ":"))
        f.write("\n")
else:
    shutil.copyfile(src, dst)
print(f"\nLOCKED {dst}: {len(qmap)} queries, "
      f"{sum(v for v in qmap.values() if v > 0):.1f} s min-sum"
      + (f" ({len(normalized)} probe-normalized)" if normalized else "")
      + f", probe {a.get('probe_baseline')} (p50 {a.get('probe_p50')}), "
      f"spread {a.get('probe_spread')}x, "
      f"tainted {a.get('tainted_pct')}%"
      + (" [FORCED over: " + "; ".join(problems) + "]" if problems else ""))
