#!/usr/bin/env python3
"""Two-verdict window-vs-code adjudication between two bench artifacts —
the manual steps of the r17 flag adjudications (SCALE.md), made
executable.

Given a CANDIDATE artifact (the run being judged) and a REFERENCE
artifact (usually docs/bench_locked.json), recompute for each query:

  prior     reference.queries[q] — recomputed against the reference YOU
            chose, not the artifact's worst-anchor pick (the q95 r17
            confusion: its flag quoted the round-prev anchor 0.594 while
            the lock's OWN value was 1.119, above the suite min)
  raw       cand.probe_baseline / ref.probe_baseline (the host unit)
  sev_un    suite_min / (prior * raw)
  flr_un    floor / (prior * raw)          [artifact floor, if any]
  sev_p50   best of the above * (pb/p50)   [only when cand window_ok is
            false: the min-probe describes the fastest window; the p50
            is the representative unit — the r16-verdict reading]
  sev_nrm   (suite_min / max(1, min_windows_lo[q])) / (prior * raw)
            [r18 artifacts: the candidate minimum normalized by its own
            window's conservative probe ratio]
  sev_ext   (f * ref_probe / f_probe) / prior for an EXTERNAL standalone
            floor passed as --floor q=<sec>@<probe> — the r17 standalone
            protocol (floor rescaled into the reference probe unit)
  sev_raw   best severity recomputed against the reference's RAW
            (pre-normalization) value when the reference is a
            probe-normalized lock carrying queries_raw — the r18
            over-normalization check: a flag whose sev_raw ≤ 1.3 is the
            lock's normalization divisor overstating speed (a
            mid-window fast dip inflated min_windows_lo), not code

Verdict per query: window if the best available severity <= 1.3, CODE?
otherwise. The r17 exonerations reproduce from the committed artifacts:

  python3 tools/adjudicate.py docs/bench_full.json docs/bench_locked.json \
      q95_block_dedup                      # prior re-anchored to the lock
  python3 tools/adjudicate.py docs/bench_full.json docs/bench_locked.json \
      q219_prefix_families --floor q219_prefix_families=0.557@0.231
  python3 tools/adjudicate.py docs/bench_r17_attempt3.json \
      docs/bench_locked.json q32_sessionize \
      --floor q32_sessionize=0.345@0.157   # floor probe = 0.141*1.116
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:]]
    floors = {}
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "--floor":
            q, spec = args[i + 1].split("=", 1)
            sec, probe = spec.split("@", 1)
            floors[q] = (float(sec), float(probe))
            i += 2
        else:
            rest.append(args[i])
            i += 1
    if len(rest) < 2:
        print(__doc__)
        sys.exit(2)
    cand, ref = load(rest[0]), load(rest[1])
    queries = rest[2:] or sorted(cand.get("regressed_vs_prev", {}))

    if cand.get("fixtures_digest") != ref.get("fixtures_digest"):
        print("WARNING: fixtures digests differ — per-query deltas "
              "measure fixture shape, not code")
    pb_c = cand.get("probe_baseline")
    pb_r = ref.get("probe_baseline")
    p50 = cand.get("probe_p50") or pb_c
    raw = (pb_c / pb_r) if pb_c and pb_r else 1.0
    p50_scale = (pb_c / p50) if (not cand.get("window_ok", False)
                                 and pb_c and p50) else 1.0
    print(f"candidate {rest[0]} (probe {pb_c}, p50 {p50}, window_ok "
          f"{cand.get('window_ok')}) vs reference {rest[1]} "
          f"(probe {pb_r}); raw host ratio {raw:.3f}, "
          f"p50 unit = min-probe x {1 / p50_scale if p50_scale else 1:.2f}")

    mw = cand.get("min_windows", {})
    mwlo = cand.get("min_windows_lo", {})
    flags = cand.get("regressed_vs_prev", {})

    def fmt(x):
        return f"{x:7.3f}" if isinstance(x, (int, float)) else f"{'-':>7}"

    print(f"{'query':36} {'prior':>7} {'min':>7} {'floor':>7} "
          f"{'sev_un':>7} {'sev_p50':>7} {'sev_nrm':>7} {'sev_ext':>7} "
          f"{'sev_raw':>7} {'mw':>6} verdict")
    n_window = n_code = 0
    raw_map = ref.get("queries_raw", {})
    for q in queries:
        prior = ref.get("queries", {}).get(q)
        ent = flags.get(q, {})
        m = ent.get("suite_min", cand.get("queries", {}).get(q))
        if not isinstance(prior, (int, float)) or prior <= 0 or \
           not isinstance(m, (int, float)) or m <= 0:
            print(f"{q:36} no comparable prior/min — skipped")
            continue
        floor = ent.get("floor")
        sev_un = m / (prior * raw)
        cands = [sev_un]
        if isinstance(floor, (int, float)) and floor > 0:
            cands.append(floor / (prior * raw))
        sev_p50 = min(cands) * p50_scale
        best = [sev_p50]
        sev_nrm = None
        if isinstance(mwlo.get(q), (int, float)) and mwlo[q] > 0:
            sev_nrm = (m / max(1.0, mwlo[q])) / (prior * raw)
            best.append(sev_nrm)
        sev_ext = None
        if q in floors:
            f_sec, f_probe = floors[q]
            sev_ext = (f_sec * pb_r / f_probe) / prior
            best.append(sev_ext)
        sev_raw = None
        raw_prior = raw_map.get(q)
        if isinstance(raw_prior, (int, float)) and raw_prior > 0 and \
           raw_prior != prior:
            # best severity against the PRE-normalization measurement —
            # same fixture, same protocol; ≤1.3 here with >1.3 against
            # the normalized prior means the divisor, not the code
            raws = [m / (raw_prior * raw) * p50_scale]
            if isinstance(floor, (int, float)) and floor > 0:
                raws.append(floor / (raw_prior * raw) * p50_scale)
            if q in floors:
                f_sec, f_probe = floors[q]
                raws.append((f_sec * pb_r / f_probe) / raw_prior)
            sev_raw = min(raws)
            best.append(sev_raw)
        verdict = "window" if min(best) <= 1.3 else "CODE?"
        if verdict == "window":
            n_window += 1
        else:
            n_code += 1
        prov = mw.get(q)
        print(f"{q:36} {fmt(prior)} {fmt(m)} {fmt(floor)} {fmt(sev_un)} "
              f"{fmt(sev_p50)} {fmt(sev_nrm)} {fmt(sev_ext)} "
              f"{fmt(sev_raw)} "
              f"{prov if prov is None else format(prov, '6.2f')} {verdict}")
    print(f"\n{n_window} window, {n_code} CODE?"
          + (" — CODE? holdouts need a standalone floor "
             "(SPARK_GRAFT_STANDALONE fork) passed back via --floor"
             if n_code else ""))
    sys.exit(0 if n_code == 0 else 1)


if __name__ == "__main__":
    main()
