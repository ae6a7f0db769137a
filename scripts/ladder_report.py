"""Summarize a scaling_bench JSON ladder: per-level medians, raw/paired
efficiencies, and per-phase 2->8 scaling — the numbers BENCH.md transcribes.

Usage: python scripts/ladder_report.py bench_data/ladder_*.out
"""

from __future__ import annotations

import json
import statistics
import sys


def main(path: str) -> None:
    line = [ln for ln in open(path) if ln.startswith("{")][-1]
    d = json.loads(line)
    runs = d["all_runs"]
    levels = sorted(int(k) for k in runs)
    n, n4 = levels[0], levels[1]
    print(f"n_docs={d['n_docs']}  levels={levels}")
    for c in levels:
        rs = runs[str(c)] if str(c) in runs else runs[c]
        bs = sorted(r["build_seconds"] for r in rs)
        qs = sorted(r["queries_per_sec"] for r in rs)
        print(f"local[{c}]: build med {statistics.median(bs):.2f}s "
              f"(spread {bs[0]:.1f}-{bs[-1]:.1f}) "
              f"= {statistics.median(r['build_docs_per_sec'] for r in rs):,.0f} docs/s | "
              f"batch med {statistics.median(r['batch_400q_seconds'] for r in rs):.2f}s "
              f"= {statistics.median(qs):.2f} q/s (spread {qs[0]:.1f}-{qs[-1]:.1f})")
    print(f"build eff {d['build_scaling_efficiency']} raw / "
          f"{d['build_scaling_efficiency_paired']} paired; "
          f"query eff {d['query_scaling_efficiency']} raw / "
          f"{d['query_scaling_efficiency_paired']} paired")
    for pair, ceil in d.get("hardware_ceiling", {}).items():
        print(f"ceiling {pair}: {ceil['ceiling_efficiency']}")

    def med_phase(c, ph):
        rs = runs[str(c)] if str(c) in runs else runs[c]
        vals = [r["build_phases"].get(ph, 0.0) for r in rs]
        return statistics.median(vals)

    phases = ["url_cuts", "tokenize_rank", "encode_postings", "lexicon_base"]
    print("per-phase 2->8 (medians, eff = t_N / (4 * t_4N)):")
    for ph in phases:
        lo, hi = med_phase(n, ph), med_phase(n4, ph)
        eff = lo / (4 * hi) if hi > 0 else float("nan")
        print(f"  {ph:15s} {lo:7.2f}s -> {hi:7.2f}s   eff {eff:.3f}")
    # paired per-repeat build ratios
    rs_n = runs[str(n)] if str(n) in runs else runs[n]
    rs_4 = runs[str(n4)] if str(n4) in runs else runs[n4]
    pairs = [round(r4["build_docs_per_sec"] / (4 * rn["build_docs_per_sec"]), 3)
             for rn, r4 in zip(rs_n, rs_4)]
    print(f"paired per-repeat build ratios: {pairs}")
    qpairs = [round(r4["queries_per_sec"] / (4 * rn["queries_per_sec"]), 3)
              for rn, r4 in zip(rs_n, rs_4)]
    print(f"paired per-repeat query ratios: {qpairs}")

    # encode-stage breakdown (kernel vs cache-write vs stats-agg), when the
    # workers recorded it — the fixed-share analysis behind the per-phase
    # encode efficiency number.
    sub = sorted({k for rs in (rs_n, rs_4) for r in rs
                  for k in r.get("encode_breakdown", {})})
    if sub:
        print("encode breakdown 2->8 (medians):")
        for k in sub:
            lo = statistics.median(
                r.get("encode_breakdown", {}).get(k, 0.0) for r in rs_n)
            hi = statistics.median(
                r.get("encode_breakdown", {}).get(k, 0.0) for r in rs_4)
            eff = lo / (4 * hi) if hi > 0 else float("nan")
            print(f"  {k:15s} {lo:7.2f}s -> {hi:7.2f}s   eff {eff:.3f}")

    # raw per-repeat build/batch seconds per level: the spread is the
    # window's noise disclosure (unimodal tight spread = calm box)
    for c in levels:
        rs = runs[str(c)] if str(c) in runs else runs[c]
        builds = [round(r["build_seconds"], 1) for r in rs]
        batches = [r[next(k for k in r if k.endswith("q_seconds"))]
                   for r in rs]
        print(f"local[{c}] raw build s: {builds}  batch s: {batches}")


if __name__ == "__main__":
    main(sys.argv[1])
