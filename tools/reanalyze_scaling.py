#!/usr/bin/env python
"""Re-score archived scaling sessions under the current clean-pair rule.

The round-2 clean rule (bracketing probes only) admitted physically
impossible super-ideal ratios (> ideal speedup) as clean evidence — a
throttle landing mid-run on the low-core half between probes inflates
the ratio, and probes cannot see it (ADVICE r2). This tool re-applies
the corrected rule (probes >= 75% of session peak AND ratio <=
1.02*ideal) to archived raw pair JSONs so every headline number in
BENCH.md can be reproduced from committed data.

Usage: python tools/reanalyze_scaling.py bench_results/scaling_r2/calibrated_*.json
"""

from __future__ import annotations

import glob
import json
import statistics
import sys


def rescore(paths: list[str]) -> dict:
    rows = []
    for path in paths:
        d = json.load(open(path))
        pairs = [p for p in d.get("pairs", []) if "probes_M_per_s" in p]
        if not pairs:
            continue
        peak = max(max(p["probes_M_per_s"]) for p in pairs)
        ideal = d.get("ideal_speedup", 4.0)
        for p in pairs:
            probes_ok = min(p["probes_M_per_s"]) >= 0.75 * peak
            # steal criterion applies when the session recorded it
            steal_ok = (
                max(p.get("low_steal_cores", 0.0),
                    p.get("high_steal_cores", 0.0)) < 1.0
            )
            rows.append(
                {
                    "file": path.split("/")[-1],
                    "n_docs": d.get("n_docs"),
                    "ideal": ideal,
                    "ratio": p["ratio"],
                    "eff": round(p["ratio"] / ideal, 3),
                    "probes_ok": probes_ok,
                    "superideal": p["ratio"] > ideal * 1.02,
                    "clean": probes_ok and steal_ok
                    and p["ratio"] <= ideal * 1.02,
                }
            )
    # efficiencies are pooled per-pair (ratio/its own ideal), so files
    # with different high/low factors can be mixed
    clean = [r["eff"] for r in rows if r["clean"]]
    old_clean = [r["eff"] for r in rows if r["probes_ok"]]
    return {
        "n_pairs": len(rows),
        "n_clean_old_rule": len(old_clean),
        "n_clean_corrected": len(clean),
        "n_superideal_excluded": sum(
            1 for r in rows if r["probes_ok"] and r["superideal"]
        ),
        "efficiency_old_rule": (
            round(statistics.median(old_clean), 3) if old_clean else None
        ),
        "efficiency_corrected": (
            round(statistics.median(clean), 3) if clean else None
        ),
        "pairs": rows,
    }


if __name__ == "__main__":
    paths = sys.argv[1:] or glob.glob(
        "bench_results/scaling_r2/calibrated_*.json"
    )
    print(json.dumps(rescore(sorted(paths)), indent=2))
