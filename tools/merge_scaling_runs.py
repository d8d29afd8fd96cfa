#!/usr/bin/env python
"""Merge two scaling_bench runs into BENCH/BASELINE.md's variance
section: per-(level, job) best-observed throughput across runs, plus the
cross-run spread — the honest answer to this VM's noisy-neighbor swings
(one run's 4-repeat best can still sit entirely inside a bad window).

Usage: python tools/merge_scaling_runs.py run1.json run2.json
where each file holds the `{"results": ..., "efficiency": ...}` line
scaling_bench prints (or the raw results dict).
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOBS = ("compute_validate", "full_check", "full_check_stored",
        "scan_validate")


def load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read()
    # accept either the bare dict or the printed JSON line inside a log
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            return d.get("results", d)
    raise SystemExit(f"no JSON found in {path}")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit("usage: merge_scaling_runs.py run1 run2 "
                         "(exactly two independent runs)")
    runs = [load(p) for p in sys.argv[1:3]]
    # only levels BOTH runs measured are comparable
    levels = sorted(set.intersection(*({int(k) for k in r}
                                       for r in runs)))
    if len(levels) < 2:
        raise SystemExit(f"runs share {levels} — need two common "
                         f"parallelism levels to compute efficiency")
    lines = ["", "## Cross-run best-observed (2 independent harness runs)",
             "",
             "| job | " + " | ".join(
                 f"local[{c}] best rows/s (spread)" for c in levels) +
             " | best efficiency |", "|---|" + "---|" * (len(levels) + 1)]
    for job in JOBS:
        cells, best = [], {}
        for c in levels:
            vals = [r[str(c)][job]["rows_per_sec"] for r in runs]
            best[c] = max(vals)
            spread = (max(vals) - min(vals)) / max(vals)
            cells.append(f"{best[c]:,} ({spread:.0%})")
        eff = (best[levels[-1]] / best[levels[0]]) / (levels[-1] / levels[0])
        lines.append(f"| {job} | " + " | ".join(cells) +
                     f" | **{eff:.2f}** |")
    lines += ["",
              "Best-observed pairs at each level can come from different "
              "runs; the efficiency column divides the two bests, which "
              "removes same-run noise correlation.", ""]
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
