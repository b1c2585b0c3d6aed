"""Two-parallelism-level scaling evidence (north_rule sandbox proxy).

Runs the full pipeline at local[N] and local[4N] in separate JVMs on the
SAME fixture and reports throughput at both + scaling efficiency
(T_N / T_4N) / 4. Levels run strictly sequentially; each level is repeated
``repeats`` times and the MINIMUM wall time is used (single-host runs are
noisy: page cache, GC, background flushes).

IMPORTANT caveat of the local-mode proxy: ``local[N]`` uses ~2-3N host
threads (N JVM task threads + N Python/Arrow workers + GC/shuffle I/O), so
on this 32-core host ``local[8]`` already consumes ~20 cores and
``local[32]`` cannot get 4x its resources. The honest proxy pairs are
N=2 vs 8 (both levels have true headroom); N=8 vs 32 is reported as the
saturated upper bound.

Usage: python tools/scaling_bench.py [sf_name] [N] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from bench import run_bench
r = run_bench({sf_dir!r}, {cpus}, pipeline_only=True)
print("RESULT_JSON:" + json.dumps(r))
"""


def run_at(sf_dir: str, cpus: int) -> dict:
    code = RUNNER.format(repo=REPO, sf_dir=sf_dir, cpus=cpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT_JSON:"):
            return json.loads(line[len("RESULT_JSON:"):])
    raise RuntimeError(
        f"bench at local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = f"/root/testdata/{sf_name}"
    # INTERLEAVE the two levels (N, 4N, N, 4N, ...) so host drift (page
    # cache fill, CPU frequency/thermal, background IO) biases both levels
    # equally — sequential blocks systematically favored whichever level
    # ran second. min-of-k per level as before.
    runs: dict[int, list[dict]] = {n: [], 4 * n: []}
    for _ in range(repeats):
        for cpus in (n, 4 * n):
            runs[cpus].append(run_at(sf_dir, cpus))
    lo = min(runs[n], key=lambda r: r["queries"]["pipeline_e2e"])
    hi = min(runs[4 * n], key=lambda r: r["queries"]["pipeline_e2e"])
    tl = lo["queries"]["pipeline_e2e"]
    th = hi["queries"]["pipeline_e2e"]
    eff = (tl / th) / 4.0
    report = {
        "sf": sf_name,
        "n_cpus": n,
        "4n_cpus": 4 * n,
        "repeats": repeats,
        "all_runs_s_at_n": [round(r["queries"]["pipeline_e2e"], 1) for r in runs[n]],
        "all_runs_s_at_4n": [round(r["queries"]["pipeline_e2e"], 1) for r in runs[4 * n]],
        # bench.py is min-of-3 internally: raw per-JVM triplets, so the
        # single-host spread stays visible in the record
        "raw_triplets_at_n": [r.get("pipeline_runs_s") for r in runs[n]],
        "raw_triplets_at_4n": [r.get("pipeline_runs_s") for r in runs[4 * n]],
        "stage_min_sum_at_n": lo["queries"].get("stage_min_sum_s"),
        "stage_min_sum_at_4n": hi["queries"].get("stage_min_sum_s"),
        "pipeline_s_at_n": tl,
        "pipeline_s_at_4n": th,
        "stages_at_n": {k: v for k, v in lo["queries"].items() if k.startswith("stage_")},
        "stages_at_4n": {k: v for k, v in hi["queries"].items() if k.startswith("stage_")},
        "docs_per_sec_at_n": lo["throughput"]["docs_per_sec"],
        "docs_per_sec_at_4n": hi["throughput"]["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
