"""Two-parallelism-level scaling evidence (north_rule sandbox proxy).

Runs the full pipeline at local[N] and local[4N] in separate JVMs on the
SAME fixture and reports throughput at both + scaling efficiency
(T_{4N} / T_N) / 4. Results go into BASELINE.md / BENCH notes.

Usage: python tools/scaling_bench.py [sf_name] [N]
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
r = run_bench({sf_dir!r}, {cpus})
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
    raise RuntimeError(f"bench at local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = f"/root/testdata/{sf_name}"
    lo = run_at(sf_dir, n)
    hi = run_at(sf_dir, 4 * n)
    tl = lo["queries"]["pipeline_e2e"]
    th = hi["queries"]["pipeline_e2e"]
    eff = (tl / th) / 4.0
    report = {
        "sf": sf_name,
        "n_cpus": n,
        "4n_cpus": 4 * n,
        "pipeline_s_at_n": tl,
        "pipeline_s_at_4n": th,
        "docs_per_sec_at_n": lo["throughput"]["docs_per_sec"],
        "docs_per_sec_at_4n": hi["throughput"]["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
