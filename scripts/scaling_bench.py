"""Two-parallelism scaling evidence (BASELINE.md / north_rule).

Runs bench.py at local[8] and local[32] on identical input (the sandbox
substitute for N vs 4N executor clusters) and appends throughput +
scaling-efficiency tables to BENCH/BASELINE.md.

efficiency = (throughput@4N / throughput@N) / 4
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # amplified corpus: scaling evidence must measure compute, not the
        # fixed per-job scheduling floor of a 1.5 MB input
        SPARK_GRAFT_AMPLIFY=os.environ.get("SPARK_GRAFT_AMPLIFY", "20"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo, r_hi = run(lo, sf_dir), run(hi, sf_dir)

    build_lo = r_lo["files_per_sec"]
    build_hi = r_hi["files_per_sec"]
    q_lo = r_lo["queries_per_sec"]
    q_hi = r_hi["queries_per_sec"]
    eff_build = (build_hi / build_lo) / (hi / lo)
    eff_query = (q_hi / q_lo) / (hi / lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(
            f"""
## Scaling run — sf_dir={sf_dir}

| phase | local[{lo}] | local[{hi}] | speedup | efficiency (target ≥0.8/4x) |
|---|---|---|---|---|
| index build (files/sec) | {build_lo} | {build_hi} | {build_hi/build_lo:.2f}x | {eff_build:.2f} |
| query batch (queries/sec) | {q_lo} | {q_hi} | {q_hi/q_lo:.2f}x | {eff_query:.2f} |

raw local[{lo}]: `{json.dumps(r_lo)}`
raw local[{hi}]: `{json.dumps(r_hi)}`
"""
        )
    print(json.dumps({"eff_build": round(eff_build, 3), "eff_query": round(eff_query, 3),
                      "lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
