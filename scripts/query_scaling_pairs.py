"""Interleaved paired query-scaling measurement (north_rule evidence).

Problem this solves: this VM's hypervisor weather drifts on ~10-minute
scales (the SAME shared index measured 61s..153s for the identical 8-core
batch across one afternoon), so timing all lo repeats then all hi repeats
— even best-of-3 — compares two different weather windows and the derived
ratio swings ±0.3. Interleaving lo/hi back-to-back puts both levels in the
same window; each pair yields its own efficiency, and the per-pair spread
is visible instead of hidden.

Runs N pairs of (local[LO] query, local[HI] query) over the ONE shared
/dev/shm index (built by profile_query.py build), CPU-pinned, recording
/proc/stat steal around each timing. Prints one JSON line with all pairs +
median/best efficiency, and appends a table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = int(os.environ.get("SPARK_GRAFT_PAIRS", "5"))


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = [int(x) for x in f.readline().split()[1:]]
    return (parts[7] if len(parts) > 7 else 0, sum(parts))


def run_level(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_REPEATS="1")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "profile_query.py"), "query"]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0" and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    s0, t0 = _steal()
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    s1, t1 = _steal()
    line = [l for l in out.stdout.splitlines() if '{"rep' in l][-1]
    rep = json.loads(line[line.index('{"rep'):])
    rep["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
    return rep


def main() -> None:
    lo = int(os.environ.get("SPARK_GRAFT_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_HI", "8"))
    ratio = hi / lo
    if not os.path.exists("/dev/shm/ctx_profile_idx/stats.json"):
        raise SystemExit("build the shared index first: profile_query.py build")
    pairs = []
    for i in range(PAIRS):
        r_lo = run_level(lo)
        r_hi = run_level(hi)
        eff = (r_lo["total_sec"] / r_hi["total_sec"]) / ratio
        pairs.append(
            {
                "pair": i,
                "lo_sec": r_lo["total_sec"],
                "hi_sec": r_hi["total_sec"],
                "lo_steal": r_lo["steal_pct"],
                "hi_steal": r_hi["steal_pct"],
                "eff": round(eff, 3),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)
    effs = [p["eff"] for p in pairs]
    med, best = statistics.median(effs), max(effs)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"""
## Interleaved paired query scaling — shared index, local[{lo}] vs local[{hi}], {PAIRS} pairs

| pair | lo_sec | hi_sec | lo_steal% | hi_steal% | efficiency |
|---|---|---|---|---|---|
"""
        )
        for p in pairs:
            f.write(
                f"| {p['pair']} | {p['lo_sec']} | {p['hi_sec']} | {p['lo_steal']} "
                f"| {p['hi_steal']} | {p['eff']} |\n"
            )
        f.write(
            f"\nmedian efficiency **{med:.2f}**, best pair {best:.2f} "
            f"(each pair times lo and hi back-to-back in the same weather "
            f"window over ONE index artifact; see module docstring).\n"
        )
    print(json.dumps({"pairs": effs, "median_eff": round(med, 3), "best_eff": round(best, 3)}))


if __name__ == "__main__":
    main()
