#!/usr/bin/env python
"""Scaling-efficiency evidence for the BASELINE.json north rule.

The rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors.  No real cluster exists in the sandbox, so per the
measurement plan in BASELINE.md this runs the *same* replay job on the
*same* input at two parallelism levels (local[N] vs local[4N]) in
separate JVMs and reports::

    efficiency = (events/sec at 4N) / (4 × events/sec at N)

Each level runs in a fresh subprocess because a Spark master is fixed
for the lifetime of a JVM.  Results are printed and appended to
BENCH.md.  Usage::

    python bench/scaling.py [--n 8] [--convs 50000] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, convs: int, work: str, input_path: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
         "--convs", str(convs), "--work", work, "--input", input_path],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N")
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--repeat", type=int, default=2, help="take best of K per level")
    args = ap.parse_args()

    levels = {}
    input_path = f"/tmp/aq-scale-input-{args.convs}"
    for cpus in (args.n, 4 * args.n):
        best = None
        for i in range(args.repeat):
            r = run_level(cpus, args.convs, f"/tmp/aq-scale-{cpus}-{i}", input_path)
            assert r["replay"]["state_ok"], f"state verify FAILED at local[{cpus}]"
            if best is None or r["replay"]["events_per_sec"] > best["events_per_sec"]:
                best = r["replay"]
        levels[cpus] = best
        print(f"local[{cpus}]: {best['events']} events in {best['sec']}s "
              f"= {best['events_per_sec']} events/s", flush=True)

    small, large = levels[args.n], levels[4 * args.n]
    eff = large["events_per_sec"] / (4 * small["events_per_sec"])
    speedup = large["events_per_sec"] / small["events_per_sec"]
    print(f"speedup {args.n}->{4*args.n}: {speedup:.2f}x, efficiency {eff:.3f} "
          f"(target >= 0.8)")

    result = {
        "n": args.n,
        "events": small["events"],
        "throughput_n": small["events_per_sec"],
        "throughput_4n": large["events_per_sec"],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
