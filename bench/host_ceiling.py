#!/usr/bin/env python
"""Host scaling ceiling: what efficiency can this box itself express?

Runs K pinned, pure-Python busy-loop processes (zero I/O, zero
coordination — embarrassingly parallel by construction) at N and 4N
processes and reports total iterations/s at each level plus the
implied efficiency.  Any engine measurement on this host is bounded
above by this number: shared-tenant CPU steal, frequency scaling and
scheduler effects all land here too.  BENCH.md quotes it next to the
engine's own N→4N number.

    python bench/host_ceiling.py [--n 2] [--secs 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

LOOP = r"""
import time, sys
end = time.time() + float(sys.argv[1])
n = 0
while time.time() < end:
    for _ in range(10000):
        n += 1
print(n)
"""


def run_level(procs: int, secs: float) -> float:
    # same high-core pinning as bench/scaling.py: low cores carry the
    # other tenants' default taskset ranges
    ncpu = os.cpu_count() or 32
    ps = []
    for i in range(procs):
        cmd = [sys.executable, "-c", LOOP, str(secs)]
        if os.path.exists("/usr/bin/taskset"):
            # wrap around rather than index below core 0 when procs
            # exceeds the host core count
            cmd = ["taskset", "-c", str(ncpu - 1 - (i % ncpu)), *cmd]
        ps.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    total = 0
    for p in ps:
        out, _ = p.communicate()
        total += int(out.strip())
    return total / secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    best = {}
    for _ in range(args.repeat):
        for procs in (args.n, 4 * args.n):
            r = run_level(procs, args.secs)
            best[procs] = max(best.get(procs, 0.0), r)
            print(f"  {procs} pinned busy-loops: {r/1e6:.1f}M iters/s "
                  f"(load {os.getloadavg()[0]:.1f})", file=sys.stderr)
    small, large = best[args.n], best[4 * args.n]
    print(json.dumps({
        "n": args.n,
        "iters_n": round(small, 1),
        "iters_4n": round(large, 1),
        "speedup": round(large / small, 3),
        "ceiling_efficiency": round(large / (4 * small), 3),
    }))


if __name__ == "__main__":
    main()
