"""Host CPU-overcommit probe: measures how much wall-clock a fixed
pure-CPU task inflates when run on all cores at once vs serially.

On a dedicated box the N-way run takes ~= the serial time (factor ~1).
Under hypervisor overcommit / steal, the factor grows: effective cores
= N / factor.  Run this next to any benchmark so throughput numbers can
be normalized across sandbox VM instances (the same code measured 7.3 s
and 31-39 s for the identical sf0.1 build on two different instances of
this sandbox — the probe attributes the gap to the host, not the code).

Usage: python tools/overcommit_probe.py [N]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i
    return x


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 1)
    work = 5_000_000
    _burn(work)  # warm up the interpreter
    t0 = time.perf_counter()
    _burn(work)
    serial = time.perf_counter() - t0
    with mp.Pool(n_procs) as pool:
        t0 = time.perf_counter()
        pool.map(_burn, [work] * n_procs)
        para = time.perf_counter() - t0
    factor = para / serial
    print(
        json.dumps(
            {
                "procs": n_procs,
                "serial_sec": round(serial, 4),
                "parallel_sec": round(para, 4),
                "slowdown_factor": round(factor, 3),
                "effective_cores": round(n_procs / factor, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
