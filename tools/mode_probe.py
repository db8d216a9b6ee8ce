"""Reproduce the query-mode latency matrix behind query._pick_mode.

Builds (or reuses) the bench index for GRAFT_SF_DIR's scale, then times
every bench query shape under exact / maxscore / bmw / auto (medians of
9 warm runs) and prints one row per query with the auto pick — the
measurement the auto policy's thresholds were derived from.

    python tools/mode_probe.py            # sf0.1, 8 cpus
    RAY_GRAFT_CPUS=32 python tools/mode_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import ray
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXTRA_SHAPES = [
    "the",  # single stopword-scale term
    "of the and",  # all-heavy
    "men never zzznotaterm",  # mixed hit/no-hit
    "year world state good very make the of",  # wide
]


def main() -> None:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import bench
    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.query import QueryEngine

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = bench._sf_label(sf_dir)
    tpath = bench._transcripts_path(sf)
    idx = f"/tmp/ciff_bench/idx_probe_{sf}"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        ds = ray.data.read_parquet(tpath, columns=["conv_id", "turn_idx", "text"])
        build_index(ds, idx, BuildParams(num_partitions=32, sample_frac=0.25))

    eng = QueryEngine(idx)
    sc = eng._local
    shapes = bench.BENCH_QUERIES + EXTRA_SHAPES
    modes = ("exact", "maxscore", "bmw", "auto")
    for q in shapes:  # warm every path
        for m in modes:
            eng.topk(q, k=10, mode=m)
    print(f"{'query':46s} {'pick':8s}" + "".join(f"{m:>10s}" for m in modes))
    for q in shapes:
        pick = sc._pick_mode(q)
        cells = []
        for m in modes:
            ts = []
            for _ in range(9):
                t0 = time.perf_counter()
                eng.topk(q, k=10, mode=m)
                ts.append(time.perf_counter() - t0)
            cells.append(float(np.median(ts)) * 1000)
        print(
            f"{q!r:46s} {pick:8s}"
            + "".join(f"{c:9.2f}m" for c in cells)
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
