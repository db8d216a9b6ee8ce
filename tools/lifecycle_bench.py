"""Reproduces the BASELINE.md lifecycle numbers: merge two half-corpus
indexes (metadata-only fold) and compact with 10% tombstones, at
sf0.1 scale (~488k turns total).

    python tools/lifecycle_bench.py          # 32 cpus (RAY_GRAFT_CPUS)

Prints one JSON line per phase."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np


def main() -> None:
    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import pyarrow.parquet as pq
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.lifecycle import compact_index, delete_docs
    from ciff_ray.merge import merge_indexes
    from ciff_ray.synth import generate_transcripts

    base = "/tmp/ciff_lcbench"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    for i, seed in enumerate((101, 102)):
        pq.write_table(
            generate_transcripts(n_convs=37_500, max_turns=12, seed=seed),
            f"{base}/t{i}.parquet",
        )
        t0 = time.monotonic()
        build_index(
            ray.data.read_parquet(f"{base}/t{i}.parquet"),
            f"{base}/idx{i}",
            BuildParams(num_partitions=16, sample_frac=1.0),
        )
        print(json.dumps({"phase": f"build_half_{i}",
                          "sec": round(time.monotonic() - t0, 2)}))

    t0 = time.monotonic()
    m = merge_indexes([f"{base}/idx0", f"{base}/idx1"], f"{base}/merged")
    dt = time.monotonic() - t0
    print(json.dumps({"phase": "merge", "sec": round(dt, 2),
                      "num_docs": m.num_docs,
                      "turns_per_sec": round(m.num_docs / dt)}))

    dead = np.arange(0, m.num_docs, 10, dtype=np.int64)
    delete_docs(f"{base}/merged", dead)
    t0 = time.monotonic()
    mc = compact_index(f"{base}/merged", f"{base}/compacted")
    dt = time.monotonic() - t0
    print(json.dumps({"phase": "compact_10pct", "sec": round(dt, 2),
                      "num_docs": mc.num_docs,
                      "turns_per_sec": round(m.num_docs / dt)}))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
