"""All round-3 late operators in one FRESH Ray session at num_cpus=32
— the driver's configuration, where zero-column empty-block races and
actor-restart issues reproduce that 4-cpu test sessions never see
(the round-2 dedup_minhash lesson).  Row-count sanity only; oracle
equality is covered per-operator at 4 cpus."""

from __future__ import annotations

import subprocess
import sys

_CODE = """
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
q = e.queries()
sf = "/root/testdata/sf0.001"
want_nonempty = [
    "hybrid_rrf", "conv_topk", "term_suggest", "bm25_fuzzy",
    "bm25_facets", "fuzzy_terms", "mmr_diversify", "approx_distinct",
    "pagerank", "top_terms", "dup_substring_coverage",
    "bm25_topk_stemmed",
]
for name in want_nonempty:
    r = q[name](sf)
    n = r.count() if hasattr(r, "count") and not hasattr(r, "shape") else len(r)
    assert n > 0, name
    print("OK", name, n)
# dedup_incremental may legitimately be small; just require it runs
r = q["dedup_incremental"](sf)
n = r.count() if hasattr(r, "count") and not hasattr(r, "shape") else len(r)
print("OK dedup_incremental", n)
ray.shutdown()
"""


def test_round3_ops_at_driver_parallelism():
    r = subprocess.run(
        [sys.executable, "-c", _CODE],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=580,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert r.stdout.count("OK ") == 13, r.stdout
