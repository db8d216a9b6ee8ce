"""Approximate distinct-count sketches (HyperLogLog) over the
documents corpus — the approximate-aggregates family the reference has
no analogue for (SURVEY.md §2.6 notes the reference carries no
sketches; this is part of the engine's 100-TB toolkit: exact distinct
counts at corpus scale force a full shuffle, an HLL is one streaming
pass + a 4 KB merge).

Three scopes spanning cardinality regimes on the driver tables:

* ``terms``     — distinct vocabulary terms (small; linear-counting
  regime exercises the small-range correction)
* ``postings``  — distinct (doc_id, term) pairs
* ``shingles``  — distinct word-3-gram shingle hashes (largest)

p = 12 (m = 4096 registers, relative error ~1.04/sqrt(m) = 1.6%).
Registers are computed per batch (vectorized: one hash pass + an exact
6-step binary-search floor-log2 — float log2 would misrank values that
round up across a power-of-2 boundary), pre-reduced to at most m rows
per batch, max-merged by one small groupby.  Deterministic: fixed hash
seeds, no RNG.

Rows-only driver entry (approximate by design); the error bound and
the register-level merge associativity are pinned in
tests/test_sketch.py against exact DuckDB counts.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

SCOPES = ("terms", "postings", "shingles")


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0 (6 vectorized steps)."""
    n = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        hi = cur >> np.uint64(shift)
        gt = hi > 0
        n += np.where(gt, shift, 0)
        cur = np.where(gt, hi, cur)
    return n


def _hll_update(regs: np.ndarray, h: np.ndarray) -> None:
    """Fold 64-bit hashes into the m uint8 registers in place."""
    if h.size == 0:
        return
    bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = np.where(
        w > 0,
        (64 - HLL_P) - _floor_log2_u64(w),
        64 - HLL_P + 1,
    ).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the small-range (linear counting)
    correction; 64-bit hashes need no large-range correction."""
    m = float(HLL_M)
    E = _ALPHA * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if E <= 2.5 * m:
        V = int((regs == 0).sum())
        if V > 0:
            return m * np.log(m / V)
    return float(E)


def _mix_u64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates structured integer keys."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class _HllPartials:
    """documents batches -> per-scope register partials, pre-reduced to
    <= m rows per (scope, batch): (scope, reg, rank)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.extras.dedup import (
            _shingle_arrays,
            _shingle_u64,
            _xxhash64,
        )
        from ciff_ray.tokenizer import term_frequencies

        n = len(batch)
        local = batch.append_column(
            "_row", pa.array(np.arange(n, dtype=np.int64))
        ).select(["_row", "text"])
        tf = term_frequencies(local, id_col="_row")
        terms = tf["term"].combine_chunks()
        th = _xxhash64(terms, seed=0x5EED_0001)
        rows = tf["_row"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_ids = (
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        # posting identity = mix(doc_hash ^ term_hash): doc_id must be
        # the GLOBAL id so partials merge across batches
        ph = _mix_u64(_mix_u64(doc_ids[rows.astype(np.int64)]) ^ th)
        sh, _parents = _shingle_arrays(batch)
        shh = _shingle_u64(sh)

        out_scope, out_reg, out_rank = [], [], []
        for scope, h in (
            ("terms", th),
            ("postings", ph),
            ("shingles", shh),
        ):
            regs = np.zeros(HLL_M, dtype=np.uint8)
            _hll_update(regs, np.ascontiguousarray(h, dtype=np.uint64))
            nz = np.flatnonzero(regs)
            out_scope.extend([scope] * nz.size)
            out_reg.extend(nz.tolist())
            out_rank.extend(regs[nz].tolist())
        return pa.table(
            {
                "scope": pa.array(out_scope, type=pa.string()),
                "reg": pa.array(out_reg, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def _hll_final(group: pa.Table) -> pa.Table:
    scope = group["scope"][0].as_py()
    regs = np.zeros(HLL_M, dtype=np.uint8)
    reg = group["reg"].to_numpy(zero_copy_only=False)
    rank = group["rank"].to_numpy(zero_copy_only=False).astype(np.uint8)
    np.maximum.at(regs, reg, rank)
    return pa.table(
        {
            "scope": pa.array([scope], type=pa.string()),
            "n_est": pa.array(
                [int(round(hll_estimate(regs)))], type=pa.int64()
            ),
        }
    )


def q_approx_distinct(sf_dir: str) -> ray.data.Dataset:
    """HLL distinct-count estimates (scope, n_est) for vocabulary
    terms, postings, and word-3-gram shingles — one streaming pass,
    partials <= m rows per batch, one tiny groupby merge."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return (
        docs.map_batches(
            _HllPartials, batch_format="pyarrow", concurrency=(1, 4)
        )
        .groupby("scope")
        .map_groups(_hll_final, batch_format="pyarrow")
    )


QUERIES = {"approx_distinct": q_approx_distinct}  # rows-only (approximate)
ORACLE_SQLS: dict[str, str] = {}
