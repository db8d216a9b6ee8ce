"""Deterministic weighted mixture sampling over the `documents` table —
the "mix sources at different rates" step every training-data pipeline
runs before tokenization.

The sampling decision is a PURE FUNCTION of the row key (keep iff
(doc_id * 2654435761) % 100 < rate(source)), so it is (a) exactly
reproducible across engines and runs with no RNG state, (b) stable
under retries and resumes (a re-executed task keeps the same rows),
and (c) shuffle-free — each map task decides its own rows, and only
per-(batch, source) partial counts move.  Per-source rates are derived
from the source id (25/50/75/100% by source index mod 4) to exercise
genuinely mixed weights.

`q_source_mixture` returns the per-source accounting (rate, total,
kept) — the driver-comparable summary; the sampled ROWS themselves are
the same `keep` mask applied in a filter (`sample_documents`).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

MIX_HASH_MULT = 2654435761  # Knuth multiplicative hash, fits int64 here
MIX_MOD = 100


def _source_nums(src: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """'srcN' -> N (int64)."""
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    return (
        pc.cast(pc.utf8_slice_codeunits(src, 3, 32), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _rates(src_num: np.ndarray) -> np.ndarray:
    return 25 * (1 + src_num % 4)


def _keep_mask(doc_id: np.ndarray, rate: np.ndarray) -> np.ndarray:
    return (doc_id * np.int64(MIX_HASH_MULT)) % MIX_MOD < rate


def sample_documents(sf_dir: str) -> ray.data.Dataset:
    """The sampled rows themselves (doc_id, source) — a stateless
    filter, no shuffle."""

    def _filt(batch: pa.Table) -> pa.Table:
        num = _source_nums(batch["source"])
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_keep_mask(did, _rates(num))))

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    ).map_batches(_filt, batch_format="pyarrow")


def _mix_partials(batch: pa.Table) -> pa.Table:
    num = _source_nums(batch["source"])
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = _keep_mask(did, _rates(num))
    u, inv = np.unique(num, return_inverse=True)
    n_total = np.bincount(inv).astype(np.int64)
    n_kept = np.bincount(inv, weights=keep).astype(np.int64)
    return pa.table(
        {
            "src_num": pa.array(u, type=pa.int64()),
            "n_total": pa.array(n_total, type=pa.int64()),
            "n_kept": pa.array(n_kept, type=pa.int64()),
        }
    )


def q_source_mixture(sf_dir: str) -> ray.data.Dataset:
    """Per-source mixture-sampling accounting: (source, rate_pct,
    n_total, n_kept).  Per-batch partials + one tiny groupby — the
    corpus itself never shuffles."""

    def _final(t: pa.Table) -> pa.Table:
        num = t["src_num"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(
                    [f"src{int(x)}" for x in num], type=pa.string()
                ),
                "rate_pct": pa.array(_rates(num), type=pa.int64()),
                "n_total": t["n_total"],
                "n_kept": t["n_kept"],
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source"],
        )
        .map_batches(_mix_partials, batch_format="pyarrow")
        .groupby("src_num")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_kept", alias_name="n_kept"),
        )
        .map_batches(_final, batch_format="pyarrow")
    )


ORACLE_SQLS = {
    "source_mixture": f"""SELECT source,
       CAST(25 * (1 + CAST(substr(source, 4) AS BIGINT) % 4) AS BIGINT)
         AS rate_pct,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN (doc_id * {MIX_HASH_MULT}) % {MIX_MOD}
                          < 25 * (1 + CAST(substr(source, 4) AS BIGINT) % 4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source""",
}

QUERIES = {
    "source_mixture": q_source_mixture,
}
