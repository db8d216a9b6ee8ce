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

MIX_HASH_MULT = 2654435761  # Knuth multiplicative hash
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
    # residues first: (id % M) * (MULT % M) stays far inside int64 for
    # ANY doc_id, and equals (id * MULT) % M in exact arithmetic — the
    # raw product silently wraps in numpy above ~3.5e9 ids while the
    # SQL side raises, breaking cross-engine reproducibility
    return ((doc_id % MIX_MOD) * np.int64(MIX_HASH_MULT % MIX_MOD)) % MIX_MOD < rate


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


# ---------------------------------------------------------------------------
# token-budget sequence packing (concat-then-chunk)

PACK_BUDGET = 512  # tokens per training sequence (context window)
PACK_RANGE_BITS = 20  # docID ranges for the distributed prefix sum


def q_pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """Concat-then-chunk context-window packing — the step that turns a
    document stream into fixed-budget training sequences: concatenate
    all token streams in docID order, cut every PACK_BUDGET tokens,
    assign each document the bin where its FIRST token lands
    (bin = exclusive-prefix-token-count // budget).

    Distributed prefix sum with no row shuffle of the corpus text:
    (1) one tokenize pass -> narrow (doc_id, ntok) rows;
    (2) per-docID-range token sums (tiny: one row per 2^20 docs) are
        prefix-summed on the driver and broadcast;
    (3) groupby(range_id) co-locates only the 16-byte/doc narrow rows;
        each group sorts by docID, cumsums, adds its range offset.
    At 10^12 docs the range table is ~1M rows — driver-safe."""
    from ciff_ray.extras.textstats import _per_row_nonempty_counts
    from ciff_ray.tokenizer import tokenize_column

    def _tok(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ntok = _per_row_nonempty_counts(tokenize_column(batch["text"]), n)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, type=pa.int64()),
                "ntok": pa.array(ntok, type=pa.int64()),
                "range_id": pa.array(did >> PACK_RANGE_BITS, type=pa.int64()),
            }
        )

    narrow = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(_tok, batch_format="pyarrow")
        .materialize()  # consumed twice: range partials + the pack groupby
    )

    def _range_partials(t: pa.Table) -> pa.Table:
        rid = t["range_id"].to_numpy(zero_copy_only=False)
        ntok = t["ntok"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(rid, return_inverse=True)
        return pa.table(
            {
                "range_id": pa.array(u, type=pa.int64()),
                "tok_sum": pa.array(
                    np.bincount(inv, weights=ntok).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    parts = narrow.map_batches(_range_partials, batch_format="pyarrow").take_all()
    n_ranges = 1 + max((int(r["range_id"]) for r in parts), default=0)
    sums = np.zeros(n_ranges, dtype=np.int64)
    for r in parts:
        sums[int(r["range_id"])] += int(r["tok_sum"])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    offsets_ref = ray.put(offsets)

    def _assign(group: pa.Table, *, oref=offsets_ref) -> pa.Table:
        offs = ray.get(oref)
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = group["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(did)
        did, ntok = did[order], ntok[order]
        prev = np.concatenate([[0], np.cumsum(ntok)[:-1]]) + offs[
            int(did[0] >> PACK_RANGE_BITS)
        ]
        return pa.table(
            {
                "doc_id": pa.array(did, type=pa.int64()),
                "ntok": pa.array(ntok, type=pa.int64()),
                "bin_id": pa.array(prev // PACK_BUDGET, type=pa.int64()),
            }
        )

    return narrow.groupby("range_id").map_groups(_assign, batch_format="pyarrow")


ORACLE_SQLS = {
    "pack_sequences": f"""WITH r AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS ntok
  FROM documents
),
c AS (
  SELECT doc_id, ntok,
         COALESCE(SUM(ntok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM r
)
SELECT doc_id, CAST(ntok AS BIGINT) AS ntok,
       CAST(prev // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM c""",
    "source_mixture": f"""SELECT source,
       CAST(25 * (1 + CAST(substr(source, 4) AS BIGINT) % 4) AS BIGINT)
         AS rate_pct,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN ((doc_id % {MIX_MOD}) * {MIX_HASH_MULT % MIX_MOD}) % {MIX_MOD}
                          < 25 * (1 + CAST(substr(source, 4) AS BIGINT) % 4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source""",
}

QUERIES = {
    "source_mixture": q_source_mixture,
    "pack_sequences": q_pack_sequences,
}
