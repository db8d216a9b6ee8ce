"""Sliding-window document chunking — the split-for-context-window step
every RAG / training-data pipeline runs before embedding or packing.

Each document's normalized token stream is cut into CHUNK_TOKENS-token
windows advancing CHUNK_STRIDE tokens (CHUNK_TOKENS - CHUNK_STRIDE
tokens of overlap), the standard recipe for not losing cross-boundary
context.  One output row per chunk: (doc_id, chunk_idx, n_tokens,
chunk_text) — the variable-rate explode shape (cf. media frames).

Fully vectorized: the batch kernel runs on the flat UTF-8 buffer of the
NORMALIZED text column (lower + collapse non-alnum runs to single
spaces — the same normalization textstats/dedup use, mirrored in the
SQL oracle), finds token boundaries as space positions with one mask,
and materializes every chunk string with repeat/arange gather math —
no per-row Python.  Chunk text is byte-identical to the oracle's
`array_to_string(list_slice(tokens, ...), ' ')` because normalized
text IS single-space-joined tokens.

Scale: stateless map_batches, no shuffle, no driver materialization;
output is written/consumed streaming.  At 100 TB this stage is
embarrassingly parallel and bounded by read bandwidth.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def _normalized(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The package's canonical normalization (single shared impl —
    dedup/textstats and every SQL oracle mirror the same contract)."""
    from ciff_ray.extras.dedup import _normalize

    return _normalize(text)


_EMPTY = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("n_tokens", pa.int64()),
        ("chunk_text", pa.large_string()),
    ]
).empty_table()


def chunk_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per sliding-window chunk."""
    norm = pc.cast(_normalized(batch["text"]), pa.large_string())
    if norm.offset != 0:
        norm = pa.concat_arrays([norm])
    off = np.frombuffer(norm.buffers()[1], dtype=np.int64)[: len(norm) + 1]
    flat = np.frombuffer(norm.buffers()[2], dtype=np.uint8)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    # token boundaries: spaces in the normalized flat buffer
    sp = np.nonzero(flat == 0x20)[0]
    sp_doc = np.searchsorted(off, sp, side="right") - 1
    n_bytes = np.diff(off)
    n_sp = np.bincount(sp_doc, minlength=doc_ids.size) if sp.size else np.zeros(
        doc_ids.size, dtype=np.int64
    )
    n_tok = np.where(n_bytes > 0, n_sp + 1, 0).astype(np.int64)

    # per-doc token start/end byte positions, flattened in doc order:
    # starts = doc_start then each space+1; ends = each space then doc_end
    tot_tok = int(n_tok.sum())
    if tot_tok == 0:
        return _EMPTY
    tok_doc = np.repeat(np.arange(doc_ids.size), n_tok)
    tok_bounds = np.cumsum(n_tok) - n_tok  # first token row of each doc
    tok_ord = np.arange(tot_tok) - tok_bounds[tok_doc]
    tok_starts = np.empty(tot_tok, dtype=np.int64)
    tok_ends = np.empty(tot_tok, dtype=np.int64)
    first = tok_ord == 0
    last = tok_ord == (n_tok[tok_doc] - 1)
    tok_starts[first] = off[:-1][np.nonzero(n_tok > 0)[0]]
    # non-first token k of a doc starts right after that doc's (k-1)-th
    # space; spaces are already in (doc, position) order
    tok_starts[~first] = sp + 1
    tok_ends[~last] = sp
    tok_ends[last] = off[1:][np.nonzero(n_tok > 0)[0]]

    C, S = CHUNK_TOKENS, CHUNK_STRIDE
    n_chunks = np.where(
        n_tok > 0, 1 + np.maximum(0, -(-(n_tok - C) // S)), 0
    ).astype(np.int64)
    tot_ch = int(n_chunks.sum())
    ch_doc = np.repeat(np.arange(doc_ids.size), n_chunks)
    ch_bounds = np.cumsum(n_chunks) - n_chunks
    ch_idx = np.arange(tot_ch) - ch_bounds[ch_doc]
    tok_lo = ch_idx * S  # first token ordinal of the chunk
    tok_hi = np.minimum(tok_lo + C, n_tok[ch_doc])  # exclusive
    byte_lo = tok_starts[tok_bounds[ch_doc] + tok_lo]
    byte_hi = tok_ends[tok_bounds[ch_doc] + tok_hi - 1]

    # gather every chunk's bytes in one flat arange pass
    lens = byte_hi - byte_lo
    out_starts = np.cumsum(lens) - lens
    rep = np.repeat(np.arange(tot_ch), lens)
    src = np.arange(int(lens.sum())) - out_starts[rep] + byte_lo[rep]
    payload = flat[src]
    chunk_text = pa.Array.from_buffers(
        pa.large_string(),
        tot_ch,
        [
            None,
            pa.py_buffer(
                np.concatenate([out_starts, [payload.size]])
                .astype(np.int64)
                .tobytes()
            ),
            pa.py_buffer(payload.tobytes()),
        ],
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[ch_doc], type=pa.int64()),
            "chunk_idx": pa.array(ch_idx, type=pa.int64()),
            "n_tokens": pa.array(tok_hi - tok_lo, type=pa.int64()),
            "chunk_text": chunk_text,
        }
    )


def q_chunk_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(chunk_batch, batch_format="pyarrow")


ORACLE_SQLS = {
    "chunk_docs": f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
ch AS (
  SELECT s.doc_id, s.t, s.n, CAST(g.k AS BIGINT) AS chunk_idx
  FROM sized s, LATERAL (
    SELECT unnest(generate_series(0,
      CAST(CASE WHEN s.n <= {CHUNK_TOKENS} THEN 0
           ELSE ceil((s.n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) END
           AS BIGINT))) AS k
  ) g
)
SELECT doc_id, chunk_idx,
       CAST(least({CHUNK_TOKENS}, n - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
         AS n_tokens,
       array_to_string(
         list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1,
                    least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)),
         ' ') AS chunk_text
FROM ch""",
}

QUERIES = {
    "chunk_docs": q_chunk_docs,
}
