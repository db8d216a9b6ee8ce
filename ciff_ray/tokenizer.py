"""Deterministic tokenizer + per-turn term-frequency stage.

The reference delegates tokenization to the exporting application (CIFF
Header `description` documents the pipeline,
/root/reference/proto/common-index-format-v1.proto:31-33).  This engine
pins its own rule — lowercase, split on ``[^a-z0-9]+``, drop empties —
chosen to be expressible identically in pyarrow
(`utf8_lower` + `split_pattern_regex`) and ANSI-SQL/DuckDB
(`lower` + `string_split_regex`), so the DuckDB oracle and the Ray
pipeline tokenize bit-identically.

All stages are pure, vectorized `map_batches` bodies over zero-copy
Arrow batches — no Python loop touches a row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_PATTERN = r"[^a-z0-9]+"
# Same tokenizer for the DuckDB oracle, as a SQL fragment over column {col}.
SQL_TOKENIZE_FRAGMENT = "string_split_regex(lower({col}), '[^a-z0-9]+')"


def tokenize_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string column -> large_list<string> of tokens (empties kept;
    callers filter).  Zero-copy Arrow kernels throughout."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if text.type != pa.string() and text.type != pa.large_string():
        text = text.cast(pa.string())
    if text.null_count:
        text = pc.fill_null(text, "")
    toks = pc.split_pattern_regex(pc.utf8_lower(text), pattern=TOKEN_SPLIT_PATTERN)
    return toks


def flatten_tokens(
    toks: pa.Array, parent_ids: np.ndarray
) -> tuple[pa.Array, np.ndarray]:
    """list<string> tokens + per-row ids -> (flat term array, flat id array),
    with empty-string tokens removed.  Vectorized via list_parent_indices."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    ids = np.asarray(parent_ids)[parents[keep_np]]
    return flat, ids


def term_frequencies(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """One batch of (id, text) -> (id, term, tf) with tf = within-turn
    count.  In-batch partial aggregation (SURVEY.md §2.4 T2 pre-combine):
    the downstream shuffle only sees one row per (doc, term)."""
    toks = tokenize_column(batch["text"])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    flat_terms, flat_ids = flatten_tokens(toks, ids)
    if len(flat_terms) == 0:
        return pa.table(
            {
                id_col: pa.array([], type=batch.schema.field(id_col).type),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int32()),
            }
        )
    tmp = pa.table({id_col: pa.array(flat_ids), "term": flat_terms})
    counted = tmp.group_by([id_col, "term"]).aggregate([([], "count_all")])
    return counted.rename_columns([id_col, "term", "tf"]).set_column(
        2, "tf", pc.cast(counted.column(2), pa.int32())
    )


def token_ids(text, analyzer: str = "") -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(term dictionary, per-token term index, per-token row index) for a
    text column.  (A byte-level ASCII fast path was measured here and
    REVERTED: its 2-D gather of fixed-width token keys looked fine
    single-stream but collapsed under full-node concurrency — RE2 split
    + Arrow dictionary hashing stream caches far better.)

    ``analyzer`` (e.g. "porter", see ciff_ray.analysis) is applied to
    the DICTIONARY — once per unique term of the batch, vocabulary-
    scale — and variants collapsing to one stem merge via an index
    remap; token count (doclength) is unaffected."""
    toks = tokenize_column(text)
    n = len(toks)
    flat_terms, flat_rows = flatten_tokens(toks, np.arange(n, dtype=np.int64))
    if len(flat_terms) == 0:
        return (
            pa.array([], type=pa.string()),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    dict_arr = pc.dictionary_encode(flat_terms)
    idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = dict_arr.dictionary
    if analyzer:
        from ciff_ray.analysis import analyze_dictionary

        dictionary, remap = analyze_dictionary(dictionary, analyzer)
        idx = remap[idx]
    return (dictionary, idx, flat_rows.astype(np.int64))


def doc_lengths(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, text) -> (id, doclength) where doclength = token count of the
    turn (Σ tf — the natural-text rule, SURVEY.md §1.3; NOT the JSONL
    unique-term rule of /root/reference/src/lib.rs:1029-1046)."""
    toks = tokenize_column(batch["text"])
    flat = pc.list_flatten(toks)
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int32())
    # per-row token count = sum of non-empty flags within each list
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = np.zeros(len(batch), dtype=np.int32)
    np.add.at(counts, parents, nonempty.to_numpy(zero_copy_only=False))
    return pa.table({id_col: batch[id_col], "doclength": pa.array(counts)})
