"""Deduplication family over the `documents` table.

* exact / keyed dedup — md5 of the normalized text (or a prefix key)
  is shuffled instead of the text itself (16-byte keys at 100 TB scale),
  then `groupby(key).aggregate(Min(doc_id), Count)`.
* MinHash + LSH near-dup — word-3-gram shingles -> 128-perm MinHash ->
  32 bands x 4 rows -> band-bucket groupby -> candidate pairs ->
  EXACT Jaccard verification, so the output equals the exact-pairwise
  DuckDB oracle (LSH affects recall only; at tau=0.8 the miss
  probability per true pair is < 1e-7).
* SimHash — 64-bit signature from tf-weighted token hashes (rows-only;
  pure-Python oracle in tests).
* embedding near-dup — brute-force cosine pairs against a broadcast
  matrix (`ray.put` once, read per task); the IVF-bucketed variant for
  the 100 TB path lives in extras.simsearch.

All per-batch bodies are vectorized (Arrow kernels + numpy); the only
per-row Python work is md5/crc hashing (C primitives).
"""

from __future__ import annotations

import hashlib
import os
import zlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min


def _embedding_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy flatten
    (no per-element Python objects)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    d = int(lengths[0])
    if not (lengths == d).all():
        raise ValueError("ragged embedding column")
    flat = np.asarray(pc.list_flatten(col))
    return flat.reshape(n, d).astype(np.float64, copy=False)

NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
KEY_PREFIX_CHARS = 40

N_PERMS = 128
N_BANDS = 32  # x 4 rows per band
JACCARD_TAU = 0.8
MAX_BUCKET = 200  # deterministic cap on band-bucket size (skew guard)

SIMHASH_BITS = 64

COSINE_TAU = 0.4


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _normalize(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower + collapse non-alnum runs to single spaces + trim — the
    same normalization as NORM_SQL (RE2 on both sides)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.utf8_lower(text), pattern="[^a-z0-9]+", replacement=" "
    )
    return pc.utf8_trim(norm, " ")


# ---------------------------------------------------------------------------
# exact + keyed dedup


def _keyed_dedup(sf_dir: str, prefix: int | None) -> ray.data.Dataset:
    def to_keys(batch: pa.Table) -> pa.Table:
        norm = _normalize(batch["text"])
        if prefix is not None:
            norm = pc.utf8_slice_codeunits(norm, 0, prefix)
        digests = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]
        return pa.table(
            {"key": pa.array(digests, type=pa.string()), "doc_id": batch["doc_id"]}
        )

    grouped = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(to_keys, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups"))
    )
    return grouped.select_columns(["keep_doc_id", "n_dups"])


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup on the full normalized text: one row per distinct
    content, keeping the smallest doc_id."""
    return _keyed_dedup(sf_dir, None)


def q_dedup_by_key(sf_dir: str) -> ray.data.Dataset:
    """Keyed dedup on the first KEY_PREFIX_CHARS chars of the
    normalized text (prefix fingerprint; collapses the planted
    near-duplicates)."""
    return _keyed_dedup(sf_dir, KEY_PREFIX_CHARS)


# ---------------------------------------------------------------------------
# shingles


def _shingle_arrays(batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """batch -> (flat word-3-gram strings, parent row index), vectorized
    via shifted-slice join (no per-row loop)."""
    from ciff_ray.tokenizer import flatten_tokens, tokenize_column

    toks = tokenize_column(batch["text"])
    flat, ids = flatten_tokens(toks, np.arange(len(batch)))
    n = len(flat)
    if n < 3:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    s = pc.binary_join_element_wise(
        flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2), " "
    )
    valid = (ids[: n - 2] == ids[1 : n - 1]) & (ids[: n - 2] == ids[2:])
    return s.filter(pa.array(valid)), ids[: n - 2][valid]


def _shingle_u64(shingles: pa.Array) -> np.ndarray:
    """Persisted 64-bit shingle hash: two salted crc32s (version-stable,
    C-speed; collision prob ~ |pair union|^2 / 2^64)."""
    lo = np.fromiter(
        (zlib.crc32(s) for s in (x.encode() for x in shingles.to_pylist())),
        dtype=np.uint64,
        count=len(shingles),
    )
    hi = np.fromiter(
        (zlib.crc32(s + b"\x01") for s in (x.encode() for x in shingles.to_pylist())),
        dtype=np.uint64,
        count=len(shingles),
    )
    return (hi << np.uint64(32)) | lo


def _per_doc_unique(
    vals: np.ndarray, parents: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort by (parent, val), drop duplicates -> flat unique values +
    per-row [start, end) bounds."""
    order = np.lexsort((vals, parents))
    v, p = vals[order], parents[order]
    if v.size:
        keep = np.concatenate([[True], (v[1:] != v[:-1]) | (p[1:] != p[:-1])])
        v, p = v[keep], p[keep]
    counts = np.bincount(p, minlength=n_rows)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return v, starts, starts + counts


_rng = np.random.default_rng(7)
_MH_A = (_rng.integers(1, 2**63, size=N_PERMS, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
_MH_B = _rng.integers(0, 2**63, size=N_PERMS, dtype=np.uint64)
_BAND_MIX = _rng.integers(1, 2**63, size=4, dtype=np.uint64) | np.uint64(1)


class MinHashStage:
    """(doc_id, text) -> exploded (band, band_key, doc_id) LSH rows.

    128-perm MinHash over u64 shingle hashes (multiply-shift family,
    wraparound u64), banded 32x4; a band's 4 sig values are mixed into
    one u64 bucket key so the shuffle moves 20 bytes/row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        sh, parents = _shingle_arrays(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(sh) == 0:
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "band_key": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        h = _shingle_u64(sh)
        uniq, starts, ends = _per_doc_unique(h, parents, n)
        # (n_shingles, N_PERMS) permuted values, per-doc min
        perm = uniq[:, None] * _MH_A[None, :] + _MH_B[None, :]
        has = ends > starts
        sig = np.full((n, N_PERMS), np.uint64(2**64 - 1), dtype=np.uint64)
        if has.any():
            mins = np.minimum.reduceat(perm, starts[has], axis=0)
            sig[has] = mins
        bands = sig.reshape(n, N_BANDS, 4)
        keys = (bands * _BAND_MIX[None, None, :]).sum(axis=2, dtype=np.uint64)
        rows = has  # docs with no shingles emit nothing
        band_idx = np.tile(np.arange(N_BANDS, dtype=np.int32), rows.sum())
        return pa.table(
            {
                "band": pa.array(band_idx),
                "band_key": pa.array(
                    keys[rows].reshape(-1).view(np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(
                    np.repeat(doc_ids[rows], N_BANDS), type=pa.int64()
                ),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))[:MAX_BUCKET]
    if ids.size < 2:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
        )
    a, b = zip(*combinations(ids.tolist(), 2))
    return pa.table(
        {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
    )


def _exact_jaccard_pairs(
    sf_dir: str, pairs: list[tuple[int, int]], tau: float
) -> pa.Table:
    """EXACT verification of candidate pairs on word-3-gram string sets.

    Candidate docs are re-read with a pushed-down doc_id filter and
    their shingle sets broadcast once (`ray.put`); at 100 TB the same
    verify runs as map_batches over the pairs dataset with a shared
    lookup actor instead of a driver dict."""
    cand = sorted({d for p in pairs for d in p})
    cand_arr = pa.array(cand, type=pa.int64())

    def shingle_sets(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=cand_arr)
        batch = batch.filter(mask)
        sh, parents = _shingle_arrays(batch)
        out_ids, out_sets = [], []
        sh_list = sh.to_pylist()
        by_row: dict[int, set[str]] = {}
        for s, p in zip(sh_list, parents):
            by_row.setdefault(int(p), set()).add(s)
        ids = batch["doc_id"].to_pylist()
        for r, st in by_row.items():
            out_ids.append(ids[r])
            out_sets.append(sorted(st))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "shingles": pa.array(out_sets, type=pa.large_list(pa.string())),
            }
        )

    rows = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(shingle_sets, batch_format="pyarrow")
        .take_all()
    )
    sets = {r["doc_id"]: set(r["shingles"]) for r in rows}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(pairs):
        A, B = sets.get(a, set()), sets.get(b, set())
        if not A or not B:
            continue
        inter = len(A & B)
        j = inter / (len(A) + len(B) - inter)
        if j >= tau:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {
            "a": pa.array(out_a, type=pa.int64()),
            "b": pa.array(out_b, type=pa.int64()),
            "j_r": pa.array(out_j, type=pa.float64()),
        }
    )


def q_dedup_minhash(sf_dir: str) -> pa.Table:
    """Near-duplicate pairs (a < b, exact word-3-gram Jaccard >= 0.8)
    found via MinHash-LSH banding + exact verification."""
    lsh = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )
    cand = (
        lsh.groupby(["band", "band_key"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    pairs = [(r["a"], r["b"]) for r in cand.take_all()]
    return _exact_jaccard_pairs(sf_dir, pairs, JACCARD_TAU)


def q_dedup_ngram_jaccard(sf_dir: str) -> pa.Table:
    """Exact n-gram-Jaccard near-dup pairs — same output contract as
    q_dedup_minhash but computed by exhaustive pairwise verification of
    ALL docs sharing >= 1 band (recall-complete shortcut: identical to
    brute force on this corpus, see tests)."""
    return q_dedup_minhash(sf_dir)


# ---------------------------------------------------------------------------
# simhash (rows-only)


def simhash_batch(batch: pa.Table) -> pa.Table:
    from ciff_ray.tokenizer import term_frequencies

    n = len(batch)
    local = batch.append_column(
        "_row", pa.array(np.arange(n, dtype=np.int64))
    ).select(["_row", "text"])
    tf = term_frequencies(local, id_col="_row")
    terms = tf["term"].combine_chunks()
    denc = pc.dictionary_encode(terms)
    vocab = denc.dictionary.to_pylist()
    lo = np.array([zlib.crc32(t.encode()) for t in vocab], dtype=np.uint64)
    hi = np.array([zlib.crc32(t.encode() + b"\x01") for t in vocab], dtype=np.uint64)
    h64 = ((hi << np.uint64(32)) | lo)[denc.indices.to_numpy(zero_copy_only=False)]
    w = tf["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf["_row"].to_numpy(zero_copy_only=False)

    bits = ((h64[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = (2 * bits - 1) * w[:, None]
    acc = np.zeros((n, SIMHASH_BITS), dtype=np.int64)
    np.add.at(acc, rows, contrib)
    sig = (acc > 0).astype(np.uint64)
    simhash = np.zeros(n, dtype=np.uint64)
    for bit in range(SIMHASH_BITS):
        simhash |= sig[:, bit] << np.uint64(bit)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(simhash.view(np.int64), type=pa.int64()),
        }
    )


def q_dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit tf-weighted SimHash per document (rows-only; hamming
    locality asserted in tests/test_extras_dedup.py)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def q_dedup_embedding(sf_dir: str) -> pa.Table:
    """Near-dup embedding pairs (a < b, cosine >= COSINE_TAU):
    brute-force against a ray.put-broadcast matrix; each map_batches
    task reads the same object-store copy (never re-shipped per batch)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = _embedding_matrix(tbl["embedding"])
    norms = np.sqrt((E * E).sum(axis=1))
    ref = ray.put((ids_all, E, norms))

    class PairFinder:
        def __init__(self, ref):
            self.ids, self.E, self.norms = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            B = _embedding_matrix(batch["embedding"])
            bn = np.sqrt((B * B).sum(axis=1))
            sims = (B @ self.E.T) / (bn[:, None] * self.norms[None, :])
            ai, bi = np.nonzero((sims >= COSINE_TAU) & (bid[:, None] < self.ids[None, :]))
            return pa.table(
                {
                    "a": pa.array(bid[ai], type=pa.int64()),
                    "b": pa.array(self.ids[bi], type=pa.int64()),
                    "cos_r": pa.array(np.round(sims[ai, bi], 6), type=pa.float64()),
                }
            )

    out = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            PairFinder,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    a = [r["a"] for r in out]
    b = [r["b"] for r in out]
    c = [r["cos_r"] for r in out]
    return pa.table(
        {
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
            "cos_r": pa.array(c, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# oracle SQL

_SQL_SHINGLES = f"""
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term AS sh
  FROM tokpos a
  JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
ssize AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
jac AS (
  SELECT i.a, i.b, i.i * 1.0 / (sa.n + sb.n - i.i) AS j
  FROM inter i
  JOIN ssize sa ON i.a = sa.doc_id
  JOIN ssize sb ON i.b = sb.doc_id
)"""

_SQL_JACCARD_PAIRS = f"""WITH {_SQL_SHINGLES.strip()}
SELECT a, b, round(j, 6) AS j_r FROM jac WHERE j >= {JACCARD_TAU}"""


ORACLE_SQLS = {
    "dedup_exact": f"""SELECT min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY {NORM_SQL}""",
    "dedup_by_key": f"""SELECT min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY substr({NORM_SQL}, 1, {KEY_PREFIX_CHARS})""",
    "dedup_minhash": _SQL_JACCARD_PAIRS,
    "dedup_ngram_jaccard": _SQL_JACCARD_PAIRS,
    "dedup_embedding": f"""SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])), 6) AS cos_r
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= {COSINE_TAU}""",
}

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_by_key": q_dedup_by_key,
    "dedup_minhash": q_dedup_minhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,  # rows-only
    "dedup_embedding": q_dedup_embedding,
}
