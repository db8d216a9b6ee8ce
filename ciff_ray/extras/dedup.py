"""Deduplication family over the `documents` table.

* exact / keyed dedup — a vectorized 128-bit content hash (two seeded
  xxhash64 passes over the normalized text) is shuffled instead of the
  text itself (16 bytes/row at 100 TB scale), then
  `groupby(key).aggregate(Min(doc_id), Count)`.
* MinHash + LSH near-dup — word-3-gram shingles -> 128-perm MinHash ->
  32 bands x 4 rows -> band-bucket groupby -> candidate pairs ->
  EXACT Jaccard verification as a distributed `map_batches` stage over
  the candidate-pair Dataset (the shingle sets of candidate docs are
  object-store blocks fetched once per verify actor — the driver holds
  only refs, never pairs or sets).  Output equals the exact-pairwise
  DuckDB oracle (LSH affects recall only; at tau=0.8 the per-pair miss
  probability is < 1e-7).
* n-gram Jaccard near-dup — same output contract, DIFFERENT algorithm:
  recall-complete inverted-index self-join (shingle -> co-occurring doc
  pairs -> intersection counts -> Jaccard), no LSH screen.  The shuffle
  moves 16-byte (shingle_hash, doc_id) rows, pre-aggregated per hash
  partition.
* SimHash — 64-bit signature from tf-weighted token hashes (rows-only;
  pure-Python oracle in tests).
* embedding near-dup — EXACT all-pairs-above-tau.  On this corpus the
  embeddings are isotropic Gaussians (measured: pairs at cos in
  [0.4, 0.5] are the random tail, dim 64), so at tau=0.4 no LSH/centroid
  bucketing can keep recall=1 — SRP-LSH at theta=66deg needs so many
  bands that nearly every pair stays a candidate.  The exact contract is
  therefore inherently Theta(N^2) FLOPs; what CAN scale is the memory
  and distribution shape: vectors are split into row blocks and each
  (block_i, block_j) cell is scored by an independent task against two
  object-store blocks (O(block^2) memory, no whole-matrix broadcast, no
  driver materialization).  For web-scale *near*-dup at high tau, the
  LSH screen (q_dedup_minhash) or the IVF path (extras.simsearch) is
  the right tool.

All per-batch bodies are vectorized (Arrow kernels + numpy + polars
xxhash); there are no per-row Python hash loops on the hot path.
"""

from __future__ import annotations

import os
import zlib

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
LSH_PARTS = 64  # hash partitions for the band-bucket pair emit
NGRAM_PARTS = 32  # hash partitions for the inverted-index self-join
# df-cap for the ngram self-join: a shingle present in >= NGRAM_DF_CAP
# docs is dropped from the shingle universe (sizes AND intersections) —
# the quadratic skew guard: a stopword-scale shingle shared by k docs
# would emit k(k-1)/2 pairs.  The oracle applies the SAME cap (HAVING
# count(*) < cap), so exactness against the capped contract holds.
NGRAM_DF_CAP = 128

SIMHASH_BITS = 64

COSINE_TAU = 0.4
EMB_BLOCK_ROWS = 100_000  # ~50 MB of f64x64 vectors per block cell side


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


def _xxhash64(arr: pa.Array, seed: int) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow string array (polars xxhash —
    C-speed over the Arrow buffers, no Python string objects).
    Run-scoped: used for in-flight keys and signatures, never persisted
    to index files (polars does not promise cross-version stability)."""
    import polars as pl

    s = pl.from_arrow(arr)
    return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)


def _dataset_refs(ds: ray.data.Dataset) -> list:
    """Materialize a (small-side) dataset into object-store blocks and
    return the block refs — the broadcast handle verify actors fetch
    once in __init__ (the driver never holds the rows).

    Consumers MUST tolerate zero-column blocks: Ray 2.49 propagates
    empty blocks from filter-pruned read fragments through operator
    boundaries WITHOUT running the UDF (the executor logs "RefBundle
    with a different schema ... new schema: ."), so a ref list can
    contain schema-less tables — whether one lands is a parallelism
    race (reproduced at num_cpus=32, absent at 8).  Use _ref_tables."""
    return ds.materialize().to_arrow_refs()


def _ref_tables(refs, required: str):
    """Fetch broadcast block refs, skipping Ray's zero-column empty
    blocks (see _dataset_refs) and any block lacking `required`."""
    for ref in refs:
        t = ray.get(ref)
        if t.num_rows == 0 or required not in t.schema.names:
            continue
        yield t.combine_chunks()


def _ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenated [start, end) index ranges, fully vectorized:
    equivalent to np.concatenate([np.arange(s, e) for s, e in ...])."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    base = np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    return base + np.arange(total, dtype=np.int64)


# ---------------------------------------------------------------------------
# exact + keyed dedup


def _keyed_dedup(sf_dir: str, prefix: int | None) -> ray.data.Dataset:
    def to_keys(batch: pa.Table) -> pa.Table:
        norm = _normalize(batch["text"])
        if prefix is not None:
            norm = pc.utf8_slice_codeunits(norm, 0, prefix)
        # two seeded xxhash64 passes = a 128-bit key; collision prob at
        # 10^12 distinct contents ~ 10^24/2^128 ~ 3e-15
        k1 = _xxhash64(norm, seed=0x9E3779B97F4A7C15)
        k2 = _xxhash64(norm, seed=0xC2B2AE3D27D4EB4F)
        return pa.table(
            {
                "k1": pa.array(k1.view(np.int64), type=pa.int64()),
                "k2": pa.array(k2.view(np.int64), type=pa.int64()),
                "doc_id": batch["doc_id"],
            }
        )

    grouped = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(to_keys, batch_format="pyarrow")
        .groupby(["k1", "k2"])
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
    """64-bit shingle hash, one vectorized xxhash pass (run-scoped, see
    _xxhash64; collision prob within a doc pair ~ |union|^2 / 2^64)."""
    if len(shingles) == 0:
        return np.empty(0, dtype=np.uint64)
    return _xxhash64(shingles, seed=0x51_7CC1B727220A95)


def _per_doc_unique(
    vals: np.ndarray, parents: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort by (parent, val), drop duplicates -> flat unique values +
    per-row [start, end) bounds (contiguous, ascending per row)."""
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
        flat_keys = keys[rows].reshape(-1)
        return pa.table(
            {
                "band": pa.array(band_idx),
                "band_key": pa.array(flat_keys.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(
                    np.repeat(doc_ids[rows], N_BANDS), type=pa.int64()
                ),
                # hash partition: a (band, band_key) bucket lives in
                # exactly one partition, so pair emit needs only
                # LSH_PARTS group calls, not one per bucket
                "part": pa.array(
                    (flat_keys % np.uint64(LSH_PARTS)).astype(np.int32)
                ),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """One hash partition of LSH rows -> candidate pairs: vectorized
    (band, band_key) run detection after a single lexsort; per
    multi-doc bucket, unique docs (capped at MAX_BUCKET — the
    deterministic skew guard) -> upper-triangle pairs, deduped within
    the partition by one composite-key unique."""
    empty = pa.table(
        {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
    )
    if len(group) < 2:
        return empty
    b = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = group["band_key"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, k, b))
    b, k, d = b[order], k[order], d[order]
    change = np.flatnonzero((b[1:] != b[:-1]) | (k[1:] != k[:-1])) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [b.size]])
    multi = (ends - starts) >= 2
    if not multi.any():
        return empty
    pa_list, pb_list = [], []
    for s, e in zip(starts[multi], ends[multi]):
        ids = d[s:e]
        ids = ids[np.concatenate([[True], ids[1:] != ids[:-1]])][:MAX_BUCKET]
        if ids.size < 2:
            continue
        ia, ib = np.triu_indices(ids.size, k=1)
        pa_list.append(ids[ia])
        pb_list.append(ids[ib])
    if not pa_list:
        return empty
    a = np.concatenate(pa_list)
    bb = np.concatenate(pb_list)
    if a.max() < (1 << 31) and bb.max() < (1 << 32):
        key = np.unique(a * np.int64(1 << 32) + bb)
        a, bb = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
    else:
        o = np.lexsort((bb, a))
        a, bb = a[o], bb[o]
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])])
        a, bb = a[keep], bb[keep]
    return pa.table(
        {"a": pa.array(a, type=pa.int64()), "b": pa.array(bb, type=pa.int64())}
    )


def _unique_ids(ds: ray.data.Dataset, cols: list[str]) -> np.ndarray:
    """Distinct int64 values across `cols`: per-block unique inside
    map_batches, tiny (ids-only) driver union.  This is the broadcast
    small-side KEY SET (8 bytes/candidate doc), not the pair list."""

    def blk(t: pa.Table) -> pa.Table:
        vals = np.unique(
            np.concatenate(
                [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in cols]
            )
            if len(t)
            else np.empty(0, dtype=np.int64)
        )
        return pa.table({"doc_id": pa.array(vals, type=pa.int64())})

    parts = ds.map_batches(blk, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.array([r["doc_id"] for r in parts], dtype=np.int64))


class ShingleSetStage:
    """documents batches -> (doc_id, hashes:list<u64-as-i64>) for the
    candidate docs only (pushed-down is_in filter); hashes ascending
    per row."""

    def __init__(self, ids_ref):
        ids = ray.get(ids_ref)
        self.value_set = pa.array(ids, type=pa.int64())

    _EMPTY = pa.schema(
        [("doc_id", pa.int64()), ("hashes", pa.large_list(pa.int64()))]
    ).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=self.value_set)
        batch = batch.filter(mask)
        if len(batch) == 0:
            return self._EMPTY
        sh, parents = _shingle_arrays(batch)
        h = _shingle_u64(sh)
        uniq, starts, ends = _per_doc_unique(h, parents, len(batch))
        offsets = np.concatenate([starts, [uniq.size]]).astype(np.int64)
        hashes = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(uniq.view(np.int64), type=pa.int64()),
        )
        return pa.table({"doc_id": batch["doc_id"], "hashes": hashes})


class JaccardVerify:
    """map_batches verify stage over the candidate-PAIR dataset: exact
    Jaccard on the per-doc unique shingle-hash sets, fetched once per
    actor from object-store block refs (__init__).  The sets stay a
    flat hash array + per-doc [start, end) bounds exactly as they
    arrive; __call__ is loop-free (gather + lexsort + bincount)."""

    _EMPTY = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("j_r", pa.float64())]
    ).empty_table()

    def __init__(self, set_refs, tau: float):
        self.tau = tau
        ids_parts, flat_parts, len_parts = [], [], []
        for t in _ref_tables(set_refs, "doc_id"):
            ids_parts.append(
                t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            col = t["hashes"].combine_chunks()
            flat_parts.append(np.asarray(col.values).view(np.uint64))
            len_parts.append(np.diff(np.asarray(col.offsets)).astype(np.int64))
        ids = (
            np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
        )
        lens = (
            np.concatenate(len_parts) if len_parts else np.empty(0, np.int64)
        )
        self.flat = (
            np.concatenate(flat_parts) if flat_parts else np.empty(0, np.uint64)
        )
        ends = np.cumsum(lens)
        starts = ends - lens
        order = np.argsort(ids)
        self.ids = ids[order]
        self.starts = starts[order]
        self.ends = ends[order]

    def _locate(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """doc ids -> (positions, found mask); missing docs (possible:
        a candidate doc may have had zero shingles) are masked out."""
        pos = np.searchsorted(self.ids, x)
        pos = np.minimum(pos, max(self.ids.size - 1, 0))
        found = (self.ids[pos] == x) if self.ids.size else np.zeros(x.size, bool)
        return pos, found

    def __call__(self, pairs: pa.Table) -> pa.Table:
        if len(pairs) == 0:
            return self._EMPTY
        a = pairs["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pairs["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos_a, ok_a = self._locate(a)
        pos_b, ok_b = self._locate(b)
        ok = ok_a & ok_b
        if not ok.any():
            return self._EMPTY
        a, b, pos_a, pos_b = a[ok], b[ok], pos_a[ok], pos_b[ok]
        la = self.ends[pos_a] - self.starts[pos_a]
        lb = self.ends[pos_b] - self.starts[pos_b]
        n = a.size
        # one tagged value stream: each side is per-doc unique, so a
        # hash appears at most twice per pair — every equal-adjacent
        # run of length 2 after the (pair, value) sort is one shared
        # shingle.  No per-pair Python.
        pid = np.concatenate(
            [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
        )
        vals = np.concatenate(
            [
                self.flat[_ranges(self.starts[pos_a], self.ends[pos_a])],
                self.flat[_ranges(self.starts[pos_b], self.ends[pos_b])],
            ]
        )
        order = np.lexsort((vals, pid))
        v, p = vals[order], pid[order]
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(p[1:][dup], minlength=n)
        denom = la + lb - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(denom > 0, inter / denom, 0.0)
        keep = j >= self.tau
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                # UNROUNDED: int-ratio jaccards are exact rationals that can
                # sit ON a 6-dp boundary (e.g. odd/2^7), where np
                # (half-to-even) and DuckDB (half-away) disagree; the
                # raw float64 division is IEEE-identical on both sides
                "j_r": pa.array(j[keep], type=pa.float64()),
            }
        )


def q_dedup_minhash(sf_dir: str) -> ray.data.Dataset:
    """Near-duplicate pairs (a < b, exact word-3-gram Jaccard >= 0.8)
    found via MinHash-LSH banding, verified DISTRIBUTED: the candidate
    pairs stay a Dataset end-to-end and the verify runs as map_batches
    against object-store-resident shingle sets (no driver-side pair
    list or set dict)."""
    lsh = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )
    cand = (
        lsh.groupby("part")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_parts"))
        .select_columns(["a", "b"])
        .materialize()
    )
    cand_ids = _unique_ids(cand, ["a", "b"])
    if cand_ids.size == 0:
        # typed empty (a dataset with no blocks would lose the schema)
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("j_r", pa.float64())]
            ).empty_table()
        )
    ids_ref = ray.put(cand_ids)
    # candidate filter pushed into the parquet scan (row-group pruning +
    # native-code filtering) so the corpus re-read for the verify side
    # touches only fragments containing candidates; the stage's own
    # is_in is a cheap second line of defense
    cand_docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(pa.array(cand_ids, type=pa.int64())),
    )
    set_refs = _dataset_refs(
        cand_docs.map_batches(
            ShingleSetStage,
            fn_constructor_args=(ids_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )
    return cand.map_batches(
        JaccardVerify,
        fn_constructor_args=(set_refs, JACCARD_TAU),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard — recall-complete inverted-index self-join


def shingle_rows(batch: pa.Table) -> pa.Table:
    """documents -> (h, doc_id, part) rows, one per UNIQUE per-doc
    shingle hash: the posting rows of the shingle inverted index.  The
    all-to-all moves 16 bytes + part key per row.  Stateless -> plain
    function (task pool, no actor startup)."""
    sh, parents = _shingle_arrays(batch)
    h = _shingle_u64(sh)
    uniq, starts, ends = _per_doc_unique(h, parents, len(batch))
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = (ends - starts).astype(np.int64)
    parents_u = np.repeat(np.arange(len(batch)), counts)
    return pa.table(
        {
            "h": pa.array(uniq.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(doc_ids[parents_u], type=pa.int64()),
            "part": pa.array(
                (uniq % np.uint64(NGRAM_PARTS)).astype(np.int32)
            ),
        }
    )


def _pair_part2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pair-hash partition key for the cross-part combine: Ray's hash
    aggregate over ~1M tiny (a, b) groups measured 15.7s at sf0.1; a
    sort exchange + vectorized per-partition sum is ~2s for the same
    result."""
    return ((a * np.int64(2654435761) + b) % NGRAM_PARTS).astype(np.int32)


_PAIRS_EMPTY = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("i", pa.int64()),
        ("part2", pa.int32()),
    ]
).empty_table()


def _pairs_in_part(group: pa.Table, df_cap: int = NGRAM_DF_CAP) -> pa.Table:
    """One hash partition of the shingle index -> per-partition
    pre-aggregated co-occurrence counts (a, b, i) PLUS per-doc size
    partials encoded as sentinel rows (a == b == doc_id, i = count of
    surviving shingles).  Vectorized: one lexsort, run detection, triu
    pair emit per multi-doc shingle, an in-partition composite-key
    unique.

    A shingle's full posting list lands in exactly one partition (part
    is a hash of the shingle), so the run length here IS the global df
    — the df-cap (drop runs with df >= df_cap from pairs AND sizes) is
    exact, and the size partials only need a per-doc sum downstream
    (their part2 is the pair formula with a == b, so all partials of
    one doc meet in one partition)."""
    h = group["h"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    if h.size == 0:
        return _PAIRS_EMPTY
    order = np.lexsort((d, h))
    h, d = h[order], d[order]
    change = np.flatnonzero(h[1:] != h[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [h.size]])
    df = ends - starts
    survive = df < df_cap
    # per-doc size partials over surviving shingles (incl. df == 1)
    keep_rows = np.repeat(survive, df)
    sdocs, scnts = np.unique(d[keep_rows], return_counts=True)
    multi = survive & (df >= 2)
    pa_list = [sdocs]
    pb_list = [sdocs]
    cnt_list = [scnts]
    if multi.any():
        ms, me = starts[multi], ends[multi]
        rows = _ranges(ms, me)
        docs = d[rows]
        runlen = me - ms
        run_off = rows - np.repeat(ms, runlen)
        # triu pair emit without a per-run loop: pair every element
        # with each LATER element of its run via one repeat/gather
        reps = np.repeat(runlen, runlen) - 1 - run_off  # later elements per row
        total = int(reps.sum())
        if total:
            left = np.repeat(np.arange(docs.size), reps)
            step = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
            )
            right = left + 1 + step
            raw_a, raw_b = docs[left], docs[right]
            # ids ascend within a run, so raw_a < raw_b already
            if raw_a.max() < (1 << 31) and raw_b.max() < (1 << 32):
                key = raw_a * np.int64(1 << 32) + raw_b
                ks, counts = np.unique(key, return_counts=True)
                ua, ub = ks >> np.int64(32), ks & np.int64(0xFFFFFFFF)
            else:
                o = np.lexsort((raw_b, raw_a))
                raw_a, raw_b = raw_a[o], raw_b[o]
                new = np.concatenate(
                    [[True], (raw_a[1:] != raw_a[:-1]) | (raw_b[1:] != raw_b[:-1])]
                )
                idx = np.flatnonzero(new)
                ua, ub = raw_a[idx], raw_b[idx]
                counts = np.diff(np.concatenate([idx, [raw_a.size]]))
            pa_list.append(ua)
            pb_list.append(ub)
            cnt_list.append(counts)
    a = np.concatenate(pa_list).astype(np.int64)
    b = np.concatenate(pb_list).astype(np.int64)
    i = np.concatenate(cnt_list).astype(np.int64)
    if a.size == 0:
        return _PAIRS_EMPTY
    return pa.table(
        {
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
            "i": pa.array(i, type=pa.int64()),
            "part2": pa.array(_pair_part2(a, b)),
        }
    )


def _sum_pairs_in_part(group: pa.Table) -> pa.Table:
    """One pair-hash partition -> per-(a, b) summed intersection counts
    (a pair's rows all land in one partition): one composite-key unique
    + bincount."""
    a = group["a"].to_numpy(zero_copy_only=False)
    b = group["b"].to_numpy(zero_copy_only=False)
    i = group["i"].to_numpy(zero_copy_only=False).astype(np.float64)
    if a.size == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "i": pa.array([], type=pa.int64()),
            }
        )
    if a.max() < (1 << 31) and b.max() < (1 << 32):
        key = a * np.int64(1 << 32) + b
        ks, inv = np.unique(key, return_inverse=True)
        ua, ub = ks >> np.int64(32), ks & np.int64(0xFFFFFFFF)
    else:
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        new = np.concatenate(
            [[True], (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        )
        grp = np.cumsum(new) - 1
        inv = np.empty(a.size, dtype=np.int64)
        inv[order] = grp
        idx = np.flatnonzero(new)
        ua, ub = sa[idx], sb[idx]
    sums = np.bincount(inv, weights=i).astype(np.int64)
    return pa.table(
        {
            "a": pa.array(ua, type=pa.int64()),
            "b": pa.array(ub, type=pa.int64()),
            "i": pa.array(sums, type=pa.int64()),
        }
    )


def _split_sizes(t: pa.Table) -> pa.Table:
    """Summed (a, b, i) rows -> the sentinel size rows only, renamed to
    (doc_id, n).  Runs over the MATERIALIZED sum output, so the shuffle
    is not re-executed for the size side."""
    mask = pc.equal(t["a"], t["b"])
    s = t.filter(mask)
    return pa.table({"doc_id": s["a"], "n": s["i"]})


def _split_pairs(t: pa.Table) -> pa.Table:
    """Summed (a, b, i) rows -> the real pair rows (a < b) only."""
    return t.filter(pc.less(t["a"], t["b"]))


class NgramFinalize:
    """(a, b, i) -> (a, b, j_r >= tau) via the broadcast size lookup
    (12 bytes/doc small side; at 10^12 docs this becomes a shuffle join
    on doc_id instead)."""

    def __init__(self, size_refs, tau: float):
        self.tau = tau
        ids_parts, n_parts = [], []
        for t in _ref_tables(size_refs, "doc_id"):
            ids_parts.append(t["doc_id"].to_numpy(zero_copy_only=False))
            n_parts.append(t["n"].to_numpy(zero_copy_only=False))
        ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
        ns = np.concatenate(n_parts) if n_parts else np.empty(0, np.int64)
        order = np.argsort(ids)
        self.ids = ids[order]
        self.ns = ns[order]

    def _sizes(self, x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.ids, x)
        if pos.size and (
            (pos >= self.ids.size).any() or (self.ids[pos] != x).any()
        ):
            raise KeyError("candidate doc missing from size table")
        return self.ns[pos]

    def __call__(self, pairs: pa.Table) -> pa.Table:
        if len(pairs) == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "j_r": pa.array([], type=pa.float64()),
                }
            )
        a = pairs["a"].to_numpy(zero_copy_only=False)
        b = pairs["b"].to_numpy(zero_copy_only=False)
        i = pairs["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = i / (self._sizes(a) + self._sizes(b) - i)
        keep = j >= self.tau
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                # UNROUNDED: int-ratio jaccards are exact rationals that can
                # sit ON a 6-dp boundary (e.g. odd/2^7), where np
                # (half-to-even) and DuckDB (half-away) disagree; the
                # raw float64 division is IEEE-identical on both sides
                "j_r": pa.array(j[keep], type=pa.float64()),
            }
        )


def q_dedup_ngram_jaccard(sf_dir: str) -> ray.data.Dataset:
    """n-gram-Jaccard near-dup pairs over the df-capped shingle
    universe (shingles with df < NGRAM_DF_CAP; the oracle caps
    identically) — same output contract as q_dedup_minhash but
    RECALL-COMPLETE by construction: an inverted-index self-join on
    shingle hashes (every pair sharing >= 1 surviving shingle is
    counted), no LSH screen, mirroring the DuckDB oracle's join shape.
    Per-doc sizes ride the SAME shuffle as the pairs (sentinel a == b
    rows), so the whole query is one all-to-all plus a broadcast."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    summed = (
        docs.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pairs_in_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(_sum_pairs_in_part, batch_format="pyarrow")
        .materialize()
    )
    size_refs = _dataset_refs(
        summed.map_batches(_split_sizes, batch_format="pyarrow")
    )
    return summed.map_batches(
        _split_pairs, batch_format="pyarrow"
    ).map_batches(
        NgramFinalize,
        fn_constructor_args=(size_refs, JACCARD_TAU),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# simhash (rows-only)


def term_hashes64(vocab: list[str]) -> np.ndarray:
    """Stable 64-bit term hashes (crc32 low word | salted-crc32 high
    word) — version-stable, shared by the SimHash kernel and the BP
    ordering's forward index (ciff_ray.bporder) so the two can never
    drift."""
    lo = np.array([zlib.crc32(t.encode()) for t in vocab], dtype=np.uint64)
    hi = np.array(
        [zlib.crc32(t.encode() + b"\x01") for t in vocab], dtype=np.uint64
    )
    return (hi << np.uint64(32)) | lo


def term_hash_rows(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """One tokenizer pass over a (doc_id/_row, text) batch -> flat
    (rows, h64, tf) arrays: per-(doc, term) rows with the stable 64-bit
    term hash and the term frequency."""
    from ciff_ray.tokenizer import term_frequencies

    n = len(batch)
    local = batch.append_column(
        "_row", pa.array(np.arange(n, dtype=np.int64))
    ).select(["_row", "text"])
    tf = term_frequencies(local, id_col="_row")
    terms = tf["term"].combine_chunks()
    denc = pc.dictionary_encode(terms)
    h64 = term_hashes64(denc.dictionary.to_pylist())[
        denc.indices.to_numpy(zero_copy_only=False)
    ]
    w = tf["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf["_row"].to_numpy(zero_copy_only=False)
    return rows, h64, w, n


def simhash_from_tf(
    rows: np.ndarray, h64: np.ndarray, w: np.ndarray, n: int
) -> np.ndarray:
    """tf-weighted bit votes -> one uint64 SimHash per row index."""
    bits = (
        (h64[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    contrib = (2 * bits - 1) * w[:, None]
    acc = np.zeros((n, SIMHASH_BITS), dtype=np.int64)
    np.add.at(acc, rows, contrib)
    sig = (acc > 0).astype(np.uint64)
    simhash = np.zeros(n, dtype=np.uint64)
    for bit in range(SIMHASH_BITS):
        simhash |= sig[:, bit] << np.uint64(bit)
    return simhash


def simhash_batch(batch: pa.Table) -> pa.Table:
    rows, h64, w, n = term_hash_rows(batch)
    simhash = simhash_from_tf(rows, h64, w, n)
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
# embedding-cosine near-dup — distributed block-pair exact search


class BlockPairScorer:
    """Scores one (block_i, block_j) cell per input row: fetches the two
    row blocks from the object store (zero-copy, LRU-cached per actor —
    cells arrive roughly row-major, so a tiny cache captures most
    reuse while keeping the documented O(block^2) memory shape: an
    unbounded cache would converge to the full matrix), one B x B
    GEMM, emits pairs >= tau.  Driver holds block REFS only."""

    _CACHE_BLOCKS = 4

    def __init__(self, block_refs, tau: float):
        from collections import OrderedDict

        self.refs = block_refs
        self.tau = tau
        self.cache: OrderedDict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = (
            OrderedDict()
        )

    def _block(self, i: int):
        blk = self.cache.get(i)
        if blk is None:
            t = ray.get(self.refs[i]).combine_chunks()
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            E = _embedding_matrix(t["embedding"])
            norms = np.sqrt((E * E).sum(axis=1))
            blk = (ids, E, norms)
            self.cache[i] = blk
            if len(self.cache) > self._CACHE_BLOCKS:
                self.cache.popitem(last=False)
        else:
            self.cache.move_to_end(i)
        return blk

    def __call__(self, cells: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for i, j in zip(cells["i"].to_pylist(), cells["j"].to_pylist()):
            aid, A, an = self._block(i)
            bid, B, bn = self._block(j)
            if not aid.size or not bid.size:
                continue
            sims = (A @ B.T) / (an[:, None] * bn[None, :])
            # a < b orders every pair exactly once, including i == j cells
            ai, bi = np.nonzero((sims >= self.tau) & (aid[:, None] < bid[None, :]))
            out_a.append(aid[ai])
            out_b.append(bid[bi])
            out_c.append(np.round(sims[ai, bi], 6))
        if not out_a:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "cos_r": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cos_r": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


# q_dedup_embedding is the EXACTNESS PIN, not the scale path: beyond
# this many vectors the Theta(N^2) FLOPs are a mistake (use
# q_dedup_embedding_ann) and the entry refuses to run unless forced
EMB_EXACT_MAX_ROWS = 2_000_000


def q_dedup_embedding(
    sf_dir: str, block_rows: int = EMB_BLOCK_ROWS, force: bool = False
) -> ray.data.Dataset:
    """Exact near-dup embedding pairs (a < b, cosine >= COSINE_TAU) via
    a distributed block-pair sweep: N vectors -> ceil(N/block_rows) row
    blocks -> one task per upper-triangle (block_i, block_j) cell.
    Exactness forces Theta(N^2) FLOPs (see module docstring: isotropic
    data + tau=0.4 defeats any recall-1 bucketing), but memory per task
    is O(block^2) and nothing materializes the whole matrix.

    Guarded: this is the driver-scale exactness contract; past
    EMB_EXACT_MAX_ROWS it raises (pass force=True to override) and
    points at q_dedup_embedding_ann, the recall-pinned scale path."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()
    if n > EMB_EXACT_MAX_ROWS and not force:
        raise ValueError(
            f"q_dedup_embedding is Theta(N^2) and {n} vectors exceed "
            f"EMB_EXACT_MAX_ROWS={EMB_EXACT_MAX_ROWS}; use "
            "q_dedup_embedding_ann (recall-pinned ANN path) or pass "
            "force=True if you really mean to pay N^2 FLOPs"
        )
    nblocks = max(1, -(-n // block_rows))
    block_refs = ds.repartition(nblocks).materialize().to_arrow_refs()
    cells = [
        {"i": i, "j": j}
        for i in range(len(block_refs))
        for j in range(i, len(block_refs))
    ]
    return ray.data.from_items(cells).map_batches(
        BlockPairScorer,
        fn_constructor_args=(block_refs, COSINE_TAU),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# cross-document repeated-substring coverage (Lee et al. 2022 flavor)

SUBSTR_L = 30  # window length over the NORMALIZED text, stride 1
SUBSTR_PARTS = 32
_ROLL_B = np.uint64(1099511628211)  # FNV prime, odd -> bijective mults


def _window_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, text) batch -> (u64 window hash, parent row) for every
    stride-1 SUBSTR_L-char window of the normalized text.  Vectorized
    polynomial rolling hash: SUBSTR_L fused multiply-adds over the flat
    byte buffer (mod-2^64 wraparound), windows crossing doc boundaries
    masked out, then mixed through splitmix64 so the partition key
    (low bits) is uniform.  Collisions only matter ACROSS distinct
    window strings: at W windows the false-repeat probability is
    ~W^2/2^64 (1e9 windows -> ~5e-2 expected collisions... at true web
    scale swap in a 128-bit hash; the contract here pins the u64 one)."""
    norm = _normalize(batch["text"])
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    # fresh kernel output has offset 0; the raw-buffer view relies on it
    assert norm.offset == 0, "normalized column unexpectedly sliced"
    buf = np.frombuffer(
        norm.buffers()[2] or b"", dtype=np.uint8
    ).astype(np.uint64)
    offs = np.frombuffer(norm.buffers()[1], dtype=np.int32).astype(np.int64)
    n_total = buf.size
    if n_total < SUBSTR_L:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    n_win = n_total - SUBSTR_L + 1
    h = np.zeros(n_win, dtype=np.uint64)
    for j in range(SUBSTR_L):
        h = h * _ROLL_B + buf[j : j + n_win]
    # window start s belongs to doc d iff offs[d] <= s <= offs[d+1]-L
    starts = np.arange(n_win, dtype=np.int64)
    parent = np.searchsorted(offs, starts, side="right") - 1
    valid = starts + SUBSTR_L <= offs[parent + 1]
    from ciff_ray.extras.sketch import _mix_u64

    return _mix_u64(h[valid]), parent[valid]


def substr_window_rows(batch: pa.Table) -> pa.Table:
    """documents -> (h, doc_id, part) rows, one per UNIQUE per-doc
    window hash — the posting rows of the window inverted index.  A
    window's rows land in one hash partition, so global df is a
    partition-local run length (same invariant as shingle_rows)."""
    h, parents = _window_hashes(batch)
    uniq, starts, ends = _per_doc_unique(h, parents, len(batch))
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    parents_u = np.repeat(np.arange(len(batch)), (ends - starts))
    return pa.table(
        {
            "h": pa.array(uniq.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(doc_ids[parents_u], type=pa.int64()),
            "part": pa.array(
                (uniq % np.uint64(SUBSTR_PARTS)).astype(np.int32)
            ),
        }
    )


def _substr_part_counts(group: pa.Table) -> pa.Table:
    """One window-hash partition -> per-doc partials (doc_id, n_win,
    n_rep): run detection over the sorted hashes; every doc in a run of
    length >= 2 gets +1 repeated.  LINEAR in rows — no pair emit, so no
    quadratic skew regardless of how many docs share a window."""
    h = group["h"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    if h.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_win": pa.array([], type=pa.int64()),
                "n_rep": pa.array([], type=pa.int64()),
            }
        )
    order = np.lexsort((d, h))
    h, d = h[order], d[order]
    change = np.flatnonzero(h[1:] != h[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [h.size]])
    rep_run = np.repeat((ends - starts) >= 2, ends - starts)
    docs, inv = np.unique(d, return_inverse=True)
    n_win = np.bincount(inv, minlength=docs.size)
    n_rep = np.bincount(inv[rep_run], minlength=docs.size)
    return pa.table(
        {
            "doc_id": pa.array(docs, type=pa.int64()),
            "n_win": pa.array(n_win.astype(np.int64), type=pa.int64()),
            "n_rep": pa.array(n_rep.astype(np.int64), type=pa.int64()),
        }
    )


def _substr_final(batch: pa.Table) -> pa.Table:
    n_win = batch["n_win"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_rep = batch["n_rep"].to_numpy(zero_copy_only=False).astype(np.float64)
    # UNROUNDED ratio: int64-exact doubles divide IEEE-identically in
    # numpy and DuckDB, while round() does not (half-to-even vs
    # half-away-from-zero — a boundary-straddling doc at sf0.1 exposed
    # the divergence)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_windows": batch["n_win"],
            "n_repeated": batch["n_rep"],
            "coverage": pa.array(n_rep / n_win, type=pa.float64()),
        }
    )


def q_dup_substring_coverage(sf_dir: str) -> ray.data.Dataset:
    """Per-document cross-corpus repeated-substring coverage: of a
    doc's distinct {SUBSTR_L}-char normalized-text windows (stride 1),
    how many also occur in ANOTHER document — the duplication metric
    behind substring-level training-data dedup (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better').

    Shape: one hashed-window exchange (12 B/row, linear — no pair
    emit), per-partition run counting, one small per-doc groupby.  The
    stride-1 emit moves ~1 row per character; the scale knob is the
    winnowing fingerprint (q_doc_fingerprint) as a screen, or a longer
    stride — this entry pins the EXACT contract."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    return (
        docs.map_batches(substr_window_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_substr_part_counts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_win", alias_name="n_win"),
            Sum("n_rep", alias_name="n_rep"),
        )
        .map_batches(_substr_final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# incremental dedup — new batch vs the existing corpus

INCR_BATCH_MOD = 10  # "new batch" = docs with doc_id % 10 == 3
INCR_BATCH_REM = 3


class IncrDedupStage:
    """corpus batches -> (new_doc_id, dup_of) rows: for every NEW doc
    whose content key (the {KEY_PREFIX_CHARS}-char normalized-prefix
    fingerprint, the same near-dup screen as dedup_by_key) already
    exists in the corpus, the smallest matching corpus doc_id.

    Shape (the ingest-time dedup every growing corpus runs): the NEW
    batch is the small side — its 16-byte content keys broadcast once
    (``ray.put`` in the driver, fetched per actor in ``__init__``) —
    and the EXISTING corpus streams through map_batches; no shuffle.
    At 10^12 corpus docs the corpus side stays a scan; only new-batch
    keys (bounded by the ingest batch size) are resident."""

    _EMPTY = pa.schema(
        [("new_doc_id", pa.int64()), ("dup_of", pa.int64())]
    ).empty_table()

    def __init__(self, keys_ref):
        # (sorted UNIQUE new-batch keys, run offsets, new doc_ids
        # grouped by key) — duplicate new-batch contents share a key
        # run, so a corpus hit fans out to every new doc with that key
        self.keys, self.offsets, self.new_ids = ray.get(keys_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        corpus_mask = ids % INCR_BATCH_MOD != INCR_BATCH_REM
        batch = batch.filter(pa.array(corpus_mask))
        if len(batch) == 0 or self.keys.size == 0:
            return self._EMPTY
        k = _content_key(batch)
        pos = np.searchsorted(self.keys, k)
        pos_c = np.minimum(pos, max(self.keys.size - 1, 0))
        hit = np.flatnonzero(self.keys[pos_c] == k)
        if hit.size == 0:
            return self._EMPTY
        corpus_ids = ids[corpus_mask][hit]
        runs = pos_c[hit]
        starts = self.offsets[runs]
        ends = self.offsets[runs + 1]
        lens = ends - starts
        new_rows = _ranges(starts, ends)
        matched_new = self.new_ids[new_rows]
        corpus_rep = np.repeat(corpus_ids, lens)
        # per-batch partial min corpus id per new doc (the global min
        # is one tiny groupby downstream)
        order = np.lexsort((corpus_rep, matched_new))
        mn, ci = matched_new[order], corpus_rep[order]
        first = np.concatenate([[True], mn[1:] != mn[:-1]])
        return pa.table(
            {
                "new_doc_id": pa.array(mn[first], type=pa.int64()),
                "dup_of": pa.array(ci[first], type=pa.int64()),
            }
        )


def _content_key(batch: pa.Table) -> np.ndarray:
    """128-bit key of the {KEY_PREFIX_CHARS}-char normalized-text
    prefix as 16 big-endian bytes viewed as void16 — lexicographically
    sortable and exactly comparable (no lossy fold)."""
    norm = pc.utf8_slice_codeunits(
        _normalize(batch["text"]), 0, KEY_PREFIX_CHARS
    )
    k1 = _xxhash64(norm, seed=0x9E3779B97F4A7C15)
    k2 = _xxhash64(norm, seed=0xC2B2AE3D27D4EB4F)
    b = np.empty((k1.size, 2), dtype=">u8")
    b[:, 0] = k1
    b[:, 1] = k2
    return b.reshape(-1).view(np.dtype((np.void, 16)))


def q_dedup_incremental(sf_dir: str) -> ray.data.Dataset:
    """Ingest-time dedup: every NEW-batch doc (doc_id % 10 == 3) whose
    prefix fingerprint already exists in the corpus, with the smallest
    matching corpus doc_id.  New-batch keys broadcast; corpus streams."""

    def new_keys(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = t.filter(pa.array(ids % INCR_BATCH_MOD == INCR_BATCH_REM))
        k = _content_key(sub)
        return pa.table(
            {
                "k": pa.array(k.view(np.uint8).reshape(-1, 16).tolist(),
                              type=pa.list_(pa.uint8(), 16)),
                "doc_id": sub["doc_id"],
            }
        )

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(new_keys, batch_format="pyarrow")
        .take_all()
    )
    if parts:
        keys = np.array(
            [bytes(r["k"]) for r in parts], dtype=np.dtype((np.void, 16))
        )
        ids = np.array([r["doc_id"] for r in parts], dtype=np.int64)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        new_run = np.concatenate([[True], keys[1:] != keys[:-1]])
        uniq = keys[new_run]
        offsets = np.concatenate(
            [np.flatnonzero(new_run), [keys.size]]
        ).astype(np.int64)
    else:
        uniq = np.empty(0, dtype=np.dtype((np.void, 16)))
        offsets = np.zeros(1, dtype=np.int64)
        ids = np.empty(0, dtype=np.int64)
    keys_ref = ray.put((uniq, offsets, ids))
    from ray.data.aggregate import Min as _Min

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            IncrDedupStage,
            fn_constructor_args=(keys_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("new_doc_id")
        .aggregate(_Min("dup_of", alias_name="dup_of"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination — n-gram overlap against a held-out set

DECON_BENCH_MOD = 20  # benchmark set = docs with doc_id % 20 == 0


def _bench_shingle_set(sf_dir: str) -> np.ndarray:
    """Sorted unique shingle hashes of the benchmark docs — the
    broadcast small side (the benchmark/eval set is small by
    construction at any corpus scale; the corpus is what streams)."""

    def blk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % DECON_BENCH_MOD == 0))
        sh, _parents = _shingle_arrays(sub)
        h = np.unique(_shingle_u64(sh))
        return pa.table({"h": pa.array(h.view(np.int64), type=pa.int64())})

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(blk, batch_format="pyarrow")
        .take_all()
    )
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.array([r["h"] for r in parts], dtype=np.int64).view(np.uint64)
    )


class DeconStage:
    """corpus batches -> (doc_id, n_hits) for docs sharing >= 1
    word-3-gram with the broadcast benchmark shingle set (benchmark
    docs themselves excluded); n_hits = DISTINCT shared shingles."""

    _EMPTY = pa.schema(
        [("doc_id", pa.int64()), ("n_hits", pa.int64())]
    ).empty_table()

    def __init__(self, bench_ref):
        self.bench = ray.get(bench_ref)  # sorted unique u64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % DECON_BENCH_MOD != 0))
        n = len(batch)
        if n == 0 or self.bench.size == 0:
            return self._EMPTY
        sh, parents = _shingle_arrays(batch)
        h = _shingle_u64(sh)
        uniq, starts, ends = _per_doc_unique(h, parents, n)
        pos = np.searchsorted(self.bench, uniq)
        pos = np.minimum(pos, max(self.bench.size - 1, 0))
        found = self.bench[pos] == uniq
        parents_u = np.repeat(np.arange(n), ends - starts)
        hits = np.bincount(parents_u[found], minlength=n).astype(np.int64)
        keep = hits > 0
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], type=pa.int64()),
                "n_hits": pa.array(hits[keep], type=pa.int64()),
            }
        )


def q_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Training-corpus decontamination: flag every non-benchmark doc
    that shares at least one word-3-gram with the benchmark set
    (doc_id % DECON_BENCH_MOD == 0), with the count of distinct shared
    shingles.  Shape: tiny broadcast set (ray.put once, searchsorted in
    every task), corpus streams — no shuffle at all."""
    bench_ref = ray.put(_bench_shingle_set(sf_dir))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        DeconStage,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# embedding near-dup, ANN-candidate scale path (sub-quadratic FLOPs)

EMB_ANN_ASSIGN = 4  # buckets each vector is assigned to (multi-probe)


def _emb_ann_k(n: int) -> int:
    """Quantizer size rule K ~ 0.7 * sqrt(N): per-bucket size scales as
    sqrt(N), so scanned candidate FLOPs ~ N^1.5 * A^2 instead of N^2.
    (n=500 -> K=16, n=2000 -> K=32.)"""
    return max(8, int(round(0.7 * float(n) ** 0.5)))


class _EmbAssignStage:
    """embeddings batches -> A rows per vector tagged with its top-A
    closest (cosine) centroid buckets; the quantizer is broadcast once
    per actor."""

    def __init__(self, cref, assign: int):
        self.C = ray.get(cref)  # unit-norm (K, d)
        self.assign = assign

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _embedding_matrix(batch["embedding"])
        if V.size == 0:
            return pa.schema(
                [
                    ("bucket", pa.int32()),
                    ("vec_id", pa.int64()),
                    ("embedding", batch.schema.field("embedding").type),
                ]
            ).empty_table()
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        sims = (V / vn) @ self.C.T
        a = min(self.assign, self.C.shape[0])
        top = np.argpartition(-sims, a - 1, axis=1)[:, :a].astype(np.int32)
        n = len(batch)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        idx = np.repeat(np.arange(n), a)
        return pa.table(
            {
                "bucket": pa.array(top.reshape(-1)),
                "vec_id": pa.array(vid[idx], type=pa.int64()),
                "embedding": emb.take(pa.array(idx)),
            }
        )


def _bucket_pairs_emb(group: pa.Table, tau: float) -> pa.Table:
    """One candidate bucket -> exact-verified cosine pairs >= tau.
    GEMM is chunked over rows so memory stays O(chunk x bucket) even
    for a skewed bucket."""
    ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = _embedding_matrix(group["embedding"])
    out_a, out_b, out_c = [], [], []
    if ids.size >= 2:
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0] = 1.0
        En = E / norms[:, None]
        chunk = 2048
        for c0 in range(0, ids.size, chunk):
            c1 = min(c0 + chunk, ids.size)
            sims = En[c0:c1] @ En.T
            ai, bi = np.nonzero(
                (sims >= tau) & (ids[c0:c1, None] < ids[None, :])
            )
            out_a.append(ids[c0:c1][ai])
            out_b.append(ids[bi])
            out_c.append(np.round(sims[ai, bi], 6))
    if not out_a:
        return pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("cos_r", pa.float64())]
        ).empty_table()
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "cos_r": pa.array(np.concatenate(out_c), type=pa.float64()),
        }
    )


def _emb_ann_buckets(
    sf_dir: str, assign: int, k_centroids: int | None
) -> ray.data.Dataset:
    """Shared candidate-generation front: spherical-k-means quantizer
    (trained distributed, see extras.simsearch), multi-assignment, one
    bucket-key exchange."""
    from ciff_ray.extras.simsearch import kmeans_centroids

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(path).metadata.num_rows
    k = k_centroids or _emb_ann_k(n)
    C, _ = kmeans_centroids(path, k=k, iters=3, spherical=True)
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cref = ray.put(C / norms)
    return (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _EmbAssignStage,
            fn_constructor_args=(cref, assign),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("bucket")
    )


def q_dedup_embedding_ann(
    sf_dir: str,
    tau: float = COSINE_TAU,
    assign: int = EMB_ANN_ASSIGN,
    k_centroids: int | None = None,
) -> ray.data.Dataset:
    """ANN-candidate embedding near-dup — the 100 TB path the exact
    block sweep (q_dedup_embedding) cannot be: vectors are
    multi-assigned to their top-A spherical-k-means buckets, only
    within-bucket pairs are exactly verified, and K grows as sqrt(N)
    so scanned FLOPs are ~N^1.5 A^2, not N^2.  APPROXIMATE by design
    (rows-only entry): recall vs the exact sweep is measured and
    asserted in tests/test_extras_dedup.py (>= 0.9 at A=4 on this
    corpus — isotropic Gaussians at tau=0.4, the worst case the module
    docstring describes; on real near-dup data with cohesive clusters
    the same screen is near-recall-1).  Same output contract/schema as
    q_dedup_embedding."""
    from ray.data.aggregate import Min as _Min

    pairs = _emb_ann_buckets(sf_dir, assign, k_centroids).map_groups(
        lambda g: _bucket_pairs_emb(g, tau), batch_format="pyarrow"
    )
    # a pair found in several shared buckets scores identically — one
    # tiny groupby dedups the (few) verified pairs
    return pairs.groupby(["a", "b"]).aggregate(
        _Min("cos_r", alias_name="cos_r")
    )


def embedding_ann_scan_stats(
    sf_dir: str,
    assign: int = EMB_ANN_ASSIGN,
    k_centroids: int | None = None,
) -> dict:
    """Deterministic FLOPs accounting for the ANN screen: the number
    of candidate pairs actually scanned (sum of m*(m-1)/2 over bucket
    occupancies, double-assignments double-counted — exactly the GEMM
    work) vs the N^2/2 the exact sweep scans.  Used by tests to pin
    the sub-quadratic claim without wall-clock flakiness."""

    def _count(group: pa.Table) -> pa.Table:
        m = len(group)
        return pa.table(
            {"cand": pa.array([m * (m - 1) // 2], type=pa.int64())}
        )

    rows = _emb_ann_buckets(sf_dir, assign, k_centroids).map_groups(
        _count, batch_format="pyarrow"
    )
    scanned = rows.sum("cand")
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    return {
        "n": int(n),
        "k": int(k_centroids or _emb_ann_k(n)),
        "scanned_pairs": int(scanned or 0),
        "exact_pairs": n * (n - 1) // 2,
    }


# ---------------------------------------------------------------------------
# oracle SQL

_SQL_SHINGLE_BASE = """
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
sh0 AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term AS sh
  FROM tokpos a
  JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
)"""

_SQL_JACCARD_TAIL = f"""
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
)
SELECT a, b, j AS j_r FROM jac WHERE j >= {JACCARD_TAU}"""

# uncapped universe (the minhash verify scores full shingle sets)
_SQL_JACCARD_PAIRS = f"""WITH {_SQL_SHINGLE_BASE.strip()},
sh AS (SELECT doc_id, sh FROM sh0),
{_SQL_JACCARD_TAIL.strip()}"""

# df-capped universe (mirrors NGRAM_DF_CAP in the ngram self-join)
_SQL_JACCARD_PAIRS_CAPPED = f"""WITH {_SQL_SHINGLE_BASE.strip()},
shk AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) < {NGRAM_DF_CAP}),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN shk k ON s.sh = k.sh),
{_SQL_JACCARD_TAIL.strip()}"""


ORACLE_SQLS = {
    "dedup_exact": f"""SELECT min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY {NORM_SQL}""",
    "dedup_by_key": f"""SELECT min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY substr({NORM_SQL}, 1, {KEY_PREFIX_CHARS})""",
    "dedup_minhash": _SQL_JACCARD_PAIRS,
    "dedup_ngram_jaccard": _SQL_JACCARD_PAIRS_CAPPED,
    "decontaminate": f"""WITH {_SQL_SHINGLE_BASE.strip()},
bench AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % {DECON_BENCH_MOD} = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM sh0 s JOIN bench b ON s.sh = b.sh
WHERE s.doc_id % {DECON_BENCH_MOD} <> 0
GROUP BY s.doc_id""",
    "dedup_incremental": f"""WITH norm AS (
  SELECT doc_id, substr({NORM_SQL}, 1, {KEY_PREFIX_CHARS}) AS nt
  FROM documents
),
newb AS (SELECT doc_id, nt FROM norm
         WHERE doc_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}),
corp AS (SELECT doc_id, nt FROM norm
         WHERE doc_id % {INCR_BATCH_MOD} <> {INCR_BATCH_REM})
SELECT n.doc_id AS new_doc_id, min(c.doc_id) AS dup_of
FROM newb n JOIN corp c ON n.nt = c.nt
GROUP BY n.doc_id""",
    "dup_substring_coverage": f"""WITH norm AS (
  SELECT doc_id, {NORM_SQL} AS nt FROM documents
),
w AS (
  SELECT DISTINCT doc_id, substr(nt, i, {SUBSTR_L}) AS win
  FROM norm, unnest(range(1, len(nt) - {SUBSTR_L - 2})) AS t(i)
  WHERE len(nt) >= {SUBSTR_L}
),
dfr AS (SELECT win, count(*) AS d FROM w GROUP BY win),
agg AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN dfr.d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeated
  FROM w JOIN dfr USING (win) GROUP BY w.doc_id
)
SELECT doc_id, n_windows, n_repeated,
       n_repeated * 1.0 / n_windows AS coverage
FROM agg""",
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
    "dedup_incremental": q_dedup_incremental,
    "dup_substring_coverage": q_dup_substring_coverage,
    "dedup_minhash": q_dedup_minhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,  # rows-only
    "dedup_embedding": q_dedup_embedding,
    # rows-only (approximate by design; recall + sub-quadratic scan
    # bounds pinned in tests/test_extras_dedup.py)
    "dedup_embedding_ann": q_dedup_embedding_ann,
    "decontaminate": q_decontaminate,
}
