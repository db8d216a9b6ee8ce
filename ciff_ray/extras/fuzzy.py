"""Fuzzy term matching over the index vocabulary: all pairs of
distinct vocabulary terms within Levenshtein distance MAX_EDITS (2),
found SymSpell-style (deletion-neighborhood self-join) and exactly
verified.

Recall completeness: if lev(a, b) <= d, each edit op removes at most
one aligned position from each side, so deleting the (<= d) touched
positions from both words yields a COMMON string reachable by <= d
deletions from either — the deletion-neighborhoods D(a, d) and
D(b, d) intersect (the SymSpell invariant).  Variants are hashed (u64)
for a compact exchange; collisions only ADD candidates, and the exact
verifier removes them, so hashing never loses a pair.

Scale shape: this is a VOCABULARY-scale operator (the small side of
any corpus — natural-language vocabs grow sublinearly in corpus
size).  The variant exchange moves (8-byte hash, term) rows hash-
partitioned by variant; a variant's rows land in one partition, so
pair emit is partition-local; the verifier is a banded-free DP
vectorized ACROSS pairs (the only Python loops run over term LENGTH,
not over pairs or rows).

Reference scope: the reference has no query/vocab tooling at all
(SURVEY.md §2.7); this extends the engine's retrieval surface
(SURVEY.md §2.11) — the standard spell-correction candidate generator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

MAX_EDITS = 2
FUZZY_PARTS = 16


def _deletion_variants(term: str, d: int) -> set[str]:
    """All strings reachable from ``term`` by 0..d deletions."""
    out = {term}
    frontier = {term}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for j in range(len(w)):
                nxt.add(w[:j] + w[j + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _variant_rows(batch: pa.Table) -> pa.Table:
    """(term, df) batch -> (part, vh, term) deletion-variant rows.
    The variant emit is a per-term loop — vocabulary-scale (the
    sublinear small side, ~len^2/2 variants per term at d=2) — then
    one vectorized hash pass over all variants."""
    terms = batch["term"].combine_chunks()
    n = len(terms)
    if n == 0:
        return pa.table(
            {
                "part": pa.array([], type=pa.int32()),
                "vh": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
            }
        )
    import polars as pl

    variants: list[str] = []
    parents: list[int] = []
    for i, t in enumerate(terms.to_pylist()):
        vs = _deletion_variants(t, MAX_EDITS)
        variants.extend(vs)
        parents.extend([i] * len(vs))
    vh = (
        pl.Series(variants)
        .hash(seed=0xF0551)
        .to_numpy()
        .astype(np.uint64, copy=False)
    )
    parent_idx = pa.array(np.asarray(parents, dtype=np.int64))
    return pa.table(
        {
            "part": pa.array(
                (vh % np.uint64(FUZZY_PARTS)).astype(np.int32)
            ),
            "vh": pa.array(vh.view(np.int64), type=pa.int64()),
            "term": terms.take(parent_idx),
        }
    )


def _pad_matrix(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """words -> (n, W) uint8 zero-padded byte matrix + lengths."""
    bs = [w.encode() for w in words]
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    W = int(lens.max()) if lens.size else 1
    M = np.zeros((len(bs), max(W, 1)), dtype=np.uint8)
    for i, b in enumerate(bs):
        M[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return M, lens


def _lev_le(a_words: list[str], b_words: list[str], d: int) -> np.ndarray:
    """Exact Levenshtein(a_i, b_i) <= d mask over aligned pair lists.
    Full DP, vectorized ACROSS pairs: the i/j loops run over term
    length (bounded, ~10 for natural-language vocab), every cell op is
    one numpy kernel over all n pairs."""
    n = len(a_words)
    if n == 0:
        return np.zeros(0, dtype=bool)
    A, la = _pad_matrix(a_words)
    B, lb = _pad_matrix(b_words)
    out = np.zeros(n, dtype=bool)
    quick = np.abs(la - lb) > d
    Wa, Wb = A.shape[1], B.shape[1]
    prev = np.tile(np.arange(Wb + 1, dtype=np.int32), (n, 1))
    # rows where la == 0: distance is lb
    done0 = la == 0
    out[done0] = lb[done0] <= d
    for i in range(1, Wa + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Wb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        fin = la == i
        if fin.any():
            idx = np.flatnonzero(fin)
            out[idx] = cur[idx, lb[idx]] <= d
        prev = cur
    out[quick] = False
    return out


def _pairs_in_part(group: pa.Table) -> pa.Table:
    """One variant-hash partition -> exact-verified (a, b) term pairs:
    lexsort by (vh, term), per-run unique terms, upper-triangle pair
    emit, in-partition pair dedup, vectorized lev<=MAX_EDITS verify."""
    empty = pa.table(
        {"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string())}
    )
    if len(group) < 2:
        return empty
    vh = group["vh"].to_numpy(zero_copy_only=False)
    terms = np.array(group["term"].to_pylist(), dtype=object)
    order = np.lexsort((terms, vh))
    vh, terms = vh[order], terms[order]
    change = np.flatnonzero(vh[1:] != vh[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [vh.size]])
    a_list, b_list = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        run = terms[s:e]
        run = run[np.concatenate([[True], run[1:] != run[:-1]])]
        if run.size < 2:
            continue
        ia, ib = np.triu_indices(run.size, k=1)
        a_list.append(run[ia])
        b_list.append(run[ib])
    if not a_list:
        return empty
    a = np.concatenate(a_list)
    b = np.concatenate(b_list)
    # in-partition pair dedup (a pair can share several variants)
    key = np.char.add(np.char.add(a.astype(str), "\x00"), b.astype(str))
    _, first = np.unique(key, return_index=True)
    a, b = a[first], b[first]
    ok = _lev_le(a.tolist(), b.tolist(), MAX_EDITS)
    return pa.table(
        {
            "a": pa.array(a[ok].tolist(), type=pa.string()),
            "b": pa.array(b[ok].tolist(), type=pa.string()),
        }
    )


def q_fuzzy_terms(sf_dir: str) -> ray.data.Dataset:
    """All (a < b) vocabulary term pairs with Levenshtein distance <=
    MAX_EDITS over the index's term dictionary — the spell-correction
    candidate map.  A pair can surface from variants hashed into
    DIFFERENT partitions, so one tiny distinct runs over the (few)
    verified pairs."""
    from ciff_ray.layout import IndexPaths
    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    paths = IndexPaths(idx)
    stats = ray.data.read_parquet(paths.term_stats, columns=["term", "df"])
    pairs = (
        stats.map_batches(_variant_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pairs_in_part, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


ORACLE_SQLS = {
    # the oracle builds the same vocabulary from the derived
    # transcripts and brute-forces levenshtein over all pairs
    "fuzzy_terms": f"""WITH transcripts AS (
  SELECT doc_id, text FROM documents
),
tok AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
v AS (SELECT DISTINCT term FROM tok WHERE term <> '')
SELECT x.term AS a, y.term AS b
FROM v x JOIN v y ON x.term < y.term
WHERE levenshtein(x.term, y.term) <= {MAX_EDITS}""",
}

QUERIES = {"fuzzy_terms": q_fuzzy_terms}
