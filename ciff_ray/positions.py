"""Positional postings: per-(term, doc) token-position lists, and the
index-only phrase match they enable.

The reference CIFF model is frequency-only — postings carry (docid, tf)
and nothing else (/root/reference/proto/common-index-format-v1.proto:
Posting) — so phrase queries against it must re-scan document text
(pipelines.q_phrase_match does exactly that: AND candidates, then a
vectorized regex over the candidate docs).  This module is the
beyond-the-reference extension a full-text engine wants at scale:
token positions are extracted ONCE at build time, and phrase queries
become pure integer set-intersections over the store — no document
text is read at query time.

Store layout (cluster-visible, under :func:`ciff_ray.layout.cache_root`):

    <root>/part=<p>/*.parquet     columns (term, doc_id, positions)

with ``p = stable_hash(term) % POS_PARTS`` (version-stable crc32 —
a persisted partition key must outlive any one process), written via
``Dataset.write_parquet(partition_cols=["part"])`` so map tasks on any
node land their files in the shared partition directories.  A phrase
query reads ONLY the partitions of its query terms, with term and
doc-id filters pushed into the parquet scan.

Positions index the FILTERED token sequence (empty splits dropped),
which equals textual adjacency because the tokenizer's regex split
consumes separator runs whole — the same argument, and therefore the
same semantics, as pipelines._phrase_regex.  The oracle for
q_phrase_match_positional is the identical regex SQL used by
q_phrase_match.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ciff_ray.layout import cache_root
from ciff_ray.tokenizer import token_ids

POS_PARTS = 32


# ---------------------------------------------------------------------------
# build


def _position_partials(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per (term, doc) with the ascending
    positions of that term in the doc's filtered token sequence.
    Vectorized: one dictionary-encode + one lexsort per batch; the
    partition hash is the per-VOCAB-entry stable_hash loop build.py
    also uses (amortized by the dictionary encode; crc32 is
    version-stable, which a persisted partition key requires —
    unlike the run-scoped polars hash)."""
    from ciff_ray.layout import stable_hash

    empty = pa.table(
        {
            "part": pa.array([], type=pa.int32()),
            "term": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "positions": pa.array([], type=pa.list_(pa.int32())),
        }
    )
    vocab, tidx, rows = token_ids(batch["text"])
    n = tidx.size
    if n == 0:
        return empty
    # position within each row's token run (rows are contiguous and
    # non-decreasing because list_parent_indices flattens in order)
    new_run = np.concatenate([[True], rows[1:] != rows[:-1]])
    run_start = np.flatnonzero(new_run)
    run_len = np.diff(np.concatenate([run_start, [n]]))
    pos = (np.arange(n) - np.repeat(run_start, run_len)).astype(np.int32)
    doc_col = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if doc_col.size and int(doc_col.max()) >= (1 << 32):
        # the query side packs (doc << 32 | pos) into u64; a larger
        # docID would wrap into another doc's key space and produce
        # silent false phrase/proximity hits — fail at build instead.
        # (>= 2^32 docs => shard the positional store by doc range.)
        raise ValueError("positional store requires doc_id < 2^32")
    doc = doc_col[rows]
    # one row per (term, doc); positions ascend within each group
    # because lexsort is stable on the already-ascending pos
    order = np.lexsort((pos, doc, tidx))
    t_s, d_s, p_s = tidx[order], doc[order], pos[order]
    boundary = np.concatenate(
        [[True], (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])]
    )
    starts = np.flatnonzero(boundary)
    offsets = np.concatenate([starts, [n]]).astype(np.int32)
    positions = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(p_s, type=pa.int32())
    )
    terms = vocab.take(pa.array(t_s[starts]))
    crc = np.array(
        [stable_hash(t.encode()) for t in vocab.to_pylist()], dtype=np.int64
    )
    part = (crc[t_s[starts]] % POS_PARTS).astype(np.int32)
    return pa.table(
        {
            "part": pa.array(part, type=pa.int32()),
            "term": terms,
            "doc_id": pa.array(d_s[starts], type=pa.int64()),
            "positions": positions,
        }
    )


def _publish_store(ds: ray.data.Dataset, out_dir: str) -> str:
    """Write a (part, term, doc_id, positions) Dataset as a positional
    store: hive partition_cols write into a tmp dir, then the
    layout.publish_dir discipline (_DONE inside tmp, atomic rename,
    race-loser cleanup, marker-less-partial self-heal)."""
    from ciff_ray.layout import publish_dir

    tmp = f"{out_dir}.tmp-{os.getpid()}"
    ds.write_parquet(tmp, partition_cols=["part"])
    return publish_dir(tmp, out_dir)


def build_positions(docs: ray.data.Dataset, out_dir: str) -> str:
    """Build the positional store from a (doc_id, text) Dataset.

    Streaming end to end: partial extraction is a stateless
    map_batches; the write itself is the only exchange (hive-style
    partition_cols on the term-hash), so no driver materialization and
    no sort — a phrase query re-sorts the handful of rows it reads."""
    return _publish_store(
        docs.map_batches(_position_partials, batch_format="pyarrow"), out_dir
    )


def positions_dir_for(sf_dir: str) -> str:
    from ciff_ray.pipelines import _sf_fingerprint

    return os.path.join(cache_root(), "positions", _sf_fingerprint(sf_dir))


def ensure_positions(sf_dir: str) -> str:
    out = positions_dir_for(sf_dir)
    if not os.path.exists(os.path.join(out, "_DONE")):
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        build_positions(docs, out)
    return out


# ---------------------------------------------------------------------------
# query


def _term_part(term: str) -> int:
    from ciff_ray.layout import stable_hash

    return int(stable_hash(term.encode()) % POS_PARTS)


class PositionStore:
    """Reader over the positional store: (term, candidate docs) ->
    sorted (doc << 32 | pos) keys.  Reads only the term's hash
    partition with term/doc filters pushed into the scan; caches
    nothing (callers are per-phrase, reads are candidate-sized)."""

    def __init__(self, root: str):
        self.root = root

    def keys(self, term: str, cand: np.ndarray) -> np.ndarray:
        part_dir = os.path.join(self.root, f"part={_term_part(term)}")
        if not os.path.isdir(part_dir):
            return np.empty(0, np.uint64)
        # term-only pushdown: a candidate "in"-list filter materializes
        # |cand| Python ints per read and degenerates for frequent-term
        # pairs; the doc intersection is one vectorized searchsorted
        # against the (sorted) candidate array instead
        t = pq.read_table(
            part_dir,
            columns=["term", "doc_id", "positions"],
            filters=[("term", "=", term)],
        )
        if t.num_rows == 0:
            return np.empty(0, np.uint64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.sort(np.asarray(cand, dtype=np.int64))
        pos = np.searchsorted(cs, doc_ids)
        keep = (pos < cs.size) & (
            cs[np.minimum(pos, max(cs.size - 1, 0))] == doc_ids
        )
        if not keep.any():
            return np.empty(0, np.uint64)
        t = t.filter(pa.array(keep))
        col = t["positions"].combine_chunks()
        flat = np.asarray(col.values).astype(np.uint64)
        lens = np.diff(np.asarray(col.offsets)).astype(np.int64)
        docs = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64), lens
        )
        keys = (docs << np.uint64(32)) | flat
        keys.sort()
        return keys

    def phrase_docs(self, terms: list[str], cand: np.ndarray) -> np.ndarray:
        """Docs (from `cand`) containing `terms` adjacently, via pure
        position-set intersection: S₀ = keys(t₀); Sᵢ = (Sᵢ₋₁ + 1) ∩
        keys(tᵢ); result docs = unique(high 32 bits of the survivors).
        pos+1 cannot carry into the doc bits (pos < 2³¹)."""
        if not terms:
            return np.empty(0, np.int64)
        s = self.keys(terms[0], cand)
        for t in terms[1:]:
            if s.size == 0:
                break
            nxt = self.keys(t, cand)
            shifted = s + np.uint64(1)
            pos_idx = np.searchsorted(nxt, shifted)
            inb = pos_idx < nxt.size
            hit = np.zeros(shifted.size, dtype=bool)
            hit[inb] = nxt[pos_idx[inb]] == shifted[inb]
            s = shifted[hit]
        return np.unique((s >> np.uint64(32)).astype(np.int64))


class _PhrasePositionalVerify:
    """map_batches stage over (query_id, phrase) rows: AND candidates
    are resolved HERE, inside the actor (index state loaded once per
    actor — the driver never decodes postings); adjacency is then
    verified against the positional store only — no document text."""

    def __init__(self, store_root: str, index_dir: str):
        from ciff_ray.pipelines import _BooleanAndActor

        self.store = PositionStore(store_root)
        self._and = _BooleanAndActor(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import tokenize_column

        qids, docs = [], []
        for qid, phrase in zip(
            batch["query_id"].to_pylist(), batch["phrase"].to_pylist()
        ):
            toks = pc.list_flatten(
                tokenize_column(pa.array([phrase], type=pa.string()))
            )
            terms = [t for t in toks.to_pylist() if t]
            cand = self._and._conjunction(phrase)
            if not terms or cand.size == 0:
                continue
            d = self.store.phrase_docs(terms, cand)
            qids.append(np.full(d.size, qid, dtype=np.int64))
            docs.append(d)
        if not qids:
            q: np.ndarray = np.empty(0, np.int64)
            d2: np.ndarray = np.empty(0, np.int64)
        else:
            q, d2 = np.concatenate(qids), np.concatenate(docs)
        return pa.table(
            {
                "query_id": pa.array(q, type=pa.int64()),
                "doc_id": pa.array(d2, type=pa.int64()),
            }
        )


def phrase_match_ds(idx: str, store: str) -> ray.data.Dataset:
    """Index-only phrase retrieval over any aligned (index, positional
    store) pair: conjunctive AND over the index bounds candidates
    (rarest-term df), the store proves adjacency.  The two roots must
    share a docID space — build/ensure pairs do by construction,
    lifecycle pairs via merge_positions/compact_positions."""
    from ciff_ray.pipelines import PHRASE_SET

    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    range(len(PHRASE_SET)), type=pa.int64()
                ),
                "phrase": pa.array(PHRASE_SET, type=pa.string()),
            }
        )
    ).repartition(min(4, len(PHRASE_SET)))
    return queries.map_batches(
        _PhrasePositionalVerify,
        fn_constructor_args=(store, idx),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_phrase_match_positional(sf_dir: str) -> ray.data.Dataset:
    """Phrase search answered entirely from the index side — same
    oracle and result set as q_phrase_match, zero document re-scan."""
    from ciff_ray.pipelines import ensure_index

    return phrase_match_ds(ensure_index(sf_dir), ensure_positions(sf_dir))


def q_phrase_match_merged(sf_dir: str) -> ray.data.Dataset:
    """Phrase retrieval through a MERGED index + MERGED positional
    store (two half-corpus builds folded by merge_indexes /
    merge_positions_for).  The byte-order split keeps merged docIDs
    equal to documents.doc_id, so the result set — and the SQL oracle —
    are identical to the monolithic phrase_match: the driver entry that
    gates the store-side lifecycle end to end."""
    from ciff_ray.pipelines import (
        ensure_merged_index,
        ensure_merged_positions,
    )

    return phrase_match_ds(
        ensure_merged_index(sf_dir), ensure_merged_positions(sf_dir)
    )


# ---------------------------------------------------------------------------
# proximity search (two terms within a token window, any order)

PROX_PAIRS = [
    ("the", "key"),
    ("merge", "join"),
    ("sort", "table"),
    ("batch", "window"),
    ("zzznotaterm", "key"),  # no-hit probe
]
PROX_WINDOW = 8  # max token distance (inclusive)

_POS_MASK = np.uint64(0xFFFFFFFF)


def _min_dist_per_doc(
    k1: np.ndarray, k2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc minimum |pos1 - pos2| between two sorted (doc<<32|pos)
    key sets.  For every k1 element only its two searchsorted
    neighbors in k2 can be nearest (k2 ascends per doc), so the whole
    computation is two gathers + a per-doc minimum reduction."""
    if k1.size == 0 or k2.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d1 = (k1 >> np.uint64(32)).astype(np.int64)
    p1 = (k1 & _POS_MASK).astype(np.int64)
    idx = np.searchsorted(k2, k1)
    best = np.full(k1.size, np.iinfo(np.int64).max, dtype=np.int64)
    for j in (idx - 1, idx):
        jc = np.clip(j, 0, k2.size - 1)
        valid = (j >= 0) & (j < k2.size)
        kj = k2[jc]
        same_doc = ((kj >> np.uint64(32)).astype(np.int64) == d1) & valid
        dist = np.abs(p1 - (kj & _POS_MASK).astype(np.int64))
        np.minimum(best, np.where(same_doc, dist, best.max()), out=best)
    hit = best < np.iinfo(np.int64).max
    if not hit.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs, inv = np.unique(d1[hit], return_inverse=True)
    mins = np.full(docs.size, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mins, inv, best[hit])
    return docs, mins


class _ProximityVerify:
    """map_batches stage over (query_id, term_a, term_b) rows: AND
    candidates are resolved inside the actor (no driver postings
    decode); then the per-doc min token distance from the positional
    store, windowed."""

    def __init__(self, store_root: str, index_dir: str, window: int):
        from ciff_ray.pipelines import _BooleanAndActor

        self.store = PositionStore(store_root)
        self._and = _BooleanAndActor(index_dir)
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, dists = [], [], []
        for qid, ta, tb in zip(
            batch["query_id"].to_pylist(),
            batch["term_a"].to_pylist(),
            batch["term_b"].to_pylist(),
        ):
            cand = self._and._conjunction(f"{ta} {tb}")
            if cand.size == 0:
                continue
            d, m = _min_dist_per_doc(
                self.store.keys(ta, cand), self.store.keys(tb, cand)
            )
            keep = m <= self.window
            d, m = d[keep], m[keep]
            qids.append(np.full(d.size, qid, dtype=np.int64))
            docs.append(d)
            dists.append(m)
        if not qids:
            q: np.ndarray = np.empty(0, np.int64)
            dd: np.ndarray = np.empty(0, np.int64)
            mm: np.ndarray = np.empty(0, np.int64)
        else:
            q = np.concatenate(qids)
            dd = np.concatenate(docs)
            mm = np.concatenate(dists)
        return pa.table(
            {
                "query_id": pa.array(q, type=pa.int64()),
                "doc_id": pa.array(dd, type=pa.int64()),
                "min_dist": pa.array(mm, type=pa.int64()),
            }
        )


def q_proximity_pairs(sf_dir: str) -> ray.data.Dataset:
    """Windowed co-occurrence: docs where both pair terms appear within
    PROX_WINDOW tokens (any order), with the per-doc min distance —
    answered from the positional store alone (AND candidates bound the
    reads; no document text)."""
    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(PROX_PAIRS)), type=pa.int64()),
                "term_a": pa.array([a for a, _ in PROX_PAIRS]),
                "term_b": pa.array([b for _, b in PROX_PAIRS]),
            }
        )
    ).repartition(min(4, len(PROX_PAIRS)))
    return queries.map_batches(
        _ProximityVerify,
        fn_constructor_args=(store, idx, PROX_WINDOW),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# proximity-boosted ranking (Büttcher et al. 2006-style bigram boost)

# multi-term queries where term adjacency should matter, plus a no-hit
# probe; the pool rescore is SQL-expressible so this entry carries a
# full value-hash oracle
PROXIMITY_QUERY_SET = [
    "the fast key",
    "merge join table",
    "batch window stream",
    "customer filter join order",
    "zzznotaterm key",
]
PROX_POOL = 50  # BM25 pool size rescored with the proximity boost
PROX_BETA = 2.0  # boost weight: beta / min_dist per adjacent pair


def adjacent_pairs(query: str) -> list[tuple[str, str]]:
    """Ordered-unique adjacent token pairs of ``query`` (self-pairs
    dropped: min|posA-posB| of a term with itself is degenerate and the
    SQL side would divide by zero).  Shared by the Ray entry and the
    oracle generator so both sides boost the exact same pairs."""
    from ciff_ray.oracle import tokenize

    toks = tokenize(query)
    seen: set[tuple[str, str]] = set()
    out: list[tuple[str, str]] = []
    for a, b in zip(toks, toks[1:]):
        if a != b and (a, b) not in seen:
            seen.add((a, b))
            out.append((a, b))
    return out


class _ProximityRescoreActor:
    """map_batches callable over (query_id, query) rows: BM25 top-pool
    from the index, per-pair min token distances from the positional
    store (reads bounded by the pool docs), additive beta/min_dist
    boost, re-rank with the engine's own rounded key.  Index + store
    handles load once per actor."""

    def __init__(
        self,
        index_dir: str,
        store_root: str,
        k: int,
        pool: int = PROX_POOL,
        window: int = PROX_WINDOW,
        beta: float = PROX_BETA,
    ):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.store = PositionStore(store_root)
        self.k, self.pool, self.window, self.beta = k, pool, window, beta

    def _rescore(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        docs, scores = self.scorer.topk(query, self.pool)
        if docs.size == 0:
            return docs, scores
        order = np.argsort(docs)
        cand = docs[order]  # sorted view for the store lookups
        boost = np.zeros(cand.size, dtype=np.float64)
        for ta, tb in adjacent_pairs(query):
            d, m = _min_dist_per_doc(
                self.store.keys(ta, cand), self.store.keys(tb, cand)
            )
            keep = m <= self.window
            if not keep.any():
                continue
            idx = np.searchsorted(cand, d[keep])
            boost[idx] += self.beta / m[keep].astype(np.float64)
        final = scores[order] + boost
        from ciff_ray.query import LocalScorer

        return LocalScorer._rank(cand, final, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            d, s = self._rescore(q)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
            scores.extend(s.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def q_bm25_proximity(sf_dir: str) -> ray.data.Dataset:
    """Proximity-boosted retrieval: BM25 top-{PROX_POOL} pool, additive
    {PROX_BETA}/min_dist boost per adjacent query-term pair within
    PROX_WINDOW tokens (positions from the positional store — no
    document text at query time), re-ranked top-k.  Oracle: the same
    pool + positional self-join rescore in SQL."""
    import ray

    from ciff_ray.pipelines import TOPK_K, ensure_index

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    range(len(PROXIMITY_QUERY_SET)), type=pa.int64()
                ),
                "query": pa.array(PROXIMITY_QUERY_SET),
            }
        )
    ).repartition(4)
    return queries.map_batches(
        _ProximityRescoreActor,
        fn_constructor_args=(idx, store, TOPK_K),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["query_id", "rank", "doc_id"])


# ---------------------------------------------------------------------------
# ordered span-near search (Lucene SpanNearQuery(inOrder=true) analogue)

# (terms-in-order, slop) — slop = max total gap tokens allowed inside
# the window, i.e. (pos_last - pos_first) - (n-1) <= slop; slop 0 means
# exact phrase adjacency.  Mix of 2- and 3-term spans, a repeated-term
# span, a slop-0 phrase equivalent, and a no-hit probe.  Keep BOTH
# arities populated: the oracle SQL unions one block per arity.
SPAN_QUERY_SET: list[tuple[list[str], int]] = [
    (["the", "key"], 3),
    (["merge", "join"], 8),
    (["key", "order", "sort"], 6),
    (["the", "the"], 2),
    (["spark", "window"], 0),
    (["zzznotaterm", "key"], 10),
    (["the", "fast", "key"], 0),
]


def _chase_min_gaps(
    key_sets: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc minimum total gap of an ORDERED occurrence across sorted
    packed (doc<<32|pos) key sets (positions strictly increasing).

    Greedy earliest-completion chase: from every occurrence in
    key_sets[0], each subsequent set jumps to its first key strictly
    after the chain's current end (one searchsorted per set over all
    chains at once).  For a fixed start the greedy chain minimizes the
    window end, and any valid ordered tuple contains a chain from its
    own start with an equal-or-smaller window — so min-over-starts
    equals the exact min over ALL ordered tuples, which is what the
    oracle's positional self-join computes.  Cost: O(Σ |keysᵢ| log) —
    no per-doc Python loop.
    """
    empty = np.empty(0, np.int64)
    starts = key_sets[0]
    if starts.size == 0:
        return empty, empty
    keep_start, end = starts, starts
    for nxt in key_sets[1:]:
        if end.size == 0 or nxt.size == 0:
            return empty, empty
        idx = np.searchsorted(nxt, end + np.uint64(1))
        inb = idx < nxt.size
        nxt_keys = nxt[np.minimum(idx, nxt.size - 1)]
        ok = inb & ((nxt_keys >> np.uint64(32)) == (end >> np.uint64(32)))
        keep_start, end = keep_start[ok], nxt_keys[ok]
    if end.size == 0:
        return empty, empty
    gaps = (
        (end & _POS_MASK).astype(np.int64)
        - (keep_start & _POS_MASK).astype(np.int64)
        - (len(key_sets) - 1)
    )
    docs = (keep_start >> np.uint64(32)).astype(np.int64)
    # keep_start stays key-sorted through the filters, so docs is
    # nondecreasing: per-doc min is one reduceat
    cut = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
    return docs[cut], np.minimum.reduceat(gaps, cut)


def _span_min_gaps(
    store: PositionStore, terms: list[str], cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """_chase_min_gaps over the positional store's key sets for
    ``terms`` restricted to the ``cand`` docs."""
    key_sets = []
    for t in terms:
        k = store.keys(t, cand)
        if k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        key_sets.append(k)
    return _chase_min_gaps(key_sets)


class _SpanNearVerify:
    """map_batches stage over (query_id, terms, slop) rows: AND
    candidates are resolved inside the actor (no driver postings
    decode); ordered-window verification runs against the positional
    store only — no document text."""

    KERNEL = staticmethod(_span_min_gaps)

    def __init__(self, store_root: str, index_dir: str):
        from ciff_ray.pipelines import _BooleanAndActor

        self.store = PositionStore(store_root)
        self._and = _BooleanAndActor(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, gaps = [], [], []
        for qid, terms, slop in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["slop"].to_pylist(),
        ):
            cand = self._and._conjunction(" ".join(terms))
            if cand.size == 0:
                continue
            d, g = self.KERNEL(self.store, terms, cand)
            keep = g <= slop
            d, g = d[keep], g[keep]
            qids.append(np.full(d.size, qid, dtype=np.int64))
            docs.append(d)
            gaps.append(g)
        if not qids:
            q: np.ndarray = np.empty(0, np.int64)
            d2: np.ndarray = np.empty(0, np.int64)
            g2: np.ndarray = np.empty(0, np.int64)
        else:
            q, d2, g2 = (
                np.concatenate(qids),
                np.concatenate(docs),
                np.concatenate(gaps),
            )
        return pa.table(
            {
                "query_id": pa.array(q, type=pa.int64()),
                "doc_id": pa.array(d2, type=pa.int64()),
                "min_gaps": pa.array(g2, type=pa.int64()),
            }
        )


def _span_queries_ds(qset: list[tuple[list[str], int]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(qset)), type=pa.int64()),
                "terms": pa.array(
                    [t for t, _ in qset], type=pa.list_(pa.string())
                ),
                "slop": pa.array([s for _, s in qset], type=pa.int64()),
            }
        )
    ).repartition(max(1, min(4, len(qset))))  # repartition(0) is an error


def span_near_ds(
    sf_dir: str, qset: list[tuple[list[str], int]], *, ordered: bool = True
) -> ray.data.Dataset:
    """Span-near retrieval over an arbitrary (terms, slop) workload —
    candidate resolution AND window verification both run inside the
    actor pool, so workload size never touches the driver."""
    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    return _span_queries_ds(qset).map_batches(
        _SpanNearVerify if ordered else _SpanUnorderedVerify,
        fn_constructor_args=(store, idx),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_span_near(sf_dir: str) -> ray.data.Dataset:
    """Ordered span-near search: docs where the query terms appear IN
    ORDER within ``slop`` total gap tokens, with the per-doc minimal
    gap — the ordered sibling of q_proximity_pairs, answered from the
    positional store alone (AND candidates bound the reads)."""
    return span_near_ds(sf_dir, SPAN_QUERY_SET, ordered=True)


# ---------------------------------------------------------------------------
# unordered span-near (Lucene SpanNearQuery(inOrder=false) analogue)

# (terms, slop) with DISTINCT terms per query (the permutation argument
# below needs one position per term; Lucene's unordered spans with
# repeated clauses have the same subtlety).  Mix: 2-term both-order
# pairs, a 3-term set, slop-0 (adjacent in any order), and a no-hit.
SPAN_UNORDERED_QUERY_SET: list[tuple[list[str], int]] = [
    (["key", "the"], 2),
    (["merge", "join"], 5),
    (["sort", "order", "key"], 4),
    (["spark", "window"], 1),
    (["zzznotaterm", "key"], 10),
    (["fast", "key", "the"], 0),
]


def _span_unordered_min_gaps(
    store: PositionStore, terms: list[str], cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc minimum unordered window gap: min over all ways to pick
    one position per term of (max pos - min pos) - (n-1).

    Exact reduction to the ordered chase: any minimizing tuple, sorted
    by position, is an ORDERED occurrence of its induced term
    permutation with the same window (positions are distinct because
    the terms are distinct), and every ordered occurrence is a valid
    unordered pick — so the unordered min equals the min over the n!
    permutations of `_chase_min_gaps`.  n! is bounded by the query
    arity (<= 3 here; Lucene caps span clause counts the same way),
    and each chase is the same O(Σ|keys| log) vectorized kernel.
    """
    import itertools

    assert len(set(terms)) == len(terms), "unordered spans need distinct terms"
    key_sets = {}
    for t in terms:
        k = store.keys(t, cand)
        if k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        key_sets[t] = k
    doc_parts, gap_parts = [], []
    for perm in itertools.permutations(terms):
        d, g = _chase_min_gaps([key_sets[t] for t in perm])
        doc_parts.append(d)
        gap_parts.append(g)
    docs = np.concatenate(doc_parts)
    gaps = np.concatenate(gap_parts)
    if docs.size == 0:
        return docs, gaps
    order = np.lexsort((gaps, docs))
    docs, gaps = docs[order], gaps[order]
    cut = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
    return docs[cut], gaps[cut]


class _SpanUnorderedVerify(_SpanNearVerify):
    """Same in-actor candidate resolution as _SpanNearVerify, with the
    unordered window kernel."""

    KERNEL = staticmethod(_span_unordered_min_gaps)


def q_span_unordered(sf_dir: str) -> ray.data.Dataset:
    """Unordered span-near search: docs where the query terms all
    appear within ``slop`` total gap tokens IN ANY ORDER, with the
    per-doc minimal gap (AND candidates bound the positional reads)."""
    return span_near_ds(sf_dir, SPAN_UNORDERED_QUERY_SET, ordered=False)


def _span_unordered_values(n: int) -> str:
    rows = []
    for qid, (terms, slop) in enumerate(SPAN_UNORDERED_QUERY_SET):
        if len(terms) != n:
            continue
        cols = ", ".join(f"'{t}'" for t in terms)
        rows.append(f"({qid}, {cols}, {slop})")
    return ", ".join(rows)


def span_unordered_oracle_sql() -> str:
    """Exact unordered-window min via positional self-joins with
    greatest/least window arithmetic (distinct terms => distinct
    positions, so no same-position degeneracy)."""
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    assert _span_unordered_values(2) and _span_unordered_values(3)
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM transcripts
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
q2(query_id, ta, tb, slop) AS (VALUES {_span_unordered_values(2)}),
q3(query_id, ta, tb, tc, slop) AS (VALUES {_span_unordered_values(3)}),
s2 AS (
  SELECT q.query_id, a.doc_id,
         min(greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1) AS g,
         q.slop AS slop
  FROM q2 q
  JOIN tokpos a ON a.term = q.ta
  JOIN tokpos b ON b.term = q.tb AND b.doc_id = a.doc_id
  GROUP BY q.query_id, a.doc_id, q.slop
),
s3 AS (
  SELECT q.query_id, a.doc_id,
         min(greatest(a.pos, b.pos, c.pos)
             - least(a.pos, b.pos, c.pos) - 2) AS g,
         q.slop AS slop
  FROM q3 q
  JOIN tokpos a ON a.term = q.ta
  JOIN tokpos b ON b.term = q.tb AND b.doc_id = a.doc_id
  JOIN tokpos c ON c.term = q.tc AND c.doc_id = a.doc_id
  GROUP BY q.query_id, a.doc_id, q.slop
),
u AS (SELECT * FROM s2 UNION ALL SELECT * FROM s3)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(g AS BIGINT) AS min_gaps
FROM u WHERE g <= slop"""


def _span_values(n: int) -> str:
    """(query_id, t1..tn, slop) VALUES rows for the n-term spans."""
    rows = []
    for qid, (terms, slop) in enumerate(SPAN_QUERY_SET):
        if len(terms) != n:
            continue
        cols = ", ".join(f"'{t}'" for t in terms)
        rows.append(f"({qid}, {cols}, {slop})")
    return ", ".join(rows)


def span_near_oracle_sql() -> str:
    """Exact ordered-window min over ALL position tuples via positional
    self-joins (one block per query arity; |pos| differences are
    invariant to SQL's 1-based subscripts)."""
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    assert _span_values(2) and _span_values(3), "keep both arities"
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM transcripts
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
q2(query_id, ta, tb, slop) AS (VALUES {_span_values(2)}),
q3(query_id, ta, tb, tc, slop) AS (VALUES {_span_values(3)}),
s2 AS (
  SELECT q.query_id, a.doc_id, min(b.pos - a.pos - 1) AS g, q.slop AS slop
  FROM q2 q
  JOIN tokpos a ON a.term = q.ta
  JOIN tokpos b ON b.term = q.tb AND b.doc_id = a.doc_id AND b.pos > a.pos
  GROUP BY q.query_id, a.doc_id, q.slop
),
s3 AS (
  SELECT q.query_id, a.doc_id, min(c.pos - a.pos - 2) AS g, q.slop AS slop
  FROM q3 q
  JOIN tokpos a ON a.term = q.ta
  JOIN tokpos b ON b.term = q.tb AND b.doc_id = a.doc_id AND b.pos > a.pos
  JOIN tokpos c ON c.term = q.tc AND c.doc_id = a.doc_id AND c.pos > b.pos
  GROUP BY q.query_id, a.doc_id, q.slop
),
u AS (SELECT * FROM s2 UNION ALL SELECT * FROM s3)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(g AS BIGINT) AS min_gaps
FROM u WHERE g <= slop"""


# ---------------------------------------------------------------------------
# lifecycle: merge / compact parity with the frequency index
#
# The store's doc_id space must MATCH the index it serves (phrase
# candidates and proximity pools are index docIDs intersected against
# store keys), so every index lifecycle op has a store-side mirror:
#
# * delete_docs — NO store transform needed.  Deletes are deferred on
#   the index side (every scorer filters tombstones out of decoded
#   postings), and the store is only ever probed with candidate sets
#   that came FROM the index — dead docs can never surface.
# * merge_indexes — merge_positions/merge_positions_for: per-root
#   doc_id offset by the SAME doc_base prefix-sums merge.py computes,
#   then a partition-preserving union (identical term → identical
#   hash partition in every root, so no shuffle: each root's hive
#   partition files stream straight into the merged layout).
# * compact_index — compact_positions: drop the source index's
#   tombstoned docs and remap survivors to dense ranks with the SAME
#   `old - searchsorted(dead, old)` rule lifecycle._compact_partition
#   and the docmap rewrite use, so the compacted store lines up with
#   the compacted index bit-for-bit.
#
# All three are streaming map_batches + hive write — no driver
# materialization, no sort; fsck.check_positions(store, index) is the
# post-op audit (per-term df/cf cross-check against the index stats).


def _canonical_pos_batch(t: pa.Table) -> pa.Table:
    """Normalize a store batch read back through hive partitioning:
    `part` returns as string/dictionary — cast to the written int32."""
    try:
        part = pc.cast(pc.cast(t["part"], pa.string()), pa.int32())
    except pa.ArrowInvalid:
        part = pc.cast(t["part"], pa.int32())
    return pa.table(
        {
            "part": part,
            "term": pc.cast(t["term"], pa.string()),
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "positions": t["positions"],
        }
    )


def _shift_pos_batch(t: pa.Table, *, doc_base: int) -> pa.Table:
    t = _canonical_pos_batch(t)
    ids = pc.add(t["doc_id"], pa.scalar(doc_base, type=pa.int64()))
    if t.num_rows and pc.max(ids).as_py() >= (1 << 32):
        # same packing invariant as _position_partials: the query side
        # packs (doc << 32 | pos) into u64
        raise ValueError("merged positional store requires doc_id < 2^32")
    return t.set_column(
        t.schema.get_field_index("doc_id"), "doc_id", ids
    )


def _compact_pos_batch(t: pa.Table, *, dead_ref) -> pa.Table:
    import ray

    from ciff_ray.lifecycle import _dead_mask

    t = _canonical_pos_batch(t)
    d = ray.get(dead_ref)
    if d.size == 0 or t.num_rows == 0:
        return t
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = ~_dead_mask(ids, d)
    t = t.filter(pa.array(keep))
    ids = ids[keep] - np.searchsorted(d, ids[keep])
    return t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(ids, type=pa.int64()),
    )


def _store_dataset(pos_root: str) -> ray.data.Dataset:
    if not os.path.exists(os.path.join(pos_root, "_DONE")):
        raise FileNotFoundError(f"not a published positional store: {pos_root}")
    return ray.data.read_parquet(pos_root, file_extensions=["parquet"])


def merge_positions(
    pos_roots: list[str], doc_bases: list[int], out_dir: str
) -> str:
    """Fold positional stores into one, offsetting each root's docIDs
    by its ``doc_base`` (the prefix-sum of preceding roots' num_docs —
    exactly merge.merge_indexes' docID renumbering).  Partition-
    preserving union: no shuffle, streaming write.  Idempotent."""
    if len(pos_roots) < 2:
        raise ValueError("merge_positions needs at least two roots")
    if len(pos_roots) != len(doc_bases):
        raise ValueError("pos_roots and doc_bases must align")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    parts = [
        _store_dataset(r).map_batches(
            _shift_pos_batch,
            fn_kwargs={"doc_base": int(b)},
            batch_format="pyarrow",
        )
        for r, b in zip(pos_roots, doc_bases)
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return _publish_store(ds, out_dir)


def merge_positions_for(
    index_roots: list[str], pos_roots: list[str], out_dir: str
) -> str:
    """merge_positions with doc_bases derived from the index roots'
    manifests — the same accumulation merge.merge_indexes performs, so
    the merged store lines up with the merged index by construction."""
    from ciff_ray.layout import IndexPaths, Manifest

    if len(index_roots) != len(pos_roots):
        raise ValueError("index_roots and pos_roots must align")
    bases, acc = [], 0
    for r in index_roots:
        bases.append(acc)
        acc += Manifest.read(IndexPaths(r).manifest).num_docs
    return merge_positions(pos_roots, bases, out_dir)


def compact_positions(pos_root: str, index_dir: str, out_dir: str) -> str:
    """Rewrite ``pos_root`` without ``index_dir``'s tombstoned docs,
    remapping survivors to dense ranks — the mirror of
    lifecycle.compact_index (run it with the SOURCE index, the one
    that carries the tombstones, not the compacted output).
    Streaming, partition-preserving, idempotent."""
    import ray

    from ciff_ray.layout import IndexPaths
    from ciff_ray.lifecycle import _load_tombstones

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    dead = _load_tombstones(IndexPaths(index_dir))
    dead_ref = ray.put(dead)
    return _publish_store(
        _store_dataset(pos_root).map_batches(
            _compact_pos_batch,
            fn_kwargs={"dead_ref": dead_ref},
            batch_format="pyarrow",
        ),
        out_dir,
    )
