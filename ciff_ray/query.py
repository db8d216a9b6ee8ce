"""BM25 query engine over a ciff_ray index directory.

The reference contains no query engine (SURVEY.md §2.7 O5); scoring
semantics are pinned by our single-process oracle (ciff_ray.oracle):
k1=0.9, b=0.4, idf = max(ln((N-df+0.5)/(df+0.5)), 1e-6), float64,
summation in byte-sorted term order, ties (score desc, doc_id asc).
The engine must be (and is, tests/test_query_topk.py) SCORE-identical
to the oracle, not merely rank-identical.

Scoring modes, all exact (``bmw`` adds block-max skipping on top of
MaxScore; ``auto`` picks per query via the measured cost model in
``_pick_mode``):

* ``exact``   — vectorized term-at-a-time: decode every query-term
  slice, accumulate with np.unique + bincount.
* ``maxscore``— MaxScore-style pruning: essential terms (largest
  idf*max_partial upper bounds) are scored fully; non-essential terms
  contribute only to the candidate set via block-targeted decode
  (per-block byte offsets in the segment let a single 128-posting block
  be decoded without touching the rest of the slice).  Falls back to
  exact when the pruning guarantee (Σ U_nonessential < θ_k) cannot be
  established, so results are always identical to ``exact``.

Deployment model: each scorer keeps the vocabulary as term-sorted
Arrow columns with binary-search lookup (init cost = one columnar
read + sort; per-query memory = O(touched terms)) and lazily
loads/caches posting slices from the segment Parquet files — on a
cluster these live on shared storage, so any actor can serve any
query and the pool scales with query load
(`QueryEngine.score_dataset` = map_batches actor pool).  Doclengths
are doc-range-sharded (`DoclengthStore`): a scorer materializes only
the 2^20-doc shards its postings touch.
"""

from __future__ import annotations

import bisect
import math
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ciff_ray import codecs
from ciff_ray.layout import IndexPaths, Manifest

# below this doc count the dense top-k threshold trick is pure overhead
# (module-level so tests can lower them to exercise the chunked path on
# small fixtures)
_DENSE_TOPK_MIN_N = 1 << 22
_DENSE_TOPK_CHUNK = 1 << 22
from ciff_ray.oracle import EPS_IDF, tokenize
from ciff_ray.schemas import CODEC_BP, CODEC_BPG, CODEC_GAMMA

# per-PROCESS posting-slice decode tally (every decode path funnels
# through LocalScorer._decode_slice).  Tests snapshot it around a
# pipeline run in the DRIVER process to pin the no-driver-decode
# contract — worker-actor decodes happen in other processes and
# leave the driver's tally untouched.
DECODE_DIAG = {"slices": 0}


def sorted_member(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``needles`` appear in the SORTED
    ``haystack``.  THE sorted-membership kernel — tombstone masking,
    LTR pool lookups and the BP bucket salter all share it, so the
    empty-haystack edge case lives in exactly one place."""
    if haystack.size == 0:
        return np.zeros(needles.size, dtype=bool)
    pos = np.searchsorted(haystack, needles)
    inb = pos < haystack.size
    hit = np.zeros(needles.size, dtype=bool)
    hit[inb] = haystack[np.minimum(pos, haystack.size - 1)][inb] == needles[inb]
    return hit


@dataclass
class BM25Params:
    k1: float = 0.9
    b: float = 0.4


class _SortedStrColumn:
    """Byte-ordered Arrow string column exposed as a bisectable
    sequence: O(log n) term lookup with ~30 scalar accesses, ZERO
    Python-side materialization of the vocabulary (SURVEY §2.5 J3 —
    the searchsorted mapping).  Tokens are [a-z0-9]+ ASCII, so Python
    string comparison == byte order."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.arr = arr

    def __len__(self) -> int:
        return len(self.arr)

    def __getitem__(self, i: int) -> str:
        return self.arr[i].as_py()

    def range_of(self, term: str) -> tuple[int, int]:
        """[lo, hi) of rows equal to `term` (empty range if absent)."""
        lo = bisect.bisect_left(self, term)
        hi = lo
        n = len(self.arr)
        while hi < n and self.arr[hi].as_py() == term:
            hi += 1
        return lo, hi


def _docmap_spans(
    docmap_dir: str, num_docs: int
) -> list[tuple[int, int, str]]:
    """(docid-lo, docid-hi, path) spans of the docmap parquet files from
    row-group min/max statistics — metadata reads only.  Validates the
    dense-docid invariant's global row count."""
    total = 0
    spans: list[tuple[int, int, str]] = []
    for f in sorted(os.listdir(docmap_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(docmap_dir, f)
        md = pq.ParquetFile(path).metadata
        total += md.num_rows
        idx = md.schema.to_arrow_schema().names.index("doc_id")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo, hi = 0, num_docs - 1  # no stats: file covers all
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if md.num_rows:
            spans.append((int(lo), int(hi), path))
    if total != num_docs:
        raise ValueError(
            f"docmap is not a dense docid map: {total} rows for "
            f"{num_docs} docs"
        )
    return spans


class DoclengthStore:
    """Doc-range-sharded doclength lookup over the docmap parquet dir.

    The scorer's doclength state at 10^12-doc scale cannot be one dense
    array; this store maps fixed-size docID ranges (2^20 docs, 4 MB of
    int32 each) to the docmap files that intersect them (parquet
    row-group min/max stats — metadata only) and materializes a shard
    the first time a posting touches it.  Dense-docid validation is
    preserved: the global row count is checked against the manifest at
    init (metadata read), each shard's ids must be exactly its arange
    on load."""

    SHARD_BITS = 20
    # subclasses reuse the sharded-gather machinery over any dense
    # per-doc parquet column (e.g. tfidf.DocnormStore: float64 norms)
    VALUE_COLUMN = "doclength"
    VALUE_DTYPE: type = np.int64

    def __init__(self, docmap_dir: str, num_docs: int):
        self.num_docs = num_docs
        self._spans = _docmap_spans(docmap_dir, num_docs)
        self._shards: dict[int, np.ndarray] = {}

    def _load_shard(self, s: int) -> np.ndarray:
        base = s << self.SHARD_BITS
        end = min(base + (1 << self.SHARD_BITS), self.num_docs)
        parts = []
        for lo, hi, path in self._spans:
            if hi < base or lo >= end:
                continue
            t = pq.read_table(
                path,
                columns=["doc_id", self.VALUE_COLUMN],
                filters=[("doc_id", ">=", base), ("doc_id", "<", end)],
            )
            parts.append(t)
        ids = (
            np.concatenate(
                [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
            )
            if parts
            else np.empty(0, dtype=np.int64)
        )
        # dense 0..N-1 docids, no duplicates — the reference's
        # doc-record order invariant (/root/reference/src/lib.rs:545-546);
        # a stale or double-written docmap must fail fast, not mis-score
        if ids.size != end - base:
            raise ValueError(
                f"docmap shard {s} is not dense: {ids.size} rows for "
                f"docs [{base}, {end})"
            )
        dl = np.concatenate(
            [p[self.VALUE_COLUMN].to_numpy(zero_copy_only=False) for p in parts]
        ).astype(self.VALUE_DTYPE)
        order = np.argsort(ids)
        if not np.array_equal(ids[order], np.arange(base, end)):
            raise ValueError(f"docmap shard {s} has gaps or duplicates")
        return dl[order]

    def _shard(self, s: int) -> np.ndarray:
        arr = self._shards.get(s)
        if arr is None:
            arr = self._shards[s] = self._load_shard(s)
        return arr

    def _load_hull(self, lo_s: int, hi_s: int) -> None:
        """Bulk-load every missing shard in [lo_s, hi_s] with ONE pass
        over the docmap files.  A stopword-scale posting list touches
        most shards of the corpus; loading them one at a time re-opened
        and re-filtered every docmap file per shard (files are written
        by map tasks, so each spans a wide docID range — at 19.5M turns
        that was ~5k filtered parquet reads and 15 s of a 28 s cold
        query).  One range-filtered read per file builds them all.
        At 10^12 docs a corpus-wide hull cannot be materialized in one
        scorer — that regime is ShardedServingPool's (each shard scorer
        holds only its own doc range); within one scorer's range the
        hull is the fastest correct load order."""
        base = lo_s << self.SHARD_BITS
        end = min((hi_s + 1) << self.SHARD_BITS, self.num_docs)
        parts = []
        for lo, hi, path in self._spans:
            if hi < base or lo >= end:
                continue
            parts.append(
                pq.read_table(
                    path,
                    columns=["doc_id", self.VALUE_COLUMN],
                    filters=[("doc_id", ">=", base), ("doc_id", "<", end)],
                )
            )
        ids = (
            np.concatenate(
                [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
            )
            if parts
            else np.empty(0, dtype=np.int64)
        )
        if ids.size != end - base:
            raise ValueError(
                f"docmap hull [{base}, {end}) is not dense: {ids.size} rows"
            )
        src = np.concatenate(
            [p[self.VALUE_COLUMN].to_numpy(zero_copy_only=False) for p in parts]
        ).astype(self.VALUE_DTYPE)
        # scatter instead of argsort: the hull is a dense docID range,
        # so placement is direct (values are >= 0, -1 marks a hole;
        # with ids.size == end-base a duplicate forces a hole elsewhere,
        # so one scan catches both)
        dl = np.full(end - base, -1, dtype=self.VALUE_DTYPE)
        dl[ids - base] = src
        if (dl < 0).any():
            raise ValueError(f"docmap hull [{base}, {end}) has gaps/duplicates")
        for s in range(lo_s, hi_s + 1):
            b = (s << self.SHARD_BITS) - base
            e = min(b + (1 << self.SHARD_BITS), end - base)
            self._shards.setdefault(s, dl[b:e])

    def gather_sorted(self, docs: np.ndarray) -> np.ndarray:
        """Gather for ASCENDING doc arrays — the postings() contract
        (build asserts strict docID order at decode, postings() asserts
        it across salted slices).  Skips the min/max and sortedness
        passes __getitem__ pays: three full scans of a stopword-scale
        list, ~0.5 s/query at 19.5M docs.  Shard spans of a sorted
        array are CONTIGUOUS slices (searchsorted boundaries), so the
        gather is one sliced fancy-index per shard."""
        if docs.size == 0:
            return np.empty(0, dtype=self.VALUE_DTYPE)
        lo = int(docs[0]) >> self.SHARD_BITS
        hi = int(docs[-1]) >> self.SHARD_BITS
        if lo == hi:
            return self._shard(lo)[docs - (lo << self.SHARD_BITS)]
        missing = [s for s in range(lo, hi + 1) if s not in self._shards]
        if len(missing) > 2:
            # wide gather (stopword-scale list): one pass builds the
            # whole hull instead of per-shard file re-reads
            self._load_hull(missing[0], missing[-1])
        out = np.empty(docs.shape, dtype=self.VALUE_DTYPE)
        edges = np.searchsorted(
            docs, np.arange(lo + 1, hi + 1) << self.SHARD_BITS
        )
        bounds = np.concatenate([[0], edges, [docs.size]])
        for i, s in enumerate(range(lo, hi + 1)):
            a, b = int(bounds[i]), int(bounds[i + 1])
            if a < b:
                out[a:b] = self._shard(s)[docs[a:b] - (s << self.SHARD_BITS)]
        return out

    def __getitem__(self, docs: np.ndarray) -> np.ndarray:
        docs = np.asarray(docs)
        if docs.size == 0:
            return np.empty(0, dtype=self.VALUE_DTYPE)
        if docs.size > 1 and docs[0] <= docs[-1] and (np.diff(docs) >= 0).all():
            return self.gather_sorted(docs)
        # O(1) single-shard fast path (an O(n log n) np.unique here would
        # tax every per-term gather on the query hot path)
        lo = int(docs.min()) >> self.SHARD_BITS
        hi = int(docs.max()) >> self.SHARD_BITS
        if lo == hi:
            return self._shard(lo)[docs - (lo << self.SHARD_BITS)]
        missing = [
            s for s in range(lo, hi + 1) if s not in self._shards
        ]
        if len(missing) > 2:
            self._load_hull(missing[0], missing[-1])
        shard_of = docs >> self.SHARD_BITS
        out = np.empty(docs.shape, dtype=self.VALUE_DTYPE)
        for s in range(lo, hi + 1):
            m = shard_of == s
            if m.any():
                out[m] = self._shard(s)[docs[m] - (s << self.SHARD_BITS)]
        return out


class TitleStore:
    """Doc-range-sharded collection_docid (title) lookup over the
    docmap parquet dir — the decoration-path sibling of
    :class:`DoclengthStore`.  Decorating k results must load only the
    O(k) shards the result docids touch: at 10^12 docs a full docmap
    read on the CLI path would dwarf the query itself.  Loaded shards
    are cached (the query mix usually revisits hot doc ranges);
    ``shard_loads`` counts materializations so tests (and scale audits)
    can assert no full-docmap read happens."""

    SHARD_BITS = DoclengthStore.SHARD_BITS

    def __init__(self, docmap_dir: str, num_docs: int):
        self.num_docs = num_docs
        self._spans = _docmap_spans(docmap_dir, num_docs)
        self._shards: dict[int, np.ndarray] = {}
        self.shard_loads = 0

    def _load_shard(self, s: int) -> np.ndarray:
        self.shard_loads += 1
        base = s << self.SHARD_BITS
        end = min(base + (1 << self.SHARD_BITS), self.num_docs)
        parts = [
            pq.read_table(
                path,
                columns=["doc_id", "collection_docid"],
                filters=[("doc_id", ">=", base), ("doc_id", "<", end)],
            )
            for lo, hi, path in self._spans
            if not (hi < base or lo >= end)
        ]
        ids = (
            np.concatenate(
                [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
            )
            if parts
            else np.empty(0, dtype=np.int64)
        )
        if ids.size != end - base:
            raise ValueError(
                f"docmap shard {s} is not dense: {ids.size} rows for "
                f"docs [{base}, {end})"
            )
        titles = np.concatenate(
            [
                p["collection_docid"].to_numpy(zero_copy_only=False)
                for p in parts
            ]
        )
        order = np.argsort(ids)
        if not np.array_equal(ids[order], np.arange(base, end)):
            raise ValueError(f"docmap shard {s} has gaps or duplicates")
        return titles[order]

    def _shard(self, s: int) -> np.ndarray:
        arr = self._shards.get(s)
        if arr is None:
            arr = self._shards[s] = self._load_shard(s)
        return arr

    def lookup(self, docs: np.ndarray) -> list[str]:
        docs = np.asarray(docs, dtype=np.int64)
        if docs.size == 0:
            return []
        out = np.empty(docs.shape, dtype=object)
        shard_of = docs >> self.SHARD_BITS
        for s in np.unique(shard_of):
            m = shard_of == s
            out[m] = self._shard(int(s))[docs[m] - (int(s) << self.SHARD_BITS)]
        return out.tolist()


class GlobalStats:
    """Collection-wide statistics for scoring a doc-sharded corpus: a
    shard scorer given one of these computes idf/avgdl from the WHOLE
    collection (num_docs/avgdl summed over shards, per-term df/cf
    merged into ``stats_dir`` by sharded.build_global_stats), so
    per-document BM25 scores are bit-identical to a monolithic index.
    ``stats_dir`` rows carry max_score bounds already rescaled to the
    global avgdl; the scorer rescales its own segment block maxima
    via ``bound_scale_for``."""

    __slots__ = ("num_docs", "avgdl", "total_terms", "stats_dir")

    def __init__(self, num_docs: int, avgdl: float, total_terms: int, stats_dir: str):
        self.num_docs = num_docs
        self.avgdl = avgdl
        self.total_terms = total_terms
        self.stats_dir = stats_dir

    def bound_scale_for(self, shard_avgdl: float) -> float:
        """Safe rescale factor for a shard's stored pruning bounds: the
        BM25 tf-side contribution is increasing in avgdl and its ratio
        under an avgdl change is strictly below avgdl_new/avgdl_old
        (see ciff_ray.merge module docstring for the proof)."""
        return (
            self.avgdl / shard_avgdl
            if shard_avgdl > 0 and self.avgdl > shard_avgdl
            else 1.0
        )


class LocalScorer:
    """In-process scorer; also the body of the map_batches actor pool.

    With ``global_stats`` the scorer serves ONE SHARD of a doc-sharded
    corpus: idf/avgdl/num_docs come from the collection-wide stats, the
    doclength store stays shard-local, and stored pruning bounds are
    rescaled to the global avgdl at read time.

    ``doc_filter`` is an optional vectorized predicate
    ``(doc_ids: int64 array) -> bool mask`` applied to every decoded
    posting list (metadata-filtered retrieval, e.g. role-scoped
    search).  It composes with the tombstone mask inside postings() —
    the single doc source for every scoring mode — so exact, MaxScore
    and BMW all honor it.  Collection statistics (idf/avgdl/N) stay
    collection-wide (standard filtered-search semantics), and stored
    pruning bounds remain valid upper bounds because filtering only
    REMOVES docs (the same argument as deferred tombstone deletes)."""

    def __init__(
        self,
        index_dir: str,
        params: BM25Params | None = None,
        global_stats: GlobalStats | None = None,
        doc_filter=None,
    ):
        self._doc_filter = doc_filter
        self.paths = IndexPaths(index_dir)
        self.manifest = Manifest.read(self.paths.manifest)
        from ciff_ray.analysis import get_analyzer

        # the index's term analyzer (manifest-recorded): query tokens
        # are analyzed with the SAME function the build used, exactly
        # once (Porter is not idempotent — stored terms are looked up
        # verbatim, never re-stemmed)
        self._analyze = get_analyzer(getattr(self.manifest, "analyzer", ""))
        self.params = params or BM25Params(self.manifest.k1, self.manifest.b)
        # pruning bounds (block_max/max_score) were computed with the
        # build-time (k1, b); with different query params they are not
        # valid upper bounds
        self._bounds_valid = (
            self.params.k1 == self.manifest.k1 and self.params.b == self.manifest.b
        )
        if global_stats is not None:
            self.N = global_stats.num_docs
            self.avgdl = global_stats.avgdl
            self._bound_scale = global_stats.bound_scale_for(
                self.manifest.average_doclength
            )
            stats_src = global_stats.stats_dir
        else:
            self.N = self.manifest.num_docs
            self.avgdl = self.manifest.average_doclength
            self._bound_scale = 1.0
            stats_src = self.paths.term_stats

        # Vocabulary state stays ARROW: term-sorted columns + binary
        # search (searchsorted/J3 mapping), so actor init cost is one
        # columnar read + sort and per-query memory is O(touched terms)
        # — no full-vocab Python dicts (at 10^9+-term vocab those were
        # the query path's scale-killer).
        stats = pq.read_table(stats_src)
        stats = stats.take(pc.sort_indices(stats["term"].combine_chunks()))
        self._st_terms = _SortedStrColumn(stats["term"])
        self._st_df = stats["df"].to_numpy(zero_copy_only=False)
        self._st_cf = stats["cf"].to_numpy(zero_copy_only=False)
        self._st_ms = stats["max_score"].to_numpy(zero_copy_only=False)
        self._stat_memo: dict[str, tuple[int, int, float] | None] = {}

        tdict = pq.read_table(self.paths.term_dict_dir)
        order = pc.sort_indices(
            tdict, sort_keys=[("term", "ascending"), ("salt", "ascending")]
        )
        tdict = tdict.take(order)
        self._sl_terms = _SortedStrColumn(tdict["term"])
        self._sl_salt = tdict["salt"].to_numpy(zero_copy_only=False)
        self._sl_pid = tdict["partition_id"].to_numpy(zero_copy_only=False)
        self._slice_memo: dict[str, list[tuple[int, int]]] = {}

        # doclengths are SHARD-local even under global stats: the dense
        # 0..num_docs-1 check is against this index's own docmap
        self._dl = DoclengthStore(self.paths.docmap_dir, self.manifest.num_docs)

        # tombstoned docIDs (lifecycle.delete_docs): filtered out of
        # every decoded posting list, so no mode can return them.
        # Collection statistics (df/avgdl/N) deliberately stay at their
        # index-time values until lifecycle.compact_index rewrites the
        # segments — the standard deferred-delete semantics (bounds
        # stay valid: removing docs only lowers true scores).
        if os.path.exists(self.paths.tombstones):
            self._dead = np.sort(
                pq.read_table(self.paths.tombstones)["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        else:
            self._dead = np.empty(0, dtype=np.int64)
        self._segments: dict[int, tuple[pa.Table, _SortedStrColumn, np.ndarray, np.ndarray]] = {}
        self._doc_titles: TitleStore | None = None
        # decoded-postings cache: hot (stopword-scale) lists decode once
        # per scorer, bounded by total cached postings
        self._plist_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._plist_cache_postings = 0
        self._plist_cache_cap = 64_000_000
        # dense-contribution cache: a term's BM25 contribution vector is
        # QUERY-INDEPENDENT (idf, tf, dl only), so stopword-scale terms
        # cache their length-N float64 vector once and dense scoring
        # becomes one vector add per term — bitwise identical to the
        # bincount it replaces (docs are unique per list, so bincount
        # emits exactly this vector).  LRU-bounded by bytes; the cap
        # scales with the scorer's LOCAL doc range so ~8 stopword
        # vectors stay resident (at 19.5M docs a vector is 156 MB and a
        # flat 256 MB cap held ONE — every multi-stopword query then
        # recomputed the others, 1-3 s/query warm).  Ceiling 4 GB: past
        # that the answer is ShardedServingPool (smaller per-scorer doc
        # range), not a bigger cache.  Env CIFF_RAY_DENSE_CACHE_MB
        # overrides for constrained hosts.
        self._dense_cache: dict[str, np.ndarray] = {}
        self._dense_cache_bytes = 0
        env_mb = os.environ.get("CIFF_RAY_DENSE_CACHE_MB")
        if env_mb is not None:
            self._dense_cache_cap = int(float(env_mb) * 1_000_000)
        else:
            self._dense_cache_cap = max(
                256_000_000,
                min(4_000_000_000, 8 * 8 * self.manifest.num_docs),
            )
        # materialized-slice memo for the block-targeted decode path:
        # the Arrow .as_py() copies of a slice's payload + offsets are
        # paid ONCE per scorer, not once per decoded block (MaxScore on
        # a stopword slice previously copied O(slice_bytes x blocks))
        self._slice_mat: dict[tuple[str, int, int], dict] = {}
        self._slice_mat_bytes = 0
        self._slice_mat_cap = 64_000_000

    # -- index access ----------------------------------------------------

    def _query_terms(self, query: str) -> list[str]:
        """Distinct analyzed query terms in byte order — the single
        tokenize path every scoring mode shares."""
        toks = tokenize(query)
        if self._analyze is not None:
            toks = [self._analyze(t) for t in toks]
        return sorted(set(toks), key=lambda s: s.encode())

    def _term_stat(self, term: str) -> tuple[int, int, float] | None:
        """(df, cf, max_score) via binary search over the term-sorted
        stats columns; memoized per touched term."""
        try:
            return self._stat_memo[term]
        except KeyError:
            pass
        lo = bisect.bisect_left(self._st_terms, term)
        if lo < len(self._st_terms) and self._st_terms[lo] == term:
            st = (
                int(self._st_df[lo]),
                int(self._st_cf[lo]),
                float(self._st_ms[lo]),
            )
        else:
            st = None
        self._stat_memo[term] = st
        return st

    def vocabulary(self) -> list[str]:
        """All index terms, byte-sorted.  Diagnostics/tests only: this
        materializes the full vocabulary (the hot paths never do)."""
        return self._st_terms.arr.to_pylist()

    def _slices_for(self, term: str) -> list[tuple[int, int]]:
        """[(salt, partition_id), ...] in ascending salt order (rows
        sorted by (term, salt))."""
        try:
            return self._slice_memo[term]
        except KeyError:
            pass
        lo, hi = self._sl_terms.range_of(term)
        out = [
            (int(self._sl_salt[i]), int(self._sl_pid[i]))
            for i in range(lo, hi)
        ]
        self._slice_memo[term] = out
        return out

    def _segment(self, pid: int):
        """Segment table + a (term, salt)-sorted lookup view: binary
        search on the sorted term column, then searchsorted on the salt
        run — no per-segment Python dict of the segment's vocabulary."""
        seg = self._segments.get(pid)
        if seg is None:
            path = self.paths.segment(pid)
            tbl = pq.read_table(path, memory_map=True)
            order = pc.sort_indices(
                tbl, sort_keys=[("term", "ascending"), ("salt", "ascending")]
            )
            order_np = order.to_numpy(zero_copy_only=False)
            terms_sorted = _SortedStrColumn(
                tbl["term"].combine_chunks().take(order)
            )
            salts_sorted = (
                tbl["salt"].combine_chunks().take(order).to_numpy(
                    zero_copy_only=False
                )
            )
            seg = (tbl, terms_sorted, salts_sorted, order_np)
            self._segments[pid] = seg
        return seg

    def _slice_row(self, term: str, salt: int, pid: int) -> dict:
        tbl, terms_sorted, salts_sorted, order_np = self._segment(pid)
        lo, hi = terms_sorted.range_of(term)
        pos = lo + int(np.searchsorted(salts_sorted[lo:hi], salt))
        if pos >= hi or salts_sorted[pos] != salt:
            raise KeyError((term, salt))
        i = int(order_np[pos])
        return {name: tbl[name][i] for name in tbl.column_names}

    def _decode_slice(self, row: dict) -> tuple[np.ndarray, np.ndarray]:
        # per-PROCESS decode tally: tests read it in the driver process
        # to prove a pipeline decoded postings only in worker actors
        DECODE_DIAG["slices"] += 1
        df = row["df"].as_py()
        first = row["first_doc"].as_py()
        gaps = codecs.decode(
            row["doc_bytes"].as_py(), df - 1, row["doc_codec"].as_py()
        )
        docs = np.empty(df, dtype=np.int64)
        docs[0] = first
        if df > 1:
            # strictly-positive gaps <=> strictly-ascending slice: this
            # single reduction is the intra-slice corruption fail-fast
            # (M3 negative-value guard).  gather_sorted and the sliced
            # shard gathers TRUST ascending postings, so a bad gap must
            # die here, not mis-score silently downstream.  Cheaper than
            # the full docID comparison scan it subsumes, and it also
            # covers single-slice terms (which the old concatenated-list
            # check never saw).
            if int(gaps.min()) < 1:
                raise AssertionError(
                    "corrupt posting slice: non-positive d-gap"
                )
            # dtype=int64 widens during the cumsum — no separate astype
            # pass over the decoded gaps
            np.cumsum(gaps, dtype=np.int64, out=docs[1:])
            docs[1:] += first
        tfs = codecs.decode(
            row["tf_bytes"].as_py(), df, row["tf_codec"].as_py()
        ).astype(np.int64)
        return docs, tfs

    def _live_mask(self, docs: np.ndarray) -> np.ndarray:
        """True where ``docs`` is NOT tombstoned — the single deferred-
        delete membership rule; serving (postings) and the quantizer
        range scan share it so they can never diverge."""
        return ~sorted_member(self._dead, docs)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full docID-ordered posting list: slices concatenated in salt
        order (salts cover disjoint ascending docID ranges by
        construction — build.py salting invariant)."""
        cached = self._plist_cache.get(term)
        if cached is not None:
            # LRU touch (insertion-ordered dict, see _dense_contrib)
            del self._plist_cache[term]
            self._plist_cache[term] = cached
            return cached
        slices = self._slices_for(term)
        if not slices:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        parts = [self._decode_slice(self._slice_row(term, s, p)) for s, p in slices]
        if len(parts) == 1:
            docs, tfs = parts[0]
        else:
            # cross-slice interleave invariant at the slice BOUNDARIES
            # only (each slice is ascending by d-gap construction, and
            # the single-slice path above never re-scans either); the
            # full-list scan this replaces cost a pass over 10M+
            # postings per stopword term.  Deep intra-slice validation
            # is fsck's job (check_index).
            prev = parts[0][0]
            for d, _ in parts[1:]:
                if d.size and prev.size and d[0] <= prev[-1]:
                    raise AssertionError(
                        f"salted slices of {term!r} out of docID order"
                    )
                if d.size:
                    prev = d
            docs = np.concatenate([d for d, _ in parts])
            tfs = np.concatenate([t for _, t in parts])
        if self._dead.size:
            # postings() is the single doc source for every scoring
            # mode (score_all / maxscore candidates / bmw), so masking
            # tombstones here suppresses deleted docs everywhere
            live = self._live_mask(docs)
            if not live.all():
                docs, tfs = docs[live], tfs[live]
        if self._doc_filter is not None and docs.size:
            keep = self._doc_filter(docs)
            if not keep.all():
                docs, tfs = docs[keep], tfs[keep]
        if docs.size <= self._plist_cache_cap:
            while (
                self._plist_cache
                and self._plist_cache_postings + docs.size
                > self._plist_cache_cap
            ):
                oldest = next(iter(self._plist_cache))
                self._plist_cache_postings -= self._plist_cache.pop(oldest)[
                    0
                ].size
            self._plist_cache[term] = (docs, tfs)
            self._plist_cache_postings += docs.size
        return docs, tfs

    # -- BM25 -------------------------------------------------------------

    def idf(self, term: str) -> float:
        st = self._term_stat(term)
        if st is None:
            return 0.0
        df = st[0]
        return max(math.log((self.N - df + 0.5) / (df + 0.5)), EPS_IDF)

    def _contrib(self, tfs: np.ndarray, dl: np.ndarray, w: float) -> np.ndarray:
        """w * tfs * (k1+1) / (tfs + k1 * (1 - b + b*dl/avgdl)), written
        as an in-place chain: same per-element op sequence (mult/add
        commuted only, which is bitwise-exact in IEEE), but 2 allocations
        instead of 6 — the naive expression's temporaries dominated cold
        stopword scoring at 19.5M docs (memory-bound box)."""
        k1, b = self.params.k1, self.params.b
        d = dl * b
        d /= self.avgdl
        d += 1.0 - b
        d *= k1
        d += tfs
        n = tfs * w
        n *= k1 + 1.0
        n /= d
        return n

    def score_all(
        self, query: str, boosts: dict[str, float] | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, scores) over all docs matching >= 1 query term;
        summation order = byte-sorted terms, matching the oracle.
        ``boosts`` multiplies a term's idf weight (fielded / weighted
        queries); the boost folds into w BEFORE the contribution product
        so the float op order stays oracle-identical."""
        terms = [
            t
            for t in self._query_terms(query)
            if self._term_stat(t) is not None
        ]
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        total_df = sum(self._term_stat(t)[0] for t in terms)
        if boosts is None and total_df > self.N // 4:
            # dense accumulation (stopword-heavy queries): one vector
            # add per term from the query-independent dense-contribution
            # cache.  Bitwise identical to both the bincount it replaces
            # and the sparse path below (per doc, contributions sum in
            # ascending-term order in all three), so path choice never
            # changes a score.  Not taken for boosted queries — their w
            # differs from the cached vectors.
            # allocate by the LOCAL doc range (manifest.num_docs), not
            # self.N: under GlobalStats a shard scorer's N is the
            # collection-wide count while its docIDs stay shard-local,
            # and a global-sized vector per cached term multiplies RSS
            # by the shard count for nothing
            acc = self._dense_accum(terms)
            u = np.flatnonzero(acc)  # all contributions are > 0
            return u, acc[u]
        doc_parts, contrib_parts = [], []
        for t in terms:
            docs, tfs = self.postings(t)
            if docs.size == 0:
                continue
            w = self.idf(t)
            if boosts is not None:
                w = w * boosts.get(t, 1.0)
            dl = self._dl.gather_sorted(docs)  # postings() => ascending
            doc_parts.append(docs)
            contrib_parts.append(self._contrib(tfs, dl, w))
        if not doc_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        all_docs = np.concatenate(doc_parts)
        all_contrib = np.concatenate(contrib_parts)
        u, inv = np.unique(all_docs, return_inverse=True)
        scores = np.bincount(inv, weights=all_contrib)
        return u, scores

    def _dense_accum(self, terms: list[str]) -> np.ndarray:
        """Summed dense contribution vector in ascending-term order.
        First pair summed out-of-place (2 reads + 1 write instead of a
        zeros fill + two 3-pass adds): elementwise ((0+c0)+c1)+c2...
        == (c0+c1)+c2..., so scores stay bitwise identical to the
        accumulate-into-zeros loop this replaces."""
        if not terms:
            return np.zeros(self.manifest.num_docs, dtype=np.float64)
        if len(terms) == 1:
            return self._dense_contrib(terms[0]).copy()
        acc = self._dense_contrib(terms[0]) + self._dense_contrib(terms[1])
        for t in terms[2:]:
            acc += self._dense_contrib(t)
        return acc

    def _topk_dense(self, query: str, k: int):
        """Exhaustive top-k on the dense path WITHOUT materializing the
        (u, scores) candidate arrays — for stopword-heavy queries u is
        ~every docID, and at 19.5M docs the flatnonzero + two gathers +
        full-array round + partition copy in score_all→_rank move ~3 GB
        through a memory bus that is the box's actual constraint.  Here:
        chunked k-th-largest threshold (one read of acc, chunk-sized
        partition copies that stay in cache), then rank only the docs
        that can reach the rounded top-k.  Selection is EXACT under the
        round-9 ranking key: round9 is monotone, so the k-th largest
        rounded score equals round9(t_raw) (t_raw = k-th largest raw),
        and round9(s) >= round9(t_raw) implies s >= t_raw - 1e-9 — the
        kept superset contains every doc _rank could emit, and _rank
        applies the identical (round9 desc, doc_id asc) key.  Returns
        None when the dense path doesn't apply (sparse/boosted)."""
        terms = [
            t for t in self._query_terms(query) if self._term_stat(t) is not None
        ]
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        total_df = sum(self._term_stat(t)[0] for t in terms)
        if total_df <= self.N // 4:
            return None  # sparse regime: score_all's bincount path wins
        acc = self._dense_accum(terms)
        n = acc.size
        if k >= n or n < _DENSE_TOPK_MIN_N:
            u = np.flatnonzero(acc)
            return self._rank(u, acc[u], k)
        chunk = _DENSE_TOPK_CHUNK
        tops = []
        for i in range(0, n, chunk):
            ch = acc[i : i + chunk]
            if ch.size > k:
                tops.append(np.partition(ch, ch.size - k)[ch.size - k :])
            else:
                tops.append(ch.copy())
        allc = np.concatenate(tops)
        thr = float(np.partition(allc, allc.size - k)[allc.size - k])
        cut = thr - 1e-9
        if cut <= 0.0:
            # degenerate (fewer than k scored docs, or scores at
            # rounding scale): the cut can no longer exclude unmatched
            # docs — take the plain exhaustive materialization
            u = np.flatnonzero(acc)
            return self._rank(u, acc[u], k)
        sel = np.flatnonzero(acc >= cut)
        return self._rank(sel, acc[sel], k)

    def _dense_contrib(self, term: str) -> np.ndarray:
        """The term's length-N BM25 contribution vector (0 where the
        term is absent) — cached: idf/tf/dl are query-independent, so
        stopword-scale terms pay decode + contribution exactly once per
        scorer.  `c[docs] = contrib` emits the same vector as
        `np.bincount(docs, weights=contrib, minlength=N)` because
        posting docIDs are unique."""
        c = self._dense_cache.get(term)
        if c is not None:
            # LRU touch: dicts iterate in insertion order, so re-insert
            # moves the hit to the young end
            del self._dense_cache[term]
            self._dense_cache[term] = c
            return c
        docs, tfs = self.postings(term)
        c = np.zeros(self.manifest.num_docs, dtype=np.float64)  # local
        # doc range, not self.N (see the dense-path comment above)
        if docs.size:
            c[docs] = self._contrib(
                tfs, self._dl.gather_sorted(docs), self.idf(term)
            )
        # cache ONLY the fully-built vector: inserting before the fill
        # would leave a poisoned all-zeros entry behind if the fill
        # raises (doclength load error, MemoryError) in a long-lived
        # serving actor — silent wrong scores on every later hit
        if c.nbytes <= self._dense_cache_cap:
            while (
                self._dense_cache
                and self._dense_cache_bytes + c.nbytes > self._dense_cache_cap
            ):
                oldest = next(iter(self._dense_cache))
                self._dense_cache_bytes -= self._dense_cache.pop(oldest).nbytes
            self._dense_cache[term] = c
            self._dense_cache_bytes += c.nbytes
        return c

    @staticmethod
    def _rank(doc_ids: np.ndarray, scores: np.ndarray, k: int):
        """Final ranking key is the score ROUNDED to 9 dp (ties then by
        doc_id asc).  Rationale: the DuckDB oracle's parallel SUM is
        run-to-run nondeterministic at the ~1e-15 level, so ranking raw
        floats makes near-ties flip between runs on the ORACLE side
        (observed once in ~10 full crosscheck runs); 9-dp rounding on
        BOTH sides collapses that jitter while leaving real orderings
        (gaps >= 1e-9) untouched.  Raw scores are still returned."""
        if doc_ids.size == 0:
            return doc_ids, scores
        r = np.round(scores, 9)
        if doc_ids.size > 4 * k > 0:
            # cheap pre-cut before the exact (round9 desc, doc_id asc)
            # sort: keep every doc scoring >= the k-th best (ALL ties
            # included, so the doc_id tie-break stays correct)
            kth = np.partition(r, r.size - k)[r.size - k]
            sel = r >= kth
            doc_ids, scores, r = doc_ids[sel], scores[sel], r[sel]
        order = np.lexsort((doc_ids, -r))[:k]
        return doc_ids[order], scores[order]

    def topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "exact",
        boosts: dict[str, float] | None = None,
    ):
        if boosts:
            # stored pruning bounds don't account for per-term boosts
            # (> 1 would make them invalid lower-than-true bounds), so
            # weighted queries always take the exhaustive path
            u, scores = self.score_all(query, boosts)
            return self._rank(u, scores, k)
        if mode == "auto":
            mode = self._pick_mode(query)
        if mode == "maxscore" and self._bounds_valid:
            r = self._topk_maxscore(query, k)
            if r is not None:
                return r
        elif mode == "bmw" and self._bounds_valid:
            r = self._topk_bmw(query, k)
            if r is not None:
                return r
        r = self._topk_dense(query, k)
        if r is not None:
            return r
        u, scores = self.score_all(query)
        return self._rank(u, scores, k)

    def _pick_mode(self, query: str) -> str:
        """Cost-based mode selection (mode="auto"), from the per-term
        (df, max_score) stats the vocab bisect already gives us.

        Measured on the sf0.1 bench index (14 query shapes x 3 modes,
        medians of 9): the vectorized exhaustive path beats pruning on
        every query whose terms have near-UNIFORM max_scores (pruning
        can never establish a useful threshold there, and MaxScore's
        candidate machinery costs up to 100x: 1.6 s vs 14 ms on an
        8-term query), while block-max pruning wins (a) single-term
        queries (threshold after k docs skips whole blocks: 1.04 vs
        1.21 ms) and (b) skewed queries, the classic
        rare-term + stopword case, where the best single-doc score
        already exceeds the stopword list's upper bound.

        Policy: MaxScore essential-list analysis on the SAME per-term
        upper bounds the pruned paths use — ub(t) = idf(t) * max_score(t)
        (raw stored max_scores are tf-partials and near-uniform even on
        skewed queries; without the idf factor the rare-term +
        stopword case the policy exists for would mis-classify as
        unskippable).  theta = max ub (the best single doc on the
        strongest term — a lower bound on the final top-k threshold
        whenever that list has >= k docs): lists whose ascending-ub
        prefix sum stays under theta can be fully skipped; if the
        estimated skipped-postings fraction >= 0.5 the pruned path
        pays, else exhaustive.  BMW over MaxScore because the
        measurements above have BMW strictly faster at every shape.
        Single-indexed-term queries go exhaustive: both pruned
        implementations decline (<2 terms) and would fall through
        anyway.
        """
        if not self._bounds_valid:
            return "exact"
        pairs = [(t, self._term_stat(t)) for t in self._query_terms(query)]
        pairs = [(t, s) for t, s in pairs if s is not None]
        if len(pairs) < 2:
            return "exact"
        dfs = np.array([s[0] for _, s in pairs], dtype=np.float64)
        ub = np.array([self.idf(t) * s[2] for t, s in pairs], dtype=np.float64)
        order = np.argsort(ub)
        theta = float(ub[order[-1]])
        # dominance guard: theta only bounds the top-k threshold the
        # pruned sweep will EVENTUALLY reach; with near-tied top bounds
        # the threshold approaches theta too late for block skipping to
        # pay (probe: 'the time people' bmw = 1.4x exact despite a 95%
        # naive skip estimate).  Require the strongest list to dominate
        # the runner-up 2:1 — the genuinely skewed rare-term + stopword
        # shape — before choosing the pruned path.
        if ub[order[-2]] * 2.0 > theta:
            return "exact"
        skippable = np.cumsum(ub[order]) < theta
        skip_frac = dfs[order][skippable].sum() / dfs.sum()
        return "bmw" if skip_frac >= 0.5 else "exact"

    # -- MaxScore + block-max pruning ------------------------------------

    def _slice_mat_for(self, term: str, salt: int, pid: int) -> dict:
        """Materialized (plain bytes + numpy) view of one slice row for
        block-targeted decode — memoized, bounded by payload bytes."""
        key = (term, salt, pid)
        mat = self._slice_mat.get(key)
        if mat is not None:
            return mat
        row = self._slice_row(term, salt, pid)
        mat = {
            "bld": np.asarray(row["block_last_doc"].as_py(), dtype=np.int64),
            "doff": np.asarray(row["block_doc_off"].as_py(), dtype=np.int64),
            "toff": np.asarray(row["block_tf_off"].as_py(), dtype=np.int64),
            "df": row["df"].as_py(),
            "first_doc": row["first_doc"].as_py(),
            "doc_codec": row["doc_codec"].as_py(),
            "tf_codec": row["tf_codec"].as_py(),
            "doc_bytes": row["doc_bytes"].as_py(),
            "tf_bytes": row["tf_bytes"].as_py(),
            "row": row,
        }
        nbytes = len(mat["doc_bytes"]) + len(mat["tf_bytes"])
        if self._slice_mat_bytes + nbytes <= self._slice_mat_cap:
            self._slice_mat[key] = mat
            self._slice_mat_bytes += nbytes
        return mat

    def _block_decode(self, mat: dict, bi: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode a single block of a varint slice via its byte offsets."""
        bld = mat["bld"]
        doff = mat["doff"]
        toff = mat["toff"]
        df = mat["df"]
        bs = self.manifest.block_size
        nblocks = len(bld)
        start_pos = bi * bs
        end_pos = min(start_pos + bs, df)
        count = end_pos - start_pos
        doc_b = mat["doc_bytes"]
        tf_b = mat["tf_bytes"]
        d_end = doff[bi + 1] if bi + 1 < nblocks else len(doc_b)
        t_end = toff[bi + 1] if bi + 1 < nblocks else len(tf_b)

        def blk(buf, codec, off, end, cnt):
            # varint: offsets index value bytes directly; bit-packed:
            # offsets point at the codec block's payload, width byte at
            # the buffer's header position bi
            if codec in (CODEC_BP, CODEC_BPG):
                return codecs.bp_decode_block(buf, bi, off, end, cnt).astype(
                    np.int64
                )
            return codecs.varint_decode(buf[off:end], cnt).astype(np.int64)

        if bi == 0:
            gaps = blk(doc_b, mat["doc_codec"], doff[0] if doff.size else 0,
                       d_end, count - 1)
            docs = np.empty(count, dtype=np.int64)
            docs[0] = mat["first_doc"]
            if count > 1:
                docs[1:] = docs[0] + np.cumsum(gaps)
        else:
            gaps = blk(doc_b, mat["doc_codec"], doff[bi], d_end, count)
            docs = bld[bi - 1] + np.cumsum(gaps)
        tfs = blk(tf_b, mat["tf_codec"], toff[bi], t_end, count)
        return docs, tfs

    def _candidate_tf(self, term: str, cand: np.ndarray) -> np.ndarray:
        """tf of each candidate doc under `term` (0 if absent), decoding
        only the blocks that can contain a candidate."""
        out = np.zeros(cand.size, dtype=np.int64)
        for salt, pid in self._slices_for(term):
            mat = self._slice_mat_for(term, salt, pid)
            bld = mat["bld"]
            if bld.size == 0:
                continue
            lo = mat["first_doc"]
            sel = (cand >= lo) & (cand <= bld[-1])
            if not sel.any():
                continue
            if (
                mat["doc_codec"] == CODEC_GAMMA
                or mat["tf_codec"] == CODEC_GAMMA
                or (mat["doff"].size and mat["doff"][0] < 0)
                or (mat["toff"].size and mat["toff"][0] < 0)
            ):
                docs, tfs = self._decode_slice(mat["row"])
                pos = np.searchsorted(docs, cand[sel])
                hit = (pos < docs.size) & (docs[np.minimum(pos, docs.size - 1)] == cand[sel])
                vals = np.zeros(sel.sum(), dtype=np.int64)
                vals[hit] = tfs[pos[hit]]
                out[sel] += vals
                continue
            csel = cand[sel]
            blocks = np.searchsorted(bld, csel)
            vals = np.zeros(csel.size, dtype=np.int64)
            for bi in np.unique(blocks):
                docs, tfs = self._block_decode(mat, int(bi))
                mask = blocks == bi
                pos = np.searchsorted(docs, csel[mask])
                hit = (pos < docs.size) & (
                    docs[np.minimum(pos, docs.size - 1)] == csel[mask]
                )
                v = np.zeros(int(mask.sum()), dtype=np.int64)
                v[hit] = tfs[pos[hit]]
                vals[mask] = v
            out[sel] += vals
        return out

    def _topk_maxscore(self, query: str, k: int):
        """Exact top-k with MaxScore pruning; returns None to fall back."""
        terms = [
            t
            for t in self._query_terms(query)
            if self._term_stat(t) is not None
        ]
        if len(terms) < 2:
            return None
        ub = np.array([self.idf(t) * self._term_stat(t)[2] for t in terms])
        order = np.argsort(-ub)  # desc upper bound
        best_docs = np.empty(0, np.int64)
        scores = np.empty(0, np.float64)
        for ness in range(1, len(terms)):
            essential = [terms[i] for i in order[:ness]]
            rest_bound = float(ub[order[ness:]].sum())
            # score candidates = union of essential postings, exactly,
            # over ALL terms (non-essential via block-targeted decode)
            doc_parts = [self.postings(t)[0] for t in essential]
            cand = np.unique(np.concatenate(doc_parts))
            if cand.size == 0:
                return None
            if cand.size >= self.manifest.num_docs // 2:
                # LOCAL doc count, not self.N: a GlobalStats shard
                # scorer's N is collection-wide while cand is bounded
                # by the shard, which made this guard dead on shards
                return None  # candidate set too dense; exhaustive is cheaper
            total = np.zeros(cand.size, dtype=np.float64)
            for t in terms:  # byte-sorted order for fp determinism
                if t in essential:
                    docs, tfs = self.postings(t)
                    pos = np.searchsorted(cand, docs)
                    w = self.idf(t)
                    np.add.at(
                        total, pos, self._contrib(tfs, self._dl[docs], w)
                    )
                else:
                    tfs = self._candidate_tf(t, cand)
                    nz = tfs > 0
                    if nz.any():
                        w = self.idf(t)
                        total[nz] += self._contrib(
                            tfs[nz], self._dl[cand[nz]], w
                        )
            if cand.size >= k:
                theta = np.partition(total, cand.size - k)[cand.size - k]
            else:
                theta = -np.inf
            # compare at the RANK KEY's precision (_rank keys on
            # round9): a non-candidate with raw score just below theta
            # could still TIE theta at 9 dp and win the doc_id
            # tie-break, so acceptance needs strict inequality of the
            # ROUNDED values, not the raw ones
            if np.round(rest_bound, 9) < np.round(theta, 9):
                best_docs, scores = cand, total
                break
        else:
            return None
        return self._rank(best_docs, scores, k)

    # -- block-max WAND (vectorized interval sweep) -----------------------

    def _term_blocks(self, term: str):
        """Global block metadata for a term, concatenated over salted
        slices in salt order: (block_lo_doc, block_hi_doc, upper_bound)
        with upper_bound = idf * stored block-max partial (the partials
        were rounded UP one float32 ulp at build time, so these are true
        upper bounds on the float64 query-time contribution)."""
        los, his, ubs = [], [], []
        w = self.idf(term)
        for salt, pid in self._slices_for(term):
            row = self._slice_row(term, salt, pid)
            bld = np.asarray(row["block_last_doc"].as_py(), dtype=np.int64)
            if bld.size == 0:
                continue
            bmax = np.asarray(row["block_max_score"].as_py(), dtype=np.float64)
            if self._bound_scale > 1.0:
                # shard scorer under global avgdl: stored bounds were
                # computed with the (smaller) shard avgdl — rescale by
                # the safe ratio, rounded up (GlobalStats.bound_scale_for)
                bmax = np.nextafter(bmax * self._bound_scale, np.inf)
            lo = np.empty(bld.size, dtype=np.int64)
            lo[0] = row["first_doc"].as_py()
            lo[1:] = bld[:-1] + 1
            los.append(lo)
            his.append(bld)
            ubs.append(w * bmax)
        if not los:
            e = np.empty(0)
            return e.astype(np.int64), e.astype(np.int64), e
        return np.concatenate(los), np.concatenate(his), np.concatenate(ubs)

    def _topk_bmw(self, query: str, k: int):
        """Exact top-k with block-max WAND-style pruning, batched: a
        sweep over the union of all query-term block boundaries yields,
        per elementary docID interval, the sum of covering block maxima
        (the WAND pivot bound, computed for ALL pivots at once).  A
        bootstrap threshold from the best interval then prunes every
        interval whose bound cannot reach the top-k; only blocks
        touching surviving intervals are scored.  Results are
        score-identical to ``exact`` (same fp summation order); returns
        None to fall back when pruning cannot win."""
        terms = [
            t
            for t in self._query_terms(query)
            if self._term_stat(t) is not None
        ]
        if len(terms) < 2:
            return None
        blocks = {}
        for t in terms:
            los, his, ubs = self._term_blocks(t)
            if los.size:
                blocks[t] = (los, his, ubs)
        if not blocks:
            return None

        # interval sweep: +ub at block lo, -ub past block hi
        pos = np.concatenate(
            [b[0] for b in blocks.values()] + [b[1] + 1 for b in blocks.values()]
        )
        val = np.concatenate(
            [b[2] for b in blocks.values()] + [-b[2] for b in blocks.values()]
        )
        order = np.argsort(pos, kind="stable")
        pos_s, val_s = pos[order], val[order]
        cum = np.cumsum(val_s)
        uniq_pos, first_idx = np.unique(pos_s, return_index=True)
        last_idx = np.concatenate([first_idx[1:] - 1, [pos_s.size - 1]])
        bound = cum[last_idx]  # bound over [uniq_pos[i], uniq_pos[i+1])

        # bootstrap threshold from the densest interval
        bi = int(np.argmax(bound))
        lo0 = int(uniq_pos[bi])
        hi0 = int(uniq_pos[bi + 1]) - 1 if bi + 1 < uniq_pos.size else self.N
        cand0 = self._docs_in_range(blocks, lo0, hi0)
        if cand0.size < k:
            return None
        theta0 = self._exact_scores_for(terms, cand0, kth=k)
        if not np.isfinite(theta0):
            return None

        # 9-dp comparison (the _rank key): an interval whose bound ties
        # theta0 at 9 dp can still hold a doc that enters the top-k via
        # the doc_id tie-break, so it must stay selected
        sel = np.round(bound, 9) >= np.round(theta0, 9)
        cumsel = np.concatenate([[0], np.cumsum(sel)])
        # candidate selection density guard: pruning must skip enough
        sel_span = float(
            np.sum((uniq_pos[1:] - uniq_pos[:-1]) * sel[:-1].astype(np.int64))
        )
        if sel_span > 0.5 * max(1, self.manifest.num_docs):  # local range
            return None

        doc_parts, contrib_parts = [], []
        for t in terms:
            if t not in blocks:
                continue
            los, his, _ = blocks[t]
            js = np.searchsorted(uniq_pos, los, side="right") - 1
            je = np.searchsorted(uniq_pos, his, side="right") - 1
            need = (cumsel[je + 1] - cumsel[np.maximum(js, 0)]) > 0
            if not need.any():
                continue
            docs, tfs = self.postings(t)
            ji = np.searchsorted(uniq_pos, docs, side="right") - 1
            mask = sel[np.clip(ji, 0, sel.size - 1)] & (ji >= 0)
            if not mask.any():
                continue
            d = docs[mask]
            w = self.idf(t)
            doc_parts.append(d)
            contrib_parts.append(self._contrib(tfs[mask], self._dl[d], w))
        if not doc_parts:
            return None
        all_docs = np.concatenate(doc_parts)
        all_contrib = np.concatenate(contrib_parts)
        u, inv = np.unique(all_docs, return_inverse=True)
        scores = np.bincount(inv, weights=all_contrib)
        if u.size < k:
            return None
        return self._rank(u, scores, k)

    def _docs_in_range(self, blocks, lo: int, hi: int) -> np.ndarray:
        """Union of docIDs within [lo, hi] across the query terms."""
        parts = []
        for t in blocks:
            docs, _ = self.postings(t)
            a = np.searchsorted(docs, lo, side="left")
            b = np.searchsorted(docs, hi, side="right")
            if b > a:
                parts.append(docs[a:b])
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def _exact_scores_for(self, terms, cand: np.ndarray, kth: int) -> float:
        """Exact scores of `cand` over all query terms (byte-sorted
        order); returns the kth best score (the bootstrap threshold)."""
        total = np.zeros(cand.size, dtype=np.float64)
        for t in terms:
            docs, tfs = self.postings(t)
            pos = np.searchsorted(docs, cand)
            hit = (pos < docs.size) & (docs[np.minimum(pos, docs.size - 1)] == cand)
            if hit.any():
                w = self.idf(t)
                total[hit] += self._contrib(
                    tfs[pos[hit]], self._dl[cand[hit]], w
                )
        if cand.size < kth:
            return float("-inf")
        return float(np.partition(total, cand.size - kth)[cand.size - kth])

    def explain(self, query: str, doc_id: int) -> list[dict]:
        """Per-term score breakdown for one (query, doc) — the engine's
        Lucene-`explain` analogue (ops/debug surface).  One row per
        matching analyzed query term: term, tf, doclength, idf,
        contribution; the contributions sum to exactly the score
        score_all assigns the doc (same _contrib kernel, float64).
        The caller supplies doc_id, so tombstone/doc_filter masking is
        NOT applied here — explain answers "why this score", including
        for docs a filter would hide."""
        cand = np.array([int(doc_id)], dtype=np.int64)
        dl_i = int(self._dl[cand][0])
        dl = np.array([float(dl_i)], dtype=np.float64)
        rows: list[dict] = []
        for t in self._query_terms(query):
            if self._term_stat(t) is None:
                continue
            tf = self._candidate_tf(t, cand)
            if tf[0] <= 0:
                continue
            w = self.idf(t)
            c = self._contrib(tf.astype(np.float64), dl, w)
            rows.append(
                {
                    "term": t,
                    "tf": int(tf[0]),
                    "doclength": dl_i,
                    "idf": float(w),
                    "contribution": float(c[0]),
                }
            )
        return rows

    # -- result decoration ------------------------------------------------

    def collection_docids(self, doc_ids: np.ndarray) -> list[str]:
        # doc-range-sharded: decorating k results loads only the O(k)
        # title shards those docids fall in, never the whole docmap
        if self._doc_titles is None:
            self._doc_titles = TitleStore(
                self.paths.docmap_dir, self.manifest.num_docs
            )
        return self._doc_titles.lookup(np.asarray(doc_ids))


class ScorerActor:
    """map_batches callable: batch of (query_id, query) -> ranked results.
    Index loaded once per actor (__init__), per-batch work vectorized."""

    def __init__(
        self, index_dir: str, k: int = 10, mode: str = "exact", doc_filter=None
    ):
        self.scorer = LocalScorer(index_dir, doc_filter=doc_filter)
        self.k = k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q in zip(batch["query_id"].to_pylist(), batch["query"].to_pylist()):
            d, s = self.scorer.topk(q, self.k, mode=self.mode)
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


class _ScorerServer:
    """Long-lived serving actor body (wrapped with ray.remote lazily —
    this module stays importable without Ray): one LocalScorer, queries
    in / ranked rows out.  Index + caches persist across calls (unlike
    score_dataset, whose actor pool is rebuilt per Dataset
    execution)."""

    def __init__(self, index_dir: str):
        self.scorer = LocalScorer(index_dir)

    def topk_batch(self, qids: list, queries: list[str], k: int, mode: str):
        out = []
        for qid, q in zip(qids, queries):
            d, s = self.scorer.topk(q, k, mode=mode)
            out.append((qid, d, s))
        return out


class ServingPool:
    """Persistent BM25 serving fleet: N named scorer actors that keep
    their index state and decoded-postings caches across calls — the
    steady-state serving path (score_dataset spins a fresh actor pool
    per Dataset execution, so its throughput includes index load).

    This is a deliberate drop to raw Ray actors: a long-lived pool with
    warm per-actor caches is shared mutable state the Dataset API can't
    express (SURVEY.md §4).  On a cluster the actors spread across
    nodes; any actor serves any query (index on shared storage)."""

    def __init__(self, index_dir: str, n_actors: int = 8):
        import ray

        self._ray = ray
        self.index_dir = index_dir
        remote_cls = ray.remote(_ScorerServer)
        self._actors = [remote_cls.remote(index_dir) for _ in range(n_actors)]

    def topk_table(
        self,
        queries: list[str],
        k: int = 10,
        mode: str = "exact",
        chunk: int = 64,
    ) -> pa.Table:
        """Score `queries` across the pool (round-robin chunks);
        returns (query_id, rank, doc_id, score) like
        QueryEngine.topk_table."""
        futs = []
        for i in range(0, len(queries), chunk):
            qids = list(range(i, min(i + chunk, len(queries))))
            actor = self._actors[(i // chunk) % len(self._actors)]
            futs.append(
                actor.topk_batch.remote(qids, queries[i : i + chunk], k, mode)
            )
        qid_col, rank_col, doc_col, score_col = [], [], [], []
        for batch in self._ray.get(futs):
            for qid, d, s in batch:
                qid_col.extend([qid] * len(d))
                rank_col.extend(range(1, len(d) + 1))
                doc_col.extend(d.tolist())
                score_col.extend(s.tolist())
        return pa.table(
            {
                "query_id": pa.array(qid_col, type=pa.int64()),
                "rank": pa.array(rank_col, type=pa.int32()),
                "doc_id": pa.array(doc_col, type=pa.int64()),
                "score": pa.array(score_col, type=pa.float64()),
            }
        )

    def close(self) -> None:
        for a in self._actors:
            self._ray.kill(a)
        self._actors = []


class QueryEngine:
    """User-facing engine: single queries, batches, and Dataset scoring."""

    def __init__(
        self,
        index_dir: str,
        params: BM25Params | None = None,
        doc_filter=None,
    ):
        self.index_dir = index_dir
        self._doc_filter = doc_filter
        self._local = LocalScorer(index_dir, params, doc_filter=doc_filter)

    @property
    def manifest(self) -> Manifest:
        return self._local.manifest

    def topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "exact",
        boosts: dict[str, float] | None = None,
    ):
        return self._local.topk(query, k, mode=mode, boosts=boosts)

    def collection_docids(self, doc_ids: np.ndarray) -> list[str]:
        """Map internal doc IDs back to collection docids (J4)."""
        return self._local.collection_docids(doc_ids)

    def explain(self, query: str, doc_id: int) -> list[dict]:
        """Per-term score breakdown (see LocalScorer.explain)."""
        return self._local.explain(query, doc_id)

    def topk_table(self, queries: list[str], k: int = 10, mode: str = "exact") -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q in enumerate(queries):
            d, s = self._local.topk(q, k, mode=mode)
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

    def score_dataset(self, queries_ds, k: int = 10, mode: str = "exact", concurrency=(1, 8)):
        """Distributed serving: actor pool, one LocalScorer per actor."""
        return queries_ds.map_batches(
            ScorerActor,
            fn_constructor_args=(self.index_dir, k, mode, self._doc_filter),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=concurrency,
        )
