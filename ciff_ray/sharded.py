"""Doc-sharded serving: scatter-gather top-k over per-shard indexes.

The standard scale-out retrieval architecture the reference engine
leaves to its callers: the corpus is split into S doc shards, each
built as an independent index (possibly on a different node / day —
see ciff_ray.merge for the fold-in path), and a query fans out to all
shards, each returning its local top-k under COLLECTION-WIDE
statistics; the gather keeps the global best k.

Rank identity to a monolithic index (tested in tests/test_sharded.py):

* Per-document BM25 only depends on (tf, dl) of the document and the
  global (df, N, avgdl).  ``build_global_stats`` merges shard stats
  into one term-sorted store (df/cf summed — the same two-level tree
  the build uses), so a shard scorer given the resulting
  :class:`~ciff_ray.query.GlobalStats` computes bit-identical scores.
* Any document in the global top-k is in its own shard's top-k (its
  score doesn't change, and fewer competitors can only raise its local
  rank), so gathering local top-k lists loses nothing.
* The gather sorts (score desc, global docID asc) — the same
  tie-break as LocalScorer._rank — so ordering matches a monolithic
  index when shard docIDs are offset by the shard's base.

Pruning stays exact: shard block-max / max-score bounds were computed
with the shard's own avgdl; under the (larger) global avgdl they are
rescaled by the safe ratio (proof in the ciff_ray.merge docstring).

``ShardedServingPool`` is the deliberate raw-actor drop (SURVEY.md §4,
same rationale as query.ServingPool): one long-lived scorer actor per
shard — on a cluster these pin to the nodes holding each shard's
files — and the driver gathers S small (k-row) results per query.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ciff_ray.build import _TERM_STATS_SHARDS, _term_stats_merge_shard
from ciff_ray.layout import IndexPaths, Manifest, atomic_write_parquet, stable_hash
from ciff_ray.query import BM25Params, GlobalStats, LocalScorer


@ray.remote
def _scaled_stats_shards(path: str, factor: float, nshard: int):
    """One shard's term-stats file -> max_score rescaled to the global
    avgdl, split into disjoint term-hash shards (level 1 of the same
    merge tree build._write_term_stats uses)."""
    pa.set_cpu_count(1)
    t = pq.read_table(path, columns=["term", "df", "cf", "max_score"])
    if factor > 1.0:
        ms = t["max_score"].to_numpy(zero_copy_only=False).astype(np.float64)
        scaled = np.nextafter((ms * factor).astype(np.float32), np.float32(np.inf))
        t = t.set_column(
            t.schema.get_field_index("max_score"),
            "max_score",
            pa.array(scaled, type=pa.float32()),
        )
    import polars as pl

    h = (
        pl.from_arrow(t["term"].combine_chunks()).hash(seed=17).to_numpy()
        % nshard
    )
    return tuple(t.filter(pa.array(h == s)) for s in range(nshard))


def build_global_stats(shard_dirs: list[str], out_dir: str) -> GlobalStats:
    """Merge shard term stats into one collection-wide store.  Cheap:
    reads only the (already per-term aggregated) term_stats files, no
    postings; distributed two-level tree, zero driver vocab work.
    Idempotent per shard-set fingerprint."""
    manifests = [Manifest.read(IndexPaths(d).manifest) for d in shard_dirs]
    num_docs = sum(m.num_docs for m in manifests)
    total_terms = sum(m.total_terms_in_collection for m in manifests)
    avgdl = total_terms / num_docs if num_docs else 0.0
    fingerprint = format(
        stable_hash(
            "|".join(f"{m.input_fingerprint}:{m.num_docs}" for m in manifests).encode()
        ),
        "08x",
    )
    stats_dir = os.path.join(out_dir, "term_stats")
    meta_path = os.path.join(out_dir, "global.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fingerprint:
            return GlobalStats(num_docs, avgdl, total_terms, stats_dir)

    os.makedirs(stats_dir, exist_ok=True)
    for f in os.listdir(stats_dir):
        os.remove(os.path.join(stats_dir, f))
    level1 = []
    for m, d in zip(manifests, shard_dirs):
        factor = avgdl / m.average_doclength if avgdl > m.average_doclength else 1.0
        sd = IndexPaths(d).term_stats
        for fn in sorted(os.listdir(sd)):
            if fn.endswith(".parquet"):
                level1.append(
                    _scaled_stats_shards.options(
                        num_returns=_TERM_STATS_SHARDS
                    ).remote(os.path.join(sd, fn), factor, _TERM_STATS_SHARDS)
                )
    ray.get(
        [
            _term_stats_merge_shard.remote(
                os.path.join(stats_dir, f"part-{s:03d}.parquet"),
                *[fr[s] for fr in level1],
            )
            for s in range(_TERM_STATS_SHARDS)
        ]
    )
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "fingerprint": fingerprint,
                "num_docs": num_docs,
                "total_terms": total_terms,
                "avgdl": avgdl,
            },
            f,
        )
    os.replace(tmp, meta_path)
    return GlobalStats(num_docs, avgdl, total_terms, stats_dir)


def _gather_topk(
    parts: list[tuple[np.ndarray, np.ndarray]], bases: list[int], k: int
):
    """Merge per-shard (docs, scores) top-k lists: offset docIDs by the
    shard base, keep the global best k under (score desc, docID asc) —
    LocalScorer._rank's exact tie-break."""
    docs = np.concatenate(
        [d + b for (d, _), b in zip(parts, bases)]
        or [np.empty(0, np.int64)]
    )
    scores = np.concatenate([s for _, s in parts] or [np.empty(0, np.float64)])
    # same 9-dp rank key as LocalScorer._rank (see its docstring)
    order = np.lexsort((docs, -np.round(scores, 9)))[:k]
    return docs[order], scores[order]


class ShardedEngine:
    """In-process scatter-gather over doc-sharded indexes.  Shard
    docIDs map to global docIDs by each shard's base offset (shard
    order = ctor order)."""

    def __init__(
        self,
        shard_dirs: list[str],
        stats_root: str,
        params: BM25Params | None = None,
    ):
        self.shard_dirs = list(shard_dirs)
        self.global_stats = build_global_stats(self.shard_dirs, stats_root)
        manifests = [Manifest.read(IndexPaths(d).manifest) for d in shard_dirs]
        self.doc_bases, acc = [], 0
        for m in manifests:
            self.doc_bases.append(acc)
            acc += m.num_docs
        self._scorers = [
            LocalScorer(d, params, global_stats=self.global_stats)
            for d in shard_dirs
        ]

    def topk(self, query: str, k: int = 10, mode: str = "exact"):
        parts = [s.topk(query, k, mode=mode) for s in self._scorers]
        return _gather_topk(parts, self.doc_bases, k)


class _ShardScorerServer:
    """Actor body: one shard's scorer under global stats."""

    def __init__(self, index_dir: str, gs_fields: tuple):
        num_docs, avgdl, total_terms, stats_dir = gs_fields
        self.scorer = LocalScorer(
            index_dir,
            global_stats=GlobalStats(num_docs, avgdl, total_terms, stats_dir),
        )

    def topk_batch(self, queries: list[str], k: int, mode: str):
        return [self.scorer.topk(q, k, mode=mode) for q in queries]


class ShardedServingPool:
    """One long-lived scorer actor PER SHARD; a query batch fans out to
    every shard actor in parallel and the driver merges the k-row
    results.  Raw actors by design: per-shard warm caches + node
    placement are shared mutable state the Dataset API can't express."""

    def __init__(self, shard_dirs: list[str], stats_root: str):
        gs = build_global_stats(list(shard_dirs), stats_root)
        self.doc_bases, acc = [], 0
        for d in shard_dirs:
            self.doc_bases.append(acc)
            acc += Manifest.read(IndexPaths(d).manifest).num_docs
        fields = (gs.num_docs, gs.avgdl, gs.total_terms, gs.stats_dir)
        remote_cls = ray.remote(_ShardScorerServer)
        self._actors = [remote_cls.remote(d, fields) for d in shard_dirs]

    def topk_table(
        self, queries: list[str], k: int = 10, mode: str = "exact"
    ) -> pa.Table:
        """(query_id, rank, doc_id, score) rows — global docIDs."""
        futs = [a.topk_batch.remote(queries, k, mode) for a in self._actors]
        per_shard = ray.get(futs)  # S x Q x (docs, scores)
        qids, ranks, docs, scores = [], [], [], []
        for qid in range(len(queries)):
            d, s = _gather_topk(
                [shard[qid] for shard in per_shard], self.doc_bases, k
            )
            qids.extend([qid] * d.size)
            ranks.extend(range(1, d.size + 1))
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

    def shutdown(self) -> None:
        for a in self._actors:
            ray.kill(a)
        self._actors = []

    # unified pool-protocol spelling (query.ServingPool uses close())
    def close(self) -> None:
        self.shutdown()


# ---------------------------------------------------------------------------
# serving-topology decision (round-4 verdict item 4): callers ask for
# "a pool over this corpus" and the library picks monolithic vs sharded

# docs per shard actor before the monolithic scorer's per-query dense
# work and cache pressure dominate.  Measured basis (BASELINE.md,
# 19.5M-turn corpus): monolithic pool 2.3 q/s warm vs 8-shard pool
# 9.5-12.4 q/s — per-shard dense vectors are 8 B x docs (156 MB mono
# vs 19 MB/shard there), and every shard decodes in parallel.  At
# 2.5M docs a stopword dense vector is 20 MB, so a shard scorer's
# LRU (>= 256 MB) keeps ~12 resident.
SHARD_DOC_TARGET = 2_500_000


def plan_shards(num_docs: int, target_docs: int = SHARD_DOC_TARGET) -> int:
    """How many doc shards serving should use: 1 = monolithic.  Pure
    function of corpus size so build planning can call it too."""
    if num_docs <= 0:
        return 1
    return -(-num_docs // target_docs)


def build_conv_shards(
    transcripts_path: str,
    root: str,
    n_shards: int,
    params=None,
) -> list[str]:
    """Build ``n_shards`` conv-range doc shards from a transcripts
    parquet (byte-ascending conv_id ranges, so shard docIDs offset by
    the shard base reproduce the monolithic docID space).  Idempotent:
    shards with a manifest are skipped, a _DONE marker caps the set."""
    import ray.data

    from ciff_ray.build import BuildParams, build_index

    done = os.path.join(root, "_DONE")
    dirs = [os.path.join(root, f"shard{i}") for i in range(n_shards)]
    if os.path.exists(done):
        return dirs
    # shard bounds from a BOUNDED sample, not the full conv_id column —
    # the driver never holds O(corpus) state (the index build's own
    # sample_frac device).  Sampling error skews shard sizes a little;
    # correctness is unaffected because doc bases come from each
    # shard's own manifest, and serving cost degrades only linearly in
    # the skew.
    sample_ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id"]
    )
    n_rows = sample_ds.count()
    cap = 262_144  # ~2 MB of conv ids on the driver, any corpus size
    frac = min(1.0, cap / max(n_rows, 1))
    if frac < 1.0:
        sample_ds = sample_ds.random_sample(frac, seed=13)
    sampled = pa.chunked_array(
        [
            t["conv_id"].combine_chunks()
            for t in ray.get(sample_ds.to_arrow_refs())
            if t.num_rows
        ]
    )
    u = pc.unique(sampled).sort()
    n = len(u)
    if n < n_shards:
        raise ValueError(
            f"only {n} distinct conv ids sampled for {n_shards} shards"
        )
    bounds = [
        u[min(i * n // n_shards, n - 1)].as_py() for i in range(1, n_shards)
    ]
    for i, out in enumerate(dirs):
        if os.path.exists(os.path.join(out, "manifest.json")):
            continue
        lo = bounds[i - 1] if i > 0 else None
        hi = bounds[i] if i < n_shards - 1 else None
        ds = ray.data.read_parquet(transcripts_path)

        def keep(b: pa.Table, lo=lo, hi=hi) -> pa.Table:
            m = None
            if lo is not None:
                m = pc.greater_equal(b["conv_id"], lo)
            if hi is not None:
                lt = pc.less(b["conv_id"], hi)
                m = lt if m is None else pc.and_(m, lt)
            return b if m is None else b.filter(m)

        build_index(
            ds.map_batches(keep, batch_format="pyarrow"),
            out,
            params
            or BuildParams(num_partitions=16, num_salts=4, sample_frac=0.25),
        )
    with open(done, "w", encoding="utf-8") as f:
        f.write("ok\n")
    return dirs


def make_serving_pool(
    transcripts_path: str,
    work_root: str,
    *,
    n_actors: int = 8,
    target_docs: int = SHARD_DOC_TARGET,
    params=None,
):
    """THE serving entry point for a corpus: picks the topology from
    corpus size (plan_shards) and returns a warm-capable pool — a
    monolithic :class:`ciff_ray.query.ServingPool` below the dense-
    cache cliff, a :class:`ShardedServingPool` above it.  Both answer
    ``topk_table(queries, k, mode)`` and ``close()``; results are
    rank-identical either way (test_sharded.py), so callers never
    choose a class.  Indexes are built under ``work_root`` on first
    use and reused after.

    ``n_actors`` sizes the MONOLITHIC pool only.  On the sharded
    branch parallelism is the shard count (one pinned actor per
    shard — each holds that shard's caches, so extra actors per shard
    would split the warm state, not add throughput); to raise sharded
    concurrency, lower ``target_docs`` so plan_shards picks more
    shards."""
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.query import ServingPool

    import pyarrow.dataset as pads

    # metadata-only row count; works for a file or a directory of files
    num_docs = pads.dataset(transcripts_path, format="parquet").count_rows()
    s = plan_shards(num_docs, target_docs)
    if s <= 1:
        idx = os.path.join(work_root, "mono")
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(
                ray.data.read_parquet(transcripts_path),
                idx,
                params
                or BuildParams(
                    num_partitions=16, num_salts=4, sample_frac=0.25
                ),
            )
        return ServingPool(idx, n_actors=n_actors)
    dirs = build_conv_shards(
        transcripts_path, os.path.join(work_root, f"shards{s}"), s, params
    )
    return ShardedServingPool(dirs, os.path.join(work_root, f"gstats{s}"))
