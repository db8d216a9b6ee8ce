"""Impact-quantized retrieval: serve top-k by SUMS OF 8-BIT IMPACTS
instead of float BM25 — the query side of the reference's score
quantizer (M6, /root/reference/src/lib.rs:94-148) and two-pass
quantization flow (T5: range scan, then quantize), which exists in the
reference precisely so an engine can rank on small integer impacts.

Two passes, both distributed:

1. **Range scan** (the reference's ``find_score_range``,
   /root/reference/src/lib.rs:922-957): one Ray task per index
   partition decodes every posting slice, computes the exact BM25
   per-posting score (idf x tf-normalization — LocalScorer._contrib,
   the oracle-mirrored kernel), and returns the partition's (min, max)
   over positive scores; the driver reduces 2 floats per partition.
2. **Quantized serving**: per query term, decode postings, compute the
   same per-posting score, map it through the M6 linear [min,max] ->
   [1,255] quantizer (interop.convert.ScoreQuantizer.quantize_array —
   byte-identical to the CIFF export path, round-half-away), and rank
   docs by INTEGER impact sums (impact DESC, doc_id ASC).  Integer
   scores mean the gate compares exact values, not rounded floats.

The oracle mirrors pass 1 with a corpus-wide min/max over the same
per-posting score expression (bit-identical contribs are already
proven by the hash-green bm25_scores rows; min/max has no
summation-order freedom at all) and pass 2 with the same quantize
arithmetic written in the same association order:
``floor(((c - lo) / (hi - lo)) * 254.0 + 1.0 + 0.5)`` clamped to
[1, 255].

A production impact-ordered index would MATERIALIZE impacts at build
(the K8 JSONL->CIFF quantize writer already does exactly that for
export, storing impacts in the tf slot); this entry computes them at
serve time so it can share one index with the float families — same
decode work as exact BM25 plus one vectorized quantize.

Scale shape: pass 1 is embarrassingly partition-parallel (2 floats per
task to the driver, cached per index fingerprint); pass 2 is the BM25
score_all shape with one extra elementwise kernel.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

TOPK_K = 10


@ray.remote
def _range_partition(index_dir: str, pid: int) -> tuple[float, float]:
    """(min, max) of positive per-posting BM25 scores in partition
    ``pid`` — the reference's find_score_range over one partition."""
    import pyarrow.parquet as pq

    from ciff_ray import codecs
    from ciff_ray.layout import IndexPaths
    from ciff_ray.query import LocalScorer

    pa.set_cpu_count(1)
    scorer = LocalScorer(index_dir)
    seg_path = IndexPaths(index_dir).segment(pid)
    if not os.path.exists(seg_path):
        return (np.inf, -np.inf)
    seg = pq.read_table(seg_path)
    if seg.num_rows == 0:
        return (np.inf, -np.inf)
    dfs = seg["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    firsts = seg["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    dcodec = seg["doc_codec"].to_numpy(zero_copy_only=False)
    tcodec = seg["tf_codec"].to_numpy(zero_copy_only=False)
    doc_bufs = seg["doc_bytes"].to_pylist()
    tf_bufs = seg["tf_bytes"].to_pylist()
    terms_py = seg["term"].to_pylist()
    lo, hi = np.inf, -np.inf
    for i in range(seg.num_rows):
        df = int(dfs[i])
        gaps = codecs.decode(doc_bufs[i], df - 1, int(dcodec[i])).astype(np.int64)
        docs = np.empty(df, dtype=np.int64)
        docs[0] = firsts[i]
        if df > 1:
            np.cumsum(gaps, out=docs[1:])
            docs[1:] += firsts[i]
        tfs = codecs.decode(tf_bufs[i], df, int(tcodec[i])).astype(np.int64)
        if scorer._dead.size:
            # deferred deletes: exclude tombstoned docs so the cached
            # [lo, hi] matches what quantized_score_all actually serves
            # — the SAME _live_mask postings() applies, so the two can
            # never diverge
            live = scorer._live_mask(docs)
            if not live.all():
                docs, tfs = docs[live], tfs[live]
                if docs.size == 0:
                    continue
        dl = scorer._dl[docs].astype(np.float64)
        c = scorer._contrib(
            tfs.astype(np.float64), dl, scorer.idf(terms_py[i])
        )
        pos = c[c > 0.0]
        if pos.size:
            lo = min(lo, float(pos.min()))
            hi = max(hi, float(pos.max()))
    return (lo, hi)


def compute_score_range(index_dir: str) -> tuple[float, float]:
    """Distributed corpus-wide (min, max) over positive per-posting
    BM25 scores (A7 semantics: positive scores only)."""
    from ciff_ray.layout import IndexPaths, Manifest

    manifest = Manifest.read(IndexPaths(index_dir).manifest)
    parts = ray.get(
        [
            _range_partition.remote(index_dir, pid)
            for pid in range(manifest.num_partitions)
        ]
    )
    lo = min(p[0] for p in parts)
    hi = max(p[1] for p in parts)
    if not np.isfinite(lo) or not np.isfinite(hi):
        raise ValueError("No valid scores found for quantization")
    return float(lo), float(hi)


def ensure_score_range(sf_dir: str) -> tuple[float, float]:
    """Cached (min, max) for the sf_dir's index, keyed like the index
    itself."""
    from ciff_ray.layout import cache_root
    from ciff_ray.pipelines import _sf_fingerprint, ensure_index

    d = os.path.join(cache_root(), "qrange")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, _sf_fingerprint(sf_dir) + ".json")
    if os.path.exists(path):
        with open(path) as f:
            v = json.load(f)
        return float(v["lo"]), float(v["hi"])
    lo, hi = compute_score_range(ensure_index(sf_dir))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"lo": lo, "hi": hi}, f)
    os.replace(tmp, path)
    return lo, hi


def quantized_score_all(
    scorer, quantizer, query: str
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, integer impact sums) over docs matching >= 1 query
    term.  Impacts come from the M6 quantizer over the exact BM25
    per-posting score."""
    terms = sorted(
        {t for t in scorer._query_terms(query) if scorer._term_stat(t)},
        key=lambda s: s.encode(),
    )
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_parts, tf_parts, w_list = [], [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        doc_parts.append(docs)
        tf_parts.append(tfs.astype(np.float64))
        w_list.append((scorer.idf(t), docs.size))
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    all_docs = np.concatenate(doc_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    dl = scorer._dl.gather_sorted(u).astype(np.float64)
    impacts = np.zeros(all_docs.size, dtype=np.int64)
    off = 0
    for (w, n), tfs in zip(w_list, tf_parts):
        c = scorer._contrib(tfs, dl[inv[off : off + n]], w)
        impacts[off : off + n] = quantizer.quantize_array(c).astype(np.int64)
        off += n
    sums = np.bincount(inv, weights=impacts).astype(np.int64)
    return u, sums


class _QuantizedScorerActor:
    """map_batches actor: (query_id, query) -> top-k (query_id, rank,
    doc_id, impact) under summed 8-bit impacts (impact DESC, doc_id
    ASC — integer key, no rounding)."""

    def __init__(self, index_dir: str, lo: float, hi: float, k: int):
        from ciff_ray.interop.convert import ScoreQuantizer
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.quantizer = ScoreQuantizer(min=lo, max=hi)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, imps = [], [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, s = quantized_score_all(self.scorer, self.quantizer, q)
            if u.size == 0:
                continue
            order = np.lexsort((u, -s))[: self.k]
            d, sv = u[order], s[order]
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
            imps.extend(sv.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "impact": pa.array(imps, type=pa.int64()),
            }
        )


def q_bm25_topk_quantized(sf_dir: str) -> ray.data.Dataset:
    """Top-k impact-quantized retrieval for the fixed query set —
    (query_id, rank, doc_id, impact)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    lo, hi = ensure_score_range(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _QuantizedScorerActor,
            fn_constructor_args=(idx, lo, hi, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def bm25_topk_quantized_oracle_sql() -> str:
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import (
        QUERY_SET,
        _BM25_CONTRIB_SQL,
        _bm25_base_cte,
    )
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    q_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(QUERY_SET)
        for t in sorted(set(tokenize(q)))
    )
    # the per-posting score: the same contrib SQL bm25_scores uses,
    # un-summed (one row per (term, doc))
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_base_cte().lstrip()},
contrib AS (
  SELECT tf.doc_id, tf.term,
         {_BM25_CONTRIB_SQL} AS c
  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
),
qr AS (SELECT min(c) AS lo, max(c) AS hi FROM contrib WHERE c > 0),
imp AS (
  SELECT doc_id, term,
         CASE
           WHEN c <= 0 THEN 0
           WHEN qr.lo = qr.hi THEN 1
           ELSE least(greatest(CAST(floor(
                  ((c - qr.lo) / (qr.hi - qr.lo)) * 254.0 + 1.0 + 0.5
                ) AS BIGINT), 1), 255)
         END AS impact
  FROM contrib CROSS JOIN qr
),
q(query_id, term) AS (VALUES {q_vals}),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, imp.doc_id AS doc_id,
         CAST(SUM(imp.impact) AS BIGINT) AS impact
  FROM q JOIN imp USING (term)
  GROUP BY q.query_id, imp.doc_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, impact FROM (
  SELECT query_id, doc_id, impact,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY impact DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""


# ---------------------------------------------------------------------------
# CIFF interop for the quantized index (round-4 verdict item 8): the
# inverse of jsonl2ciff --quantize.  PISA-side quantized serving is the
# reference's stated purpose for M6 (/root/reference/src/lib.rs:94-148):
# a CIFF whose tf slot carries 8-bit impacts ranks by plain tf sums.


def export_quantized_ciff(
    index_dir: str,
    output_path: str,
    lo: float,
    hi: float,
    description: str | None = None,
):
    """Export ``index_dir`` as an impact-quantized CIFF: every posting's
    tf is replaced by its M6-quantized BM25 contribution (the same
    quantize_array the JSONL --quantize writer uses), so any
    impact-ordered consumer ranks by integer tf sums.  Streaming like
    index_to_ciff (k-way segment merge + docmap record batches).

    Doc records keep the ORIGINAL doclengths — impact serving never
    reads them, and the header keeps describing the source collection
    (the same convention as quantized PISA indexes).  Zero impacts
    (contributions <= 0) are dropped per the M4 tf>0 filter — a
    belt-and-braces guard: floored idf makes every stored posting's
    contribution strictly positive, so nothing actually drops (the
    written != n_lists assertion enforces it)."""
    from ciff_ray.interop.bridge import _docmap_batches, _merged_postings
    from ciff_ray.interop.convert import CiffWriter, ScoreQuantizer
    from ciff_ray.interop.proto import (
        CiffHeader,
        CiffPostingsList,
        serialize_doc_records,
    )
    from ciff_ray.layout import IndexPaths, Manifest
    from ciff_ray.query import LocalScorer

    paths = IndexPaths(index_dir)
    if os.path.exists(paths.tombstones):
        raise ValueError(
            "index has pending tombstones — run lifecycle.compact_index "
            "before exporting to CIFF"
        )
    m = Manifest.read(paths.manifest)
    scorer = LocalScorer(index_dir)
    qz = ScoreQuantizer(min=lo, max=hi)

    # the header's list count IS the manifest count: idf is floored
    # (query.EPS_IDF), tf >= 1 and doclength > 0, so every stored
    # posting's contribution is strictly positive, and quantize maps
    # any positive score to >= 1 — no list can quantize away.  The
    # per-list keep-filter below plus the written != n_lists assertion
    # still guard the invariant instead of trusting this argument.
    n_lists = m.num_postings_lists

    header = CiffHeader(
        version=1,
        num_postings_lists=n_lists,
        num_docs=m.num_docs,
        total_postings_lists=n_lists,
        total_docs=m.num_docs,
        total_terms_in_collection=m.total_terms_in_collection,
        average_doclength=m.average_doclength,
        description=(
            description
            if description is not None
            else f"{m.description} [quantized {lo:.6g}..{hi:.6g}]"
        ),
    )
    with CiffWriter(output_path, header) as w:
        written = 0
        for term, docs, tfs in _merged_postings(paths):
            c = scorer._contrib(
                tfs.astype(np.float64),
                scorer._dl.gather_sorted(docs).astype(np.float64),
                scorer.idf(term),
            )
            impacts = qz.quantize_array(c).astype(np.int64)
            keep = impacts > 0
            if not keep.any():
                continue
            w.write_postings_list(
                CiffPostingsList.from_absolute(
                    term, docs[keep], impacts[keep]
                )
            )
            written += 1
        if written != n_lists:
            raise AssertionError(
                f"quantized export wrote {written} lists, counted {n_lists}"
            )
        for rb in _docmap_batches(paths.docmap_dir):
            w.write_serialized(
                serialize_doc_records(
                    rb.column(0).to_numpy(zero_copy_only=False),
                    rb.column(1),
                    rb.column(2).to_numpy(zero_copy_only=False),
                )
            )
    return header


def impact_score_all(scorer, query: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, integer impact sums) over a PRE-QUANTIZED index — the
    stored tf IS the impact (export_quantized_ciff / jsonl2ciff
    --quantize layout), so ranking is a plain tf sum per doc.  The
    serving twin of quantized_score_all for materialized impacts."""
    terms = sorted(
        {t for t in scorer._query_terms(query) if scorer._term_stat(t)},
        key=lambda s: s.encode(),
    )
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_parts, tf_parts = [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        doc_parts.append(docs)
        tf_parts.append(tfs)
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    all_docs = np.concatenate(doc_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    sums = np.bincount(inv, weights=np.concatenate(tf_parts)).astype(np.int64)
    return u, sums
