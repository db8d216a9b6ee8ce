"""Classic vector-space TF-IDF cosine retrieval — the fourth scoring
family next to BM25 (query.py), the smoothed language models (lmdir.py)
and PL2 (dfr.py): SMART-style lnc document weighting with an ln idf,
cosine-normalized by the document's full weight-vector norm.

    w(t, d)   = (1 + ln tf) * ln(N / df_t)
    norm(d)   = sqrt( sum over ALL terms of d of w(t, d)^2 )
    score(q, d) = sum_{t in q} w(t, d) / norm(d)

Unlike BM25/LM/PL2, cosine needs per-document state the inverted index
does not carry: the full-vector norm.  That is a one-pass derived
artifact — the **doc-norms store** — built exactly like the positional
store (ciff_ray.positions): a stateless-per-doc map_batches over the
corpus (each document is one row, so its complete norm is computable
inside its batch — no shuffle at any scale), with df/N coming from the
already-built index's term stats inside the actor (no second
aggregation pass).  The reader reuses DoclengthStore's doc-range-
sharded gather verbatim (query.py VALUE_COLUMN/VALUE_DTYPE hooks), so
norm lookups at query time touch only the shards the candidate union
hits — the same 10^12-doc story as doclengths.

Float-op discipline (the hash-compare gate): every op is {+, -, *, /,
ln, sqrt} — ln is proven bit-identical between numpy and DuckDB by the
BM25 idf rows, sqrt is IEEE-exact — and the ranking key is the engine-
standard (round(score, 9) DESC, doc_id ASC), which absorbs the one
unmirrored degree of freedom (summation order inside SUM/bincount).

Cites: reference header/doc-record stats (pisa-engine/ciff
src/lib.rs Header num_postings_lists / doclengths) are the N/df
inputs; norms are this engine's derived extension, not a reference
structure.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.layout import cache_root
from ciff_ray.query import DoclengthStore

TOPK_K = 10


class DocnormStore(DoclengthStore):
    """Doc-range-sharded float64 norm lookup over the norms parquet
    dir — DoclengthStore's gather machinery over a (doc_id, norm)
    layout."""

    VALUE_COLUMN = "norm"
    VALUE_DTYPE = np.float64


class _NormPartials:
    """map_batches actor: (doc_id, text) -> (doc_id, norm).  Each doc
    is one input row, so its complete norm is computable per batch;
    df/N load once per actor from the index term stats."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import token_ids

        n_rows = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vocab, tidx, rows = token_ids(batch["text"])
        if tidx.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.int64()),
                    "norm": pa.array(np.zeros(n_rows), type=pa.float64()),
                }
            )
        n_docs = float(self.scorer.N)
        # df per batch-vocab entry (vocabulary-scale loop, the same
        # amortization as the positional store's crc loop); a term
        # missing from the index means the index was built over a
        # different corpus — fail fast, never emit a wrong norm
        df = np.empty(len(vocab), dtype=np.float64)
        for i, t in enumerate(vocab.to_pylist()):
            st = self.scorer._term_stat(t)
            if st is None:
                raise ValueError(
                    f"term {t!r} absent from index "
                    f"{self.scorer.paths.root!r} — norms must be built "
                    "over the indexed corpus"
                )
            df[i] = float(st[0])
        # tf per (row, term): one lexsort + boundary diff
        order = np.lexsort((tidx, rows))
        r_s, t_s = rows[order], tidx[order]
        boundary = np.concatenate(
            [[True], (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])]
        )
        starts = np.flatnonzero(boundary)
        tf = np.diff(np.concatenate([starts, [t_s.size]])).astype(np.float64)
        pair_row = r_s[starts]
        pair_tid = t_s[starts]
        w = (1.0 + np.log(tf)) * np.log(n_docs / df[pair_tid])
        sumsq = np.bincount(pair_row, weights=w * w, minlength=n_rows)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "norm": pa.array(np.sqrt(sumsq), type=pa.float64()),
            }
        )


def build_docnorms(
    docs: ray.data.Dataset, index_dir: str, out_dir: str
) -> str:
    """Build the doc-norms store from a (doc_id, text) Dataset against
    an existing index.  Streaming end to end: one stateless-per-doc
    actor pass, the parquet write is the only materialization; the
    reader locates doc ranges via row-group statistics, so no sort is
    required (the same contract as the docmap)."""
    from ciff_ray.layout import publish_dir

    # layout.publish_dir discipline: pid-suffixed tmp, _DONE written
    # INSIDE tmp, one atomic rename; a concurrent-publish loser cleans
    # up, and a crash-left marker-less out_dir self-heals
    tmp = f"{out_dir}.tmp-{os.getpid()}"
    docs.map_batches(
        _NormPartials,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).write_parquet(tmp)
    return publish_dir(tmp, out_dir)


def norms_dir_for(sf_dir: str) -> str:
    from ciff_ray.pipelines import _sf_fingerprint

    return os.path.join(cache_root(), "norms", _sf_fingerprint(sf_dir))


def ensure_docnorms(sf_dir: str) -> str:
    from ciff_ray.pipelines import ensure_index

    out = norms_dir_for(sf_dir)
    if not os.path.exists(os.path.join(out, "_DONE")):
        idx = ensure_index(sf_dir)
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        build_docnorms(docs, idx, out)
    return out


def tfidf_score_all(
    scorer, norms: DocnormStore, query: str
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, cosine scores) over docs matching >= 1 query term.
    Per-term contributions sum in byte-sorted term order; the norm
    divides once per doc AFTER the sum (1:1 with the oracle SQL)."""
    terms = sorted(
        {t for t in scorer._query_terms(query) if scorer._term_stat(t)},
        key=lambda s: s.encode(),
    )
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    n_docs = float(scorer.N)
    doc_parts, w_parts = [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        df = float(scorer._term_stat(t)[0])
        doc_parts.append(docs)
        w_parts.append(
            (1.0 + np.log(tfs.astype(np.float64))) * np.log(n_docs / df)
        )
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    sums = np.bincount(inv, weights=np.concatenate(w_parts))
    nm = norms.gather_sorted(u)
    # a doc whose every term has df == N has zero weight vector — its
    # cosine direction is undefined, so DROP it (0/0 would be nan and
    # the SQL oracle mirrors the drop with `n.norm > 0`)
    ok = nm > 0.0
    if not ok.all():
        u, sums, nm = u[ok], sums[ok], nm[ok]
    return u, sums / nm


class _TfidfScorerActor:
    """map_batches actor: (query_id, query) -> top-k (query_id, rank,
    doc_id) under TF-IDF cosine.  Index + norms state once per actor;
    the engine-standard (round9 desc, doc_id asc) rank key."""

    def __init__(self, index_dir: str, norms_dir: str, k: int):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.norms = DocnormStore(norms_dir, self.scorer.N)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, ranks, docs = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, sc = tfidf_score_all(self.scorer, self.norms, q)
            d, _ = LocalScorer._rank(u, sc, self.k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
            }
        )


def q_tfidf_cosine(sf_dir: str) -> ray.data.Dataset:
    """Top-k TF-IDF cosine retrieval for the fixed query set —
    (query_id, rank, doc_id)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    norms = ensure_docnorms(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _TfidfScorerActor,
            fn_constructor_args=(idx, norms, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def tfidf_cosine_oracle_sql() -> str:
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET, _bm25_base_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    q_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(QUERY_SET)
        for t in sorted(set(tokenize(q)))
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_base_cte().lstrip()},
q(query_id, term) AS (VALUES {q_vals}),
wt AS (
  SELECT tf.doc_id, tf.term,
         (1.0 + ln(tf.tf)) * ln(s.n_docs / df.df) AS w
  FROM tf JOIN df USING (term) CROSS JOIN stats s
),
norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS norm FROM wt GROUP BY doc_id),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, wt.doc_id AS doc_id,
         SUM(wt.w) / n.norm AS score
  FROM q JOIN wt USING (term) JOIN norms n ON wt.doc_id = n.doc_id
  WHERE n.norm > 0
  GROUP BY q.query_id, wt.doc_id, n.norm
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""
