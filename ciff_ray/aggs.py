"""Search-result aggregations: date-histogram facets over the match
set and significant-terms analysis over the top pool — the
"aggregations" side of a serving stack (Elasticsearch's
`date_histogram` / `significant_terms` analogues), computed directly
on the inverted index.

Date histogram
    For each query, the disjunctive match set (docs containing >= 1
    query term — the same candidate definition every scoring family
    here uses) bucketed by time.  Transcript timestamps derive
    arithmetically from doc_id (synth.transcripts_from_documents:
    ts = EPOCH + doc_id seconds), so the minute bucket is exactly
    ``doc_id // 60`` — mirrored verbatim by the oracle, the same
    device ciff_ray.recency uses for ages.  A real deployment stores
    ts in the docmap and gathers it like doclengths (doc-range-sharded
    lookup); either way the histogram is one vectorized pass over the
    match set inside the scorer actor — no corpus scan, no shuffle.

Significant terms
    For each query, terms over-represented in the BM25 top pool
    relative to the whole collection, scored with the JLH heuristic
    (the Elasticsearch default):

        fg_pct = df_pool(t) / |pool|      bg_pct = df(t) / N
        jlh(t) = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    All inputs are integers and every float op is {-, *, /} in a
    mirrored order, so the gate stays an exact hash compare.  The pool
    is k x |Q| documents (driver-small by construction, like the
    snippets join); background df comes from the index's term stats
    inside a map_batches actor, never from a corpus scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

HIST_BUCKET_SECONDS = 60  # minute buckets of the synth ts rule
POOL_K = 20  # BM25 pool size feeding significant-terms
SIG_K = 10  # significant terms reported per query


# -- date histogram -------------------------------------------------------


class _HistogramActor:
    """map_batches actor: (query_id, query) -> (query_id, ts_bucket,
    n_docs) — match-set counts per minute bucket.  Index state loads
    once per actor; per query the work is the posting-union + one
    vectorized bucket bincount."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, buckets, counts = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            terms = [
                t
                for t in self.scorer._query_terms(q)
                if self.scorer._term_stat(t) is not None
            ]
            parts = [self.scorer.postings(t)[0] for t in terms]
            parts = [d for d in parts if d.size]
            if not parts:
                continue
            u = np.unique(np.concatenate(parts))
            b, n = np.unique(
                u.astype(np.int64) // HIST_BUCKET_SECONDS, return_counts=True
            )
            qids.extend([qid] * len(b))
            buckets.extend(b.tolist())
            counts.extend(n.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "ts_bucket": pa.array(buckets, type=pa.int64()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )


def q_date_histogram(sf_dir: str) -> ray.data.Dataset:
    """Minute-bucket histogram of the disjunctive match set for the
    fixed query set — (query_id, ts_bucket, n_docs)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _HistogramActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def date_histogram_oracle_sql() -> str:
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
matched AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id
  FROM q JOIN tf USING (term)
)
SELECT query_id, doc_id // {HIST_BUCKET_SECONDS} AS ts_bucket,
       count(*) AS n_docs
FROM matched GROUP BY query_id, ts_bucket"""


# -- match-set stats -------------------------------------------------------


class _MatchStatsActor:
    """map_batches actor: (query_id, query) -> one stats row per query
    over the disjunctive match set (Elasticsearch's `stats` aggregation
    on the doclength field): n_docs, min/max/sum dl, 6-dp mean."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ns, mins, maxs, sums, avgs = [], [], [], [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            terms = [
                t
                for t in self.scorer._query_terms(q)
                if self.scorer._term_stat(t) is not None
            ]
            parts = [self.scorer.postings(t)[0] for t in terms]
            parts = [d for d in parts if d.size]
            if not parts:
                continue
            u = np.unique(np.concatenate(parts))
            dl = self.scorer._dl.gather_sorted(u)
            total = int(dl.sum())
            qids.append(qid)
            ns.append(int(u.size))
            mins.append(int(dl.min()))
            maxs.append(int(dl.max()))
            sums.append(total)
            avgs.append(round(float(total) / float(u.size), 6))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "n_docs": pa.array(ns, type=pa.int64()),
                "min_dl": pa.array(mins, type=pa.int64()),
                "max_dl": pa.array(maxs, type=pa.int64()),
                "sum_dl": pa.array(sums, type=pa.int64()),
                "avg_dl_r": pa.array(avgs, type=pa.float64()),
            }
        )


def q_match_stats(sf_dir: str) -> ray.data.Dataset:
    """Doclength stats of the disjunctive match set per query —
    (query_id, n_docs, min_dl, max_dl, sum_dl, avg_dl_r)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _MatchStatsActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def match_stats_oracle_sql() -> str:
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
matched AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id
  FROM q JOIN tf USING (term)
)
SELECT m.query_id, count(*) AS n_docs,
       min(dl.dl) AS min_dl, max(dl.dl) AS max_dl,
       CAST(SUM(dl.dl) AS BIGINT) AS sum_dl,
       round(CAST(SUM(dl.dl) AS DOUBLE) / count(*), 6) AS avg_dl_r
FROM matched m JOIN dl ON m.doc_id = dl.doc_id
GROUP BY m.query_id"""


# -- significant terms ----------------------------------------------------


class _JLHScoreActor:
    """map_batches actor: (query_id, term, fg_df, pool_n) -> + jlh
    score.  Holds the index term stats (df lookups off the driver);
    the candidate set is the pool vocabulary — bounded by
    POOL_K x |Q| x avgdl rows total."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = float(self.scorer.N)
        fg = batch["fg_df"].to_numpy(zero_copy_only=False).astype(np.float64)
        pool_n = batch["pool_n"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms = batch["term"].to_pylist()
        # every pool term exists in the index by construction (pool
        # docs come from the indexed corpus through the same tokenizer)
        df = np.array(
            [float(self.scorer._term_stat(t)[0]) for t in terms],
            dtype=np.float64,
        )
        fg_pct = fg / pool_n
        bg_pct = df / n_docs
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        return batch.append_column("score", pa.array(score, type=pa.float64()))


def q_significant_terms(sf_dir: str) -> pa.Table:
    """Top significant terms of each query's BM25 top-POOL_K pool
    under the JLH score — (query_id, rank, term)."""
    import os

    from ciff_ray.oracle import tokenize as _tok
    from ciff_ray.pipelines import QUERY_SET, ensure_index
    from ciff_ray.query import QueryEngine

    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    pool = eng.topk_table(QUERY_SET, k=POOL_K, mode="bmw")
    pool_qid = pool["query_id"].to_numpy(zero_copy_only=False)
    pool_doc = pool["doc_id"].to_numpy(zero_copy_only=False)
    # per-query pool sizes (rare queries can match < POOL_K docs)
    pool_n_of = {
        int(q): int(n) for q, n in zip(*np.unique(pool_qid, return_counts=True))
    }
    hit_ids = pa.array(np.unique(pool_doc), type=pa.int64())
    # predicate pushed into the parquet scan (row-group pruning by
    # doc_id stats) — the pool is <= POOL_K x |Q| docs of the corpus
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(hit_ids),
    )
    texts = pa.concat_tables(ray.get(docs.to_arrow_refs())).combine_chunks()
    text_of = dict(
        zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist())
    )
    # foreground document frequencies over the pool: POOL_K x |Q| docs
    # total (driver-small by construction, like the snippets join)
    fg: dict[tuple[int, str], int] = {}
    for qid, d in zip(pool_qid.tolist(), pool_doc.tolist()):
        for t in set(_tok(text_of[d])):
            fg[(qid, t)] = fg.get((qid, t), 0) + 1
    if not fg:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int32()),
                "term": pa.array([], type=pa.string()),
            }
        )
    keys = sorted(fg)
    cand = pa.table(
        {
            "query_id": pa.array([k[0] for k in keys], type=pa.int64()),
            "term": pa.array([k[1] for k in keys], type=pa.string()),
            "fg_df": pa.array([fg[k] for k in keys], type=pa.int64()),
            "pool_n": pa.array(
                [pool_n_of[k[0]] for k in keys], type=pa.int64()
            ),
        }
    )
    scored = pa.concat_tables(
        ray.get(
            ray.data.from_arrow(cand)
            .repartition(4)
            .map_batches(
                _JLHScoreActor,
                fn_constructor_args=(idx,),
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .to_arrow_refs()
        )
    ).combine_chunks()
    # final per-query top-SIG_K under (round9 desc, term asc) — the
    # scored candidate table is pool-vocabulary-sized (driver-small)
    qids = scored["query_id"].to_numpy(zero_copy_only=False)
    terms = np.array(scored["term"].to_pylist(), dtype=object)
    sc = np.round(scored["score"].to_numpy(zero_copy_only=False), 9)
    order = np.lexsort((terms, -sc, qids))
    qids, terms = qids[order], terms[order]
    out_q, out_r, out_t = [], [], []
    i = 0
    while i < len(qids):
        j = i
        while j < len(qids) and qids[j] == qids[i]:
            j += 1
        for r, k in enumerate(range(i, min(i + SIG_K, j)), start=1):
            out_q.append(int(qids[k]))
            out_r.append(r)
            out_t.append(terms[k])
        i = j
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int32()),
            "term": pa.array(out_t, type=pa.string()),
        }
    )


def significant_terms_oracle_sql() -> str:
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
pool AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {POOL_K}
),
pooln AS (SELECT query_id, count(*) AS n FROM pool GROUP BY query_id),
fg AS (
  SELECT p.query_id, tf.term, count(*) AS fg_df
  FROM pool p JOIN tf ON p.doc_id = tf.doc_id
  GROUP BY p.query_id, tf.term
),
sig AS (
  SELECT f.query_id, f.term,
         ((CAST(f.fg_df AS DOUBLE) / pn.n) - (CAST(df.df AS DOUBLE) / s.n_docs))
         * ((CAST(f.fg_df AS DOUBLE) / pn.n) / (CAST(df.df AS DOUBLE) / s.n_docs))
           AS score
  FROM fg f
  JOIN pooln pn USING (query_id)
  JOIN df USING (term)
  CROSS JOIN stats s
)
SELECT query_id, CAST(rnk AS INT) AS rank, term FROM (
  SELECT query_id, term,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, term ASC) AS rnk
  FROM sig
) WHERE rnk <= {SIG_K}"""
