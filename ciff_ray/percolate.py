"""Query percolation — reverse search: match a stream of INCOMING
documents against a registry of STORED queries (Elasticsearch's
percolator; the alerting/routing primitive for transcript pipelines:
"notify every saved search this new turn matches").

Semantics: conjunctive bag-of-words — stored query q matches document
d iff every distinct term of q occurs in d (the percolator's default
`match` behaviour for term queries; phrase/positional percolation
would compose the positions kernels the same way and is out of scope
for this entry).

Shape: the query registry is the SMALL side — it broadcasts into the
actor (constructor args; a production registry would be `ray.put`
once), and the document stream is one stateless map_batches pass:
tokenize the batch, build one (row, vocab-id) EXISTENCE table, then
evaluate each query as an AND over its terms' membership columns.
Cost per batch is O(tokens + |registry terms| x rows) with no shuffle
and nothing corpus-sized anywhere; at a large registry you'd invert
it (term -> queries, exactly the engine's own index structure) and
count satisfied terms per (doc, query) instead — noted, not needed at
a |Q| = 8 registry.

No index required: percolation is a pure streaming transform (the
one entry in the retrieval family that runs BEFORE indexing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def parse_registry(queries: list[str]) -> list[tuple[int, list[str]]]:
    """(query_id, sorted distinct terms) for each stored query;
    term-less queries are kept (they match nothing — conjunctive AND
    over an empty certain-to-be-missing set is defined by the terms
    that ARE there; a fully-empty query matches nothing by contract)."""
    from ciff_ray.oracle import tokenize

    return [(qid, sorted(set(tokenize(q)))) for qid, q in enumerate(queries)]


class _PercolateActor:
    """map_batches actor: (doc_id, text) -> (doc_id, query_id) match
    pairs.  The registry parses once per actor."""

    def __init__(self, queries: list[str]):
        self.registry = [(qid, ts) for qid, ts in parse_registry(queries) if ts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import token_ids

        n_rows = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
        vocab, tidx, rows = token_ids(batch["text"])
        if tidx.size == 0:
            return empty
        vid_of = {t: i for i, t in enumerate(vocab.to_pylist())}
        out_doc, out_q = [], []
        # membership column per registry term, cached across queries
        # sharing a term (stopwords repeat across stored queries)
        memb: dict[str, np.ndarray] = {}
        for qid, terms in self.registry:
            hit = np.ones(n_rows, dtype=bool)
            for t in terms:
                m = memb.get(t)
                if m is None:
                    vid = vid_of.get(t)
                    if vid is None:
                        m = np.zeros(n_rows, dtype=bool)
                    else:
                        m = np.zeros(n_rows, dtype=bool)
                        m[rows[tidx == vid]] = True
                    memb[t] = m
                hit &= m
                if not hit.any():
                    break
            matched = np.flatnonzero(hit)
            if matched.size:
                out_doc.extend(doc_ids[matched].tolist())
                out_q.extend([qid] * matched.size)
        if not out_doc:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )


def percolate(docs: ray.data.Dataset, queries: list[str]) -> ray.data.Dataset:
    """Match every (doc_id, text) row of ``docs`` against the stored
    ``queries`` — (doc_id, query_id) pairs."""
    return docs.map_batches(
        _PercolateActor,
        fn_constructor_args=(queries,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def q_percolate(sf_dir: str) -> ray.data.Dataset:
    """Percolate the documents table against the fixed query registry
    — (doc_id, query_id) conjunctive matches."""
    import os

    from ciff_ray.pipelines import QUERY_SET

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return percolate(docs, QUERY_SET)


def percolate_oracle_sql() -> str:
    from ciff_ray.pipelines import QUERY_SET
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    rows = []
    for qid, terms in parse_registry(QUERY_SET):
        for t in terms:
            rows.append(f"({qid}, '{t}', {len(terms)})")
    q_vals = ", ".join(rows)
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
q(query_id, term, n_terms) AS (VALUES {q_vals})
SELECT t.doc_id, CAST(q.query_id AS BIGINT) AS query_id
FROM tok t JOIN q ON t.term = q.term
GROUP BY t.doc_id, q.query_id, q.n_terms
HAVING count(*) = q.n_terms"""
