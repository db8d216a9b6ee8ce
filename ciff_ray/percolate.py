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
once), INVERTED into term -> queries adjacency (exactly the engine's
own index structure, built once per actor).  The document stream is
one stateless map_batches pass: tokenize the batch, keep only tokens
that are registry terms, reduce to DISTINCT (row, term) pairs, expand
each through the adjacency, and count satisfied terms per (row,
query); a query matches where its full term count is satisfied.
Every step is a vectorized composite-key unique/bincount — cost per
batch is O(tokens + matched (row, term) pairs x avg queries per
term), independent of |registry| itself, so a million-rule registry
costs what its actually-hit rules cost.  No shuffle, nothing
corpus-sized anywhere.

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
    pairs.  The registry parses + inverts once per actor."""

    def __init__(self, queries: list[str]):
        registry = [(qid, ts) for qid, ts in parse_registry(queries) if ts]
        # invert: registry term -> CSR adjacency of registry rows
        self.tid_of: dict[str, int] = {}
        adj: list[list[int]] = []
        for r, (_, terms) in enumerate(registry):
            for t in terms:
                tid = self.tid_of.setdefault(t, len(adj))
                if tid == len(adj):
                    adj.append([])
                adj[tid].append(r)
        counts = np.array([len(a) for a in adj], dtype=np.int64)
        self.offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.qrows = (
            np.concatenate([np.asarray(a, dtype=np.int64) for a in adj])
            if adj
            else np.empty(0, np.int64)
        )
        self.reg_qid = np.array([qid for qid, _ in registry], dtype=np.int64)
        self.need = np.array(
            [len(terms) for _, terms in registry], dtype=np.int64
        )
        self.n_tids = len(adj)
        self.n_reg = len(registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import token_ids

        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
        if self.n_reg == 0:
            return empty
        vocab, tidx, rows = token_ids(batch["text"])
        if tidx.size == 0:
            return empty
        # batch-vocab -> registry term id (-1 = not a registry term);
        # vocabulary-scale loop, the only per-string work in the pass
        vtid = np.array(
            [self.tid_of.get(t, -1) for t in vocab.to_pylist()],
            dtype=np.int64,
        )
        vt = vtid[tidx]
        mask = vt >= 0
        if not mask.any():
            return empty
        # distinct (row, registry-term) pairs via one composite unique
        key = rows[mask] * np.int64(self.n_tids) + vt[mask]
        key = np.unique(key)
        rr, tt = key // self.n_tids, key % self.n_tids
        # expand each pair through the term's adjacency slice (CSR
        # gather: pure arithmetic, no Python loop)
        lens = self.offs[tt + 1] - self.offs[tt]
        if int(lens.sum()) == 0:
            return empty
        starts = np.repeat(self.offs[tt], lens)
        local = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        reg_exp = self.qrows[starts + local]
        rows_exp = np.repeat(rr, lens)
        # satisfied-term count per (row, registry row): a query matches
        # where the count equals its full term count
        key2, cnt2 = np.unique(
            rows_exp * np.int64(self.n_reg) + reg_exp, return_counts=True
        )
        reg2 = key2 % self.n_reg
        hit = cnt2 == self.need[reg2]
        if not hit.any():
            return empty
        return pa.table(
            {
                "doc_id": pa.array(
                    doc_ids[(key2[hit] // self.n_reg)], type=pa.int64()
                ),
                "query_id": pa.array(self.reg_qid[reg2[hit]], type=pa.int64()),
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


class _PhrasePercolateActor:
    """map_batches actor: (doc_id, text) -> (doc_id, query_id) EXACT
    PHRASE matches against a registry of stored phrases.  Two stages,
    both in-batch: the inverted conjunctive screen (a phrase's terms
    must all be present — _PercolateActor verbatim), then one
    vectorized adjacency regex per rule over ONLY that rule's candidate
    rows (the same token-boundary RE2 the phrase_match entry and its
    SQL oracle share, pipelines._phrase_regex)."""

    def __init__(self, phrases: list[str]):
        from ciff_ray.oracle import tokenize
        from ciff_ray.pipelines import _phrase_regex

        self.screen = _PercolateActor(phrases)
        self.pattern_of = {
            qid: _phrase_regex(tokenize(p))
            for qid, p in enumerate(phrases)
            if tokenize(p)
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cand = self.screen(batch)
        if cand.num_rows == 0:
            return cand
        batch_docs = (
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.argsort(batch_docs)
        low = pc.utf8_lower(batch["text"].combine_chunks())
        c_doc = cand["doc_id"].to_numpy(zero_copy_only=False)
        c_qid = cand["query_id"].to_numpy(zero_copy_only=False)
        rows = order[np.searchsorted(batch_docs[order], c_doc)]
        out_doc, out_q = [], []
        for qid in np.unique(c_qid):
            m = c_qid == qid
            sub = rows[m]
            hit = pc.match_substring_regex(
                low.take(pa.array(sub)), self.pattern_of[int(qid)]
            ).to_numpy(zero_copy_only=False)
            if hit.any():
                out_doc.extend(c_doc[m][hit].tolist())
                out_q.extend([int(qid)] * int(hit.sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )


def percolate_phrases(
    docs: ray.data.Dataset, phrases: list[str]
) -> ray.data.Dataset:
    """Match every (doc_id, text) row against stored EXACT PHRASES —
    (doc_id, query_id) pairs."""
    return docs.map_batches(
        _PhrasePercolateActor,
        fn_constructor_args=(phrases,),
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


def q_percolate_phrase(sf_dir: str) -> ray.data.Dataset:
    """Percolate the documents table against the stored PHRASE
    registry (pipelines.PHRASE_SET) — (doc_id, query_id) exact
    adjacency matches."""
    import os

    from ciff_ray.pipelines import PHRASE_SET

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return percolate_phrases(docs, PHRASE_SET)


def percolate_phrase_oracle_sql() -> str:
    from ciff_ray.pipelines import _phrase_query_values
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
q(query_id, pattern) AS (VALUES {_phrase_query_values()})
SELECT t.doc_id, CAST(q.query_id AS BIGINT) AS query_id
FROM transcripts t
JOIN q ON regexp_matches(lower(t.text), q.pattern)"""


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
