"""Query continuation suggestions: for each query's LAST term, the
most frequent FOLLOWING terms in the corpus — the bigram-continuation
half of search-as-you-type (the other half, prefix completion of the
term being typed, is pipelines.q_term_suggest; together they are the
standard suggester pair).

    score(lead, t) = count of adjacent occurrences "lead t" in the
    corpus token stream (within a document; the [^a-z0-9]+ tokenizer's
    adjacency, the same definition the phrase/span entries use)

ranked top-K per query by (count DESC, term ASC) — integer counts, so
the gate compares exact values.

Scale shape: the lead-term set (|Q| strings) broadcasts into a
stateless one-pass combiner over the corpus — each batch emits
pre-aggregated (lead, term, cnt) partials for ADJACENT pairs whose
first element is a lead term (everything else is dropped before the
exchange), then one groupby-sum of those slim rows and a driver-small
rank.  Nothing vocabulary- or corpus-sized moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TOP_K = 10


def _continuation_partials(batch: pa.Table, leads: set[str]) -> pa.Table:
    """(doc_id, text) -> pre-aggregated (lead, term, cnt) partials over
    adjacent in-document token pairs whose first token is a lead."""
    from ciff_ray.tokenizer import token_ids

    empty = pa.table(
        {
            "lead": pa.array([], type=pa.string()),
            "term": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    vocab, tidx, rows = token_ids(batch["text"])
    n = tidx.size
    if n < 2:
        return empty
    vl = vocab.to_pylist()
    lead_vids = np.array(
        [i for i, t in enumerate(vl) if t in leads], dtype=np.int64
    )
    if lead_vids.size == 0:
        return empty
    is_lead = np.zeros(len(vl), dtype=bool)
    is_lead[lead_vids] = True
    # adjacent pairs: consecutive tokens of the SAME row
    a, b = tidx[:-1], tidx[1:]
    keep = (rows[:-1] == rows[1:]) & is_lead[a]
    if not keep.any():
        return empty
    a, b = a[keep], b[keep]
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    boundary = np.concatenate(
        [[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    )
    starts = np.flatnonzero(boundary)
    cnt = np.diff(np.concatenate([starts, [a_s.size]]))
    return pa.table(
        {
            "lead": vocab.take(pa.array(a_s[starts])),
            "term": vocab.take(pa.array(b_s[starts])),
            "cnt": pa.array(cnt, type=pa.int64()),
        }
    )


def q_suggest_next_term(sf_dir: str) -> pa.Table:
    """Top next-term continuations of each query's last term —
    (query_id, rank, term, cnt)."""
    import os

    from ray.data.aggregate import Sum

    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET

    lead_of = {}
    for qid, q in enumerate(QUERY_SET):
        toks = tokenize(q)
        if toks:
            lead_of[qid] = toks[-1]
    leads = set(lead_of.values())
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(
            lambda t, leads=leads: _continuation_partials(t, leads),
            batch_format="pyarrow",
        )
        .groupby(["lead", "term"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # |leads| x continuations rows — driver-small by construction
    by_lead: dict[str, list[tuple[int, str]]] = {}
    for r in agg:
        by_lead.setdefault(r["lead"], []).append((int(r["cnt"]), r["term"]))
    out_q, out_r, out_t, out_c = [], [], [], []
    for qid in sorted(lead_of):
        cands = by_lead.get(lead_of[qid], [])
        cands.sort(key=lambda x: (-x[0], x[1]))
        for rank, (c, t) in enumerate(cands[:TOP_K], start=1):
            out_q.append(qid)
            out_r.append(rank)
            out_t.append(t)
            out_c.append(c)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int32()),
            "term": pa.array(out_t, type=pa.string()),
            "cnt": pa.array(out_c, type=pa.int64()),
        }
    )


def suggest_next_term_oracle_sql() -> str:
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    q_vals = ", ".join(
        f"({qid}, '{tokenize(q)[-1]}')"
        for qid, q in enumerate(QUERY_SET)
        if tokenize(q)
    )
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
q(query_id, lead) AS (VALUES {q_vals}),
pairs AS (
  SELECT a.term AS lead, b.term AS term, count(*) AS cnt
  FROM tokpos a
  JOIN tokpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN (SELECT DISTINCT lead FROM q)
  GROUP BY a.term, b.term
)
SELECT query_id, CAST(rnk AS INT) AS rank, term, cnt FROM (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, p.term, p.cnt,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY p.cnt DESC, p.term ASC) AS rnk
  FROM q JOIN pairs p ON p.lead = q.lead
) WHERE rnk <= {TOP_K}"""
