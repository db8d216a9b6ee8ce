"""Trending terms: for each time bucket, the terms over-represented in
that bucket's traffic relative to the whole corpus — the time-sliced
sibling of the JLH significant-terms aggregation (ciff_ray.aggs), i.e.
Elasticsearch's `significant_terms` under a `date_histogram` parent:

    fg_pct = fg(b, t) / T_b       (term tokens in bucket / bucket tokens)
    bg_pct = cf(t) / T            (corpus collection freq / total tokens)
    lift(b, t) = (fg_pct - bg_pct) * (fg_pct / bg_pct)

ranked top-K per bucket under (round(lift, 9) DESC, term ASC), with an
fg >= MIN_FG noise floor (mirrored by the oracle's HAVING).

Transcript timestamps derive arithmetically from doc_id (synth rule:
ts = EPOCH + doc_id seconds), so the bucket is ``doc_id // W`` — the
same device date_histogram and recency use; a real deployment buckets
a ts column the docmap carries.

Scale shape: one tokenize pass emits PRE-AGGREGATED per-batch
(bucket, term, cnt) partials (the combiner — one lexsort + boundary
diff per batch), then ONE groupby-sum shuffle of those slim partials
(vocab x buckets rows, never token-level rows).  Bucket totals reduce
from the same aggregate; cf/T come from the index term stats inside
the scoring actor (no second corpus pass); the final per-bucket top-K
is a distributed map_groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

BUCKET_SECONDS = 60  # minute buckets of the synth ts rule (60 docs each
# at driver sf — enough buckets to differentiate, enough tokens per
# bucket for the MIN_FG floor to bind meaningfully)
MIN_FG = 5
TOP_K = 10


def _bucket_term_partials(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> pre-aggregated (bucket, term, cnt) partials."""
    from ciff_ray.tokenizer import token_ids

    empty = pa.table(
        {
            "bucket": pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    vocab, tidx, rows = token_ids(batch["text"])
    if tidx.size == 0:
        return empty
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = doc[rows] // BUCKET_SECONDS
    order = np.lexsort((tidx, bucket))
    b_s, t_s = bucket[order], tidx[order]
    boundary = np.concatenate(
        [[True], (b_s[1:] != b_s[:-1]) | (t_s[1:] != t_s[:-1])]
    )
    starts = np.flatnonzero(boundary)
    cnt = np.diff(np.concatenate([starts, [t_s.size]]))
    return pa.table(
        {
            "bucket": pa.array(b_s[starts], type=pa.int64()),
            "term": vocab.take(pa.array(t_s[starts])),
            "cnt": pa.array(cnt, type=pa.int64()),
        }
    )


class _LiftScorer:
    """map_batches actor over aggregated (bucket, term, fg) rows:
    appends the JLH lift using cf/T from the index term stats and the
    broadcast bucket-total map."""

    def __init__(self, index_dir: str, bucket_totals: dict[int, int]):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.totals = bucket_totals

    def __call__(self, batch: pa.Table) -> pa.Table:
        total = float(self.scorer.manifest.total_terms_in_collection)
        fg = batch["fg"].to_numpy(zero_copy_only=False).astype(np.float64)
        tb = np.array(
            [float(self.totals[int(b)]) for b in batch["bucket"].to_pylist()]
        )
        cf = np.array(
            [
                float(self.scorer._term_stat(t)[1])
                for t in batch["term"].to_pylist()
            ]
        )
        fg_pct = fg / tb
        bg_pct = cf / total
        lift = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        return batch.append_column("lift", pa.array(lift, type=pa.float64()))


def _rank_bucket(g: pa.Table) -> pa.Table:
    """Per-bucket top-K under (round(lift, 9) DESC, term ASC)."""
    lift = np.round(g["lift"].to_numpy(zero_copy_only=False), 9)
    terms = np.array(g["term"].to_pylist(), dtype=object)
    order = np.lexsort((terms, -lift))[:TOP_K]
    return pa.table(
        {
            "bucket": pa.array(
                g["bucket"].to_numpy(zero_copy_only=False)[order],
                type=pa.int64(),
            ),
            "rank": pa.array(range(1, len(order) + 1), type=pa.int32()),
            "term": pa.array(terms[order], type=pa.string()),
        }
    )


def q_trending_terms(sf_dir: str) -> ray.data.Dataset:
    """Top trending terms per time bucket — (bucket, rank, term)."""
    import os

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(_bucket_term_partials, batch_format="pyarrow")
        .groupby(["bucket", "term"])
        .aggregate(Sum("cnt", alias_name="fg"))
        .materialize()
    )
    # bucket totals: one more slim aggregate over the SAME table
    # (bucket-count rows — tiny), broadcast into the scorer
    totals = {
        int(r["bucket"]): int(r["tb"])
        for r in agg.groupby("bucket")
        .aggregate(Sum("fg", alias_name="tb"))
        .take_all()
    }
    return (
        agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["fg"], MIN_FG)),
            batch_format="pyarrow",
        )
        .map_batches(
            _LiftScorer,
            fn_constructor_args=(idx, totals),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("bucket")
        .map_groups(_rank_bucket, batch_format="pyarrow")
    )


def trending_terms_oracle_sql() -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
fg AS (
  SELECT doc_id // {BUCKET_SECONDS} AS bucket, term, count(*) AS fg
  FROM tok WHERE term <> '' GROUP BY bucket, term
),
tb AS (SELECT bucket, CAST(SUM(fg) AS BIGINT) AS tb FROM fg GROUP BY bucket),
cf AS (SELECT term, count(*) AS cf FROM tok WHERE term <> '' GROUP BY term),
tt AS (SELECT count(*) AS total FROM tok WHERE term <> ''),
scored AS (
  SELECT fg.bucket, fg.term,
         ((fg.fg / tb.tb) - (cf.cf / tt.total))
         * ((fg.fg / tb.tb) / (cf.cf / tt.total)) AS lift
  FROM fg
  JOIN tb USING (bucket)
  JOIN cf USING (term)
  CROSS JOIN tt
  WHERE fg.fg >= {MIN_FG}
)
SELECT bucket, CAST(rnk AS INT) AS rank, term FROM (
  SELECT bucket, term,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY round(lift, 9) DESC, term ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}"""
