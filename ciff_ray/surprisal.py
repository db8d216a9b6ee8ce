"""Per-document unigram surprisal — the classic language-model quality
score for training-data filtering (the CCNet / Wenzek et al. 2020
device: rank documents by perplexity under a corpus LM; here the LM is
the corpus's own unigram model, whose sufficient statistics — cf per
term, total token count — the index already stores because the
reference's CIFF header/posting stats carry exactly them,
pisa-engine/ciff src/lib.rs Header.total_terms_in_collection +
PostingsList cf):

    nll(d) = ( sum over terms t of d:  tf(t, d) * ln(T / cf_t) ) / dl(d)

i.e. mean per-token negative log-likelihood in nats.  Low = stopword-
heavy boilerplate, high = rare-token-dense (gibberish or genuinely
novel text); both tails are the standard filter targets.

Shape: identical to the doc-norms build (ciff_ray.tfidf) — each
document is one input row, so its complete score is computable inside
its batch: one stateless-per-doc map_batches pass over the corpus with
cf/T looked up from the index term stats inside the actor.  No shuffle
at any scale; the output is one row per document, written/streamed like
any per-doc feature column.

Every float op is {+, *, /, ln}; the output rounds to 6 dp
(``nll_r``) — the bm25_scores cross-engine float-compare device.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


class _SurprisalActor:
    """map_batches actor: (doc_id, text) -> (doc_id, dl, nll_r).
    cf/T load once per actor from the index term stats."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import token_ids

        n_rows = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vocab, tidx, rows = token_ids(batch["text"])
        total = float(self.scorer.manifest.total_terms_in_collection)
        if tidx.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.int64()),
                    "dl": pa.array(np.zeros(n_rows, np.int64), type=pa.int64()),
                    "nll_r": pa.array(np.zeros(n_rows), type=pa.float64()),
                }
            )
        # ln(T / cf) per batch-vocab entry (vocabulary-scale loop); a
        # term missing from the index means a corpus mismatch — fail
        # fast, never emit a wrong score
        surp = np.empty(len(vocab), dtype=np.float64)
        for i, t in enumerate(vocab.to_pylist()):
            st = self.scorer._term_stat(t)
            if st is None:
                raise ValueError(
                    f"term {t!r} absent from index "
                    f"{self.scorer.paths.root!r} — surprisal must be "
                    "computed over the indexed corpus"
                )
            surp[i] = np.log(total / float(st[1]))
        # token-level sum per row: nll numerator = sum tf * ln(T/cf)
        # == sum over TOKENS of ln(T/cf) (each occurrence contributes
        # once) — one bincount over the token stream, no tf pass needed
        nll = np.bincount(rows, weights=surp[tidx], minlength=n_rows)
        dl = np.bincount(rows, minlength=n_rows).astype(np.int64)
        out = np.zeros(n_rows, dtype=np.float64)
        nz = dl > 0
        out[nz] = nll[nz] / dl[nz]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "dl": pa.array(dl, type=pa.int64()),
                "nll_r": pa.array(np.round(out, 6), type=pa.float64()),
            }
        )


def q_doc_surprisal(sf_dir: str) -> ray.data.Dataset:
    """Mean per-token unigram surprisal of every document —
    (doc_id, dl, nll_r)."""
    import os

    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        _SurprisalActor,
        fn_constructor_args=(idx,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def doc_surprisal_oracle_sql() -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    # summed per TOKEN (tf * ln == repeated adds is NOT float-identical,
    # so mirror the token-level bincount: SUM over tok rows directly)
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
cf AS (SELECT term, count(*) AS cf FROM tok WHERE term <> '' GROUP BY term),
tt AS (SELECT count(*) AS total FROM tok WHERE term <> ''),
perdoc AS (
  SELECT t.doc_id, count(*) AS dl,
         SUM(ln(tt.total / cf.cf)) AS nll
  FROM tok t JOIN cf ON t.term = cf.term CROSS JOIN tt
  WHERE t.term <> ''
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(p.dl, 0) AS dl,
       round(coalesce(p.nll / p.dl, 0.0), 6) AS nll_r
FROM transcripts d LEFT JOIN perdoc p ON d.doc_id = p.doc_id"""
