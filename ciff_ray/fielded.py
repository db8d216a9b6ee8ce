"""BM25F — field-weighted retrieval over CONVERSATIONS, with the turn
ROLE as the field (Zaragoza et al., "Microsoft Cambridge at TREC-13:
Web and HARD tracks", the simple-BM25F form).

The engine's other retrieval entries rank turns; a transcript corpus
usually wants the conversation as the retrieval unit with role-aware
weighting — a user's words matter more than boilerplate system
prompts.  BM25F does exactly that without double-counting k1
saturation per field:

    wtf(t, c)  = Σ_f  W_f · tf_{t,c,f} / (1 − B + B · len_{c,f} / avglen_f)
    score(q,c) = Σ_{t∈q}  idf(t) · wtf · (K1 + 1) / (K1 + wtf)

with conv-level document frequency (idf over conversations, floored
like the engine's BM25), per-field average length avglen_f =
Σ_c len_{c,f} / n_convs (field-absent convs count as 0), and weights
W = {user 2.0, assistant 1.0, system 0.5, tool 0.5}.

Distributed shape (reuses the TURN-level index — no fielded rebuild):

1. per-field collection stats: ONE pass over the docmap's doclength
   column, per-batch int64 partial sums per role → a 4-row reduce
   (avglen_f is the exact-int sum divided once, so both engines get
   bit-identical float64 stats).
2. posting slices for the workload's terms (pushed-down `term IN …`
   segment read) are decoded in an actor pool; conv and role derive
   arithmetically from the dense docID (synth.transcripts_from_documents:
   conv = doc // 8, role = doc % 4), and the FIELD length is the sum of
   the role's two turn doclengths (partner turn = same conv, doc % 8
   shifted by 4) via the shard-lazy DoclengthStore — no length shuffle
   at all.  A real deployment with arbitrary conv shapes would carry
   (conv, role) → length as a docmap column; the arithmetic stands in
   for that lookup, exactly like q_bm25_topk_filtered's role predicate.
3. `groupby(term, conv, role).sum(tf)` merges salt-split slices, a
   map_batches computes the per-field part, `groupby(term, conv).sum`
   yields wtf.  The wtf dataset is materialized ONCE — it is
   candidate-bounded (Σ_t df(t) rows, the same bound as any scoring
   run's intermediate), never corpus-sized.
4. conv-level df per term is a tiny `groupby(term).count()` over the
   wtf rows (row count = workload terms — provably small driver take),
   broadcast back as idf for the final fan-out → (query, conv) sum →
   per-query map_groups rank, identical tie-break to the engine
   (round(score, 9) desc, conv asc).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray import codecs
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.oracle import EPS_IDF
from ciff_ray.query import DoclengthStore
from ciff_ray.synth import TURNS_PER_CONV_FROM_DOCS as _TPC

# role_idx = doc_id % 4 → (user, assistant, system, tool)
FIELD_WEIGHTS = (2.0, 1.0, 0.5, 0.5)
BM25F_B = 0.4
BM25F_K1 = 0.9
TOPK_K = 10
_N_ROLES = 4


def field_length_sums(index_dir: str) -> tuple[np.ndarray, int]:
    """(int64 Σ doclen per role_idx, n_convs) — one streaming pass over
    the docmap, 4-row reduce."""
    paths = IndexPaths(index_dir)
    m = Manifest.read(paths.manifest)

    def partials(t: pa.Table) -> pa.Table:
        docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = t["doclength"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.bincount(docs % _N_ROLES, weights=dl, minlength=_N_ROLES)
        return pa.table(
            {
                "role_idx": pa.array(np.arange(_N_ROLES), type=pa.int64()),
                "s": pa.array(sums.astype(np.int64), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ray.data.read_parquet(
            paths.docmap_dir,
            file_extensions=["parquet"],
            columns=["doc_id", "doclength"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("role_idx")
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )  # exactly 4 rows
    sums = np.zeros(_N_ROLES, dtype=np.int64)
    for r in rows:
        sums[int(r["role_idx"])] = int(r["s"])
    n_convs = -(-m.num_docs // _TPC)  # dense docids → ceil
    return sums, n_convs


class _FieldTfActor:
    """Posting slices → (term, conv, role_idx, tf, len_cf) rows,
    combined in-batch.  len_cf = doclen(doc) + doclen(partner turn of
    the same (conv, role)) via the dense-docid arithmetic above."""

    def __init__(self, index_dir: str) -> None:
        paths = IndexPaths(index_dir)
        m = Manifest.read(paths.manifest)
        self._n_docs = m.num_docs
        self._dl = DoclengthStore(paths.docmap_dir, m.num_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[tuple[np.ndarray, ...]] = []
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
        tcodec = batch["tf_codec"].to_numpy(zero_copy_only=False)
        for i, term in enumerate(terms):
            df = int(dfs[i])
            gaps = codecs.decode(
                batch["doc_bytes"][i].as_py(), df - 1, int(dcodec[i])
            ).astype(np.int64)
            docs = np.empty(df, dtype=np.int64)
            docs[0] = int(firsts[i])
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += docs[0]
            tfs = codecs.decode(
                batch["tf_bytes"][i].as_py(), df, int(tcodec[i])
            ).astype(np.int64)
            conv = docs // _TPC
            role = docs % _N_ROLES
            partner = docs - (docs % _TPC) + (docs % _TPC + _N_ROLES) % _TPC
            plen = np.zeros(docs.size, dtype=np.int64)
            ok = partner < self._n_docs
            if ok.any():
                plen[ok] = self._dl[partner[ok]].astype(np.int64)
            len_cf = self._dl[docs].astype(np.int64) + plen
            out.append((np.full(docs.size, i, dtype=np.int64), conv, role, tfs, len_cf))
        if not out:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "conv": pa.array([], type=pa.int64()),
                    "role_idx": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int64()),
                    "len_cf": pa.array([], type=pa.int64()),
                }
            )
        ti = np.concatenate([o[0] for o in out])
        conv = np.concatenate([o[1] for o in out])
        role = np.concatenate([o[2] for o in out])
        tf = np.concatenate([o[3] for o in out])
        ln = np.concatenate([o[4] for o in out])
        # in-batch combine by (term, conv, role): the two partner turns
        # of a (conv, role) collapse to one row before the shuffle
        order = np.lexsort((role, conv, ti))
        ti, conv, role, tf, ln = (
            ti[order], conv[order], role[order], tf[order], ln[order]
        )
        new = np.empty(ti.size, dtype=bool)
        new[0] = True
        new[1:] = (ti[1:] != ti[:-1]) | (conv[1:] != conv[:-1]) | (
            role[1:] != role[:-1]
        )
        starts = np.flatnonzero(new)
        tf_sum = np.add.reduceat(tf, starts)
        term_col = pa.array(
            np.array(terms, dtype=object)[ti[starts]], type=pa.string()
        )
        return pa.table(
            {
                "term": term_col,
                "conv": pa.array(conv[starts], type=pa.int64()),
                "role_idx": pa.array(role[starts], type=pa.int64()),
                "tf": pa.array(tf_sum, type=pa.int64()),
                "len_cf": pa.array(ln[starts], type=pa.int64()),
            }
        )


def bm25f_topk(
    index_dir: str,
    queries: list[str],
    k: int = TOPK_K,
    concurrency=(1, 8),
    weights: tuple[float, float, float, float] = FIELD_WEIGHTS,
    b: float = BM25F_B,
    k1: float = BM25F_K1,
) -> pa.Table:
    """Conversation-level BM25F top-k for a query workload (module doc).
    ``weights`` is per role_idx (user, assistant, system, tool)."""
    from ray.data.aggregate import Max, Sum

    from ciff_ray.oracle import tokenize

    qmap: dict[str, list[int]] = {}
    for qid, q in enumerate(queries):
        for t in set(tokenize(q)):
            qmap.setdefault(t, []).append(qid)
    wl_terms = sorted(qmap)
    if not wl_terms:  # empty / all-empty workload
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "conv": pa.array([], type=pa.int64()),
                }
            )
        )

    lsums, n_convs = field_length_sums(index_dir)
    # exact-int sums divided ONCE → bit-identical avglen_f on both engines
    avglen = lsums.astype(np.float64) / float(n_convs)

    paths = IndexPaths(index_dir)
    segs = ray.data.read_parquet(
        paths.segments_dir,
        file_extensions=["parquet"],
        columns=[
            "term",
            "df",
            "first_doc",
            "doc_codec",
            "tf_codec",
            "doc_bytes",
            "tf_bytes",
        ],
        filter=pads.field("term").isin(wl_terms),
    )
    tf_rows = (
        segs.map_batches(
            _FieldTfActor,
            fn_constructor_args=(index_dir,),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby(["term", "conv", "role_idx"])
        .aggregate(
            Sum("tf", alias_name="tf"),  # salt-split slices merge here
            Max("len_cf", alias_name="len_cf"),  # identical on every slice
        )
    )

    w_arr = np.asarray(weights, dtype=np.float64)

    def field_part(t: pa.Table) -> pa.Table:
        role = t["role_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        ln = t["len_cf"].to_numpy(zero_copy_only=False).astype(np.float64)
        part = (
            w_arr[role]
            * tf
            / (1.0 - b + b * ln / avglen[role])
        )
        return pa.table(
            {
                "term": t["term"],
                "conv": t["conv"],
                "part": pa.array(part, type=pa.float64()),
            }
        )

    # candidate-bounded (Σ_t df(t) rows): materialized once, consumed
    # twice (df aggregate + scoring) without recomputing the decode
    wtf = (
        tf_rows.map_batches(field_part, batch_format="pyarrow")
        .groupby(["term", "conv"])
        .aggregate(Sum("part", alias_name="wtf"))
        .materialize()
    )

    df_rows = wtf.groupby("term").count().take_all()  # ≤ workload terms
    idf = {
        r["term"]: float(
            max(
                np.log(
                    (n_convs - r["count()"] + 0.5) / (r["count()"] + 0.5)
                ),
                EPS_IDF,
            )
        )
        for r in df_rows
    }
    bcast = ray.put(
        {
            "idf": idf,
            "qmap": {t: np.asarray(v, dtype=np.int64) for t, v in qmap.items()},
        }
    )

    def score_rows(t: pa.Table) -> pa.Table:
        """(term, conv, wtf) rows → per-query contributions, fully
        vectorized: the Python loop runs only over the ≤ workload-term
        UNIQUE terms of the batch; per-row fan-out is repeat/offset
        arithmetic."""
        bc = ray.get(bcast)
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "conv": pa.array([], type=pa.int64()),
                    "contrib": pa.array([], type=pa.float64()),
                }
            )
        terms = np.array(t["term"].to_pylist(), dtype=object)
        conv = t["conv"].to_numpy(zero_copy_only=False).astype(np.int64)
        wtf_v = t["wtf"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        idf_u = np.array([bc["idf"][x] for x in uniq], dtype=np.float64)
        contrib = idf_u[inv] * wtf_v * (k1 + 1.0) / (k1 + wtf_v)
        q_per_u = [bc["qmap"][x] for x in uniq]
        qcat = np.concatenate(q_per_u)
        cu = np.array([a.size for a in q_per_u], dtype=np.int64)
        su = np.cumsum(cu) - cu
        lens = cu[inv]
        row_of = np.repeat(np.arange(terms.size), lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        query_id = qcat[su[inv[row_of]] + pos]
        return pa.table(
            {
                "query_id": pa.array(query_id, type=pa.int64()),
                "conv": pa.array(conv[row_of], type=pa.int64()),
                "contrib": pa.array(contrib[row_of], type=pa.float64()),
            }
        )

    def rank_group(g: pa.Table) -> pa.Table:
        conv = g["conv"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["score"].to_numpy(zero_copy_only=False)
        qid = int(g["query_id"][0].as_py())
        order = np.lexsort((conv, -np.round(s, 9)))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(order.size, qid), type=pa.int64()),
                "rank": pa.array(np.arange(1, order.size + 1), type=pa.int64()),
                "conv": pa.array(conv[order], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        wtf.map_batches(score_rows, batch_format="pyarrow")
        .groupby(["query_id", "conv"])
        .aggregate(_Sum("contrib", alias_name="score"))
        .groupby("query_id")
        .map_groups(rank_group, batch_format="pyarrow")
    )
