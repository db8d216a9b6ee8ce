"""Approximate distinct-count sketches (HyperLogLog) over the
documents corpus — the approximate-aggregates family the reference has
no analogue for (SURVEY.md §2.6 notes the reference carries no
sketches; this is part of the engine's 100-TB toolkit: exact distinct
counts at corpus scale force a full shuffle, an HLL is one streaming
pass + a 4 KB merge).

Three scopes spanning cardinality regimes on the driver tables:

* ``terms``     — distinct vocabulary terms (small; linear-counting
  regime exercises the small-range correction)
* ``postings``  — distinct (doc_id, term) pairs
* ``shingles``  — distinct word-3-gram shingle hashes (largest)

p = 12 (m = 4096 registers, relative error ~1.04/sqrt(m) = 1.6%).
Registers are computed per batch (vectorized: one hash pass + an exact
6-step binary-search floor-log2 — float log2 would misrank values that
round up across a power-of-2 boundary), pre-reduced to at most m rows
per batch, max-merged by one small groupby.  Deterministic: fixed hash
seeds, no RNG.

Rows-only driver entry (approximate by design); the error bound and
the register-level merge associativity are pinned in
tests/test_sketch.py against exact DuckDB counts.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

SCOPES = ("terms", "postings", "shingles")


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0 (6 vectorized steps)."""
    n = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        hi = cur >> np.uint64(shift)
        gt = hi > 0
        n += np.where(gt, shift, 0)
        cur = np.where(gt, hi, cur)
    return n


def _hll_update(regs: np.ndarray, h: np.ndarray) -> None:
    """Fold 64-bit hashes into the m uint8 registers in place."""
    if h.size == 0:
        return
    bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = np.where(
        w > 0,
        (64 - HLL_P) - _floor_log2_u64(w),
        64 - HLL_P + 1,
    ).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the small-range (linear counting)
    correction; 64-bit hashes need no large-range correction."""
    m = float(HLL_M)
    E = _ALPHA * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if E <= 2.5 * m:
        V = int((regs == 0).sum())
        if V > 0:
            return m * np.log(m / V)
    return float(E)


def _mix_u64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates structured integer keys."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class _HllPartials:
    """documents batches -> per-scope register partials, pre-reduced to
    <= m rows per (scope, batch): (scope, reg, rank)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.extras.dedup import (
            _shingle_arrays,
            _shingle_u64,
            _xxhash64,
        )
        from ciff_ray.tokenizer import term_frequencies

        n = len(batch)
        local = batch.append_column(
            "_row", pa.array(np.arange(n, dtype=np.int64))
        ).select(["_row", "text"])
        tf = term_frequencies(local, id_col="_row")
        terms = tf["term"].combine_chunks()
        th = _xxhash64(terms, seed=0x5EED_0001)
        rows = tf["_row"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_ids = (
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        # posting identity = mix(doc_hash ^ term_hash): doc_id must be
        # the GLOBAL id so partials merge across batches
        ph = _mix_u64(_mix_u64(doc_ids[rows.astype(np.int64)]) ^ th)
        sh, _parents = _shingle_arrays(batch)
        shh = _shingle_u64(sh)

        out_scope, out_reg, out_rank = [], [], []
        for scope, h in (
            ("terms", th),
            ("postings", ph),
            ("shingles", shh),
        ):
            regs = np.zeros(HLL_M, dtype=np.uint8)
            _hll_update(regs, np.ascontiguousarray(h, dtype=np.uint64))
            nz = np.flatnonzero(regs)
            out_scope.extend([scope] * nz.size)
            out_reg.extend(nz.tolist())
            out_rank.extend(regs[nz].tolist())
        return pa.table(
            {
                "scope": pa.array(out_scope, type=pa.string()),
                "reg": pa.array(out_reg, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def _hll_final(group: pa.Table) -> pa.Table:
    scope = group["scope"][0].as_py()
    regs = np.zeros(HLL_M, dtype=np.uint8)
    reg = group["reg"].to_numpy(zero_copy_only=False)
    rank = group["rank"].to_numpy(zero_copy_only=False).astype(np.uint8)
    np.maximum.at(regs, reg, rank)
    return pa.table(
        {
            "scope": pa.array([scope], type=pa.string()),
            "n_est": pa.array(
                [int(round(hll_estimate(regs)))], type=pa.int64()
            ),
        }
    )


def q_approx_distinct(sf_dir: str) -> ray.data.Dataset:
    """HLL distinct-count estimates (scope, n_est) for vocabulary
    terms, postings, and word-3-gram shingles — one streaming pass,
    partials <= m rows per batch, one tiny groupby merge."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return (
        docs.map_batches(
            _HllPartials, batch_format="pyarrow", concurrency=(1, 4)
        )
        .groupby("scope")
        .map_groups(_hll_final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# certified-exact top-K frequent terms (Misra-Gries screen + verify)
#
# The streaming-top-K shape (cf. "Top-K Frequent Term Queries on
# Streaming Data", ICDE 2019): pass 1 builds a MERGEABLE Misra-Gries
# summary (per-batch exact counts pruned to MG_CAP with the subtract
# rule; every prune adds its subtracted value to an explicit error
# budget B, so for every term true-B <= est <= true and any term
# OUTSIDE the summary has true <= B).  Pass 2 exactly counts the <=
# MG_CAP candidates (broadcast set, one streaming is_in pass).  If the
# K-th exact candidate count >= B the top-K is PROVABLY exact (any
# non-candidate is <= B); otherwise the query falls back to the full
# exact aggregation — the result is exact either way, which is what
# lets it carry a plain SQL oracle.

MG_CAP = 64
TOPK_TERMS = 10


def _mg_prune(
    terms: np.ndarray, counts: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Prune a summary to <= cap counters via the Misra-Gries subtract
    rule; returns (terms, counts, subtracted)."""
    if terms.size <= cap:
        return terms, counts, 0
    kth = np.partition(counts, counts.size - cap - 1)[counts.size - cap - 1]
    kept = counts - kth
    keep = kept > 0
    return terms[keep], kept[keep], int(kth)


def _mg_partials(batch: pa.Table) -> pa.Table:
    """One documents batch -> its pruned MG summary rows (term, est);
    the batch's token count and prune-subtracted value ride as two
    sentinel rows (term '' and '\\x01' — neither can be a real token,
    the tokenizer never emits empties or control chars)."""
    from ciff_ray.tokenizer import token_ids

    term_dict, idx, _rows = token_ids(batch["text"])
    n_tok = int(idx.size)
    if n_tok == 0:
        terms = np.empty(0, dtype=object)
        counts = np.empty(0, dtype=np.int64)
        sub = 0
    else:
        counts = np.bincount(idx, minlength=len(term_dict)).astype(np.int64)
        terms = np.array(term_dict.to_pylist(), dtype=object)
        terms, counts, sub = _mg_prune(terms, counts, MG_CAP)
    out_terms = np.concatenate([terms, ["", "\x01"]])
    out_counts = np.concatenate([counts, [n_tok, sub]]).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(out_terms.tolist(), type=pa.string()),
            "est": pa.array(out_counts, type=pa.int64()),
        }
    )


class _ExactCountStage:
    """Pass 2: exact per-batch counts of the broadcast candidate set."""

    def __init__(self, cand_ref):
        self.cands = ray.get(cand_ref)  # sorted numpy object array

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.tokenizer import token_ids

        term_dict, idx, _rows = token_ids(batch["text"])
        if len(term_dict) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "cf": pa.array([], type=pa.int64()),
                }
            )
        counts = np.bincount(idx, minlength=len(term_dict)).astype(np.int64)
        terms = np.array(term_dict.to_pylist(), dtype=object)
        pos = np.searchsorted(self.cands, terms)
        pos_c = np.minimum(pos, max(self.cands.size - 1, 0))
        hit = (self.cands[pos_c] == terms) if self.cands.size else np.zeros(
            terms.size, bool
        )
        return pa.table(
            {
                "term": pa.array(terms[hit].tolist(), type=pa.string()),
                "cf": pa.array(counts[hit], type=pa.int64()),
            }
        )


def q_top_terms(sf_dir: str) -> pa.Table:
    """EXACT global top-{TOPK_TERMS} terms by collection frequency
    (rank, term, cf), computed via the certified Misra-Gries screen —
    and via the full exact aggregation only if the certificate ever
    fails (it cannot on Zipf-shaped text with MG_CAP >> K)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    rows = docs.map_batches(
        _mg_partials, batch_format="pyarrow"
    ).take_all()
    # driver merge: sum ests by term, accumulate the error budget
    agg: dict[str, int] = {}
    budget = 0
    for r in rows:
        t = r["term"]
        if t == "":
            continue
        elif t == "\x01":
            budget += int(r["est"])
        else:
            agg[t] = agg.get(t, 0) + int(r["est"])
    terms = np.array(list(agg.keys()), dtype=object)
    ests = np.array(list(agg.values()), dtype=np.int64)
    terms, ests, sub = _mg_prune(terms, ests, MG_CAP)
    budget += sub
    order = np.argsort(terms)
    cand_ref = ray.put(terms[order])
    parts = docs.map_batches(
        _ExactCountStage,
        fn_constructor_args=(cand_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).take_all()
    exact: dict[str, int] = {}
    for r in parts:
        exact[r["term"]] = exact.get(r["term"], 0) + int(r["cf"])
    ranked = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    top = ranked[:TOPK_TERMS]
    # STRICT: a non-candidate's true count can EQUAL budget, and a
    # lexicographically-smaller tie would belong in the top-K
    certified = len(top) == TOPK_TERMS and top[-1][1] > budget
    if not certified:
        # exact fallback: full (term, cf) aggregation, STREAMED top-K —
        # after groupby every term lives in exactly one output block, so
        # a per-block top-K under the final (cf desc, term asc) key is a
        # superset of the global top-K (classic distributed top-k); the
        # driver merges <= K rows per block, never the vocabulary
        from ray.data.aggregate import Sum

        parts = (
            docs.map_batches(_exact_tf_rows, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("cf", alias_name="cf"))
            .map_batches(_block_top_terms, batch_format="pyarrow")
            .take_all()
        )
        _DIAG["fallback_rows"] = len(parts)  # driver-merge size audit
        ranked = sorted(
            ((r["term"], int(r["cf"])) for r in parts),
            key=lambda kv: (-kv[1], kv[0]),
        )
        top = ranked[:TOPK_TERMS]
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(top) + 1, dtype=np.int64), type=pa.int64()
            ),
            "term": pa.array([t for t, _ in top], type=pa.string()),
            "cf": pa.array([c for _, c in top], type=pa.int64()),
        }
    )


# diagnostics for tests / scale audits: how many rows the exact
# fallback's driver merge actually received (must be ~TOPK_TERMS x
# blocks, never the vocabulary)
_DIAG: dict[str, int | None] = {"fallback_rows": None}


def _block_top_terms(batch: pa.Table) -> pa.Table:
    """Per-block top-{TOPK_TERMS} (term, cf) rows under the final
    (cf desc, term asc) key.  Exact: each term appears in one block
    post-groupby, and a global-top-K row is in the top-K of ANY set
    containing it, so it survives its own block's cut."""
    if batch.num_rows <= TOPK_TERMS:
        return batch.select(["term", "cf"])
    cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.array(batch["term"].to_pylist(), dtype=object)
    keep = np.lexsort((terms, -cf))[:TOPK_TERMS]
    return pa.table(
        {
            "term": pa.array(terms[keep].tolist(), type=pa.string()),
            "cf": pa.array(cf[keep], type=pa.int64()),
        }
    )


def _exact_tf_rows(batch: pa.Table) -> pa.Table:
    from ciff_ray.tokenizer import token_ids

    term_dict, idx, _rows = token_ids(batch["text"])
    if len(term_dict) == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "cf": pa.array([], type=pa.int64()),
            }
        )
    counts = np.bincount(idx, minlength=len(term_dict)).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(term_dict, type=pa.string()),
            "cf": pa.array(counts, type=pa.int64()),
        }
    )


TOP_TERMS_SQL = f"""SELECT CAST(rnk AS BIGINT) AS rank, term, cf FROM (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
         row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rnk
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  ) WHERE term <> '' GROUP BY term
) WHERE rnk <= {TOPK_TERMS}"""




# ---------------------------------------------------------------------------
# t-digest quantile sketch (events.value) — the mergeable-quantiles leg of
# the sketch family (HLL = distinct counts, Misra-Gries = heavy hitters,
# t-digest = quantiles).  Exact quantiles need a full sort (all-to-all at
# 100 TB); the digest is one streaming pass emitting <= ~DELTA centroids
# per (block, scope), merged by a tiny groupby.
#
# Batch "merging digest" construction (Dunning & Ertl, arXiv:1902.04023,
# public algorithm): sort points/centroids by mean, compute each item's
# center quantile q, bin by the k1 scale function
# k(q) = (delta/2pi) * asin(2q-1), and fuse consecutive items that share a
# k-bin — clusters stay small near the tails (accurate p99) and coarse in
# the middle.  Fully vectorized: argsort + cumsum + reduceat, no Python
# loop over points; merging two digests is the same routine on the
# concatenated centroid arrays, so partials are associative enough for a
# distributed tree (order-dependence only redistributes the APPROXIMATION,
# the rank-error bound is partition-independent — pinned in
# tests/test_sketch.py).
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 200
TD_QUANTILES = (0.01, 0.10, 0.50, 0.90, 0.99)


def td_compress(
    means: np.ndarray, weights: np.ndarray, delta: int = TDIGEST_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse (means, weights) into <= O(delta) centroids (k1 scale)."""
    if means.size == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    m = means[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    total = w.sum()
    q_center = (np.cumsum(w) - w / 2.0) / total
    k = delta * (np.arcsin(2.0 * q_center - 1.0) / np.pi + 0.5)
    bins = np.floor(k).astype(np.int64)
    starts = np.concatenate([[0], np.nonzero(np.diff(bins))[0] + 1])
    gw = np.add.reduceat(w, starts)
    gm = np.add.reduceat(m * w, starts) / gw
    return gm, gw


def td_quantiles(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    qs: tuple[float, ...] = TD_QUANTILES,
) -> np.ndarray:
    """Interpolated quantile estimates from a digest: piecewise-linear
    CDF through the centroid means at their center ranks, clamped to
    the exact [min, max] carried alongside the digest."""
    if means.size == 0:
        return np.full(len(qs), np.nan)
    total = weights.sum()
    centers = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate([[0.0], centers, [total]])
    ys = np.concatenate([[vmin], means, [vmax]])
    return np.interp(np.asarray(qs) * total, xs, ys)


_TD_PARTIAL_SCHEMA = pa.schema(
    [
        ("scope", pa.string()),
        ("means", pa.large_list(pa.float64())),
        ("weights", pa.large_list(pa.float64())),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
    ]
)


def _td_partials(batch: pa.Table) -> pa.Table:
    """events batch -> one digest row per event_type present (plus the
    \'all\' scope): <= ~TDIGEST_DELTA centroids each."""
    vals = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    types = batch["event_type"].to_numpy(zero_copy_only=False)
    rows_scope, rows_m, rows_w, rows_lo, rows_hi = [], [], [], [], []

    def emit(scope: str, v: np.ndarray) -> None:
        gm, gw = td_compress(v, np.ones_like(v))
        rows_scope.append(scope)
        rows_m.append(gm)
        rows_w.append(gw)
        rows_lo.append(float(v.min()))
        rows_hi.append(float(v.max()))

    if vals.size:
        emit("all", vals)
        order = np.argsort(types, kind="stable")
        st, sv = types[order], vals[order]
        starts = np.concatenate(
            [[0], np.nonzero(st[1:] != st[:-1])[0] + 1]
        )
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < starts.size else st.size
            emit(str(st[s]), sv[s:e])
    return pa.table(
        {
            "scope": pa.array(rows_scope, type=pa.string()),
            "means": pa.array(rows_m, type=pa.large_list(pa.float64())),
            "weights": pa.array(rows_w, type=pa.large_list(pa.float64())),
            "vmin": pa.array(rows_lo, type=pa.float64()),
            "vmax": pa.array(rows_hi, type=pa.float64()),
        },
        schema=_TD_PARTIAL_SCHEMA,
    )


def _td_final(group: pa.Table) -> pa.Table:
    """Merge one scope\'s partial digests and emit quantile rows."""
    means_col = group["means"].combine_chunks()
    w_col = group["weights"].combine_chunks()
    m = np.asarray(means_col.values, dtype=np.float64)
    w = np.asarray(w_col.values, dtype=np.float64)
    gm, gw = td_compress(m, w)
    vmin = float(np.min(group["vmin"].to_numpy(zero_copy_only=False)))
    vmax = float(np.max(group["vmax"].to_numpy(zero_copy_only=False)))
    est = td_quantiles(gm, gw, vmin, vmax)
    scope = group["scope"][0].as_py()
    return pa.table(
        {
            "scope": pa.array([scope] * len(TD_QUANTILES), type=pa.string()),
            "q": pa.array(list(TD_QUANTILES), type=pa.float64()),
            "est": pa.array(est, type=pa.float64()),
            "n": pa.array(
                [int(round(gw.sum()))] * len(TD_QUANTILES), type=pa.int64()
            ),
        }
    )


def q_quantile_sketch(sf_dir: str) -> ray.data.Dataset:
    """Distributed t-digest over events.value, per event_type plus an
    \'all\' scope -> (scope, q, est, n).  Rows-only driver entry
    (approximate by design); the rank-error bound vs exact quantiles is
    pinned in tests/test_sketch.py."""
    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(_td_partials, batch_format="pyarrow")
        .groupby("scope")
        .map_groups(_td_final, batch_format="pyarrow")
    )




# ---------------------------------------------------------------------------
# EXACT distributed quantiles without a full sort: t-digest bracket +
# one refinement pass.  The classic scale move — an exact quantile of a
# 100 TB column via sort/percentile is an all-to-all shuffle; instead:
#   pass A: merged t-digest per scope (tiny partials, driver merge),
#   bracket [est(q - delta), est(q + delta)] around each target — the
#     digest\'s measured rank error (~1e-4, pinned <= 5e-3 in tests) makes
#     delta = 0.01 a safe over-cover,
#   pass B: one map_batches computing, per (scope, q): exact
#     count(v < lo) plus the values INSIDE the bracket (~2*delta*N rows,
#     the only data that ever reaches the driver),
#   driver: the global rank-r order statistic (r = ceil(q*n), DuckDB
#     quantile_disc semantics) = the (r - count_below)-th smallest
#     bracket value, via np.partition.  If a bracket under-covers
#     (cannot happen within the pinned error bound, but guarded anyway)
#     the pass retries with delta doubled.
# Result is an actual element of the column -> bit-identical to the SQL
# oracle, hash-green, not approximate.
# ---------------------------------------------------------------------------

EXACT_QS = (0.5, 0.9, 0.99)
_BRACKET_DELTA = 0.01


def _merged_digests(sf_dir: str) -> dict[str, tuple]:
    """scope -> (means, weights, vmin, vmax, n) from pass-A partials."""
    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(_td_partials, batch_format="pyarrow")
        .take_all()
    )  # bounded: blocks x scopes x <=~DELTA centroids
    acc: dict[str, list] = {}
    for r in rows:
        a = acc.setdefault(r["scope"], [[], [], np.inf, -np.inf])
        a[0].append(np.asarray(r["means"], dtype=np.float64))
        a[1].append(np.asarray(r["weights"], dtype=np.float64))
        a[2] = min(a[2], r["vmin"])
        a[3] = max(a[3], r["vmax"])
    out = {}
    for scope, (ms, ws, lo, hi) in acc.items():
        gm, gw = td_compress(np.concatenate(ms), np.concatenate(ws))
        out[scope] = (gm, gw, lo, hi, int(round(gw.sum())))
    return out


def _bracket_pass(sf_dir: str, brackets: dict) -> dict:
    """(scope, qi) -> (n_below_lo, bracket values) in ONE scan.
    `brackets`: (scope, qi) -> (lo, hi)."""

    def blk(batch: pa.Table) -> pa.Table:
        vals = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        ks, nb, bv = [], [], []
        for (scope, qi), (lo, hi) in brackets.items():
            v = vals if scope == "all" else vals[types == scope]
            ks.append(f"{scope}\x00{qi}")
            nb.append(int((v < lo).sum()))
            bv.append(v[(v >= lo) & (v <= hi)])
        return pa.table(
            {
                "k": pa.array(ks, type=pa.string()),
                "n_below": pa.array(nb, type=pa.int64()),
                "vals": pa.array(bv, type=pa.large_list(pa.float64())),
            }
        )

    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(blk, batch_format="pyarrow")
        .take_all()
    )  # bounded: ~2*delta*N values per (scope, q)
    out: dict = {}
    for r in rows:
        scope, qi = r["k"].split("\x00")
        key = (scope, int(qi))
        nb, vs = out.setdefault(key, [0, []])
        out[key][0] += r["n_below"]
        out[key][1].append(np.asarray(r["vals"], dtype=np.float64))
    return out


def q_exact_quantiles(sf_dir: str) -> "pd.DataFrame":
    """Exact per-scope quantiles of events.value (DuckDB quantile_disc
    semantics: the element at 1-based rank ceil(q*n)) with no full
    sort: digest-bracketed order-statistic refinement."""
    import pandas as pd

    digests = _merged_digests(sf_dir)
    delta = _BRACKET_DELTA
    pending = {
        (scope, qi)
        for scope in digests
        for qi in range(len(EXACT_QS))
    }
    results: dict = {}
    for _attempt in range(6):
        if not pending:
            break
        brackets = {}
        for scope, qi in pending:
            gm, gw, vmin, vmax, n = digests[scope]
            q = EXACT_QS[qi]
            lo, hi = td_quantiles(
                gm, gw, vmin, vmax, (max(q - delta, 0.0), min(q + delta, 1.0))
            )
            brackets[(scope, qi)] = (float(lo), float(hi))
        got = _bracket_pass(sf_dir, brackets)
        still = set()
        for key, (n_below, parts) in got.items():
            scope, qi = key
            n = digests[scope][4]
            r = max(1, int(np.ceil(EXACT_QS[qi] * n)))  # 1-based target rank
            vals = np.concatenate(parts) if parts else np.empty(0)
            idx = r - n_below - 1
            if 0 <= idx < vals.size:
                results[key] = float(np.partition(vals, idx)[idx])
            else:  # bracket under-covered: widen and retry
                still.add(key)
        pending = still
        delta *= 2.0
    if pending:
        raise RuntimeError(f"quantile brackets failed to converge: {pending}")
    rows = [
        {"scope": scope, "q": EXACT_QS[qi], "val": v}
        for (scope, qi), v in sorted(results.items())
    ]
    return pd.DataFrame(rows)


_EQ_LIST = "[" + ", ".join(str(q) for q in EXACT_QS) + "]"

EXACT_QUANTILES_SQL = f"""
WITH alls AS (
  SELECT 'all' AS scope, unnest({_EQ_LIST}) AS q,
         unnest(quantile_disc(value, {_EQ_LIST})) AS val
  FROM events
),
byt AS (
  SELECT event_type AS scope, unnest({_EQ_LIST}) AS q,
         unnest(quantile_disc(value, {_EQ_LIST})) AS val
  FROM events GROUP BY event_type
)
SELECT * FROM alls UNION ALL SELECT * FROM byt"""




# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimates over the full term stream in one pass with a fixed
# CMS_D x CMS_W counter grid.  Completes the mergeable-sketch family
# (HLL = distinct counts, Misra-Gries = heavy hitters + exact verify,
# t-digest = quantiles, CMS = arbitrary point lookups): at 100 TB an
# exact per-term count table is vocabulary-sized state through a
# shuffle; a CMS is CMS_D*CMS_W*8 bytes per block, merged by elementwise
# SUM (one tiny groupby), with the one-sided guarantee
#   true <= est <= true + eps*TOTAL  w.p. 1 - delta,
# eps = e/CMS_W, delta = e^-CMS_D — pinned in tests/test_sketch.py
# against exact DuckDB counts.
# ---------------------------------------------------------------------------

CMS_D = 4  # rows (delta = e^-4 ~ 1.8%)
CMS_W = 1 << 14  # columns (eps = e/16384 ~ 1.7e-4 of total mass)
_CMS_SEEDS = np.array([0xA5A5, 0x5A5A, 0xC3C3, 0x3C3C], dtype=np.uint64)


def _cms_rows(terms: pa.Array) -> np.ndarray:
    """(CMS_D, n) column indices for a term array (vectorized xxhash
    per seed — C-speed over the Arrow buffers)."""
    import polars as pl

    s = pl.from_arrow(terms)
    return np.stack(
        [
            s.hash(seed=int(seed)).to_numpy().astype(np.uint64)
            & np.uint64(CMS_W - 1)
            for seed in _CMS_SEEDS
        ]
    ).astype(np.int64)


def _cms_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> one flattened CMS_D*CMS_W counter row."""
    from ciff_ray.tokenizer import token_ids

    term_dict, idx, _rows = token_ids(batch["text"])
    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(term_dict):
        counts = np.bincount(idx, minlength=len(term_dict)).astype(np.int64)
        cols = _cms_rows(pa.array(term_dict, type=pa.string()))
        for d in range(CMS_D):  # CMS_D=4 iterations, vectorized inside
            np.add.at(grid[d], cols[d], counts)
    return pa.table(
        {
            "k": pa.array([0], type=pa.int64()),
            "grid": pa.array([grid.ravel()], type=pa.large_list(pa.int64())),
            "total": pa.array(
                [int(np.bincount(idx).sum()) if len(term_dict) else 0],
                type=pa.int64(),
            ),
        }
    )


def cms_build(sf_dir: str) -> tuple[np.ndarray, int]:
    """Merged (CMS_D, CMS_W) grid + exact total token count."""
    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        .map_batches(_cms_partial, batch_format="pyarrow")
        .take_all()
    )  # bounded: one 512 KiB grid per block
    grid = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    total = 0
    for r in rows:
        grid += np.asarray(r["grid"], dtype=np.int64)
        total += int(r["total"])
    return grid.reshape(CMS_D, CMS_W), total


def cms_query(grid: np.ndarray, terms: list[str]) -> np.ndarray:
    """Point-frequency estimates: min over the CMS_D rows."""
    if not terms:
        return np.empty(0, dtype=np.int64)
    cols = _cms_rows(pa.array(terms, type=pa.string()))
    return np.min(
        np.stack([grid[d][cols[d]] for d in range(CMS_D)]), axis=0
    ).astype(np.int64)


CMS_PROBE_TERMS = (
    "the", "a", "table", "spark", "vector", "window", "merge",
    "customer", "zzznotaterm",
)


def q_term_freq_cms(sf_dir: str):
    """CMS point estimates for a fixed probe set -> (term, est, total).
    Rows-only driver entry (one-sided approximate by construction); the
    true <= est <= true + eps*total guarantee is pinned in
    tests/test_sketch.py against exact DuckDB counts."""
    import pandas as pd

    grid, total = cms_build(sf_dir)
    est = cms_query(grid, list(CMS_PROBE_TERMS))
    return pd.DataFrame(
        {
            "term": list(CMS_PROBE_TERMS),
            "est": est,
            "total": [total] * len(CMS_PROBE_TERMS),
        }
    )


QUERIES = {
    "approx_distinct": q_approx_distinct,  # rows-only (approximate)
    "top_terms": q_top_terms,
    "quantile_sketch": q_quantile_sketch,  # rows-only (approximate)
    "exact_quantiles": q_exact_quantiles,
    "term_freq_cms": q_term_freq_cms,  # rows-only (one-sided approx)
}
ORACLE_SQLS: dict[str, str] = {
    "top_terms": TOP_TERMS_SQL,
    "exact_quantiles": EXACT_QUANTILES_SQL,
}
