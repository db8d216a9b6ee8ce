"""Text analysis over the `documents` table: token counting, quality
scoring, language-ID (stopword heuristic), document fingerprinting
(winnowing over a rolling token-hash stream).

Every stage is a pure vectorized `map_batches` body over zero-copy
Arrow batches; the tokenizer rule is shared with ciff_ray.tokenizer so
the DuckDB oracles tokenize bit-identically (RE2 on both sides).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ciff_ray.tokenizer import tokenize_column

# Whitespace / subword-piece patterns — spelled with explicit character
# classes so pyarrow-RE2 and DuckDB-RE2 agree exactly.
WS_PATTERN = r"[ \t\n\r]+"
ALPHA_RUN_SPLIT = r"[^a-z]+"
DIGIT_RUN_SPLIT = r"[^0-9]+"
PUNCT_RUN_SPLIT = r"[a-z0-9 \t\n\r]+"

# Per-language stopword lists for the language-ID heuristic.  The rule
# (occurrence counts, argmax, ties -> lexicographically first code) is
# the spec; the oracle SQL reimplements the identical rule.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "for", "a"),
    "es": ("el", "los", "las", "y", "un", "una", "que", "por", "para", "es"),
    "fr": ("le", "la", "les", "et", "une", "que", "pour", "dans", "du", "au"),
}
_LANGS = tuple(sorted(LANG_STOPWORDS))  # de, en, es, fr — argmax order

EN_STOP = LANG_STOPWORDS["en"]

FP_WINDOW = 4  # winnowing window (tokens)


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _per_row_nonempty_counts(toks: pa.Array, n_rows: int) -> np.ndarray:
    """list<string> -> per-row count of non-empty elements (vectorized)."""
    flat = pc.list_flatten(toks)
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = np.zeros(n_rows, dtype=np.int64)
    np.add.at(counts, parents, nonempty.to_numpy(zero_copy_only=False))
    return counts


def _split_counts(text: pa.ChunkedArray | pa.Array, pattern: str, n: int) -> np.ndarray:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(text), pattern=pattern)
    return _per_row_nonempty_counts(toks, n)


# ---------------------------------------------------------------------------
# token_counts


def _token_counts_batch(batch: pa.Table) -> pa.Table:
    n = len(batch)
    text = batch["text"]
    n_tokens = _per_row_nonempty_counts(tokenize_column(text), n)
    n_ws = _split_counts(text, WS_PATTERN, n)
    n_bpe = (
        _split_counts(text, ALPHA_RUN_SPLIT, n)
        + _split_counts(text, DIGIT_RUN_SPLIT, n)
        + _split_counts(text, PUNCT_RUN_SPLIT, n)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_ws": pa.array(n_ws, type=pa.int64()),
            "n_bpe": pa.array(n_bpe, type=pa.int64()),
        }
    )


def q_token_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_ws, n_bpe): standard-tokenizer count,
    whitespace-split count, BPE-ish piece count (alpha runs + digit runs
    + punctuation runs)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _token_counts_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# doc_quality


def _doc_quality_batch(batch: pa.Table) -> pa.Table:
    n = len(batch)
    text = batch["text"].combine_chunks()
    toks = tokenize_column(text)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)

    n_tokens = np.zeros(n, dtype=np.int64)
    np.add.at(n_tokens, parents, keep_np.astype(np.int64))

    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_len = np.zeros(n, dtype=np.int64)
    np.add.at(sum_len, parents, np.where(keep_np, tok_len, 0))

    is_stop = pc.is_in(flat, value_set=pa.array(list(EN_STOP)))
    n_stop = np.zeros(n, dtype=np.int64)
    np.add.at(n_stop, parents, is_stop.to_numpy(zero_copy_only=False).astype(np.int64))

    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    safe = np.maximum(n_tokens, 1)
    avg_len = sum_len / safe
    stop_frac = n_stop / safe
    quality = (
        ((n_tokens >= 5) & (n_tokens <= 5000)).astype(np.int64)
        + ((stop_frac >= 0.05) & (stop_frac <= 0.7)).astype(np.int64)
        + ((avg_len >= 2.0) & (avg_len <= 12.0)).astype(np.int64)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            # UNROUNDED int ratios (see dedup j_r note): identical
            # float64 divisions on both sides, no boundary hazard
            "avg_len_r": pa.array(avg_len, type=pa.float64()),
            "stop_frac_r": pa.array(stop_frac, type=pa.float64()),
            "quality": pa.array(quality, type=pa.int64()),
        }
    )


def q_doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Per-document quality features + 0-3 heuristic quality score."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_quality_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# lang_id


def _lang_id_batch(batch: pa.Table) -> pa.Table:
    n = len(batch)
    toks = tokenize_column(batch["text"])
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    scores = np.zeros((len(_LANGS), n), dtype=np.int64)
    for li, lang in enumerate(_LANGS):
        hit = pc.is_in(flat, value_set=pa.array(list(LANG_STOPWORDS[lang])))
        np.add.at(
            scores[li], parents, hit.to_numpy(zero_copy_only=False).astype(np.int64)
        )
    pred_idx = np.argmax(scores, axis=0)  # first max wins -> lexicographic tie-break
    pred = np.array(_LANGS)[pred_idx]
    cols = {
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array(pred, type=pa.string()),
    }
    for li, lang in enumerate(_LANGS):
        cols[f"score_{lang}"] = pa.array(scores[li], type=pa.int64())
    return pa.table(cols)


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    """Stopword-heuristic language ID: occurrence count per language
    list, argmax, ties broken by lexicographically first code."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _lang_id_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# doc_fingerprint (winnowing — rows-only; pure-Python oracle in tests)


def token_hashes(tokens: list[str]) -> np.ndarray:
    return np.array(
        [zlib.crc32(t.encode()) for t in tokens], dtype=np.uint32
    )


def _winnow_flat(
    hashes: np.ndarray, starts: np.ndarray, ends: np.ndarray, w: int
) -> list[np.ndarray]:
    """Per-document winnowing fingerprints: distinct window-min hashes
    (window = w consecutive token hashes); docs shorter than w keep all
    their hashes.  Vectorized sliding-window min over the flat stream,
    with windows crossing document boundaries masked out."""
    out: list[np.ndarray] = []
    if hashes.size == 0:
        return [np.empty(0, dtype=np.uint32) for _ in starts]
    if hashes.size >= w:
        mins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
    else:
        mins = np.empty(0, dtype=np.uint32)
    for s, e in zip(starts, ends):
        ln = e - s
        if ln == 0:
            out.append(np.empty(0, dtype=np.uint32))
        elif ln < w:
            out.append(np.unique(hashes[s:e]))
        else:
            out.append(np.unique(mins[s : e - w + 1]))
    return out


class FingerprintStage:
    """Actor-pool stage: dictionary-encodes tokens once per batch and
    hashes only the batch vocabulary (crc32 is the persisted hash — a
    version-stable function, unlike process-seeded hashes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        toks = tokenize_column(batch["text"])
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)[
            keep.to_numpy(zero_copy_only=False)
        ]
        flat = flat.filter(keep)
        denc = pc.dictionary_encode(flat)
        vocab_h = token_hashes(denc.dictionary.to_pylist())
        h = vocab_h[denc.indices.to_numpy(zero_copy_only=False)]

        order = np.argsort(parents, kind="stable")
        h = h[order]
        parents = parents[order]
        counts = np.bincount(parents, minlength=n)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ends = starts + counts
        fps = _winnow_flat(h, starts, ends, FP_WINDOW)

        n_fp = np.array([f.size for f in fps], dtype=np.int64)
        fp_min = np.array(
            [int(f.min()) if f.size else -1 for f in fps], dtype=np.int64
        )
        fp_xor = np.array(
            [int(np.bitwise_xor.reduce(f)) if f.size else 0 for f in fps],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fp": pa.array(n_fp),
                "fp_min": pa.array(fp_min),
                "fp_xor": pa.array(fp_xor),
            }
        )


def q_doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Winnowing fingerprint summary per document (rows-only: crc32 not
    expressible in SQL; verified against a pure-Python oracle in
    tests/test_extras_text.py)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        FingerprintStage, batch_format="pyarrow", concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# pii_scan — PII-pattern counting (emails / URLs / long digit runs),
# the redaction-triage pass a training-data pipeline runs before
# release.  Both sides are RE2 (pyarrow count_substring_regex and
# DuckDB regexp_extract_all), counting non-overlapping left-to-right
# matches, so the counts agree exactly.

PII_PATTERNS = {
    "n_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_url": r"https?://[^\s]+",
    "n_digitrun": r"[0-9]{6,}",
}


def _pii_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols: dict = {"doc_id": batch["doc_id"]}
    total = np.zeros(len(batch), dtype=np.int64)
    for name, pat in PII_PATTERNS.items():
        c = (
            pc.count_substring_regex(text, pattern=pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cols[name] = pa.array(c, type=pa.int64())
        total += c
    cols["has_pii"] = pa.array(total > 0, type=pa.bool_())
    return pa.table(cols)


def q_pii_scan(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_email, n_url, n_digitrun, has_pii) — stateless
    vectorized RE2 counting, no shuffle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _pii_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# collocations: corpus-level PMI over adjacent token bigrams
#
# PMI(a,b) = ln(P(ab)/(P(a)P(b))) with P(ab) = cnt_ab / total_bigrams and
# P(a) = cnt_a / total_tokens.  The Ray side and the SQL oracle compute
# ln(cnt_ab/B) - ln(cnt_a/T) - ln(cnt_b/T) in that exact operation order
# so the float64 results agree bit-for-bit before the 6-dp round.

MIN_COLLOC_COUNT = 5  # bigram types below this are noise, dropped early
COLLOC_TOP_N = 500  # deterministic cut: (cnt desc, term_a, term_b) asc


def _bigram_partials(batch: pa.Table) -> pa.Table:
    """One batch -> partial adjacent-bigram counts (term_a, term_b,
    cnt).  In-batch pre-aggregation (Table.group_by) so the downstream
    shuffle sees one row per distinct bigram per batch, not per token."""
    toks = tokenize_column(batch["text"])
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    par = parents[keep_np]
    empty = pa.table(
        {
            "term_a": pa.array([], type=pa.string()),
            "term_b": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    if len(flat) < 2:
        return empty
    # adjacent within the same row (the regex split consumes separator
    # runs whole, so filtered adjacency == textual adjacency)
    ia = np.flatnonzero(par[1:] == par[:-1])
    if ia.size == 0:
        return empty
    pairs = pa.table(
        {
            "term_a": flat.take(pa.array(ia)),
            "term_b": flat.take(pa.array(ia + 1)),
        }
    )
    g = pairs.group_by(["term_a", "term_b"]).aggregate([([], "count_all")])
    return g.rename_columns(["term_a", "term_b", "cnt"]).set_column(
        2, "cnt", pc.cast(g.column(2), pa.int64())
    )


def _unigram_partials(batch: pa.Table) -> pa.Table:
    """One batch -> partial unigram counts (term, cnt)."""
    toks = tokenize_column(batch["text"])
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    g = pa.table({"term": flat}).group_by(["term"]).aggregate([([], "count_all")])
    return g.rename_columns(["term", "cnt"]).set_column(
        1, "cnt", pc.cast(g.column(1), pa.int64())
    )


def q_collocations(sf_dir: str) -> pa.Table:
    """Top-N collocations by corpus count with exact PMI: (term_a,
    term_b, rank, cnt, pmi_r).

    Shape at scale: two pre-aggregated map_batches passes feed two
    groupby-sum exchanges whose outputs are BIGRAM-TYPE- and
    VOCAB-sized (not corpus-sized); the driver then touches only the
    deterministic top-N candidate table (<= COLLOC_TOP_N rows) and the
    unigram rows of the <= 2N terms it references — both provably
    small sides, fetched via a broadcast membership filter rather than
    a shuffle join."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    bigrams = (
        docs.map_batches(_bigram_partials, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # bigram-type-sized; reused for B and candidates
    )
    total_bigrams = bigrams.sum("cnt") or 0
    cand = (
        bigrams.filter(expr=f"cnt >= {MIN_COLLOC_COUNT}")
        .sort(["cnt", "term_a", "term_b"], descending=[True, False, False])
        .limit(COLLOC_TOP_N)
        .take_all()
    )
    unigrams = (
        docs.map_batches(_unigram_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # vocab-sized; reused for T and the term lookup
    )
    total_tokens = unigrams.sum("cnt") or 0
    need = sorted({r["term_a"] for r in cand} | {r["term_b"] for r in cand})
    need_arr = pa.array(need, type=pa.string())  # tiny, ships with the fn
    uni_rows = unigrams.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=need_arr)),
        batch_format="pyarrow",
    ).take_all()
    uc = {r["term"]: r["cnt"] for r in uni_rows}
    ta = [r["term_a"] for r in cand]
    tb = [r["term_b"] for r in cand]
    c = np.array([r["cnt"] for r in cand], dtype=np.float64)
    ca = np.array([uc[t] for t in ta], dtype=np.float64)
    cb = np.array([uc[t] for t in tb], dtype=np.float64)
    if c.size:
        pmi = (
            np.log(c / total_bigrams)
            - np.log(ca / total_tokens)
            - np.log(cb / total_tokens)
        )
    else:
        pmi = np.empty(0, np.float64)
    return pa.table(
        {
            "term_a": pa.array(ta, type=pa.string()),
            "term_b": pa.array(tb, type=pa.string()),
            "rank": pa.array(np.arange(1, c.size + 1), type=pa.int64()),
            "cnt": pa.array(c.astype(np.int64), type=pa.int64()),
            "pmi_r": pa.array(np.round(pmi, 6), type=pa.float64()),
        }
    )


_COLLOC_SQL = f"""WITH tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
uni AS (SELECT term, count(*) AS c FROM tokpos GROUP BY term),
big AS (
  SELECT a.term AS ta, b.term AS tb, count(*) AS c
  FROM tokpos a JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
tot AS (
  SELECT (SELECT sum(c) FROM uni) AS T, (SELECT sum(c) FROM big) AS B
),
cand AS (
  SELECT ta, tb, c,
         row_number() OVER (ORDER BY c DESC, ta ASC, tb ASC) AS rnk
  FROM big WHERE c >= {MIN_COLLOC_COUNT}
)
SELECT cand.ta AS term_a, cand.tb AS term_b,
       CAST(cand.rnk AS BIGINT) AS rank, CAST(cand.c AS BIGINT) AS cnt,
       round(ln(cand.c * 1.0 / t.B) - ln(ua.c * 1.0 / t.T)
             - ln(ub.c * 1.0 / t.T), 6) AS pmi_r
FROM cand
JOIN uni ua ON cand.ta = ua.term
JOIN uni ub ON cand.tb = ub.term
CROSS JOIN tot t
WHERE cand.rnk <= {COLLOC_TOP_N}"""


# ---------------------------------------------------------------------------
# oracle SQL


def _sql_nonempty_split(col: str, pat: str) -> str:
    return (
        f"len(list_filter(string_split_regex(lower({col}), '{pat}'),"
        " x -> x <> ''))"
    )


def _sql_in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def _lang_sql() -> str:
    score_cols = ",\n       ".join(
        f"coalesce(sum(CASE WHEN term IN ({_sql_in_list(LANG_STOPWORDS[lang])})"
        f" THEN 1 ELSE 0 END), 0) AS score_{lang}"
        for lang in _LANGS
    )
    # argmax with lexicographic tie-break == first max in sorted order
    pred = """CASE
    WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
    WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
    WHEN score_es >= score_fr THEN 'es'
    ELSE 'fr' END"""
    return f"""WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
sc AS (
  SELECT doc_id,
       {score_cols}
  FROM tok WHERE term <> '' GROUP BY doc_id
),
filled AS (
  SELECT d.doc_id,
         CAST(coalesce(s.score_de, 0) AS BIGINT) AS score_de,
         CAST(coalesce(s.score_en, 0) AS BIGINT) AS score_en,
         CAST(coalesce(s.score_es, 0) AS BIGINT) AS score_es,
         CAST(coalesce(s.score_fr, 0) AS BIGINT) AS score_fr
  FROM documents d LEFT JOIN sc s ON d.doc_id = s.doc_id
)
SELECT doc_id, {pred} AS lang_pred, score_de, score_en, score_es, score_fr
FROM filled"""


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality rules: repeated content and
# symbol density are the strongest cheap junk predictors at corpus scale)

SYM_STRIP = "[^a-z0-9 \t\n\r]+"  # chars KEPT by the symbol-ratio strip
REP_TOP_TOK_MAX = 0.3
REP_DUP_MAX = 0.3


def _kgram_u64(
    flat: pa.Array, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """flat non-empty tokens + parent row ids -> (u64 word-k-gram
    hashes, parents), vectorized shifted-slice join (the dedup shingle
    construction generalized to k)."""
    from ciff_ray.extras.dedup import _xxhash64

    n = len(flat)
    if n < k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    m = n - k + 1
    joined = pc.binary_join_element_wise(
        *[flat.slice(i, m) for i in range(k)], " "
    )
    valid = np.ones(m, dtype=bool)
    for i in range(1, k):
        valid &= ids[:m] == ids[i : m + i]
    joined = joined.filter(pa.array(valid))
    if len(joined) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    return _xxhash64(joined, seed=0x2545F4914F6CDD1D), ids[:m][valid]


def _per_doc_runs(
    h: np.ndarray, parents: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(total per doc, distinct per doc, per-(doc,value) run counts,
    run parents) — one lexsort, no Python loops."""
    tot = np.bincount(parents, minlength=n).astype(np.int64)
    if h.size == 0:
        z = np.zeros(n, dtype=np.int64)
        return tot, z, np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((h, parents))
    hs, ps = h[order], parents[order]
    new = np.concatenate([[True], (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])])
    run_idx = np.flatnonzero(new)
    run_counts = np.diff(np.concatenate([run_idx, [hs.size]])).astype(np.int64)
    run_parent = ps[run_idx]
    uniq = np.bincount(run_parent, minlength=n).astype(np.int64)
    return tot, uniq, run_counts, run_parent


def _rep_signals_batch(batch: pa.Table) -> pa.Table:
    from ciff_ray.extras.dedup import _xxhash64
    from ciff_ray.tokenizer import flatten_tokens

    n = len(batch)
    text = batch["text"].combine_chunks()
    toks = tokenize_column(text)
    flat, ids = flatten_tokens(toks, np.arange(n, dtype=np.int64))

    h1 = (
        _xxhash64(flat, seed=0x9E3779B97F4A7C15)
        if len(flat)
        else np.empty(0, np.uint64)
    )
    tot1, _uniq1, run_counts, run_parent = _per_doc_runs(h1, ids, n)
    top = np.zeros(n, dtype=np.int64)
    if run_counts.size:
        doc_new = np.concatenate([[True], run_parent[1:] != run_parent[:-1]])
        doc_starts = np.flatnonzero(doc_new)
        top[run_parent[doc_starts]] = np.maximum.reduceat(
            run_counts, doc_starts
        )
    top_frac = top / np.maximum(tot1, 1)

    dup_fracs = {}
    for k in (2, 3):
        hk, pk = _kgram_u64(flat, ids, k)
        totk, uniqk, _rc, _rp = _per_doc_runs(hk, pk, n)
        dup_fracs[k] = np.where(totk > 0, 1.0 - uniqk / np.maximum(totk, 1), 0.0)

    low = pc.utf8_lower(text)
    nc = pc.utf8_length(low).to_numpy(zero_copy_only=False).astype(np.int64)
    stripped = pc.replace_substring_regex(low, pattern=SYM_STRIP, replacement="")
    ns = nc - pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sym_ratio = ns / np.maximum(nc, 1)

    flags = (
        (top_frac > REP_TOP_TOK_MAX).astype(np.int64)
        + (dup_fracs[2] > REP_DUP_MAX).astype(np.int64)
        + (dup_fracs[3] > REP_DUP_MAX).astype(np.int64)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "top_tok_frac_r": pa.array(top_frac, type=pa.float64()),
            "dup_bigram_frac_r": pa.array(
                dup_fracs[2], type=pa.float64()
            ),
            "dup_trigram_frac_r": pa.array(
                dup_fracs[3], type=pa.float64()
            ),
            "symbol_ratio_r": pa.array(sym_ratio, type=pa.float64()),
            "rep_flags": pa.array(flags, type=pa.int64()),
        }
    )


def q_repetition_signals(sf_dir: str) -> ray.data.Dataset:
    """Per-document repetition / junk signals (Gopher-rule family):
    fraction of tokens that are the single most frequent token,
    duplicate word-2-gram and word-3-gram fractions, symbol-to-char
    ratio, and a 0-3 flag count over the repetition thresholds.  Pure
    vectorized map_batches — no shuffle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _rep_signals_batch, batch_format="pyarrow"
    )


_REP_SQL = f"""WITH tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
tc AS (SELECT doc_id, term, count(*) AS c FROM tokpos GROUP BY doc_id, term),
ta AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM tc GROUP BY doc_id),
g2 AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS g
  FROM tokpos a JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
a2 AS (SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS uni
       FROM g2 GROUP BY doc_id),
g3 AS (
  SELECT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS g
  FROM tokpos a
  JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
a3 AS (SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS uni
       FROM g3 GROUP BY doc_id),
sym AS (
  SELECT doc_id, length(lower(text)) AS nc,
         length(lower(text))
           - length(regexp_replace(lower(text), '{SYM_STRIP}', '', 'g')) AS ns
  FROM documents
),
feat AS (
  SELECT d.doc_id,
         coalesce(ta.top, 0) * 1.0 / greatest(coalesce(ta.tot, 0), 1)
           AS top_frac,
         CASE WHEN coalesce(a2.tot, 0) = 0 THEN 0.0
              ELSE 1.0 - a2.uni * 1.0 / a2.tot END AS dup2,
         CASE WHEN coalesce(a3.tot, 0) = 0 THEN 0.0
              ELSE 1.0 - a3.uni * 1.0 / a3.tot END AS dup3,
         s.ns * 1.0 / greatest(s.nc, 1) AS symr
  FROM documents d
  LEFT JOIN ta ON d.doc_id = ta.doc_id
  LEFT JOIN a2 ON d.doc_id = a2.doc_id
  LEFT JOIN a3 ON d.doc_id = a3.doc_id
  JOIN sym s ON d.doc_id = s.doc_id
)
SELECT doc_id,
       top_frac AS top_tok_frac_r,
       dup2 AS dup_bigram_frac_r,
       dup3 AS dup_trigram_frac_r,
       symr AS symbol_ratio_r,
       CAST((CASE WHEN top_frac > {REP_TOP_TOK_MAX} THEN 1 ELSE 0 END)
            + (CASE WHEN dup2 > {REP_DUP_MAX} THEN 1 ELSE 0 END)
            + (CASE WHEN dup3 > {REP_DUP_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS rep_flags
FROM feat"""


ORACLE_SQLS = {
    "repetition_signals": _REP_SQL,
    "pii_scan": f"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["n_email"]}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["n_url"]}')) AS BIGINT) AS n_url,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["n_digitrun"]}')) AS BIGINT) AS n_digitrun,
       (len(regexp_extract_all(text, '{PII_PATTERNS["n_email"]}'))
        + len(regexp_extract_all(text, '{PII_PATTERNS["n_url"]}'))
        + len(regexp_extract_all(text, '{PII_PATTERNS["n_digitrun"]}'))) > 0 AS has_pii
FROM documents""",
    "token_counts": f"""SELECT doc_id,
       {_sql_nonempty_split('text', '[^a-z0-9]+')} AS n_tokens,
       {_sql_nonempty_split('text', WS_PATTERN)} AS n_ws,
       {_sql_nonempty_split('text', ALPHA_RUN_SPLIT)}
         + {_sql_nonempty_split('text', DIGIT_RUN_SPLIT)}
         + {_sql_nonempty_split('text', PUNCT_RUN_SPLIT)} AS n_bpe
FROM documents""",
    "doc_quality": f"""WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens, sum(length(term)) AS sum_len,
         sum(CASE WHEN term IN ({_sql_in_list(EN_STOP)}) THEN 1 ELSE 0 END)
           AS n_stop
  FROM tok WHERE term <> '' GROUP BY doc_id
),
feat AS (
  SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         length(d.text) AS n_chars,
         coalesce(a.sum_len, 0) * 1.0 / greatest(coalesce(a.n_tokens, 0), 1)
           AS avg_len,
         coalesce(a.n_stop, 0) * 1.0 / greatest(coalesce(a.n_tokens, 0), 1)
           AS stop_frac
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
)
SELECT doc_id, n_tokens, n_chars,
       avg_len AS avg_len_r, stop_frac AS stop_frac_r,
       (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1 ELSE 0 END)
       + (CASE WHEN stop_frac >= 0.05 AND stop_frac <= 0.7 THEN 1 ELSE 0 END)
       + (CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 1 ELSE 0 END)
         AS quality
FROM feat""",
    "lang_id": _lang_sql(),
    "collocations": _COLLOC_SQL,
}

QUERIES = {
    "collocations": q_collocations,
    "token_counts": q_token_counts,
    "doc_quality": q_doc_quality,
    "repetition_signals": q_repetition_signals,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,  # rows-only
    "pii_scan": q_pii_scan,
}
