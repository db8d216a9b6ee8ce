"""Boolean retrieval beyond conjunction: disjunctive (OR) matching
with coordination counts, and negated (AND NOT) matching — the two
remaining legs of the classic boolean query surface next to
`pipelines.q_boolean_and` (reference query-semantics family; the
reference itself only ranks, cf. pisa-engine/ciff src/lib.rs query
path which materializes one posting list per term and leaves
composition to callers).

Shapes (both 100-TB-clean):
- OR is a per-query union of decoded posting lists: one np.unique with
  counts over the concatenated docID arrays — no text re-scan, no
  shuffle; the output is bounded by Σ df(t), the same bound the BM25
  scoring pass already pays.
- AND NOT intersects the include lists rarest-first (|result| only
  shrinks), unions the exclude lists, and subtracts with one
  searchsorted — the exclude side never ships documents, only docIDs.

Both run as actor-pool `map_batches` stages over the fixed query sets;
index state loads once per actor (`LocalScorer`), queries stream
through in batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.oracle import tokenize

# (include-terms, exclude-terms) pairs over the documents vocabulary:
# heavy-hitter excludes, miss excludes, miss includes, self-exclusion
# (always empty), and multi-term both sides.
NOT_QUERY_SET = [
    ("the key", "merge"),
    ("table", "the"),
    ("batch stream", "zzznotaterm"),
    ("zzznotaterm", "key"),
    ("customer order", "join filter"),
    ("vector", "vector"),
    ("the a", "batch stream"),
]


def _not_query_set_ds() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    np.arange(len(NOT_QUERY_SET), dtype=np.int64)
                ),
                "include": pa.array([q[0] for q in NOT_QUERY_SET]),
                "exclude": pa.array([q[1] for q in NOT_QUERY_SET]),
            }
        )
    )


def _empty_or_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "n_match": pa.array([], type=pa.int64()),
        }
    )


class _BooleanOrActor:
    """map_batches stage: (query_id, query) rows -> all (query_id,
    doc_id, n_match) with the doc containing AT LEAST ONE query term,
    n_match = how many distinct query terms it contains (the
    coordination factor boolean rankers key on)."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def _disjunction(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        arrs = []
        for t in sorted(set(tokenize(query))):
            if self.scorer._term_stat(t) is None:
                continue  # a missing term contributes nothing to OR
            d, _ = self.scorer.postings(t)
            arrs.append(d.astype(np.int64))
        if not arrs:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        # each term's list is unique per doc, so the multiplicity of a
        # docID across the concatenation IS its matched-term count
        u, c = np.unique(np.concatenate(arrs), return_counts=True)
        return u, c.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, c = self._disjunction(q)
            qids.append(np.full(u.size, qid, dtype=np.int64))
            docs.append(u)
            counts.append(c)
        if not qids:
            return _empty_or_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
                "n_match": pa.array(np.concatenate(counts), type=pa.int64()),
            }
        )


# (query, minimum_should_match) pairs — Lucene's minShouldMatch on a
# disjunction: a doc qualifies iff it contains >= m DISTINCT query
# terms.  Mix: m=1 (plain OR), m=n (AND-equivalent), interior m,
# a missing-term query where m is unreachable, and a stopword-heavy
# query where m=2 still matches broadly.
MSM_QUERY_SET: list[tuple[str, int]] = [
    ("the key merge", 2),
    ("table batch stream", 2),
    ("customer order join filter", 3),
    ("the a of", 1),
    ("zzznotaterm key", 2),
    ("vector spark window sort", 4),
]


def _msm_query_set_ds() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    np.arange(len(MSM_QUERY_SET), dtype=np.int64)
                ),
                "query": pa.array([q for q, _ in MSM_QUERY_SET]),
                "msm": pa.array(
                    [m for _, m in MSM_QUERY_SET], type=pa.int64()
                ),
            }
        )
    )


class _BooleanOrMsmActor(_BooleanOrActor):
    """map_batches stage: (query_id, query, msm) rows -> (query_id,
    doc_id, n_match) restricted to docs matching at least ``msm``
    distinct query terms.  Same union shape as OR — the msm cut is one
    boolean mask over the per-doc multiplicities, applied before the
    rows ever leave the actor, so the exchange shrinks with m."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        for qid, q, m in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["msm"].to_pylist(),
        ):
            u, c = self._disjunction(q)
            keep = c >= m
            u, c = u[keep], c[keep]
            qids.append(np.full(u.size, qid, dtype=np.int64))
            docs.append(u)
            counts.append(c)
        if not qids:
            return _empty_or_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
                "n_match": pa.array(np.concatenate(counts), type=pa.int64()),
            }
        )


class _BooleanAndNotActor:
    """map_batches stage: (query_id, include, exclude) rows -> all
    (query_id, doc_id) matching EVERY include term and NO exclude term.
    Includes intersect rarest-first; excludes union once and subtract
    with a single searchsorted probe."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def _conjunction(self, query: str) -> np.ndarray:
        from ciff_ray.pipelines import _intersect_sorted

        terms = sorted(set(tokenize(query)))
        if not terms:
            return np.empty(0, np.int64)
        stats = []
        for t in terms:
            st = self.scorer._term_stat(t)
            if st is None:  # a missing include term empties the AND
                return np.empty(0, np.int64)
            stats.append((st[0], t))
        stats.sort()  # rarest term drives
        cur, _ = self.scorer.postings(stats[0][1])
        cur = cur.astype(np.int64)
        for _, t in stats[1:]:
            if cur.size == 0:
                break
            d, _ = self.scorer.postings(t)
            cur = _intersect_sorted(cur, d.astype(np.int64))
        return cur

    def _exclusion(self, query: str) -> np.ndarray:
        arrs = []
        for t in sorted(set(tokenize(query))):
            if self.scorer._term_stat(t) is None:
                continue  # a missing exclude term excludes nothing
            d, _ = self.scorer.postings(t)
            arrs.append(d.astype(np.int64))
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs = [], []
        for qid, inc, exc in zip(
            batch["query_id"].to_pylist(),
            batch["include"].to_pylist(),
            batch["exclude"].to_pylist(),
        ):
            cur = self._conjunction(inc)
            if cur.size:
                ex = self._exclusion(exc)
                if ex.size:
                    pos = np.searchsorted(ex, cur)
                    inb = pos < ex.size
                    hit = np.zeros(cur.size, dtype=bool)
                    hit[inb] = ex[pos[inb]] == cur[inb]
                    cur = cur[~hit]
            qids.append(np.full(cur.size, qid, dtype=np.int64))
            docs.append(cur)
        if not qids:
            qcat: np.ndarray = np.empty(0, np.int64)
            dcat: np.ndarray = np.empty(0, np.int64)
        else:
            qcat, dcat = np.concatenate(qids), np.concatenate(docs)
        return pa.table(
            {
                "query_id": pa.array(qcat, type=pa.int64()),
                "doc_id": pa.array(dcat, type=pa.int64()),
            }
        )


def q_boolean_or(sf_dir: str) -> ray.data.Dataset:
    """Disjunctive (any-term) match set with per-doc matched-term
    counts for the fixed query set."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _BooleanOrActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def q_boolean_or_msm(sf_dir: str) -> ray.data.Dataset:
    """Disjunctive match with minimum_should_match: (query_id, doc_id,
    n_match) for docs containing at least the query's ``msm`` distinct
    terms."""
    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    return (
        _msm_query_set_ds()
        .repartition(4)
        .map_batches(
            _BooleanOrMsmActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def q_boolean_and_not(sf_dir: str) -> ray.data.Dataset:
    """Negated conjunctive match set (include AND NOT exclude) for the
    fixed NOT_QUERY_SET."""
    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    return (
        _not_query_set_ds()
        .repartition(4)
        .map_batches(
            _BooleanAndNotActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


# ---------------------------------------------------------------------------
# oracles


def _not_values(side: int) -> str:
    """(query_id, term) VALUES rows for the include (0) / exclude (1)
    side of NOT_QUERY_SET — mirrors the actors' sorted(set(tokenize))."""
    values = []
    for qid, pair in enumerate(NOT_QUERY_SET):
        for t in sorted(set(tokenize(pair[side]))):
            values.append(f"({qid}, '{t}')")
    return ", ".join(values)


def boolean_or_oracle_sql() -> str:
    from ciff_ray.pipelines import _boolean_query_values
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
),
q(query_id, term) AS (VALUES {_boolean_query_values()})
SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_match
FROM q JOIN tf USING (term) GROUP BY q.query_id, tf.doc_id"""


def boolean_or_msm_oracle_sql() -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    term_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, (q, _) in enumerate(MSM_QUERY_SET)
        for t in sorted(set(tokenize(q)))
    )
    m_vals = ", ".join(
        f"({qid}, {m})" for qid, (_, m) in enumerate(MSM_QUERY_SET)
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
),
q(query_id, term) AS (VALUES {term_vals}),
qm(query_id, msm) AS (VALUES {m_vals})
SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_match
FROM q JOIN tf USING (term) JOIN qm ON qm.query_id = q.query_id
GROUP BY q.query_id, tf.doc_id, qm.msm
HAVING count(*) >= qm.msm"""


def boolean_and_not_oracle_sql() -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
),
qi(query_id, term) AS (VALUES {_not_values(0)}),
qe(query_id, term) AS (VALUES {_not_values(1)}),
qn AS (SELECT query_id, count(*) AS nt FROM qi GROUP BY query_id),
ahit AS (
  SELECT qi.query_id, tf.doc_id, count(*) AS nhit
  FROM qi JOIN tf USING (term) GROUP BY qi.query_id, tf.doc_id
),
amatch AS (
  SELECT a.query_id, a.doc_id
  FROM ahit a JOIN qn USING (query_id) WHERE a.nhit = qn.nt
),
ehit AS (
  SELECT DISTINCT qe.query_id, tf.doc_id FROM qe JOIN tf USING (term)
)
SELECT CAST(m.query_id AS BIGINT) AS query_id, m.doc_id AS doc_id
FROM amatch m
LEFT JOIN ehit e ON e.query_id = m.query_id AND e.doc_id = m.doc_id
WHERE e.doc_id IS NULL"""


# ---------------------------------------------------------------------------
# wildcard (prefix) retrieval: dictionary expansion -> boolean OR

# fixed prefix set: short high-fanout, medium, full-term, and a miss;
# the expansion cap must BIND for at least one prefix so the capped
# semantics are actually exercised on both sides
WILDCARD_PREFIXES = ["ke", "mer", "s", "tab", "zzzxx"]
# Lucene-style expansion bound (maxClauseCount flavor): each prefix
# expands to at most this many vocabulary terms, picked by
# (df desc, term asc) — highest-coverage terms first, deterministic.
# 4 is small enough that the cap BINDS on the 's' prefix at every
# driver sf, so the capped semantics are exercised on both sides.
WILDCARD_MAX_TERMS = 4

# leading-wildcard (*suffix) set: high-fanout single letter (cap
# binds), common inflections, a full-term, and a miss.  Lucene answers
# these from a REVERSED-term dictionary so the scan becomes a prefix
# range; here the dictionary scan is already a distributed sharded
# parquet read with per-batch partial top-k, so `ends_with` over the
# same scan keeps the exchange at cap rows per (suffix, batch) — at
# cluster scale a reversed sorted lexicon would additionally prune the
# scan to one key range per suffix (same top-k merge either way).
WILDCARD_SUFFIXES = ["ey", "ge", "e", "ble", "zzzxx"]

# regex term set (Lucene RegexpQuery analogue): the pattern must match
# the ENTIRE term.  Both sides run RE2 — pyarrow's match_substring_regex
# (anchored here) and DuckDB's regexp_full_match — so the semantics are
# literally the same engine.  Mix: wildcard-dot, alternation, a
# character-class numeric probe, a broad pattern where the cap binds,
# and a miss.
REGEX_PATTERNS = ["k.y", "(merge|join)s?", "[0-9]+", "s.*", "zzz.x"]


def _top_terms_per_prefix(
    prefix_ids: np.ndarray, terms: np.ndarray, dfs: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-prefix top-``cap`` rows under (df desc, term asc) — shared
    by the per-batch partial and the driver merge, so the two-level
    top-k is exact (the per-batch partial is a superset of every
    prefix's global winners in that batch)."""
    order = np.lexsort((terms, -dfs, prefix_ids))
    pid_sorted = prefix_ids[order]
    # rank within each prefix run
    starts = np.r_[True, pid_sorted[1:] != pid_sorted[:-1]]
    run_id = np.cumsum(starts) - 1
    first_idx = np.flatnonzero(starts)
    rank = np.arange(pid_sorted.size) - first_idx[run_id]
    keep = order[rank < cap]
    return prefix_ids[keep], terms[keep], dfs[keep]


def _wildcard_partials(
    batch: pa.Table,
    patterns: list[str] = WILDCARD_PREFIXES,
    mode: str = "prefix",
) -> pa.Table:
    """map_batches stage over the sharded term-stats parquet: for each
    pattern, the batch's top-{WILDCARD_MAX_TERMS} matching terms — the
    exchange is bounded at cap rows per (pattern, batch) at any
    vocabulary size.  ``mode`` picks prefix (trailing wildcard) or
    suffix (leading wildcard) matching."""
    import pyarrow.compute as pc

    if mode == "prefix":
        matcher = pc.starts_with
    elif mode == "suffix":
        matcher = pc.ends_with
    elif mode == "fuzzy":  # Levenshtein <= 1 (Lucene FuzzyQuery flavor)

        def matcher(col, pat):
            from ciff_ray.extras.fuzzy import _lev_le

            words = col.to_pylist()
            return pa.array(_lev_le([pat] * len(words), words, 1))

    else:  # full-term regex (RE2), anchored

        def matcher(col, pat):
            return pc.match_substring_regex(col, f"^(?:{pat})$")

    term_col = batch["term"].combine_chunks()
    pids, terms, dfs = [], [], []
    for pid, prefix in enumerate(patterns):
        mask = matcher(term_col, prefix)
        if not pc.any(mask).as_py():
            continue
        sub = batch.filter(mask)
        t = np.asarray(sub["term"].to_pylist(), dtype=object)
        d = sub["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.full(t.size, pid, dtype=np.int64)
        p, t, d = _top_terms_per_prefix(p, t, d, WILDCARD_MAX_TERMS)
        pids.append(p)
        terms.append(t)
        dfs.append(d)
    if not pids:
        return pa.table(
            {
                "prefix_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "prefix_id": pa.array(np.concatenate(pids), type=pa.int64()),
            "term": pa.array(
                np.concatenate(terms).tolist(), type=pa.string()
            ),
            "df": pa.array(np.concatenate(dfs), type=pa.int64()),
        }
    )


def wildcard_expansions(
    index_dir: str,
    patterns: list[str] = WILDCARD_PREFIXES,
    mode: str = "prefix",
) -> dict[int, list[str]]:
    """pattern_id -> its capped expansion terms, via a distributed scan
    of the term dictionary (term + df columns only) with per-batch
    partial top-k; the driver merge sees <= cap x blocks rows."""
    import functools

    from ciff_ray.layout import IndexPaths

    paths = IndexPaths(index_dir)
    parts = (
        ray.data.read_parquet(paths.term_stats, columns=["term", "df"])
        .map_batches(
            functools.partial(
                _wildcard_partials, patterns=patterns, mode=mode
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    if not parts:
        return {}
    pids = np.array([r["prefix_id"] for r in parts], dtype=np.int64)
    terms = np.array([r["term"] for r in parts], dtype=object)
    dfs = np.array([r["df"] for r in parts], dtype=np.int64)
    pids, terms, _ = _top_terms_per_prefix(
        pids, terms, dfs, WILDCARD_MAX_TERMS
    )
    out: dict[int, list[str]] = {}
    for p, t in zip(pids.tolist(), terms.tolist()):
        out.setdefault(int(p), []).append(t)
    return out


class _TermUnionActor:
    """map_batches stage: (query_id) rows -> (query_id, doc_id,
    n_match) unions over EXPLICIT per-query term lists (the wildcard
    expansions), broadcast once via a spec ref."""

    def __init__(self, index_dir: str, spec_ref):
        import ray as _ray

        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.spec = _ray.get(spec_ref)  # {qid: [terms]}

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        for qid in batch["query_id"].to_pylist():
            arrs = []
            for t in self.spec[qid]:
                d, _ = self.scorer.postings(t)
                arrs.append(d.astype(np.int64))
            if not arrs:
                continue
            u, c = np.unique(np.concatenate(arrs), return_counts=True)
            qids.append(np.full(u.size, qid, dtype=np.int64))
            docs.append(u)
            counts.append(c.astype(np.int64))
        if not qids:
            return _empty_or_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
                "n_match": pa.array(np.concatenate(counts), type=pa.int64()),
            }
        )


def _wildcard_query(
    sf_dir: str, patterns: list[str], mode: str
) -> ray.data.Dataset:
    import ray as _ray

    from ciff_ray.pipelines import ensure_index

    idx = ensure_index(sf_dir)
    spec = wildcard_expansions(idx, patterns, mode)
    if not spec:
        return ray.data.from_arrow(_empty_or_table())
    spec_ref = _ray.put(spec)
    qids = sorted(spec)
    queries = ray.data.from_arrow(
        pa.table({"query_id": pa.array(qids, type=pa.int64())})
    ).repartition(min(4, len(qids)))
    return queries.map_batches(
        _TermUnionActor,
        fn_constructor_args=(idx, spec_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_wildcard_match(sf_dir: str) -> ray.data.Dataset:
    """Wildcard (prefix) retrieval: each prefix expands to its capped
    top-df vocabulary terms via a distributed dictionary scan, then the
    expansion unions posting lists exactly like boolean OR — (query_id,
    doc_id, n_match) with n_match = distinct expansion terms in the
    doc."""
    return _wildcard_query(sf_dir, WILDCARD_PREFIXES, "prefix")


def q_wildcard_suffix(sf_dir: str) -> ray.data.Dataset:
    """Leading-wildcard (*suffix) retrieval: the suffix expands to its
    capped top-df vocabulary terms (ends_with over the same distributed
    dictionary scan; see WILDCARD_SUFFIXES note on the reversed-lexicon
    scale path), then unions posting lists like boolean OR."""
    return _wildcard_query(sf_dir, WILDCARD_SUFFIXES, "suffix")


def q_term_regex(sf_dir: str) -> ray.data.Dataset:
    """Regex term retrieval: each RE2 pattern full-matches against the
    distributed term dictionary, expands to its capped top-df terms,
    then unions posting lists like boolean OR."""
    return _wildcard_query(sf_dir, REGEX_PATTERNS, "regex")


def _wildcard_oracle_sql(patterns: list[str], match_expr: str) -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    pattern_values = ", ".join(
        f"({pid}, '{p}')" for pid, p in enumerate(patterns)
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
),
dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
p(query_id, pattern) AS (VALUES {pattern_values}),
expd AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, d.term,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM p JOIN dfv d ON {match_expr}
  ) WHERE rn <= {WILDCARD_MAX_TERMS}
)
SELECT CAST(e.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_match
FROM expd e JOIN tf USING (term) GROUP BY e.query_id, tf.doc_id"""


def wildcard_match_oracle_sql() -> str:
    return _wildcard_oracle_sql(
        WILDCARD_PREFIXES, "d.term LIKE p.pattern || '%'"
    )


def wildcard_suffix_oracle_sql() -> str:
    return _wildcard_oracle_sql(
        WILDCARD_SUFFIXES, "d.term LIKE '%' || p.pattern"
    )


def term_regex_oracle_sql() -> str:
    return _wildcard_oracle_sql(
        REGEX_PATTERNS, "regexp_full_match(d.term, p.pattern)"
    )
