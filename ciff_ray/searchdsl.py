"""A Lucene-style search query language compiled onto the engine's
retrieval primitives — the user-facing composition layer the reference
leaves to callers (pisa-engine/ciff src/lib.rs materializes one posting
list per term; everything above that is downstream's job).

Grammar (classic Lucene boolean subset):

    expr     := and_expr ('OR' and_expr)*
    and_expr := operand ('AND' operand)*
    operand  := 'NOT' operand | primary
    primary  := '(' expr ')' | '"' word+ '"' | 'role:' value
              | word '*' | word '~' | word

Semantics are SET-exact (no scoring): a term is its posting list, a
quoted phrase is in-order adjacency against the positional store, and
``role:`` is a document-metadata predicate.  ``word*`` (trailing
wildcard) and ``word~`` (fuzzy, Levenshtein <= 1) expand against the
term dictionary to at most ``EXPANSION_CAP`` terms picked by
(df desc, term asc) — Lucene's maxClauseCount-bounded rewrite — via
ONE distributed dictionary scan per query set, then evaluate as a
plain term union.  Like Lucene, a query must
have at least one positive clause at every level that produces
documents: ``NOT x`` and ``role:v`` are FILTERS that can only appear
ANDed with a generating clause (a pure-negative query has no bounded
evaluation — the parser rejects it rather than enumerating the corpus).

Scale shape: parsing is driver-side over a handful of bytes; evaluation
is the same actor-pool `map_batches` as boolean retrieval — posting
lists decode per term, phrases read only their candidates' position
rows, the role mask is a vectorized predicate on docIDs, and every set
op (intersect / union / subtract) is one searchsorted-family kernel.
No text is ever re-scanned.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.oracle import tokenize
from ciff_ray.synth import _ROLES

# Fixed query set: AND / OR / NOT, phrases, role filters, nesting,
# a missing term, a negated metadata filter, and wildcard / fuzzy
# clauses (incl. a cap-binding prefix, a miss, and a negated wildcard).
DSL_QUERY_SET = [
    "key AND merge",
    "key OR (merge AND join)",
    'table AND NOT "the key"',
    '"batch stream" OR spark',
    "role:assistant AND key AND NOT merge",
    "(customer OR order) AND role:tool",
    'zzznotaterm OR "fast key"',
    "the AND NOT role:user",
    "mer* AND key",
    "s* AND NOT role:system",
    "merg~ OR keu~",
    "key AND NOT zzzxx*",
]

# Lucene maxClauseCount flavor: every wildcard / fuzzy clause expands
# to at most this many dictionary terms, picked by (df desc, term asc)
# — shared with the standalone wildcard retrieval entries.
from ciff_ray.booleanq import WILDCARD_MAX_TERMS as EXPANSION_CAP


# ---------------------------------------------------------------------------
# parser

import re as _re

_TOKEN_RE = _re.compile(r'"[^"]*"|\(|\)|[^\s()"]+')
_KEYWORDS = {"AND", "OR", "NOT"}


def _normalize_word(w: str) -> str:
    toks = tokenize(w)
    if len(toks) != 1:
        raise ValueError(f"not a single index term: {w!r}")
    return toks[0]


class _Parser:
    def __init__(self, query: str):
        self.toks = _TOKEN_RE.findall(query)
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        self.pos += 1
        return t

    def parse(self) -> tuple:
        node = self._expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens at {self.peek()!r}")
        _validate(node, top=True)
        return node

    def _expr(self) -> tuple:
        parts = [self._and_expr()]
        while self.peek() == "OR":
            self.take()
            parts.append(self._and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _and_expr(self) -> tuple:
        parts = [self._operand()]
        while self.peek() == "AND":
            self.take()
            parts.append(self._operand())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _operand(self) -> tuple:
        if self.peek() == "NOT":
            self.take()
            return ("not", self._operand())
        return self._primary()

    def _primary(self) -> tuple:
        t = self.take()
        if t == "(":
            node = self._expr()
            if self.take() != ")":
                raise ValueError("expected ')'")
            return node
        if t.startswith('"'):
            words = [_normalize_word(w) for w in t[1:-1].split()]
            if not words:
                raise ValueError("empty phrase")
            return ("term", words[0]) if len(words) == 1 else ("phrase", words)
        if t in _KEYWORDS or t == ")":
            raise ValueError(f"unexpected {t!r}")
        if t.endswith("*") and "*" not in t[:-1] and "~" not in t:
            prefix = t[:-1].lower()
            if not _re.fullmatch(r"[a-z0-9]+", prefix):
                raise ValueError(f"bad wildcard prefix {t!r}")
            return ("wild", prefix)
        if t.endswith("~") and "~" not in t[:-1] and "*" not in t:
            return ("fuzzy", _normalize_word(t[:-1]))
        if "*" in t or "~" in t:
            raise ValueError(f"misplaced wildcard in {t!r}")
        if ":" in t:
            field, _, value = t.partition(":")
            if field != "role":
                raise ValueError(f"unknown field {field!r}")
            if value not in _ROLES:
                raise ValueError(f"unknown role {value!r}")
            return ("role", value)
        return ("term", _normalize_word(t))


def parse_query(query: str) -> tuple:
    """Parse a DSL query into an AST; raises ValueError on syntax
    errors or pure-negative (unbounded) queries."""
    return _Parser(query).parse()


def _is_generator(node: tuple) -> bool:
    """True iff the node produces a bounded doc set on its own."""
    k = node[0]
    if k in ("term", "phrase", "wild", "fuzzy", "terms"):
        return True
    if k in ("role", "not"):
        return False
    if k == "or":
        return all(_is_generator(c) for c in node[1])
    return any(_is_generator(c) for c in node[1])  # and


def _validate(node: tuple, top: bool = False) -> None:
    k = node[0]
    if top and not _is_generator(node):
        raise ValueError("query needs at least one positive clause")
    if k == "or":
        for c in node[1]:
            if not _is_generator(c):
                raise ValueError(
                    "NOT / role: filters must be ANDed with a positive "
                    "clause, not OR'd"
                )
            _validate(c)
    elif k == "and":
        if not any(_is_generator(c) for c in node[1]):
            raise ValueError("AND group needs a positive clause")
        for c in node[1]:
            _validate(c)
    elif k == "not":
        child = node[1]
        if not (_is_generator(child) or child[0] == "role"):
            raise ValueError("NOT needs a positive or role: operand")
        _validate(child)


# ---------------------------------------------------------------------------
# wildcard / fuzzy expansion (driver-side, one dictionary scan)


def _collect_patterns(
    node: tuple, wild: list[str], fuzzy: list[str]
) -> None:
    k = node[0]
    if k == "wild" and node[1] not in wild:
        wild.append(node[1])
    elif k == "fuzzy" and node[1] not in fuzzy:
        fuzzy.append(node[1])
    elif k == "not":
        _collect_patterns(node[1], wild, fuzzy)
    elif k in ("and", "or"):
        for c in node[1]:
            _collect_patterns(c, wild, fuzzy)


def expand_asts(
    asts: dict[int, tuple], index_dir: str
) -> dict[int, tuple]:
    """Rewrite every ``wild`` / ``fuzzy`` node into an explicit
    ``("terms", [...])`` union via the distributed dictionary scan —
    ONE scan for all patterns of the whole query set (per-batch partial
    top-cap, driver merge <= cap x blocks rows)."""
    from ciff_ray.booleanq import wildcard_expansions

    wild: list[str] = []
    fuzzy: list[str] = []
    for a in asts.values():
        _collect_patterns(a, wild, fuzzy)
    wmap: dict[str, list[str]] = {}
    fmap: dict[str, list[str]] = {}
    if wild:
        exp = wildcard_expansions(index_dir, wild, mode="prefix")
        wmap = {p: exp.get(i, []) for i, p in enumerate(wild)}
    if fuzzy:
        exp = wildcard_expansions(index_dir, fuzzy, mode="fuzzy")
        fmap = {w: exp.get(i, []) for i, w in enumerate(fuzzy)}

    def rewrite(node: tuple) -> tuple:
        k = node[0]
        if k == "wild":
            return ("terms", wmap[node[1]])
        if k == "fuzzy":
            return ("terms", fmap[node[1]])
        if k == "not":
            return ("not", rewrite(node[1]))
        if k in ("and", "or"):
            return (k, [rewrite(c) for c in node[1]])
        return node

    return {qid: rewrite(a) for qid, a in asts.items()}


# ---------------------------------------------------------------------------
# evaluation

_N_ROLES = len(_ROLES)


def _subtract_sorted(cur: np.ndarray, ex: np.ndarray) -> np.ndarray:
    if cur.size == 0 or ex.size == 0:
        return cur
    pos = np.searchsorted(ex, cur)
    inb = pos < ex.size
    hit = np.zeros(cur.size, dtype=bool)
    hit[inb] = ex[pos[inb]] == cur[inb]
    return cur[~hit]


class DslEvaluator:
    """AST -> sorted unique docID array, against one loaded index +
    positional store (state per actor)."""

    def __init__(self, index_dir: str, store_root: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.store_root = store_root
        self._store = None

    def _term_docs(self, term: str) -> np.ndarray:
        if self.scorer._term_stat(term) is None:
            return np.empty(0, np.int64)
        d, _ = self.scorer.postings(term)
        return d.astype(np.int64)

    def _phrase_docs(self, terms: list[str]) -> np.ndarray:
        from ciff_ray.pipelines import _intersect_sorted
        from ciff_ray.positions import PositionStore

        cand: np.ndarray | None = None
        # rarest-first AND over the phrase terms bounds the position read
        stats = []
        for t in terms:
            st = self.scorer._term_stat(t)
            if st is None:
                return np.empty(0, np.int64)
            stats.append((st[0], t))
        for _, t in sorted(stats):
            d = self._term_docs(t)
            cand = d if cand is None else _intersect_sorted(cand, d)
            if cand.size == 0:
                return np.empty(0, np.int64)
        if self._store is None:
            self._store = PositionStore(self.store_root)
        return self._store.phrase_docs(terms, cand)

    def evaluate(self, node: tuple) -> np.ndarray:
        k = node[0]
        if k == "term":
            return self._term_docs(node[1])
        if k == "phrase":
            return self._phrase_docs(node[1])
        if k == "terms":  # expanded wildcard / fuzzy: term union
            if not node[1]:
                return np.empty(0, np.int64)
            return np.unique(
                np.concatenate([self._term_docs(t) for t in node[1]])
            )
        if k == "or":
            return np.unique(
                np.concatenate([self.evaluate(c) for c in node[1]])
            )
        if k == "and":
            gens = [c for c in node[1] if _is_generator(c)]
            cur: np.ndarray | None = None
            for c in gens:
                d = self.evaluate(c)
                if cur is None:
                    cur = d
                else:
                    from ciff_ray.pipelines import _intersect_sorted

                    cur = _intersect_sorted(cur, d)
                if cur.size == 0:
                    return cur
            assert cur is not None  # _validate guarantees a generator
            for c in node[1]:
                if c[0] == "role":
                    cur = cur[cur % _N_ROLES == _ROLES.index(c[1])]
                elif c[0] == "not":
                    child = c[1]
                    if child[0] == "role":
                        cur = cur[cur % _N_ROLES != _ROLES.index(child[1])]
                    else:
                        cur = _subtract_sorted(cur, self.evaluate(child))
            return cur
        raise ValueError(f"cannot evaluate {k!r} outside AND")

    def topk(self, node: tuple, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Ranked evaluation: the boolean AST is the candidate FILTER,
        BM25 over the positive clauses' terms is the score (the bool
        query + scoring shape).  Candidate tf comes from the
        block-targeted decode (`_candidate_tf`), so a selective filter
        never pays a full posting-list pass for the scoring terms."""
        cand = self.evaluate(node)
        if cand.size == 0:
            return cand, np.empty(0, np.float64)
        sc = self.scorer
        total = np.zeros(cand.size, dtype=np.float64)
        dl = sc._dl[cand]
        for t in scoring_terms(node):  # byte-sorted: oracle sum order
            if sc._term_stat(t) is None:
                continue
            tfs = sc._candidate_tf(t, cand)
            nz = tfs > 0
            if nz.any():
                total[nz] += sc._contrib(tfs[nz], dl[nz], sc.idf(t))
        return sc._rank(cand, total, k)


def scoring_terms(node: tuple) -> list[str]:
    """Distinct terms of the POSITIVE clauses (bare terms + phrase
    words), byte-sorted — the BM25 scoring set for ranked evaluation.
    Filters (NOT subtrees, role:) contribute no score, Lucene-style."""
    k = node[0]
    if k == "term":
        return [node[1]]
    if k in ("phrase", "terms"):
        return sorted(set(node[1]), key=lambda s: s.encode())
    if k in ("wild", "fuzzy"):
        # unexpanded patterns carry no scoring terms here; the oracle
        # adds their expansion via SQL (_scoring_patterns) and the
        # engine always scores the expand_asts()-rewritten tree (an
        # unexpanded tree fails evaluate() outright)
        return []
    if k in ("role", "not"):
        return []
    out: set[str] = set()
    for c in node[1]:
        out.update(scoring_terms(c))
    return sorted(out, key=lambda s: s.encode())


def _local_expansions(
    scorer, wild: list[str], fuzzy: list[str]
) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    """Expansion against an already-loaded scorer's term dictionary:
    prefix = one bisect range (O(log V) + cap-bounded slice), fuzzy =
    chunked vectorized edit-distance scan over the dictionary column.
    Produces byte-for-byte the same capped (df desc, term asc) sets as
    the distributed scan in :func:`expand_asts` — same vocabulary,
    same key — so interactive `search()` matches the batch entries.
    At huge vocabularies the fuzzy scan is O(V) per distinct pattern;
    the batch path amortizes that over the query set, and a SymSpell
    deletion-neighborhood index (extras/fuzzy.py) is the scale path."""
    terms_arr = scorer._st_terms.arr
    df_arr = np.asarray(scorer._st_df)

    def top_cap(idx: np.ndarray) -> list[str]:
        if idx.size == 0:
            return []
        t = np.array(
            [terms_arr[int(i)].as_py() for i in idx], dtype=object
        )
        d = df_arr[idx]
        order = np.lexsort((t, -d))[:EXPANSION_CAP]
        return sorted(t[order].tolist())  # set semantics; order is moot

    wmap: dict[str, list[str]] = {}
    for p in wild:
        lo = bisect.bisect_left(scorer._st_terms, p)
        # '{' sorts after every [a-z0-9] byte, so p+'{' bounds the run
        hi = bisect.bisect_left(scorer._st_terms, p + "{")
        wmap[p] = top_cap(np.arange(lo, hi))
    fmap: dict[str, list[str]] = {}
    if fuzzy:
        from ciff_ray.extras.fuzzy import _lev_le

        hits: dict[str, list[np.ndarray]] = {w: [] for w in fuzzy}
        CH = 1 << 16
        for lo in range(0, len(terms_arr), CH):
            chunk = terms_arr.slice(lo, CH).to_pylist()
            for w in fuzzy:
                m = _lev_le([w] * len(chunk), chunk, 1)
                if m.any():
                    hits[w].append(np.flatnonzero(m) + lo)
        for w in fuzzy:
            idx = (
                np.concatenate(hits[w])
                if hits[w]
                else np.empty(0, np.int64)
            )
            fmap[w] = top_cap(idx)
    return wmap, fmap


def search(
    index_dir: str,
    positions_dir: str,
    query: str,
    k: int | None = None,
):
    """One-shot DSL search against a built index (positional store for
    phrases).  Returns the sorted matching docID array, or
    ``(doc_ids, scores)`` ranked top-k when ``k`` is given.  Wildcard /
    fuzzy clauses expand locally via the loaded term dictionary (see
    :func:`_local_expansions`); results are identical to the batch
    entries' distributed expansion."""
    ev = DslEvaluator(index_dir, positions_dir)
    ast = parse_query(query)
    wild: list[str] = []
    fuzzy: list[str] = []
    _collect_patterns(ast, wild, fuzzy)
    if wild or fuzzy:
        wmap, fmap = _local_expansions(ev.scorer, wild, fuzzy)

        def rewrite(node: tuple) -> tuple:
            kk = node[0]
            if kk == "wild":
                return ("terms", wmap[node[1]])
            if kk == "fuzzy":
                return ("terms", fmap[node[1]])
            if kk == "not":
                return ("not", rewrite(node[1]))
            if kk in ("and", "or"):
                return (kk, [rewrite(c) for c in node[1]])
            return node

        ast = rewrite(ast)
    if k is None:
        return ev.evaluate(ast)
    return ev.topk(ast, k)


class _DslActor:
    """map_batches stage: (query_id) rows -> (query_id, doc_id) match
    sets for the broadcast ASTs; index + positional state once per
    actor."""

    def __init__(self, index_dir: str, store_root: str, spec_ref):
        import ray as _ray

        self.ev = DslEvaluator(index_dir, store_root)
        self.spec = _ray.get(spec_ref)  # {qid: ast}

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs = [], []
        for qid in batch["query_id"].to_pylist():
            d = self.ev.evaluate(self.spec[qid])
            qids.append(np.full(d.size, qid, dtype=np.int64))
            docs.append(d)
        if not qids:
            q: np.ndarray = np.empty(0, np.int64)
            d2: np.ndarray = np.empty(0, np.int64)
        else:
            q, d2 = np.concatenate(qids), np.concatenate(docs)
        return pa.table(
            {
                "query_id": pa.array(q, type=pa.int64()),
                "doc_id": pa.array(d2, type=pa.int64()),
            }
        )


def q_search_dsl(sf_dir: str) -> ray.data.Dataset:
    """Boolean search-DSL evaluation: (query_id, doc_id) match sets for
    the fixed DSL_QUERY_SET (AND / OR / NOT / phrase / role: filters,
    arbitrarily nested)."""
    import ray as _ray

    from ciff_ray.pipelines import ensure_index
    from ciff_ray.positions import ensure_positions

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    spec = expand_asts(
        {qid: parse_query(q) for qid, q in enumerate(DSL_QUERY_SET)}, idx
    )
    spec_ref = _ray.put(spec)
    queries = ray.data.from_arrow(
        pa.table(
            {"query_id": pa.array(sorted(spec), type=pa.int64())}
        )
    ).repartition(4)
    return queries.map_batches(
        _DslActor,
        fn_constructor_args=(idx, store, spec_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


class _DslRankActor:
    """map_batches stage for ranked DSL: (query_id) rows ->
    (query_id, rank, doc_id) top-k under the boolean filter."""

    def __init__(self, index_dir: str, store_root: str, spec_ref, k: int):
        import ray as _ray

        self.ev = DslEvaluator(index_dir, store_root)
        self.spec = _ray.get(spec_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        ranks: list[int] = []
        docs: list[int] = []
        for qid in batch["query_id"].to_pylist():
            d, _ = self.ev.topk(self.spec[qid], self.k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
            }
        )


def q_search_dsl_ranked(sf_dir: str) -> ray.data.Dataset:
    """Ranked search-DSL retrieval: top-k per DSL query, candidates
    filtered by the boolean AST, scored by BM25 over the positive
    clauses' terms (rank key = round(score, 9) desc, doc_id asc —
    identical to bm25_topk)."""
    import ray as _ray

    from ciff_ray.pipelines import TOPK_K, ensure_index
    from ciff_ray.positions import ensure_positions

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    spec = expand_asts(
        {qid: parse_query(q) for qid, q in enumerate(DSL_QUERY_SET)}, idx
    )
    spec_ref = _ray.put(spec)
    queries = ray.data.from_arrow(
        pa.table(
            {"query_id": pa.array(sorted(spec), type=pa.int64())}
        )
    ).repartition(4)
    return queries.map_batches(
        _DslRankActor,
        fn_constructor_args=(idx, store, spec_ref, TOPK_K),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# oracle: compile the SAME ASTs to SQL predicates

def _scoring_patterns(node: tuple) -> list[tuple[str, str]]:
    """(kind, pattern) of positive-clause wildcard/fuzzy nodes — the
    clauses whose EXPANSION terms join the BM25 scoring set."""
    k = node[0]
    if k in ("wild", "fuzzy"):
        return [(k, node[1])]
    if k in ("and", "or"):
        out: list[tuple[str, str]] = []
        for c in node[1]:
            out.extend(_scoring_patterns(c))
        return out
    return []


def _expansion_subquery(kind: str, pat: str) -> str:
    """SQL computing the SAME capped expansion the engine's dictionary
    scan produces: top-{EXPANSION_CAP} vocabulary terms by
    (df desc, term asc) under the prefix / Levenshtein<=1 match."""
    cond = (
        f"term LIKE '{pat}%'"
        if kind == "wild"
        else f"levenshtein(term, '{pat}') <= 1"
    )
    return (
        "SELECT term FROM (SELECT term, row_number() OVER "
        f"(ORDER BY df DESC, term ASC) AS rn FROM dfv WHERE {cond}) "
        f"WHERE rn <= {EXPANSION_CAP}"
    )


def _sql_pred(node: tuple) -> str:
    k = node[0]
    if k == "term":
        return (
            f"d.doc_id IN (SELECT doc_id FROM tf WHERE term = '{node[1]}')"
        )
    if k in ("wild", "fuzzy"):
        return (
            "d.doc_id IN (SELECT doc_id FROM tf WHERE term IN ("
            + _expansion_subquery(k, node[1])
            + "))"
        )
    if k == "phrase":
        terms = node[1]
        joins = "".join(
            f"\n    JOIN tokpos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.pos = p0.pos + {i}"
            for i in range(1, len(terms))
        )
        conds = " AND ".join(
            f"p{i}.term = '{t}'" for i, t in enumerate(terms)
        )
        return (
            f"d.doc_id IN (SELECT p0.doc_id FROM tokpos p0{joins}"
            f"\n    WHERE {conds})"
        )
    if k == "role":
        # synth rule: role = _ROLES[doc_id % 4] (rank identity), same
        # arithmetic derivation every role-aware oracle in pipelines.py uses
        return f"d.doc_id % {_N_ROLES} = {_ROLES.index(node[1])}"
    if k == "or":
        return "(" + " OR ".join(_sql_pred(c) for c in node[1]) + ")"
    if k == "and":
        return "(" + " AND ".join(_sql_pred(c) for c in node[1]) + ")"
    return "NOT " + _sql_pred(node[1])  # not


def search_dsl_oracle_sql() -> str:
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    selects = []
    for qid, q in enumerate(DSL_QUERY_SET):
        pred = _sql_pred(parse_query(q))
        selects.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, d.doc_id AS doc_id"
            f"\nFROM docs d WHERE {pred}"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM transcripts
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
),
dfv AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM transcripts
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
docs AS (SELECT DISTINCT doc_id FROM transcripts)
{body}"""


def search_dsl_ranked_oracle_sql() -> str:
    """Top-k per DSL query: the standard BM25 scored CTE restricted to
    the query's positive terms, filtered by the compiled DSL predicate,
    ranked by (round(score, 9) DESC, doc_id ASC) — the engine's exact
    rank key.  The `tf` predicate subquery intentionally reuses the
    counted tf CTE from the BM25 base block (IN-semantics identical to
    the DISTINCT variant the set oracle uses)."""
    from ciff_ray.pipelines import _BM25_CONTRIB_SQL, TOPK_K, _bm25_base_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    qvals: list[str] = []
    preds: list[str] = []
    qx_parts: list[str] = []
    for qid, q in enumerate(DSL_QUERY_SET):
        ast = parse_query(q)
        for t in scoring_terms(ast):
            qvals.append(f"({qid}, '{t}')")
        for kind, pat in _scoring_patterns(ast):
            qx_parts.append(
                f"SELECT CAST({qid} AS BIGINT) AS query_id, term"
                f" FROM ({_expansion_subquery(kind, pat)})"
            )
        preds.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, d.doc_id AS doc_id"
            f"\nFROM docs d WHERE {_sql_pred(ast)}"
        )
    matched = "\nUNION ALL\n".join(preds)
    # scoring set = explicit positive terms UNION positive wildcard /
    # fuzzy expansions, deduped — exactly scoring_terms() over the
    # engine's expand_asts()-rewritten tree
    if qx_parts:
        qall = (
            "qall AS (\n  SELECT DISTINCT query_id, term FROM (\n"
            "    SELECT query_id, term FROM q\n    UNION ALL\n    "
            + "\n    UNION ALL\n    ".join(qx_parts)
            + "\n  )\n)"
        )
    else:
        qall = "qall AS (SELECT query_id, term FROM q)"
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_base_cte().lstrip()},
dfv AS (SELECT term, df FROM df),
q(query_id, term) AS (VALUES {", ".join(qvals)}),
{qall},
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         SUM(
           {_BM25_CONTRIB_SQL}
         ) AS score
  FROM qall q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM transcripts
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
),
docs AS (SELECT DISTINCT doc_id FROM transcripts),
matched AS (
{matched}
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY round(s.score, 9) DESC, s.doc_id ASC) AS rnk
  FROM scored s
  JOIN matched m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
) WHERE rnk <= {TOPK_K}"""
