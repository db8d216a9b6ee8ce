"""Round-4 final retrieval operators: boolean OR / AND-NOT, ordered
span-near, and ranking-quality metrics — each checked against an
independent pure-Python recompute over the tokenized sf0.001 corpus
(brute force over ALL position tuples for span-near, not the engine's
greedy chase)."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _doc_tokens() -> list[tuple[int, list[str]]]:
    from ciff_ray.oracle import tokenize

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return [
        (int(d), tokenize(x or ""))
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]


def test_boolean_or_matches_bruteforce(ray_session):
    from ciff_ray.booleanq import q_boolean_or
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET

    docs = _doc_tokens()
    expected = {}
    for qid, q in enumerate(QUERY_SET):
        terms = set(tokenize(q))
        for doc_id, toks in docs:
            n = len(terms & set(toks))
            if n:
                expected[(qid, doc_id)] = n
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_match"])
        for r in q_boolean_or(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # the no-hit query contributes nothing
    assert not any(q == QUERY_SET.index("zzznotaterm") for q, _ in got)


def test_boolean_and_not_matches_bruteforce(ray_session):
    from ciff_ray.booleanq import NOT_QUERY_SET, q_boolean_and_not
    from ciff_ray.oracle import tokenize

    docs = _doc_tokens()
    expected = set()
    for qid, (inc, exc) in enumerate(NOT_QUERY_SET):
        it = set(tokenize(inc))
        et = set(tokenize(exc))
        for doc_id, toks in docs:
            ts = set(toks)
            if it and it <= ts and not (et & ts):
                expected.add((qid, doc_id))
    got = {
        (int(r["query_id"]), int(r["doc_id"]))
        for r in q_boolean_and_not(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # self-exclusion is always empty
    self_ex = [
        qid for qid, (i, e) in enumerate(NOT_QUERY_SET)
        if set(tokenize(i)) & set(tokenize(e))
    ]
    assert self_ex and not any(q in self_ex for q, _ in got)


def test_boolean_or_msm_matches_bruteforce(ray_session):
    from ciff_ray.booleanq import MSM_QUERY_SET, q_boolean_or_msm
    from ciff_ray.oracle import tokenize

    docs = _doc_tokens()
    expected = {}
    for qid, (q, m) in enumerate(MSM_QUERY_SET):
        terms = set(tokenize(q))
        for doc_id, toks in docs:
            n = len(terms & set(toks))
            if n >= m:
                expected[(qid, doc_id)] = n
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_match"])
        for r in q_boolean_or_msm(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # m=1 degenerates to plain OR; the unreachable-m query is empty
    m1 = [qid for qid, (_, m) in enumerate(MSM_QUERY_SET) if m == 1]
    assert m1 and any(q in m1 for q, _ in got)
    dead = MSM_QUERY_SET.index(("zzznotaterm key", 2))
    assert not any(q == dead for q, _ in got)


def test_wildcard_suffix_bruteforce(ray_session):
    from ciff_ray.booleanq import (
        WILDCARD_MAX_TERMS,
        WILDCARD_SUFFIXES,
        q_wildcard_suffix,
    )

    docs = _doc_tokens()
    df: dict[str, int] = {}
    for _, toks in docs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    expected = {}
    cap_bound = False
    for pid, suffix in enumerate(WILDCARD_SUFFIXES):
        matching = sorted(
            (t for t in df if t.endswith(suffix)),
            key=lambda t: (-df[t], t),
        )
        cap_bound = cap_bound or len(matching) > WILDCARD_MAX_TERMS
        exp = set(matching[:WILDCARD_MAX_TERMS])
        for doc_id, toks in docs:
            n = len(exp & set(toks))
            if n:
                expected[(pid, doc_id)] = n
    assert cap_bound, "expansion cap must bind for at least one suffix"
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_match"])
        for r in q_wildcard_suffix(SF).to_pandas().to_dict("records")
    }
    assert got == expected


def test_term_regex_bruteforce(ray_session):
    """Independent check with Python re (a DIFFERENT regex engine from
    the RE2 both production sides use)."""
    import re

    from ciff_ray.booleanq import (
        REGEX_PATTERNS,
        WILDCARD_MAX_TERMS,
        q_term_regex,
    )

    docs = _doc_tokens()
    df: dict[str, int] = {}
    for _, toks in docs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    expected = {}
    cap_bound = False
    for pid, pat in enumerate(REGEX_PATTERNS):
        rx = re.compile(pat)
        matching = sorted(
            (t for t in df if rx.fullmatch(t)), key=lambda t: (-df[t], t)
        )
        cap_bound = cap_bound or len(matching) > WILDCARD_MAX_TERMS
        exp = set(matching[:WILDCARD_MAX_TERMS])
        for doc_id, toks in docs:
            n = len(exp & set(toks))
            if n:
                expected[(pid, doc_id)] = n
    assert cap_bound, "expansion cap must bind for at least one pattern"
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_match"])
        for r in q_term_regex(SF).to_pandas().to_dict("records")
    }
    assert got == expected


def _brute_min_gap(toks: list[str], terms: list[str]) -> int | None:
    """Exact min total gap over ALL strictly-increasing position
    tuples (the oracle semantics, independent of the greedy chase)."""
    pos = [
        [i for i, x in enumerate(toks) if x == t] for t in terms
    ]
    if any(not p for p in pos):
        return None
    best = None
    for combo in itertools.product(*pos):
        if all(b > a for a, b in zip(combo, combo[1:])):
            g = combo[-1] - combo[0] - (len(terms) - 1)
            if best is None or g < best:
                best = g
    return best


def test_span_near_matches_bruteforce(ray_session):
    from ciff_ray.positions import SPAN_QUERY_SET, q_span_near

    docs = _doc_tokens()
    expected = {}
    for qid, (terms, slop) in enumerate(SPAN_QUERY_SET):
        for doc_id, toks in docs:
            g = _brute_min_gap(toks, terms)
            if g is not None and g <= slop:
                expected[(qid, doc_id)] = g
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["min_gaps"])
        for r in q_span_near(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # slop-0 three-term span == exact phrase containment
    phrase_qid = SPAN_QUERY_SET.index((["the", "fast", "key"], 0))
    phrase_docs = {d for (q, d) in got if q == phrase_qid}
    brute_phrase = set()
    for doc_id, toks in docs:
        for i in range(len(toks) - 2):
            if toks[i : i + 3] == ["the", "fast", "key"]:
                brute_phrase.add(doc_id)
                break
    assert phrase_docs == brute_phrase


def _brute_min_window(toks: list[str], terms: list[str]) -> int | None:
    """Exact min unordered window gap over all one-position-per-term
    picks (any order)."""
    pos = [[i for i, x in enumerate(toks) if x == t] for t in terms]
    if any(not p for p in pos):
        return None
    best = None
    for combo in itertools.product(*pos):
        g = max(combo) - min(combo) - (len(terms) - 1)
        if best is None or g < best:
            best = g
    return best


def test_span_unordered_matches_bruteforce(ray_session):
    from ciff_ray.positions import (
        SPAN_UNORDERED_QUERY_SET,
        q_span_unordered,
    )

    docs = _doc_tokens()
    expected = {}
    for qid, (terms, slop) in enumerate(SPAN_UNORDERED_QUERY_SET):
        for doc_id, toks in docs:
            g = _brute_min_window(toks, terms)
            if g is not None and g <= slop:
                expected[(qid, doc_id)] = g
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["min_gaps"])
        for r in q_span_unordered(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # unordered is a superset of ordered at the same (terms, slop):
    # ("key", "the") slop 2 must catch "the ... key" docs too
    rev_qid = SPAN_UNORDERED_QUERY_SET.index((["key", "the"], 2))
    assert any(q == rev_qid for q, _ in got)


def test_span_unordered_kernel_property():
    """min-over-permutations of the greedy chase == brute-force min
    unordered window, on random distinct-term position sets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ciff_ray.positions import _span_unordered_min_gaps

    class _FakeStore:
        def __init__(self, keysets):
            self.keysets = keysets

        def keys(self, term, cand):
            return self.keysets[term]

    @st.composite
    def case(draw):
        n_terms = draw(st.integers(2, 3))
        n_docs = draw(st.integers(1, 3))
        # a position holds exactly ONE term (real tokenization): draw
        # unique positions per doc, then assign each to a term
        keys: dict[int, list[int]] = {t: [] for t in range(n_terms)}
        for doc in range(n_docs):
            poss = draw(
                st.lists(st.integers(0, 12), max_size=8, unique=True)
            )
            owners = draw(
                st.lists(
                    st.integers(0, n_terms - 1),
                    min_size=len(poss),
                    max_size=len(poss),
                )
            )
            for p, t in zip(sorted(poss), owners):
                keys[t].append((doc << 32) | p)
        sets = {
            f"t{t}": np.array(sorted(k), dtype=np.uint64)
            for t, k in keys.items()
        }
        return n_docs, sets

    @given(case())
    @settings(max_examples=150, deadline=None)
    def run(c):
        n_docs, sets = c
        terms = sorted(sets)
        if any(s.size == 0 for s in sets.values()):
            return
        docs, gaps = _span_unordered_min_gaps(
            _FakeStore(sets), terms, np.empty(0, np.int64)
        )
        got = dict(zip(docs.tolist(), gaps.tolist()))
        expect = {}
        for doc in range(n_docs):
            pos_lists = [
                [int(k) & 0xFFFFFFFF for k in sets[t].tolist() if k >> 32 == doc]
                for t in terms
            ]
            if any(not p for p in pos_lists):
                continue
            g = min(
                max(combo) - min(combo) - (len(terms) - 1)
                for combo in itertools.product(*pos_lists)
            )
            expect[doc] = g
        assert got == expect

    run()


def test_ranking_metrics_matches_bruteforce(ray_session):
    """Metric formulas recomputed from the corpus text + the engine's
    own (separately oracle-pinned) BM25 top-10."""
    from ciff_ray.evaluation import (
        METRICS_GRADE_CAP,
        METRICS_K,
        q_ranking_metrics,
    )
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET, q_bm25_topk

    docs = _doc_tokens()
    topk = q_bm25_topk(SF).to_pandas()
    got = {
        int(r["query_id"]): r
        for r in q_ranking_metrics(SF).to_pandas().to_dict("records")
    }
    assert set(got) == set(range(len(QUERY_SET)))
    for qid, q in enumerate(QUERY_SET):
        terms = sorted(set(tokenize(q)))
        grades, matched = {}, {}
        for doc_id, toks in docs:
            g = sum(toks.count(t) for t in terms)
            m = sum(1 for t in terms if t in toks)
            if m:
                grades[doc_id] = min(g, METRICS_GRADE_CAP)
                matched[doc_id] = m
        rel = {d for d, m in matched.items() if m == len(terms)}
        ranked = list(
            topk[topk.query_id == qid].sort_values("rank")["doc_id"]
        )[:METRICS_K]
        dcg = sum(
            (2.0 ** grades.get(d, 0) - 1) / np.log2(r + 1)
            for r, d in enumerate(ranked, 1)
        )
        ideal = sorted(grades.values(), reverse=True)[:METRICS_K]
        idcg = sum(
            (2.0**g - 1) / np.log2(r + 1) for r, g in enumerate(ideal, 1)
        )
        ndcg = round(dcg / idcg, 9) if idcg > 0 else 0.0
        firsts = [r for r, d in enumerate(ranked, 1) if d in rel]
        mrr = 1.0 / firsts[0] if firsts else 0.0
        recall = len(firsts) / len(rel) if rel else 0.0
        row = got[qid]
        assert int(row["n_rel"]) == len(rel)
        assert abs(float(row["ndcg10"]) - ndcg) < 1e-12, (qid, row, ndcg)
        assert float(row["mrr10"]) == mrr
        assert float(row["recall10"]) == recall
    # the all-miss query is all-zeros
    miss = got[QUERY_SET.index("zzznotaterm")]
    assert (
        int(miss["n_rel"]),
        float(miss["ndcg10"]),
        float(miss["mrr10"]),
        float(miss["recall10"]),
    ) == (0, 0.0, 0.0, 0.0)


def test_wildcard_match_bruteforce(ray_session):
    from ciff_ray.booleanq import (
        WILDCARD_MAX_TERMS,
        WILDCARD_PREFIXES,
        q_wildcard_match,
    )

    docs = _doc_tokens()
    df: dict[str, int] = {}
    for _, toks in docs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    expected = {}
    cap_bound = False
    for pid, prefix in enumerate(WILDCARD_PREFIXES):
        matching = sorted(
            (t for t in df if t.startswith(prefix)),
            key=lambda t: (-df[t], t),
        )
        cap_bound = cap_bound or len(matching) > WILDCARD_MAX_TERMS
        exp = set(matching[:WILDCARD_MAX_TERMS])
        for doc_id, toks in docs:
            n = len(exp & set(toks))
            if n:
                expected[(pid, doc_id)] = n
    assert cap_bound, "expansion cap must bind for at least one prefix"
    got = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_match"])
        for r in q_wildcard_match(SF).to_pandas().to_dict("records")
    }
    assert got == expected


def test_top_terms_per_prefix_two_level_exact():
    """Per-batch partial top-k then driver merge == direct global
    top-k, for any batch split (the partial is a per-prefix superset)."""
    import random

    from ciff_ray.booleanq import _top_terms_per_prefix

    rng = random.Random(7)
    rows = [
        (rng.randrange(3), f"t{rng.randrange(40):02d}", rng.randrange(1, 9))
        for _ in range(200)
    ]
    # dedup (prefix, term) keeping max df, like a real dictionary
    best: dict[tuple[int, str], int] = {}
    for p, t, d in rows:
        best[(p, t)] = max(best.get((p, t), 0), d)
    items = [(p, t, d) for (p, t), d in best.items()]
    pids = np.array([p for p, _, _ in items], dtype=np.int64)
    terms = np.array([t for _, t, _ in items], dtype=object)
    dfs = np.array([d for _, _, d in items], dtype=np.int64)
    cap = 5
    gp, gt, gd = _top_terms_per_prefix(pids, terms, dfs, cap)
    direct = {
        p: sorted(
            ((t, d) for p2, t, d in items if p2 == p),
            key=lambda kv: (-kv[1], kv[0]),
        )[:cap]
        for p in set(pids.tolist())
    }
    # two-level: split into 4 chunks, partial each, merge, re-top
    parts = []
    for lo in range(0, len(items), 50):
        sl = slice(lo, lo + 50)
        parts.append(
            _top_terms_per_prefix(pids[sl], terms[sl], dfs[sl], cap)
        )
    mp = np.concatenate([p for p, _, _ in parts])
    mt = np.concatenate([t for _, t, _ in parts])
    md = np.concatenate([d for _, _, d in parts])
    fp, ft, fd = _top_terms_per_prefix(mp, mt, md, cap)
    two_level = {}
    for p, t, d in zip(fp.tolist(), ft.tolist(), fd.tolist()):
        two_level.setdefault(p, []).append((t, d))
    one_level = {}
    for p, t, d in zip(gp.tolist(), gt.tolist(), gd.tolist()):
        one_level.setdefault(p, []).append((t, d))
    assert one_level == direct
    assert two_level == direct


def test_chase_min_gaps_property():
    """Greedy chase == exact min over all ordered tuples, on random
    position sets (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ciff_ray.positions import _chase_min_gaps

    @st.composite
    def keysets(draw):
        n_terms = draw(st.integers(2, 4))
        n_docs = draw(st.integers(1, 4))
        sets = []
        for _ in range(n_terms):
            keys = []
            for doc in range(n_docs):
                poss = draw(
                    st.lists(
                        st.integers(0, 12), max_size=6, unique=True
                    )
                )
                keys.extend((doc << 32) | p for p in sorted(poss))
            sets.append(np.array(sorted(keys), dtype=np.uint64))
        return n_docs, sets

    @given(keysets())
    @settings(max_examples=200, deadline=None)
    def run(case):
        n_docs, sets = case
        docs, gaps = _chase_min_gaps(sets)
        got = dict(zip(docs.tolist(), gaps.tolist()))
        expect = {}
        for doc in range(n_docs):
            pos_lists = [
                [int(k) & 0xFFFFFFFF for k in s.tolist() if k >> 32 == doc]
                for s in sets
            ]
            g = None
            for combo in itertools.product(*pos_lists):
                if all(b > a for a, b in zip(combo, combo[1:])):
                    w = combo[-1] - combo[0] - (len(sets) - 1)
                    g = w if g is None or w < g else g
            if g is not None:
                expect[doc] = g
        assert got == expect

    run()
