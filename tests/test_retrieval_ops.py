"""Round-3 retrieval/aggregate operators: conjunctive boolean AND,
per-role heavy-hitter terms, exact per-role discrete quantiles
(kernel edges + sf0.001 e2e vs independent Python recomputes)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _transcript_tokens() -> list[tuple[int, list[str]]]:
    from ciff_ray.oracle import tokenize

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return [
        (int(d), tokenize(x or ""))
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]


def test_intersect_sorted_kernel():
    from ciff_ray.pipelines import _intersect_sorted

    a = np.array([1, 3, 5, 9, 12], dtype=np.int64)
    b = np.array([3, 4, 9, 13], dtype=np.int64)
    assert _intersect_sorted(a, b).tolist() == [3, 9]
    # probe past the end of d must not wrap or error
    assert _intersect_sorted(np.array([99], dtype=np.int64), b).size == 0
    assert _intersect_sorted(np.empty(0, np.int64), b).size == 0
    assert _intersect_sorted(a, np.empty(0, np.int64)).size == 0


def test_boolean_and_matches_bruteforce(ray_session):
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET, q_boolean_and

    docs = _transcript_tokens()
    expected = set()
    for qid, q in enumerate(QUERY_SET):
        terms = set(tokenize(q))
        for doc_id, toks in docs:
            if terms and terms <= set(toks):
                expected.add((qid, doc_id))
    got = {
        (int(r["query_id"]), int(r["doc_id"]))
        for r in q_boolean_and(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # the no-hit query contributes nothing
    assert not any(q == QUERY_SET.index("zzznotaterm") for q, _ in got)


def test_topk_per_role_tie_break():
    """cnt ties order by term ascending; runs don't leak across roles."""
    from ciff_ray.pipelines import _topk_per_role

    t = pa.table(
        {
            "role": pa.array([0, 0, 0, 1], type=pa.int32()),
            "term": pa.array(["b", "a", "c", "z"]),
            "cnt": pa.array([5, 5, 9, 1], type=pa.int64()),
        }
    )
    top = _topk_per_role(t, 2)
    rows = list(
        zip(
            top["role"].to_pylist(),
            top["term"].to_pylist(),
            top["rk"].to_pylist(),
        )
    )
    assert rows == [(0, "c", 1), (0, "a", 2), (1, "z", 1)]


def test_role_top_terms_e2e(ray_session):
    from collections import Counter

    from ciff_ray.pipelines import ROLE_TOP_K, _ROLE_NAMES, q_role_top_terms

    counts: dict[str, Counter] = {r: Counter() for r in _ROLE_NAMES}
    for doc_id, toks in _transcript_tokens():
        counts[_ROLE_NAMES[doc_id % 4]].update(toks)
    got = q_role_top_terms(SF).to_pandas()
    assert len(got) == 4 * ROLE_TOP_K
    for role, sub in got.groupby("role"):
        want = sorted(
            counts[role].items(), key=lambda kv: (-kv[1], kv[0])
        )[:ROLE_TOP_K]
        sub = sub.sort_values("rank")
        assert list(sub["term"]) == [t for t, _ in want]
        assert list(sub["cnt"]) == [c for _, c in want]
        assert list(sub["rank"]) == list(range(1, ROLE_TOP_K + 1))


def test_dlq_final_quantile_rule():
    """ceil(n*q)-1 indexing, duplicate histogram rows merged across
    partials (the same value arriving from two batches)."""
    from ciff_ray.pipelines import _dlq_final

    # multiset {3 x1, 7 x3, 9 x2} split across duplicate partial rows
    group = pa.table(
        {
            "role": pa.array([2, 2, 2, 2], type=pa.int32()),
            "ntok": pa.array([7, 3, 9, 7], type=pa.int64()),
            "cnt": pa.array([1, 1, 2, 2], type=pa.int64()),
        }
    )
    row = _dlq_final(group).to_pylist()[0]
    vals = sorted([3, 7, 7, 7, 9, 9])
    n = len(vals)
    for q in (0.25, 0.5, 0.75, 0.95):
        assert row[f"p{int(q * 100)}"] == vals[int(np.ceil(n * q)) - 1]
    assert row["n"] == n and row["role"] == "system"


def test_doclength_quantiles_e2e(ray_session):
    from ciff_ray.pipelines import q_doclength_quantiles

    per_role: dict[str, list[int]] = {}
    from ciff_ray.pipelines import _ROLE_NAMES

    for doc_id, toks in _transcript_tokens():
        per_role.setdefault(_ROLE_NAMES[doc_id % 4], []).append(len(toks))
    got = q_doclength_quantiles(SF).to_pandas().set_index("role")
    for role, lens in per_role.items():
        vals = sorted(lens)
        n = len(vals)
        assert got.loc[role, "n"] == n
        for q in (0.25, 0.5, 0.75, 0.95):
            assert (
                got.loc[role, f"p{int(q * 100)}"]
                == vals[int(np.ceil(n * q)) - 1]
            )


def test_phrase_regex_semantics():
    from ciff_ray.pipelines import _phrase_regex
    import re

    pat = re.compile(_phrase_regex(["the", "fast"]))
    assert pat.search("the fast key")           # leading edge
    assert pat.search("x the  fast")            # multi-space separator
    assert pat.search("a the-fast b")           # any non-token run
    assert not pat.search("the faster key")     # token boundary holds
    assert not pat.search("lathe fast")         # left boundary holds
    assert not pat.search("fast the")           # order matters


def test_phrase_match_matches_bruteforce(ray_session):
    import re

    from ciff_ray.pipelines import PHRASE_SET, _phrase_regex, q_phrase_match
    from ciff_ray.oracle import tokenize

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expected = set()
    for qid, phrase in enumerate(PHRASE_SET):
        terms = tokenize(phrase)
        if not terms:
            continue
        pat = re.compile(_phrase_regex(terms))
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if pat.search((x or "").lower()):
                expected.add((qid, int(d)))
    got = {
        (int(r["query_id"]), int(r["doc_id"]))
        for r in q_phrase_match(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    assert expected  # the phrase set is non-degenerate on this corpus


def test_doc_top_tfidf_vs_bruteforce(ray_session):
    import math
    from collections import Counter

    from ciff_ray.pipelines import TFIDF_TOP_K, q_doc_top_tfidf

    docs = _transcript_tokens()
    n_docs = len(docs)
    df: Counter = Counter()
    for _, toks in docs:
        df.update(set(toks))
    got = q_doc_top_tfidf(SF).to_pandas()
    by_doc = {d: s.sort_values("rank") for d, s in got.groupby("doc_id")}
    for doc_id, toks in docs[:50]:
        tf = Counter(toks)
        want = sorted(
            (
                (t, c * math.log(n_docs / df[t]))
                for t, c in tf.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:TFIDF_TOP_K]
        if not want:
            assert doc_id not in by_doc
            continue
        sub = by_doc[doc_id]
        assert list(sub["term"]) == [t for t, _ in want]
        assert np.allclose(
            sub["score_r"], [round(s, 6) for _, s in want], atol=1e-9
        )


def test_bm25_snippets_window_semantics(ray_session):
    """Every snippet is the ±30-char window around the earliest
    query-term substring hit of its (lowercased) document text."""
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import (
        QUERY_SET,
        SNIPPET_RADIUS,
        q_bm25_snippets,
    )

    got = q_bm25_snippets(SF).to_pandas()
    assert (got.groupby("query_id")["rank"].count() <= 10).all()
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for row in got.itertuples():
        text = text_of[row.doc_id]
        low = text.lower()
        terms = sorted(set(tokenize(QUERY_SET[row.query_id])))
        p = min(
            (low.find(t) + 1 for t in terms if low.find(t) >= 0), default=1
        )
        start = max(p - SNIPPET_RADIUS, 1)
        assert row.snippet == text[start - 1 : start - 1 + 2 * SNIPPET_RADIUS + 1]
        # the window indeed contains a query term unless the doc only
        # matched terms longer than the radius allows (can't happen:
        # the hit starts inside the window by construction)
        assert any(t in row.snippet.lower() for t in terms) or p == 1


def test_more_like_this_vs_bruteforce(ray_session):
    """more_like_this == brute-force: expansion terms are the seed's
    top-TFIDF_TOP_K TF-IDF terms (score desc, term asc), results are
    the BM25 ranking of that term set with the seed excluded."""
    import math

    from ciff_ray.oracle import OracleIndex
    from ciff_ray.pipelines import (
        MLT_SEEDS,
        TFIDF_TOP_K,
        TOPK_K,
        q_more_like_this,
    )
    from ciff_ray.synth import transcripts_from_documents

    got = q_more_like_this(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tr = transcripts_from_documents(docs)
    tr = tr.append_column("doc_id", docs["doc_id"])
    oracle = OracleIndex.build(tr)
    n = len(docs)
    text_of = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    for seed in MLT_SEEDS:
        from ciff_ray.oracle import tokenize

        toks = tokenize(text_of[seed])
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((term, c * math.log(n / oracle.df(term))) for term, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:TFIDF_TOP_K]
        q = " ".join(term for term, _ in scored)
        exp = [
            d
            for d, _ in sorted(
                oracle.bm25_scores(q).items(), key=lambda kv: (-kv[1], kv[0])
            )
            if d != seed
        ][:TOPK_K]
        sub = got[got.seed_doc_id == seed].sort_values("rank")
        assert sub.doc_id.tolist() == exp, seed
        assert sub["rank"].tolist() == list(range(1, len(exp) + 1))
        assert seed not in sub.doc_id.tolist()


def test_bm25_feedback_vs_bruteforce(ray_session):
    """Pseudo-relevance feedback == brute force: integer tf votes over
    the original top-k pool, df-capped, top-5 joined to the query,
    re-ranked.  Also asserts the expansion actually changes rankings
    (the entry must not be vacuously identical to bm25_topk)."""
    from ciff_ray.oracle import OracleIndex, tokenize
    from ciff_ray.pipelines import (
        FEEDBACK_DF_FRAC,
        FEEDBACK_DOCS,
        FEEDBACK_TERMS,
        QUERY_SET,
        TOPK_K,
        q_bm25_feedback,
        q_bm25_topk,
    )
    from ciff_ray.synth import transcripts_from_documents

    got = (
        q_bm25_feedback(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    oracle = OracleIndex.build(transcripts_from_documents(docs))
    text_of = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    n = len(docs)
    for qid, q in enumerate(QUERY_SET):
        pool = [d for d, _ in oracle.bm25_topk(q, k=FEEDBACK_DOCS)]
        votes: dict[str, int] = {}
        for d in pool:
            for t in tokenize(text_of[d]):
                if oracle.df(t) * FEEDBACK_DF_FRAC <= n:
                    votes[t] = votes.get(t, 0) + 1
        fb = [
            t
            for t, _ in sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[
                :FEEDBACK_TERMS
            ]
        ]
        expanded = " ".join(sorted(set(tokenize(q)) | set(fb)))
        exp = [d for d, _ in oracle.bm25_topk(expanded, k=TOPK_K)]
        sub = got[got.query_id == qid]
        assert sub.doc_id.tolist() == exp, (qid, q)
    plain = (
        q_bm25_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert not got[["query_id", "rank", "doc_id"]].equals(
        plain[["query_id", "rank", "doc_id"]]
    )
