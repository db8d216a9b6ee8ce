"""Search-DSL parser + evaluator, checked against an independent
pure-Python set-semantics recompute over the tokenized sf0.001 corpus
(universe-based: NOT is true complement, phrases scan all positions —
not the engine's filter-only evaluation order)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# parser


def test_parse_precedence_and_nesting():
    from ciff_ray.searchdsl import parse_query

    # AND binds tighter than OR
    assert parse_query("key OR merge AND join") == (
        "or",
        [("term", "key"), ("and", [("term", "merge"), ("term", "join")])],
    )
    assert parse_query("(key OR merge) AND join") == (
        "and",
        [("or", [("term", "key"), ("term", "merge")]), ("term", "join")],
    )
    assert parse_query('"batch stream"') == ("phrase", ["batch", "stream"])
    assert parse_query('"key"') == ("term", "key")
    assert parse_query("key AND NOT role:tool") == (
        "and",
        [("term", "key"), ("not", ("role", "tool"))],
    )
    assert parse_query("mer* AND keu~") == (
        "and",
        [("wild", "mer"), ("fuzzy", "keu")],
    )


@pytest.mark.parametrize(
    "bad",
    [
        "NOT key",                # pure negative at top level
        "role:user",              # bare filter generates nothing
        "key OR NOT merge",       # NOT cannot be OR'd
        "key OR role:user",       # filters cannot be OR'd
        "role:user AND NOT key",  # AND group with no generator
        "key AND",                # dangling operator
        "key)",                   # trailing token
        "(key",                   # unclosed paren
        "field:val AND key",      # unknown field
        "role:ceo AND key",       # unknown role value
        '"" OR key',              # empty phrase
        "*foo",                   # leading wildcard star
        "f*o",                    # interior star
        "~key",                   # leading fuzzy marker
        "a*~",                    # mixed markers
    ],
)
def test_parse_rejects(bad):
    from ciff_ray.searchdsl import parse_query

    with pytest.raises(ValueError):
        parse_query(bad)


# ---------------------------------------------------------------------------
# evaluation vs universe-based brute force


def _doc_tokens() -> list[tuple[int, list[str]]]:
    from ciff_ray.oracle import tokenize

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return [
        (int(d), tokenize(x or ""))
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand(kind: str, pat: str, docs) -> list[str]:
    """Independent top-4 (df desc, term asc) expansion over the corpus
    vocabulary."""
    df = {}
    for _, toks in docs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    if kind == "wild":
        hits = [t for t in df if t.startswith(pat)]
    else:
        hits = [t for t in df if _lev(t, pat) <= 1]
    hits.sort(key=lambda t: (-df[t], t))
    return hits[:4]


def _brute(node, docs, universe):
    from ciff_ray.synth import _ROLES

    k = node[0]
    if k == "term":
        return {d for d, toks in docs if node[1] in toks}
    if k in ("wild", "fuzzy"):
        terms = set(_expand(k, node[1], docs))
        return {d for d, toks in docs if terms & set(toks)}
    if k == "phrase":
        terms = node[1]
        out = set()
        for d, toks in docs:
            for p in range(len(toks) - len(terms) + 1):
                if toks[p : p + len(terms)] == terms:
                    out.add(d)
                    break
        return out
    if k == "role":
        ri = _ROLES.index(node[1])
        return {d for d in universe if d % len(_ROLES) == ri}
    if k == "not":
        return universe - _brute(node[1], docs, universe)
    sets = [_brute(c, docs, universe) for c in node[1]]
    if k == "or":
        return set().union(*sets)
    return set.intersection(*sets)  # and


def test_dsl_matches_bruteforce(ray_session):
    from ciff_ray.searchdsl import DSL_QUERY_SET, parse_query, q_search_dsl

    docs = _doc_tokens()
    universe = {d for d, _ in docs}
    expected = set()
    for qid, q in enumerate(DSL_QUERY_SET):
        for d in _brute(parse_query(q), docs, universe):
            expected.add((qid, d))
    got = {
        (int(r["query_id"]), int(r["doc_id"]))
        for r in q_search_dsl(SF).to_pandas().to_dict("records")
    }
    assert got == expected
    # the fixed set must actually exercise every construct non-trivially
    assert any(q for q in DSL_QUERY_SET if '"' in q)
    by_qid = {}
    for qid, _ in got:
        by_qid[qid] = by_qid.get(qid, 0) + 1
    assert all(by_qid.get(q, 0) > 0 for q in range(len(DSL_QUERY_SET)))


def test_scoring_terms_excludes_filters():
    from ciff_ray.searchdsl import parse_query, scoring_terms

    assert scoring_terms(parse_query('table AND NOT "the key"')) == ["table"]
    assert scoring_terms(parse_query('"batch stream" OR spark')) == [
        "batch", "spark", "stream",
    ]
    assert scoring_terms(parse_query("role:tool AND key")) == ["key"]


def test_dsl_ranked_matches_bruteforce(ray_session):
    import math

    from ciff_ray.oracle import B_DEFAULT, EPS_IDF, K1_DEFAULT
    from ciff_ray.searchdsl import (
        DSL_QUERY_SET,
        parse_query,
        q_search_dsl_ranked,
    )

    docs = _doc_tokens()
    universe = {d for d, _ in docs}
    toks_of = dict(docs)
    n = len(docs)
    lens = {d: len(t) for d, t in docs}
    avgdl = sum(lens.values()) / n
    df = {}
    for _, toks in docs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1

    def idf(t):
        if t not in df:
            return 0.0
        return max(math.log((n - df[t] + 0.5) / (df[t] + 0.5)), EPS_IDF)

    def scoring_set(node):
        k = node[0]
        if k == "term":
            return {node[1]}
        if k == "phrase":
            return set(node[1])
        if k in ("wild", "fuzzy"):
            return set(_expand(k, node[1], docs))
        if k in ("and", "or"):
            out = set()
            for c in node[1]:
                out |= scoring_set(c)
            return out
        return set()  # role / not

    expected = set()
    for qid, q in enumerate(DSL_QUERY_SET):
        ast = parse_query(q)
        terms = sorted(scoring_set(ast))
        scored = []
        for d in _brute(ast, docs, universe):
            s = 0.0
            for t in terms:
                tf = toks_of[d].count(t)
                if tf:
                    s += (
                        idf(t)
                        * tf
                        * (K1_DEFAULT + 1.0)
                        / (tf + K1_DEFAULT * (1.0 - B_DEFAULT + B_DEFAULT * lens[d] / avgdl))
                    )
            scored.append((d, s))
        ranked = sorted(scored, key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]
        for r, (d, _) in enumerate(ranked, 1):
            expected.add((qid, r, d))
    got = {
        (int(r["query_id"]), int(r["rank"]), int(r["doc_id"]))
        for r in q_search_dsl_ranked(SF).to_pandas().to_dict("records")
    }
    assert got == expected


def test_local_expansion_matches_distributed(ray_session):
    from ciff_ray.pipelines import ensure_index
    from ciff_ray.positions import ensure_positions
    from ciff_ray.searchdsl import (
        DSL_QUERY_SET,
        DslEvaluator,
        _collect_patterns,
        _local_expansions,
        expand_asts,
        parse_query,
    )

    idx = ensure_index(SF)
    asts = {i: parse_query(q) for i, q in enumerate(DSL_QUERY_SET)}
    wild, fuzzy = [], []
    for a in asts.values():
        _collect_patterns(a, wild, fuzzy)
    assert wild and fuzzy  # the fixed set exercises both
    ev = DslEvaluator(idx, ensure_positions(SF))
    wmap, fmap = _local_expansions(ev.scorer, wild, fuzzy)

    def terms_of(node, acc):
        if node[0] == "terms":
            acc.append(sorted(node[1]))
        elif node[0] == "not":
            terms_of(node[1], acc)
        elif node[0] in ("and", "or"):
            for c in node[1]:
                terms_of(c, acc)

    dist_terms: list[list[str]] = []
    for a in expand_asts(asts, idx).values():
        terms_of(a, dist_terms)
    local = {p: sorted(t) for p, t in {**wmap, **fmap}.items()}
    # every distributed expansion appears identically in the local map
    assert sorted(dist_terms) == sorted(
        local[p] for p in wild + fuzzy
    )
    # the cap must BIND somewhere so the tie-key parity is exercised
    assert any(len(t) == 4 for t in dist_terms)


def test_search_oneshot_and_cli(ray_session, capsys):
    from ciff_ray.cli import main
    from ciff_ray.pipelines import ensure_index
    from ciff_ray.positions import ensure_positions
    from ciff_ray.searchdsl import q_search_dsl_ranked, search

    idx = ensure_index(SF)
    pos = ensure_positions(SF)
    # one-shot ranked search == the batch entry's rows for that query
    docs, scores = search(idx, pos, "mer* AND key", k=10)
    batch = q_search_dsl_ranked(SF).to_pandas()
    qid = 8  # "mer* AND key" position in DSL_QUERY_SET
    want = batch[batch.query_id == qid].sort_values("rank").doc_id.tolist()
    assert docs.tolist() == want
    # set-mode search: every hit contains a mer*-expansion term AND key
    hits = search(idx, pos, 'keu~ AND "batch stream"')
    toks_of = dict(_doc_tokens())
    for d in hits.tolist():
        toks = toks_of[int(d)]
        assert any(
            " ".join(toks[i : i + 2]) == "batch stream"
            for i in range(len(toks))
        )
    main(["search", idx, pos, "mer* AND key", "-k", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3 and out[0].startswith("1\t")
    main(["search", idx, pos, "key AND NOT merge"])
    out2 = capsys.readouterr().out.strip().splitlines()
    assert len(out2) > 0 and all("\t" in ln for ln in out2)
