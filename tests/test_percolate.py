"""Query percolation (reverse search) vs a pure-Python recompute."""

from __future__ import annotations

import pyarrow as pa

from ciff_ray.oracle import tokenize
from ciff_ray.percolate import _PercolateActor, parse_registry

QUERIES = [
    "the cat",            # 0: both terms required
    "hat",                # 1: single term
    "zzznotaterm",        # 2: never matches
    "the the cat cat",    # 3: duplicates collapse to the same as 0
    "",                   # 4: empty query matches nothing
]

TEXTS = [
    "the cat sat on the mat",   # matches 0, 1? no hat -> 0, 3
    "a hat and the cat",        # matches 0, 1, 3
    "hat hat hat",              # matches 1
    "dog",                      # matches nothing
    "",                         # matches nothing
]


def _brute() -> set[tuple[int, int]]:
    out = set()
    for qid, terms in parse_registry(QUERIES):
        if not terms:
            continue
        for d, text in enumerate(TEXTS):
            toks = set(tokenize(text))
            if all(t in toks for t in terms):
                out.add((d, qid))
    return out


def test_percolate_actor_matches_bruteforce():
    actor = _PercolateActor(QUERIES)
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
            "text": pa.array(TEXTS),
        }
    )
    out = actor(batch)
    got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    assert got == _brute()
    # spot invariants: conjunctive AND, duplicate-collapsed query == base
    assert (0, 0) in got and (1, 0) in got and (2, 0) not in got
    assert {q for d, q in got if d == 2} == {1}
    assert all(q != 2 and q != 4 for _, q in got)


def test_percolate_empty_batch():
    actor = _PercolateActor(QUERIES)
    batch = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }
    )
    out = actor(batch)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "query_id"]


def test_percolate_e2e_matches_oracle_sql(ray_session):
    """q_percolate over sf0.001 == the DuckDB oracle (the gate the
    driver runs at sf0.01)."""
    import os

    import duckdb
    import pandas as pd

    from ciff_ray.percolate import percolate_oracle_sql, q_percolate

    sf = "/root/testdata/sf0.001"
    t = pd.concat(
        b.to_pandas()
        for b in q_percolate(sf).iter_batches(batch_format="pyarrow")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    o = con.execute(percolate_oracle_sql()).df()
    key = ["doc_id", "query_id"]
    a = t[key].sort_values(key).reset_index(drop=True)
    b = o[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_percolate_large_registry_bruteforce():
    """The inverted-registry path at a few hundred stored queries:
    identical to a plain-Python conjunctive evaluation, including
    shared-term and subset-term rules."""
    import itertools
    import re

    words = [f"w{i}" for i in range(40)]
    # deterministic registry: all 2-term combos of the first 20 words
    # (190 rules) + some 3-term rules + duplicates-of-earlier rules
    registry = [
        f"{a} {b}" for a, b in itertools.combinations(words[:20], 2)
    ] + [f"{a} {b} {c}" for a, b, c in zip(words[:5], words[5:10], words[10:15])]
    # deterministic docs: doc i contains words whose index divides i+2
    texts = [
        " ".join(w for j, w in enumerate(words) if (i + 2) % (j + 2) == 0)
        for i in range(60)
    ]
    actor = _PercolateActor(registry)
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = actor(batch)
    got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    exp = set()
    for qid, q in enumerate(registry):
        terms = set(re.split(r"[^a-z0-9]+", q))
        for d, text in enumerate(texts):
            toks = set(re.split(r"[^a-z0-9]+", text)) - {""}
            if terms <= toks:
                exp.add((d, qid))
    assert got == exp and len(got) > 100


def test_percolate_property_random_registries():
    """Hypothesis: for random registries and documents over a small
    alphabet, the inverted CSR evaluation equals the set-inclusion
    definition exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from([f"t{i}" for i in range(8)])
    query = st.lists(word, min_size=0, max_size=4).map(" ".join)
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @given(
        st.lists(query, min_size=1, max_size=12),
        st.lists(doc, min_size=1, max_size=16),
    )
    @settings(max_examples=200, deadline=None)
    def run(registry, texts):
        actor = _PercolateActor(registry)
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        out = actor(batch)
        got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
        exp = set()
        for qid, q in enumerate(registry):
            terms = set(tokenize(q))
            if not terms:
                continue
            for d, text in enumerate(texts):
                if terms <= set(tokenize(text)):
                    exp.add((d, qid))
        assert got == exp

    run()


def test_phrase_percolate_actor_bruteforce():
    """Exact-phrase percolation vs a regex recompute: adjacency
    required, conjunctive presence alone is NOT a match."""
    import re

    from ciff_ray.percolate import _PhrasePercolateActor

    phrases = ["the cat", "hat hat", "zzznever term", "the the"]
    texts = [
        "the cat sat",        # 0: "the cat"
        "cat ... the",        # 1: both terms, wrong order -> no match
        "a hat, hat!",        # 2: "hat hat" across separators
        "hat and hat",        # 3: both present, not adjacent
        "the the the cat",    # 4: "the the" and "the cat"
        "",                   # 5: nothing
    ]
    actor = _PhrasePercolateActor(phrases)
    batch = pa.table(
        {
            # deliberately unsorted doc ids: the row mapping must not
            # assume sorted input
            "doc_id": pa.array([10, 3, 7, 0, 5, 2], type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = actor(batch)
    got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    ids = [10, 3, 7, 0, 5, 2]
    exp = set()
    pats = {
        0: r"(^|[^a-z0-9])the[^a-z0-9]+cat([^a-z0-9]|$)",
        1: r"(^|[^a-z0-9])hat[^a-z0-9]+hat([^a-z0-9]|$)",
        3: r"(^|[^a-z0-9])the[^a-z0-9]+the([^a-z0-9]|$)",
    }
    for qid, pat in pats.items():
        for d, text in zip(ids, texts):
            if re.search(pat, text.lower()):
                exp.add((d, qid))
    assert got == exp
    assert (10, 0) in got and (3, 0) not in got  # order matters
    assert (7, 1) in got and (0, 1) not in got   # adjacency matters
    assert (5, 3) in got                          # overlapping duplicate
