"""Tokenizer unit tests + equivalence with the DuckDB-side tokenizer."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from ciff_ray import tokenizer


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_term_frequencies_basic():
    t = tokenizer.term_frequencies(_tbl(["Hello, hello WORLD 42!", "", "a--a a"]))
    rows = sorted(zip(*[c.to_pylist() for c in t.columns]))
    assert rows == [(0, "42", 1), (0, "hello", 2), (0, "world", 1), (2, "a", 3)]


def test_doc_lengths():
    t = tokenizer.doc_lengths(_tbl(["one two three", "", "  ", "x!x"]))
    assert t["doclength"].to_pylist() == [3, 0, 0, 2]


def test_matches_duckdb_tokenizer():
    texts = [
        "The quick-brown FOX; jumps(over) the lazy dog 99 times",
        "",
        "...leading and trailing...",
        "ALLCAPS 123abc mixed4you",
        "tabs\tand\nnewlines  spaces",
    ]
    ray_tf = tokenizer.term_frequencies(_tbl(texts))
    ray_rows = sorted(zip(*[c.to_pylist() for c in ray_tf.columns]))

    con = duckdb.connect()
    con.register("docs", _tbl(texts))
    frag = tokenizer.SQL_TOKENIZE_FRAGMENT.format(col="text")
    sql_rows = con.execute(
        f"""
        SELECT doc_id, term, CAST(count(*) AS INT) AS tf FROM (
          SELECT doc_id, unnest({frag}) AS term FROM docs
        ) WHERE term <> '' GROUP BY doc_id, term ORDER BY doc_id, term
        """
    ).fetchall()
    assert ray_rows == [tuple(r) for r in sql_rows]


def test_term_frequencies_empty_batch():
    t = tokenizer.term_frequencies(_tbl([]))
    assert len(t) == 0
    assert t.column_names == ["doc_id", "term", "tf"]
