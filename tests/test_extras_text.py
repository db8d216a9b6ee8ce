"""Text-analysis extras vs pure-Python oracles (sf0.001 testdata)."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from ciff_ray.extras import textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _tokens(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def test_fingerprint_matches_python_oracle(ray_session, docs):
    got = {
        r["doc_id"]: r
        for r in textstats.q_doc_fingerprint(SF).take_all()
    }
    assert set(got) == set(docs)
    for doc_id, text in list(docs.items())[:100]:
        toks = _tokens(text)
        h = [zlib.crc32(t.encode()) for t in toks]
        w = textstats.FP_WINDOW
        if not h:
            fp = set()
        elif len(h) < w:
            fp = set(h)
        else:
            fp = {min(h[i : i + w]) for i in range(len(h) - w + 1)}
        r = got[doc_id]
        assert r["n_fp"] == len(fp)
        assert r["fp_min"] == (min(fp) if fp else -1)
        xor = 0
        for v in fp:
            xor ^= v
        assert r["fp_xor"] == xor


def test_fingerprint_similar_docs_share_fingerprints(ray_session):
    """Planted near-dup docs share most winnowing fingerprints."""
    from ciff_ray.extras import dedup

    pairs = dedup.q_dedup_minhash(SF).to_pandas()
    assert len(pairs) > 0
    rows = {r["doc_id"]: r for r in textstats.q_doc_fingerprint(SF).take_all()}
    a0 = int(pairs["a"].iloc[0])
    b0 = int(pairs["b"].iloc[0])
    # near-identical docs -> near-identical fingerprint summaries
    assert rows[a0]["fp_min"] == rows[b0]["fp_min"]


def test_lang_id_rule(ray_session, docs):
    got = {r["doc_id"]: r for r in textstats.q_lang_id(SF).take_all()}
    langs = sorted(textstats.LANG_STOPWORDS)
    for doc_id, text in list(docs.items())[:50]:
        toks = _tokens(text)
        scores = [
            sum(t in textstats.LANG_STOPWORDS[lang] for t in toks) for lang in langs
        ]
        exp = langs[int(np.argmax(scores))]
        assert got[doc_id]["lang_pred"] == exp
        for lang, s in zip(langs, scores):
            assert got[doc_id][f"score_{lang}"] == s


def test_token_counts_pinned():
    import pyarrow as pa

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["Hello, world! 42x", "", "a  b\tc\nd"]),
        }
    )
    out = textstats._token_counts_batch(batch)
    # "hello, world! 42x" -> tokens [hello, world, 42x]; ws [Hello,, world!, 42x]
    # bpe: alpha runs [hello, world, x] + digit runs [42] + punct runs [,, !]
    assert out["n_tokens"].to_pylist() == [3, 0, 4]
    assert out["n_ws"].to_pylist() == [3, 0, 4]
    assert out["n_bpe"].to_pylist() == [3 + 1 + 2, 0, 4]


def test_collocations_pinned(ray_session, tmp_path):
    """PMI on a hand-countable corpus: 'red car' appears 6x, 'red' 7x,
    'car' 6x, plus filler tokens; verify count, PMI value, rank order,
    and that sub-threshold bigrams are dropped."""
    import math

    import pyarrow as pa

    texts = ["red car"] * 6 + ["red", "blue sky"] + ["blue sky"] * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = textstats.q_collocations(str(tmp_path))
    rows = {
        (r["term_a"], r["term_b"]): r for r in out.to_pylist()
    }
    # totals: tokens T = 6*2 + 1 + 5*2 = 23; bigrams B = 6 + 5 = 11
    assert set(rows) == {("red", "car"), ("blue", "sky")}
    rc = rows[("red", "car")]
    assert rc["cnt"] == 6 and rc["rank"] == 1
    exp = math.log(6 / 11) - math.log(7 / 23) - math.log(6 / 23)
    assert rc["pmi_r"] == round(exp, 6)
    bs = rows[("blue", "sky")]
    assert bs["cnt"] == 5 and bs["rank"] == 2
    exp2 = math.log(5 / 11) - math.log(5 / 23) - math.log(5 / 23)
    assert bs["pmi_r"] == round(exp2, 6)
