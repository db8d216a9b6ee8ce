"""End-to-end stemmed index: IndexBuilder(analyzer="porter") vs an
independent dict-based reconstruction (tokenize + porter per turn),
and build/query analyzer agreement."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def stemmed_index(ray_session, tmp_path_factory):
    from ciff_ray import IndexBuilder
    from ciff_ray.synth import generate_transcripts

    d = tmp_path_factory.mktemp("stemmed")
    src = str(d / "transcripts.parquet")
    pq.write_table(generate_transcripts(n_convs=60, seed=9), src)
    out = str(d / "idx")
    m = (
        IndexBuilder()
        .input_parquet(src)
        .output_dir(out)
        .partitions(4)
        .analyzer("porter")
        .convert()
    )
    return src, out, m


def _expected(src: str):
    from ciff_ray.analysis import porter_stem
    from ciff_ray.oracle import tokenize

    t = pq.read_table(src, columns=["conv_id", "turn_idx", "text"])
    rows = sorted(
        zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
        )
    )
    postings: dict[str, dict[int, int]] = defaultdict(Counter)
    doclen = []
    for doc_id, (_c, _i, text) in enumerate(rows):
        toks = [porter_stem(x) for x in tokenize(text or "")]
        doclen.append(len(toks))
        for x in toks:
            postings[x][doc_id] += 1
    return postings, doclen


def test_stemmed_postings_match_reconstruction(stemmed_index):
    from ciff_ray.query import LocalScorer

    src, out, m = stemmed_index
    want, doclen = _expected(src)
    s = LocalScorer(out)
    assert m.analyzer == "porter"
    assert sorted(s.vocabulary()) == sorted(want)
    assert m.total_terms_in_collection == sum(doclen)
    for term in sorted(want):
        docs, tfs = s.postings(term)
        exp = sorted(want[term].items())
        assert docs.tolist() == [d for d, _ in exp], term
        assert tfs.tolist() == [c for _, c in exp], term
        df, cf, _ = s._term_stat(term)
        assert df == len(exp) and cf == sum(c for _, c in exp)


def test_query_analyzed_like_build(stemmed_index):
    from ciff_ray.query import LocalScorer

    _src, out, _m = stemmed_index
    s = LocalScorer(out)
    # morphological variants hit the same stem -> identical results
    for a, b in (("tables", "table"), ("filtering filters", "filter")):
        da, sa = s.topk(a, k=10)
        db, sb = s.topk(b, k=10)
        assert da.tolist() == db.tolist()
        np.testing.assert_array_equal(sa, sb)
    # all three modes agree on the stemmed index
    q = "tables merging windows"
    exact = s.topk(q, k=10)
    for mode in ("maxscore", "bmw"):
        dm, sm = s.topk(q, k=10, mode=mode)
        assert dm.tolist() == exact[0].tolist()
        np.testing.assert_allclose(sm, exact[1], rtol=0, atol=0)


def test_unstemmed_default_unchanged(ray_session, tmp_path_factory):
    """analyzer='' (default) builds the identical index as before —
    guard against the hook changing the default path."""
    from ciff_ray import IndexBuilder
    from ciff_ray.query import LocalScorer
    from ciff_ray.synth import generate_transcripts

    d = tmp_path_factory.mktemp("plain")
    src = str(d / "t.parquet")
    pq.write_table(generate_transcripts(n_convs=20, seed=4), src)
    m = (
        IndexBuilder()
        .input_parquet(src)
        .output_dir(str(d / "idx"))
        .partitions(2)
        .convert()
    )
    assert m.analyzer == ""
    s = LocalScorer(str(d / "idx"))
    # raw surface forms present, unmerged
    vocab = set(s.vocabulary())
    from ciff_ray.oracle import tokenize

    toks = set()
    for txt in pq.read_table(src, columns=["text"])["text"].to_pylist():
        toks.update(tokenize(txt or ""))
    assert vocab == toks


def test_lifecycle_preserves_analyzer(stemmed_index, tmp_path_factory):
    """merge/ingest/compact must carry the analyzer through — a merged
    or compacted stemmed index that silently stops stemming query terms
    returns wrong results for every morphological variant (code-review
    findings on merge.py/lifecycle.py)."""
    import numpy as np
    import pytest

    from ciff_ray import IndexBuilder
    from ciff_ray.layout import IndexPaths, Manifest
    from ciff_ray.lifecycle import compact_index, delete_docs
    from ciff_ray.merge import merge_indexes
    from ciff_ray.query import LocalScorer
    from ciff_ray.synth import generate_transcripts

    src, out, m = stemmed_index
    d = tmp_path_factory.mktemp("an_lc")

    # second stemmed index over different data
    src2 = str(d / "t2.parquet")
    pq.write_table(generate_transcripts(n_convs=30, seed=21), src2)
    idx2 = str(d / "idx2")
    (
        IndexBuilder()
        .input_parquet(src2)
        .output_dir(idx2)
        .partitions(4)
        .analyzer("porter")
        .convert()
    )
    merged = str(d / "merged")
    mm = merge_indexes([out, idx2], merged)
    assert mm.analyzer == "porter"
    s = LocalScorer(merged)
    # wordlist variants: porter("years") == porter("year") == "year"
    da, _ = s.topk("years working", k=5)
    db, _ = s.topk("year work", k=5)
    assert da.tolist() == db.tolist() and da.size > 0

    # compact keeps it too
    victim = str(d / "victim")
    (
        IndexBuilder()
        .input_parquet(src2)
        .output_dir(victim)
        .partitions(4)
        .analyzer("porter")
        .convert()
    )
    delete_docs(victim, np.array([0, 1], dtype=np.int64))
    compacted = str(d / "compacted")
    cm = compact_index(victim, compacted)
    assert cm.analyzer == "porter"

    # stemmed + unstemmed must refuse to fold
    plain = str(d / "plain")
    (
        IndexBuilder()
        .input_parquet(src2)
        .output_dir(plain)
        .partitions(4)
        .convert()
    )
    with pytest.raises(ValueError, match="analyzer"):
        merge_indexes([out, plain], str(d / "bad"))
