"""CIFF <-> Ray-index bridge: imported CIFF collections are served by
the Ray query engine; Ray-built indexes export to valid CIFF."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.interop import CiffReader
from ciff_ray.interop.bridge import ciff_to_index, index_to_ciff
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts

TOY = "/root/reference/tests/test_data/toy-complete-20200309.ciff"


def test_ciff_to_index_toy(tmp_path):
    out = str(tmp_path / "idx")
    manifest = ciff_to_index(TOY, out, BuildParams(num_partitions=3))
    assert manifest.num_docs == 3
    assert manifest.num_postings_lists == 9
    assert manifest.average_doclength == pytest.approx(16 / 3)

    scorer = LocalScorer(out)
    expected = {
        pl.term: (pl.doc_ids().tolist(), pl.tfs.tolist())
        for pl in CiffReader(TOY).postings_lists()
    }
    assert scorer.vocabulary() == sorted(expected.keys())
    for term, (docs, tfs) in expected.items():
        d, t = scorer.postings(term)
        assert d.tolist() == docs, term
        assert t.tolist() == tfs, term

    # BM25 serving works over the imported index
    docs, scores = scorer.topk("text content", k=3)
    assert len(docs) > 0
    assert scorer.collection_docids(docs)[0] in ("WSJ_1", "TREC_DOC_1", "DOC222")


def test_index_to_ciff_round_trip(tmp_path):
    """Ray-built index -> CIFF -> re-import -> identical postings."""
    tbl = generate_transcripts(n_convs=12, max_turns=4, seed=11)
    idx1 = str(tmp_path / "idx1")
    build_index(
        ray.data.from_arrow(tbl).repartition(3),
        idx1,
        BuildParams(num_partitions=4, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    ciff_path = str(tmp_path / "export.ciff")
    header = index_to_ciff(idx1, ciff_path)

    s1 = LocalScorer(idx1)
    assert header.num_docs == s1.manifest.num_docs
    assert header.average_doclength == pytest.approx(s1.manifest.average_doclength)

    # CIFF terms are byte-sorted (required by PISA downstream)
    r = CiffReader(ciff_path)
    terms = [pl.term for pl in r.postings_lists()]
    assert terms == sorted(terms, key=lambda s: s.encode())

    idx2 = str(tmp_path / "idx2")
    ciff_to_index(ciff_path, idx2, BuildParams(num_partitions=2))
    s2 = LocalScorer(idx2)
    assert s1.vocabulary() == s2.vocabulary()
    for term in s1.vocabulary():
        d1, t1 = s1.postings(term)
        d2, t2 = s2.postings(term)
        assert d1.tolist() == d2.tolist(), term
        assert t1.tolist() == t2.tolist(), term

    # salted (multi-slice) terms survive export/import; scores identical
    q = "the time people"
    r1 = s1.topk(q, k=5)
    r2 = s2.topk(q, k=5)
    assert r1[0].tolist() == r2[0].tolist()
    assert r1[1].tolist() == r2[1].tolist()


def test_postings_chunks_boundary_scan():
    """The varint boundary scan must partition the postings stream into
    chunks that, parsed independently, reproduce the sequential read —
    the invariant the parallel import decode relies on."""
    from ciff_ray.interop.convert import CiffReader
    from ciff_ray.interop.proto import CiffPostingsList, read_delimited

    seq = [
        (pl.term, pl.doc_ids().tolist(), pl.tfs.tolist())
        for pl in CiffReader(TOY).postings_lists()
    ]
    r = CiffReader(TOY)
    chunks = r.postings_chunks(target_msgs=2)
    assert sum(c for _, c in chunks) == len(seq) == 9
    assert len(chunks) == 5  # 2+2+2+2+1
    got = []
    for pos, count in chunks:
        for _ in range(count):
            msg, pos = read_delimited(r.buf, pos)
            pl = CiffPostingsList.parse(msg)
            got.append((pl.term, pl.doc_ids().tolist(), pl.tfs.tolist()))
    assert got == seq
    # the scan also fixed _docs_start: doc records readable with no
    # second postings pass
    assert len(list(r.doc_records())) == r.header.num_docs


def test_export_refuses_pending_tombstones(ray_session, tmp_path):
    """index_to_ciff on a tombstoned index would resurrect deleted docs
    in the exported CIFF — it must fail and point at compaction."""
    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from ciff_ray import IndexBuilder
    from ciff_ray.interop.bridge import index_to_ciff
    from ciff_ray.lifecycle import delete_docs
    from ciff_ray.synth import generate_transcripts

    src = str(tmp_path / "t.parquet")
    pq.write_table(generate_transcripts(n_convs=10, seed=13), src)
    idx = str(tmp_path / "idx")
    IndexBuilder().input_parquet(src).output_dir(idx).partitions(2).convert()
    delete_docs(idx, np.array([0], dtype=np.int64))
    with pytest.raises(ValueError, match="tombstones"):
        index_to_ciff(idx, str(tmp_path / "out.ciff"))
