"""Checkpoint/resume: a failed build resumes per partition (north_rule:
per-partition lineage + metrics), re-runs skip finished partitions, and
resumed output is byte-identical."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.layout import IndexPaths, read_lineage
from ciff_ray.oracle import OracleIndex
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts

PARAMS = dict(n_convs=16, max_turns=5, seed=21)
BP = BuildParams(num_partitions=6, heavy_df_frac=0.0, sample_frac=1.0)


def _segments_bytes(out: str) -> dict[str, bytes]:
    segdir = IndexPaths(out).segments_dir
    return {
        f: open(os.path.join(segdir, f), "rb").read()
        for f in sorted(os.listdir(segdir))
        if f.endswith(".parquet")
    }


def test_partial_failure_resume(tmp_path):
    tbl = generate_transcripts(**PARAMS)
    ds = ray.data.from_arrow(tbl).repartition(3)

    # full reference build
    ref = str(tmp_path / "ref")
    build_index(ds, ref, BP)
    ref_bytes = _segments_bytes(ref)

    # simulated mid-build crash: build fully, then destroy two partitions
    # (segment + done-marker), as if those write tasks never finished
    out = str(tmp_path / "crashed")
    build_index(ds, out, BP)
    paths = IndexPaths(out)
    for pid in (1, 4):
        os.remove(paths.segment(pid))
        os.remove(paths.segment_done(pid))
        os.remove(paths.term_dict_part(pid))

    # resume: identical inputs -> identical fingerprint -> completed
    # partitions skipped, missing ones rebuilt
    build_index(ds, out, BP)
    lineage = read_lineage(paths.lineage)
    last_round = lineage[-BP.num_partitions:]
    by_status = {}
    for r in last_round:
        by_status.setdefault(r["status"], []).append(r["partition_id"])
    assert sorted(by_status.get("written", [])) == [1, 4]
    assert len(by_status.get("skipped", [])) == BP.num_partitions - 2

    # resumed output byte-identical to the uninterrupted build
    assert _segments_bytes(out) == ref_bytes

    # and the index still matches the oracle exactly
    oracle = OracleIndex.build(tbl)
    scorer = LocalScorer(out)
    for term, plist in oracle.postings.items():
        docs, tfs = scorer.postings(term)
        assert docs.tolist() == [d for d, _ in plist]
        assert tfs.tolist() == [t for _, t in plist]


def test_changed_input_invalidates_markers(tmp_path):
    """A different input fingerprint must NOT reuse stale partitions."""
    tbl1 = generate_transcripts(**PARAMS)
    tbl2 = generate_transcripts(n_convs=16, max_turns=5, seed=99)
    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl1), out, BP, input_fingerprint="fp-one")
    build_index(ray.data.from_arrow(tbl2), out, BP, input_fingerprint="fp-two")
    lineage = read_lineage(IndexPaths(out).lineage)
    last_round = lineage[-BP.num_partitions:]
    assert all(r["status"] == "written" for r in last_round)
    # index reflects the NEW input
    oracle = OracleIndex.build(tbl2)
    scorer = LocalScorer(out)
    assert scorer.vocabulary() == sorted(oracle.postings.keys())


def test_out_dir_reuse_clears_stale_state(tmp_path):
    """Rebuilding a DIFFERENT corpus into the same out_dir must not
    leave the previous occupant's segments, term-dict parts, or
    tombstones behind (code-review findings: a partition receiving no
    rows in the new build kept the old corpus's postings; stale
    tombstones suppressed arbitrary new docs)."""
    import numpy as np

    from ciff_ray.lifecycle import delete_docs
    from ciff_ray.query import LocalScorer

    out = str(tmp_path / "idx")
    a = generate_transcripts(n_convs=12, seed=1)
    build_index(ray.data.from_arrow(a), out, BP)
    delete_docs(out, np.array([0], dtype=np.int64))
    paths = IndexPaths(out)
    assert os.path.exists(paths.tombstones)

    b = generate_transcripts(n_convs=4, seed=99)  # different + smaller
    m = build_index(ray.data.from_arrow(b), out, BP)

    # tombstones from the old corpus are gone; doc 0 serves again
    assert not os.path.exists(paths.tombstones)
    s = LocalScorer(out)
    # vocabulary is exactly corpus B's (no stale terms from A)
    from ciff_ray.oracle import OracleIndex

    oracle = OracleIndex.build(b)
    assert sorted(s.vocabulary()) == sorted(oracle.postings)
    for term, plist in oracle.postings.items():
        docs, tfs = s.postings(term)
        assert docs.tolist() == [d for d, _ in plist], term
    assert m.num_docs == len(b)


def test_in_memory_content_fingerprint(tmp_path):
    """In-memory datasets resume on IDENTICAL content but never match
    markers from different content (the params-only-hash trap)."""
    out = str(tmp_path / "idx")
    a = generate_transcripts(n_convs=10, seed=3)
    build_index(ray.data.from_arrow(a), out, BP)
    build_index(ray.data.from_arrow(a), out, BP)  # identical -> resume
    lineage = read_lineage(IndexPaths(out).lineage)
    last = lineage[-BP.num_partitions:]
    assert all(r["status"] == "skipped" for r in last)

    b = generate_transcripts(n_convs=10, seed=4)  # same shape, new text
    build_index(ray.data.from_arrow(b), out, BP)
    lineage = read_lineage(IndexPaths(out).lineage)
    last = lineage[-BP.num_partitions:]
    assert all(r["status"] == "written" for r in last)
