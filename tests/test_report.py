"""Index observability report vs an independent direct recompute over
the segment parquet files."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.report import index_report
from ciff_ray.synth import generate_transcripts


@pytest.fixture(scope="module")
def report_index(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=17, mean_tokens=20)
    out = str(tmp_path_factory.mktemp("repidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(3),
        out,
        BuildParams(
            num_partitions=4, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0
        ),
    )
    return out


def test_report_matches_direct_recompute(report_index):
    got = index_report(report_index)
    slices = postings = doc_b = tf_b = heavy = 0
    max_df = 0
    codec = {0: 0, 1: 0, 2: 0}
    for f in glob.glob(os.path.join(report_index, "segments", "*.parquet")):
        t = pq.read_table(f)
        slices += t.num_rows
        postings += sum(t["df"].to_pylist())
        doc_b += sum(len(b) for b in t["doc_bytes"].to_pylist())
        tf_b += sum(len(b) for b in t["tf_bytes"].to_pylist())
        heavy += sum(1 for s in t["salt"].to_pylist() if s > 0)
        for c in t["doc_codec"].to_pylist():
            codec[int(c)] += 1
        if t.num_rows:
            max_df = max(max_df, max(t["df"].to_pylist()))
    assert got["slices"] == slices
    assert got["postings"] == postings
    assert got["doc_bytes"] == doc_b and got["tf_bytes"] == tf_b
    assert got["heavy_slices"] == heavy
    assert got["max_df"] == max_df
    assert got["codec_slices"] == {
        "varint": codec[0], "gamma": codec[1], "packed": codec[2]
    }
    assert got["bytes_per_posting"] == (doc_b + tf_b) / postings
    assert got["num_partitions"] == 4


def test_report_cli(report_index, capsys):
    from ciff_ray.cli import main

    main(["stats", report_index])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["postings"] > 0 and out["slices"] > 0
    assert set(out["codec_slices"]) == {"varint", "gamma", "packed"}
