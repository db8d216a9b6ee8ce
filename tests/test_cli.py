"""CLI surface: the reference's three converters + engine commands
(`python -m ciff_ray ...`), driven in-process via cli.main."""

from __future__ import annotations

import json

import pytest

from ciff_ray.cli import main

TOY = "/root/reference/tests/test_data/toy-complete-20200309.ciff"


def test_converter_chain(tmp_path, capsys):
    base = str(tmp_path / "coll")
    main(["ciff2pisa", TOY, base])
    assert open(base + ".terms").read().splitlines()[0] == "01"

    ciff2 = str(tmp_path / "out.ciff")
    main(["pisa2ciff", base, ciff2])

    idx = str(tmp_path / "idx")
    main(["import-ciff", ciff2, idx, "--partitions", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_docs"] == 3

    main(["query", idx, "text content", "-k", "3"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    assert lines[0].split("\t")[3] in ("WSJ_1", "TREC_DOC_1", "DOC222")

    back = str(tmp_path / "back.ciff")
    main(["export-ciff", idx, back])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_postings_lists"] == 9


def test_jsonl2ciff_cli(tmp_path, capsys):
    src = tmp_path / "docs.jsonl"
    src.write_text('{"id": "a", "vector": {"x": 2.0}}\n')
    out = str(tmp_path / "o.ciff")
    main(["jsonl2ciff", str(src), out])
    r = json.loads(capsys.readouterr().out.strip())
    assert r == {"num_docs": 1, "num_postings_lists": 1}


def test_unknown_command():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_lifecycle_cli_chain(tmp_path, capsys, ray_session):
    """build -> merge -> delete -> compact -> query, all via the CLI."""
    import pyarrow.parquet as pq
    from ciff_ray.synth import generate_transcripts

    pq.write_table(
        generate_transcripts(n_convs=20, max_turns=4, seed=5, mean_tokens=15),
        str(tmp_path / "a.parquet"),
    )
    pq.write_table(
        generate_transcripts(n_convs=20, max_turns=4, seed=6, mean_tokens=15),
        str(tmp_path / "b.parquet"),
    )
    for n in ("a", "b"):
        main(["build", str(tmp_path / f"{n}.parquet"),
              str(tmp_path / f"idx_{n}"), "--partitions", "2"])
    capsys.readouterr()
    merged = str(tmp_path / "merged")
    main(["merge", str(tmp_path / "idx_a"), str(tmp_path / "idx_b"), merged])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_total = out["num_docs"]
    assert n_total > 0

    main(["delete", merged, "0", "1", "2"])
    assert json.loads(capsys.readouterr().out.strip())["total_tombstones"] == 3

    compacted = str(tmp_path / "compacted")
    main(["compact", merged, compacted])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_docs"] == n_total - 3

    main(["query", compacted, "the time", "-k", "3"])
    assert len(capsys.readouterr().out.strip().splitlines()) == 3


def test_positions_cli_chain(tmp_path, capsys, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["tool call failed", "call the tool", "tool call ok"]
    src = str(tmp_path / "transcripts.parquet")
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(["conv-0"] * 3, type=pa.string()),
                "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
                "role": pa.array(["user"] * 3, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "tool": pa.array([""] * 3, type=pa.string()),
                "ts": pa.array([0, 1, 2], type=pa.timestamp("us")),
            }
        ),
        src,
    )
    # the positional store reads (doc_id, text); docids are the dense
    # (conv_id, turn_idx) rank, which here equals turn_idx
    docsrc = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        docsrc,
    )
    idx = str(tmp_path / "idx")
    main(["build", src, idx, "--partitions", "2"])
    capsys.readouterr()
    pos = str(tmp_path / "pos")
    main(["build-positions", docsrc, pos])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["output"] == pos

    main(["phrase", idx, pos, "tool call"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert [int(l.split("\t")[0]) for l in lines] == [0, 2]


def test_cli_publish_current(tmp_path, capsys, ray_session):
    import json

    import pyarrow.parquet as pq

    from ciff_ray.synth import generate_transcripts

    pq.write_table(
        generate_transcripts(n_convs=10, max_turns=3, seed=7, mean_tokens=10),
        str(tmp_path / "t.parquet"),
    )
    idx = str(tmp_path / "idx")
    main(["build", str(tmp_path / "t.parquet"), idx, "--partitions", "2"])
    capsys.readouterr()
    cat = str(tmp_path / "cat")
    main(["publish", cat, idx])
    gen1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gen1["generation"] == 1
    main(["current", cat])
    cur = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cur["generation"] == 1 and cur["index_dir"].endswith("idx")


def test_cli_prune_chain(tmp_path, capsys, ray_session):
    """build -> prune -> query via the CLI: pruned index serves."""
    import json

    import pyarrow.parquet as pq

    from ciff_ray.synth import generate_transcripts

    pq.write_table(
        generate_transcripts(n_convs=15, max_turns=4, seed=9, mean_tokens=12),
        str(tmp_path / "t.parquet"),
    )
    idx, pidx = str(tmp_path / "idx"), str(tmp_path / "pruned")
    main(["build", str(tmp_path / "t.parquet"), idx, "--partitions", "2"])
    capsys.readouterr()
    main(["prune", idx, pidx, "--top", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["top"] == 8 and out["output"] == pidx
    main(["query", pidx, "the", "-k", "3"])
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert 1 <= len(lines) <= 3


def test_cli_bulk_and_fsck(tmp_path, capsys, ray_session):
    """build -> fsck (clean) -> bulk workload -> parquet results that
    match the per-query CLI path."""
    import pyarrow.parquet as pq
    from ciff_ray.synth import generate_transcripts

    pq.write_table(
        generate_transcripts(n_convs=20, max_turns=4, seed=9, mean_tokens=15),
        str(tmp_path / "t.parquet"),
    )
    idx = str(tmp_path / "idx")
    main(["build", str(tmp_path / "t.parquet"), idx, "--partitions", "2"])
    capsys.readouterr()

    main(["fsck", idx])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clean"] is True

    wl = str(tmp_path / "wl.txt")
    open(wl, "w").write("the time\nzzznever\n")
    outdir = str(tmp_path / "bulk_out")
    main(["bulk", idx, wl, outdir, "-k", "4"])
    capsys.readouterr()
    res = pq.read_table(outdir)
    assert res.num_rows == 4  # 4 hits for q0, none for q1
    assert set(res.column_names) == {"query_id", "rank", "doc_id"}

    main(["query", idx, "the time", "-k", "4"])
    lines = capsys.readouterr().out.strip().splitlines()
    cli_docs = [int(line.split("\t")[1]) for line in lines]
    got = sorted(
        (int(r["rank"]), int(r["doc_id"]))
        for r in res.to_pylist()
        if r["query_id"] == 0
    )
    assert [d for _, d in got] == cli_docs


def test_cli_query_models_and_percolate(tmp_path, capsys, ray_session):
    """--model scoring families + the percolate subcommand."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ciff_ray.synth import generate_transcripts
    from ciff_ray.tfidf import build_docnorms

    tbl = generate_transcripts(n_convs=20, max_turns=4, seed=5, mean_tokens=15)
    pq.write_table(tbl, str(tmp_path / "t.parquet"))
    idx = str(tmp_path / "idx")
    main(["build", str(tmp_path / "t.parquet"), idx, "--partitions", "3"])
    capsys.readouterr()
    # docs table in docid order (rank under byte-ascending conv/turn)
    conv, turn = tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(tbl)), type=pa.int64()),
            "text": tbl["text"].take(pa.array(order)),
        }
    )
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    norms = build_docnorms(
        ray.data.from_arrow(docs).repartition(2), idx, str(tmp_path / "norms")
    )
    for extra in (
        ["--model", "lmdir"],
        ["--model", "lmjm"],
        ["--model", "pl2"],
        ["--model", "tfidf", "--norms", norms],
    ):
        main(["query", idx, "the time", "-k", "2", *extra])
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 2 and lines[0].startswith("1\t"), extra
    with pytest.raises(SystemExit, match="norms"):
        main(["query", idx, "the", "--model", "tfidf"])
    # percolate: stored-query file -> match parquet
    (tmp_path / "qs.txt").write_text("the time\nzzznever\n")
    out_dir = str(tmp_path / "perc")
    main(["percolate", str(tmp_path / "qs.txt"), str(tmp_path / "docs.parquet"), out_dir])
    capsys.readouterr()
    t = pq.read_table(out_dir)
    assert t.num_rows > 0
    assert set(t["query_id"].to_pylist()) == {0}


def test_cli_ltr(tmp_path, capsys, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ciff_ray.synth import generate_transcripts
    from ciff_ray.tfidf import build_docnorms

    tbl = generate_transcripts(n_convs=20, max_turns=4, seed=5, mean_tokens=15)
    pq.write_table(tbl, str(tmp_path / "t.parquet"))
    idx = str(tmp_path / "idx")
    main(["build", str(tmp_path / "t.parquet"), idx, "--partitions", "3"])
    capsys.readouterr()
    conv, turn = tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(tbl)), type=pa.int64()),
            "text": tbl["text"].take(pa.array(order)),
        }
    )
    norms = build_docnorms(
        ray.data.from_arrow(docs).repartition(2), idx, str(tmp_path / "norms")
    )
    (tmp_path / "qs.txt").write_text("the time\npeople\n")
    out = str(tmp_path / "ltr")
    main(["ltr", idx, norms, str(tmp_path / "qs.txt"), out, "-k", "5"])
    capsys.readouterr()
    t = pq.read_table(out)
    assert t.num_rows > 0
    assert t.schema.names == [
        "query_id", "doc_id", "rank", "dl",
        "bm25_r", "lmdir_r", "lmjm_r", "pl2_r", "tfidf_r",
    ]


def test_cli_export_ciff_quantized(ray_session, tmp_path):
    """export-ciff --quantize: the CLI inverse of jsonl2ciff --quantize —
    re-importing the quantized CIFF serves identical impact sums."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.interop.bridge import ciff_to_index
    from ciff_ray.interop.convert import ScoreQuantizer
    from ciff_ray.query import LocalScorer
    from ciff_ray.quantized import (
        compute_score_range,
        impact_score_all,
        quantized_score_all,
    )
    from ciff_ray.synth import generate_transcripts

    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(
            generate_transcripts(n_convs=30, max_turns=6, seed=9)
        ),
        idx,
        BuildParams(num_partitions=3, sample_frac=1.0),
    )
    out = str(tmp_path / "q.ciff")
    r = subprocess.run(
        [sys.executable, "-m", "ciff_ray", "export-ciff", idx, out,
         "--quantize"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["quantize_range"][0] > 0

    re_idx = str(tmp_path / "reidx")
    ciff_to_index(out, re_idx)
    lo, hi = compute_score_range(idx)
    qz = ScoreQuantizer(min=lo, max=hi)
    s1, s2 = LocalScorer(idx), LocalScorer(re_idx)
    for q in ["the people", "time year", "zzznotaterm"]:
        u1, v1 = quantized_score_all(s1, qz, q)
        u2, v2 = impact_score_all(s2, q)
        assert np.array_equal(u1, u2) and np.array_equal(v1, v2), q


def test_cli_reorder_bp(ray_session, tmp_path):
    """reorder CLI: rebuild under BP order from a documents.parquet dir,
    then fsck --mapping validates the pair end to end."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(80, dtype=np.int64)),
            "text": pa.array(
                [f"alpha beta w{i % 7} w{i % 11} gamma" for i in range(80)]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    idx, mapping = str(tmp_path / "idx"), str(tmp_path / "map")
    r = subprocess.run(
        [sys.executable, "-m", "ciff_ray", "reorder", str(tmp_path), idx,
         mapping, "--order", "bp"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["postings"] > 0
    f = subprocess.run(
        [sys.executable, "-m", "ciff_ray", "fsck", idx, "--mapping", mapping],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert f.returncode == 0, f.stderr[-2000:]
    assert '"clean": true' in f.stdout
