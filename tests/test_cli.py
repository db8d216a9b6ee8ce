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
