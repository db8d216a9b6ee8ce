"""Conversation upsert (replace-by-conv): delete_convs + delta ingest +
merge, then compaction — the updated index must score every surviving
document bit-identically to a from-scratch build over the UPDATED
corpus (matched by collection_docid: docID ASSIGNMENT legitimately
differs, replaced conversations re-enter at the end of the merged doc
range until a fresh build re-sorts them)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.lifecycle import compact_index
from ciff_ray.merge import upsert_convs
from ciff_ray.query import QueryEngine
from ciff_ray.synth import generate_transcripts

PARAMS = dict(num_partitions=4, heavy_df_frac=0.2, num_salts=2, sample_frac=1.0)

QUERIES = ["the", "time people", "freshterm", "state good very make", "freshterm the"]


def _replacement_rows(convs: list[str]) -> pa.Table:
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    for i, c in enumerate(convs):
        for t in range(4):  # different turn count than the originals
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            rows["text"].append(f"freshterm revision {i} turn {t} of the conversation")
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "text": pa.array(rows["text"], type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def upserted(tmp_path_factory):
    tbl = generate_transcripts(n_convs=30, max_turns=6, seed=21, mean_tokens=24)
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    replaced = convs[3:8]
    new_tbl = pa.concat_tables(
        [_replacement_rows(replaced), _replacement_rows(["zzz-brandnew"])]
    )
    base = str(tmp_path_factory.mktemp("ups") / "base")
    merged = str(tmp_path_factory.mktemp("ups") / "merged")
    compacted = str(tmp_path_factory.mktemp("ups") / "compacted")
    fresh = str(tmp_path_factory.mktemp("ups") / "fresh")
    build_index(ray.data.from_arrow(tbl).repartition(3), base, BuildParams(**PARAMS))

    n_old_turns = sum(
        1 for c in tbl["conv_id"].to_pylist() if c in set(replaced)
    )
    upsert_convs(base, ray.data.from_arrow(new_tbl), merged)

    compact_index(merged, compacted)

    import pyarrow.compute as pc

    keep = pc.invert(
        pc.is_in(tbl["conv_id"], value_set=pa.array(replaced, type=pa.string()))
    )
    updated_corpus = pa.concat_tables(
        [tbl.select(["conv_id", "turn_idx", "text"]).filter(keep), new_tbl]
    )
    build_index(
        ray.data.from_arrow(updated_corpus).repartition(3),
        fresh,
        BuildParams(**PARAMS),
    )
    return base, merged, compacted, fresh, replaced, n_old_turns, new_tbl


def _score_map(idx_dir: str, query: str) -> dict[str, float]:
    eng = QueryEngine(idx_dir)
    docs, scores = eng._local.score_all(query)
    names = eng.collection_docids(docs)
    return dict(zip(names, scores.tolist()))


def test_tombstones_cover_exactly_the_replaced_convs(upserted):
    base, merged, *_rest, replaced, n_old_turns, _new = (
        upserted[0],
        upserted[1],
        upserted[2],
        upserted[3],
        upserted[4],
        upserted[5],
        upserted[6],
    )
    import pyarrow.parquet as pq

    from ciff_ray.layout import IndexPaths

    dead = pq.read_table(IndexPaths(base).tombstones)
    assert len(dead) == n_old_turns


def test_stale_turns_never_served_and_fresh_turns_are(upserted):
    _base, merged, _compacted, _fresh, replaced, _n, new_tbl = upserted
    eng = QueryEngine(merged)
    docs, _tfs = eng._local.postings("freshterm")
    # every replacement turn (and nothing else) contains freshterm
    assert docs.size == len(new_tbl)
    names = set(eng.collection_docids(docs))
    assert names == {
        f"{c}/{t}"
        for c, t in zip(
            new_tbl["conv_id"].to_pylist(), new_tbl["turn_idx"].to_pylist()
        )
    }
    # no stale turn of a replaced conv is reachable from any posting
    # hit: every served docID of a replaced conv must BE one of the
    # replacement docIDs (turn-index checks alone would miss a
    # tombstone landing on the wrong doc of turns 0-3)
    fresh_ids = set(docs.tolist())
    for q in QUERIES:
        d, _ = eng._local.score_all(q)
        names = eng.collection_docids(d)
        for doc, name in zip(d.tolist(), names):
            conv, _turn = name.rsplit("/", 1)
            if conv in set(replaced):
                assert doc in fresh_ids, f"stale turn served: {name}"


def test_compacted_upsert_matches_fresh_build(upserted):
    _base, _merged, compacted, fresh, _replaced, _n, _new = upserted
    for q in QUERIES:
        a = _score_map(compacted, q)
        b = _score_map(fresh, q)
        assert a == b, q  # bit-identical score per collection_docid
