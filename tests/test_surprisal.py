"""Unigram-surprisal quality scoring vs a pure-Python recompute over
the OracleIndex."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.surprisal import _SurprisalActor
from ciff_ray.synth import generate_transcripts


@pytest.fixture(scope="module")
def surp_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("surpidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    # docid order = byte-ascending (conv_id, turn_idx) rank
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    texts = tbl["text"].take(pa.array(order)).to_pylist()
    return out, OracleIndex.build(tbl), texts


def _brute_nll(oracle: OracleIndex, text: str) -> float:
    toks = tokenize(text)
    if not toks:
        return 0.0
    total = float(sum(oracle.doclengths))
    s = sum(math.log(total / oracle.cf(t)) for t in toks)
    return s / len(toks)


def test_surprisal_actor_matches_bruteforce(surp_fixture):
    idx, oracle, texts = surp_fixture
    actor = _SurprisalActor(idx)
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = actor(batch)
    nll = out["nll_r"].to_numpy(zero_copy_only=False)
    dl = out["dl"].to_numpy(zero_copy_only=False)
    for d, text in enumerate(texts):
        assert dl[d] == len(tokenize(text)), d
        assert nll[d] == pytest.approx(round(_brute_nll(oracle, text), 6)), d


def test_surprisal_discriminates_rare_from_stopword(surp_fixture):
    """A rare-token-only doc must score strictly above a stopword-only
    doc (the filter's reason to exist), using tokens from the corpus
    itself."""
    idx, oracle, texts = surp_fixture
    common = max(oracle.postings, key=lambda t: oracle.cf(t))
    rare = min(oracle.postings, key=lambda t: (oracle.cf(t), t))
    actor = _SurprisalActor(idx)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([f"{common} {common} {common}", f"{rare} {rare}"]),
        }
    )
    out = actor(batch)["nll_r"].to_pylist()
    assert out[1] > out[0] > 0.0


def test_surprisal_fails_fast_on_foreign_term(surp_fixture):
    idx, oracle, texts = surp_fixture
    actor = _SurprisalActor(idx)
    batch = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(["zzzznotaterm"]),
        }
    )
    with pytest.raises(ValueError, match="absent from index"):
        actor(batch)


def test_surprisal_empty_doc_is_zero(surp_fixture):
    idx, oracle, texts = surp_fixture
    actor = _SurprisalActor(idx)
    batch = pa.table(
        {
            "doc_id": pa.array([7], type=pa.int64()),
            "text": pa.array(["   ...   "]),
        }
    )
    out = actor(batch)
    assert out["dl"].to_pylist() == [0]
    assert out["nll_r"].to_pylist() == [0.0]
