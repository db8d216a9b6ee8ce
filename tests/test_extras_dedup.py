"""Dedup extras: planted near-dup recovery, simhash locality, keyed
dedup semantics (sf0.001 testdata)."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from ciff_ray.extras import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _shingles(s: str) -> set[tuple[str, str, str]]:
    w = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    return set(zip(w, w[1:], w[2:]))


def brute_force_pairs(doc_texts, tau):
    sh = {i: _shingles(t) for i, t in doc_texts.items()}
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        A, B = sh[a], sh[b]
        if not A or not B:
            continue
        inter = len(A & B)
        if inter and inter / (len(A) + len(B) - inter) >= tau:
            out.add((a, b))
    return out


def test_minhash_equals_brute_force(ray_session, doc_texts):
    """LSH + distributed exact verify must equal exhaustive pairwise
    Jaccard."""
    got = dedup.q_dedup_minhash(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    exp = brute_force_pairs(doc_texts, dedup.JACCARD_TAU)
    assert got_pairs == exp
    assert len(exp) > 0  # the corpus has planted near-dups


def test_ngram_jaccard_equals_brute_force(ray_session, doc_texts):
    """The inverted-index self-join path (no LSH) must also equal brute
    force, including the Jaccard values."""
    got = dedup.q_dedup_ngram_jaccard(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    exp = brute_force_pairs(doc_texts, dedup.JACCARD_TAU)
    assert got_pairs == exp
    # values match the definitionally-exact jaccard
    sh = {i: _shingles(t) for i, t in doc_texts.items()}
    for _, r in got.iterrows():
        A, B = sh[r["a"]], sh[r["b"]]
        inter = len(A & B)
        assert r["j_r"] == round(inter / (len(A) + len(B) - inter), 6)


def test_simhash_locality(ray_session, doc_texts):
    sig = {
        r["doc_id"]: int(r["simhash"]) & 0xFFFFFFFFFFFFFFFF
        for r in dedup.q_dedup_simhash(SF).take_all()
    }
    near = brute_force_pairs(doc_texts, 0.9)
    assert near

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    near_d = [hamming(sig[a], sig[b]) for a, b in near]
    rng = np.random.default_rng(0)
    ids = sorted(sig)
    rand_d = []
    near_set = set(near)
    while len(rand_d) < 200:
        a, b = rng.choice(len(ids), 2, replace=False)
        p = (ids[min(a, b)], ids[max(a, b)])
        if p not in near_set:
            rand_d.append(hamming(sig[p[0]], sig[p[1]]))
    assert max(near_d) <= 12
    assert np.mean(rand_d) > 16


def test_simhash_deterministic_known_value():
    import pyarrow as pa

    batch = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["a b a"])}
    )
    out1 = dedup.simhash_batch(batch)
    out2 = dedup.simhash_batch(batch)
    assert out1["simhash"].to_pylist() == out2["simhash"].to_pylist()
    # tf weights matter: "a a b" == "a b a" (bag semantics)
    batch2 = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["a a b"])}
    )
    assert (
        dedup.simhash_batch(batch2)["simhash"].to_pylist()
        == out1["simhash"].to_pylist()
    )


def test_keyed_dedup_collapses_near_dups(ray_session, doc_texts):
    exact = dedup.q_dedup_exact(SF).to_pandas()
    keyed = dedup.q_dedup_by_key(SF).to_pandas()
    assert exact["n_dups"].sum() == len(doc_texts)
    assert keyed["n_dups"].sum() == len(doc_texts)
    # prefix-keyed dedup merges the planted near-dups; exact does not
    assert len(keyed) < len(exact)
    assert (keyed["n_dups"] > 1).any()


def test_embedding_pairs_match_numpy(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = E @ E.T
    iu = np.triu_indices(len(ids), k=1)
    mask = S[iu] >= dedup.COSINE_TAU
    exp = set(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist()))
    got = dedup.q_dedup_embedding(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs == exp
    # multi-block sweep (forces cross-block cells) finds the same pairs
    small = dedup.q_dedup_embedding(SF, block_rows=60).to_pandas()
    assert set(zip(small["a"], small["b"])) == exp
