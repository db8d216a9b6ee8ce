"""End-to-end corpus cleaning — the composed training-data filter pass
(C4/Gopher flavor) built from the engine's existing per-doc kernels:

bit 1  low quality        (textstats quality score < {QUALITY_MIN})
bit 2  non-English        (lang_pred != 'en')
bit 4  repetitive/junk    (rep_flags > 0)
bit 8  duplicate          (not its content group's keeper — the
                           dedup_by_key prefix-fingerprint rule)

Output: (doc_id, drop_reasons bitmask, keep 0/1).  keep == 1 iff no
reason fired.

Shape: the three per-doc feature kernels run fused in ONE map_batches
pass (no shuffle — they are row-aligned over the same batch); the dup
bit needs the one keyed exchange every dedup needs (16-byte content
keys); the two bit streams then meet in a doc-hash co-partition merge
(the established part-key pattern — Ray's hash aggregate over millions
of tiny groups measured ~5x slower in round 2, dedup.py:_pair_part2).

Oracle: the composed SQL reuses the individual entries' oracle
CTEs verbatim (doc_quality / lang_id / repetition_signals /
dedup_by_key), so the composition can never drift from its parts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

QUALITY_MIN = 2
CLEAN_PARTS = 32

_BIT_QUALITY = 1
_BIT_LANG = 2
_BIT_REP = 4
_BIT_DUP = 8


def _feature_bits(batch: pa.Table) -> pa.Table:
    """ONE pass over a documents batch -> (part, doc_id, bits) from the
    three row-aligned feature kernels."""
    from ciff_ray.extras.textstats import (
        _doc_quality_batch,
        _lang_id_batch,
        _rep_signals_batch,
    )

    q = _doc_quality_batch(batch)
    l = _lang_id_batch(batch)
    r = _rep_signals_batch(batch)
    quality = q["quality"].to_numpy(zero_copy_only=False)
    lang = np.array(l["lang_pred"].to_pylist(), dtype=object)
    flags = r["rep_flags"].to_numpy(zero_copy_only=False)
    bits = (
        (quality < QUALITY_MIN) * _BIT_QUALITY
        + (lang != "en") * _BIT_LANG
        + (flags > 0) * _BIT_REP
    ).astype(np.int64)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "part": pa.array((doc % CLEAN_PARTS).astype(np.int32)),
            "doc_id": pa.array(doc, type=pa.int64()),
            "bits": pa.array(bits, type=pa.int64()),
        }
    )


def _dup_keys(batch: pa.Table) -> pa.Table:
    from ciff_ray.extras.dedup import (
        KEY_PREFIX_CHARS,
        _normalize,
        _xxhash64,
    )

    norm = pc.utf8_slice_codeunits(
        _normalize(batch["text"]), 0, KEY_PREFIX_CHARS
    )
    k1 = _xxhash64(norm, seed=0x9E3779B97F4A7C15)
    k2 = _xxhash64(norm, seed=0xC2B2AE3D27D4EB4F)
    return pa.table(
        {
            "k1": pa.array(k1.view(np.int64), type=pa.int64()),
            "k2": pa.array(k2.view(np.int64), type=pa.int64()),
            "doc_id": batch["doc_id"],
        }
    )


def _dup_bits(group: pa.Table) -> pa.Table:
    """One content-key group -> (part, doc_id, bits): every member but
    the minimum doc_id carries the dup bit (keepers emit bits=0 rows so
    the merge sees every doc from this stream too — harmless, tiny)."""
    d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bits = np.full(d.size, _BIT_DUP, dtype=np.int64)
    bits[np.argmin(d)] = 0
    return pa.table(
        {
            "part": pa.array((d % CLEAN_PARTS).astype(np.int32)),
            "doc_id": pa.array(d, type=pa.int64()),
            "bits": pa.array(bits, type=pa.int64()),
        }
    )


def _merge_bits(group: pa.Table) -> pa.Table:
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    b = group["bits"].to_numpy(zero_copy_only=False)
    docs, inv = np.unique(d, return_inverse=True)
    merged = np.zeros(docs.size, dtype=np.int64)
    np.bitwise_or.at(merged, inv, b)
    return pa.table(
        {
            "doc_id": pa.array(docs, type=pa.int64()),
            "drop_reasons": pa.array(merged, type=pa.int64()),
            "keep": pa.array((merged == 0).astype(np.int64), type=pa.int64()),
        }
    )


def q_clean_corpus(sf_dir: str) -> ray.data.Dataset:
    """The composed cleaning pass: per-doc (drop_reasons, keep)."""
    import os

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    feats = docs.map_batches(_feature_bits, batch_format="pyarrow")
    dups = (
        docs.map_batches(_dup_keys, batch_format="pyarrow")
        .groupby(["k1", "k2"])
        .map_groups(_dup_bits, batch_format="pyarrow")
    )
    return (
        feats.union(dups)
        .groupby("part")
        .map_groups(_merge_bits, batch_format="pyarrow")
    )


def _oracle_sql() -> str:
    from ciff_ray.extras.dedup import ORACLE_SQLS as DEDUP_SQLS
    from ciff_ray.extras.textstats import ORACLE_SQLS as TEXT_SQLS

    def cte(sql: str) -> str:
        """Embed a standalone 'WITH a AS (...), b AS (...) SELECT ...'
        oracle as a subquery."""
        return f"({sql})"

    return f"""WITH
q AS {cte(TEXT_SQLS["doc_quality"])},
l AS {cte(TEXT_SQLS["lang_id"])},
r AS {cte(TEXT_SQLS["repetition_signals"])},
keepers AS (SELECT keep_doc_id FROM {cte(DEDUP_SQLS["dedup_by_key"])}),
bits AS (
  SELECT q.doc_id,
         (CASE WHEN q.quality < {QUALITY_MIN} THEN {_BIT_QUALITY} ELSE 0 END)
       + (CASE WHEN l.lang_pred <> 'en' THEN {_BIT_LANG} ELSE 0 END)
       + (CASE WHEN r.rep_flags > 0 THEN {_BIT_REP} ELSE 0 END)
       + (CASE WHEN q.doc_id NOT IN (SELECT keep_doc_id FROM keepers)
               THEN {_BIT_DUP} ELSE 0 END) AS drop_reasons
  FROM q JOIN l ON q.doc_id = l.doc_id JOIN r ON q.doc_id = r.doc_id
)
SELECT doc_id, CAST(drop_reasons AS BIGINT) AS drop_reasons,
       CAST(CASE WHEN drop_reasons = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM bits"""


ORACLE_SQLS = {"clean_corpus": _oracle_sql()}
QUERIES = {"clean_corpus": q_clean_corpus}
